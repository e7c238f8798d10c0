#!/usr/bin/env python3
"""Compare two bench runs' per-query seconds (driver BENCH_r*.json
artifacts or raw `graft.Bench` stdout) and report the common-set drift.

Usage: tools/bench_compare.py <old> <new> [threshold_pct=30]

Accepts either the driver artifact shape {"n":..,"tail":"...{json line}"}
or a file containing the bench's own JSON line. Prints the common-set
totals, the per-query worst regressions/improvements past the
threshold, and the medians — the round-13 "quiet-host two-pass
re-baseline" discipline in one command.
"""
import json
import re
import sys


def load_queries(path: str) -> dict:
    txt = open(path).read()
    try:
        d = json.loads(txt)
        if isinstance(d, dict) and "queries" in d:
            return d["queries"]
        if isinstance(d, dict) and "tail" in d:
            txt = d["tail"]
    except json.JSONDecodeError:
        pass
    best = {}
    for m in re.finditer(r'\{"metric".*?"queries":(\{[^}]*\}).*?\}', txt):
        qs = json.loads(m.group(1))
        # keep the line with the most queries (the full-run line)
        if len(qs) > len(best):
            best = qs
    if not best:
        raise SystemExit(f"no bench queries found in {path}")
    return best


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    old, new = load_queries(old_p), load_queries(new_p)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    o_tot = sum(old[q] for q in common)
    n_tot = sum(new[q] for q in common)
    print(f"common queries: {len(common)}  old {o_tot:.1f} s -> new {n_tot:.1f} s "
          f"({(n_tot / o_tot - 1) * 100:+.1f}%)")
    print(f"only-old: {len(set(old) - set(new))}  only-new: {len(set(new) - set(old))}")
    deltas = sorted(((new[q] / old[q] - 1) * 100, q) for q in common if old[q] > 0)
    meds = deltas[len(deltas) // 2][0]
    print(f"median per-query drift: {meds:+.1f}%")
    regs = [(d, q) for d, q in deltas if d > thr and new[q] - old[q] > 0.3]
    imps = [(d, q) for d, q in deltas if d < -thr and old[q] - new[q] > 0.3]
    if regs:
        print(f"\nregressions > {thr:.0f}% (and > 0.3 s):")
        for d, q in sorted(regs, reverse=True):
            print(f"  {q:28s} {old[q]:7.2f} -> {new[q]:7.2f} s  ({d:+.0f}%)")
    if imps:
        print(f"\nimprovements > {thr:.0f}% (and > 0.3 s):")
        for d, q in sorted(imps):
            print(f"  {q:28s} {old[q]:7.2f} -> {new[q]:7.2f} s  ({d:+.0f}%)")


if __name__ == "__main__":
    main()
