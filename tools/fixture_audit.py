#!/usr/bin/env python3
"""Fixture-sensitivity audit: flag queries whose result is thin at the
smoke scale factor.

The q7_volume class of bug (round 10): a query keyed on constants that
happen to select an empty/near-empty slice at sf0.001 passes the
sf0.01 oracle gate but trips the driver's rows>0 smoke check — or
worse, silently loses its discriminating power (a 1-row result hashes
equal under many wrong plans). This script runs after a full Verify
dump and lists every query returning fewer than THRESHOLD rows at the
given SF, so constant choices are audited deliberately (the list lives
in FIXTURES.md §4) instead of discovered by a red round.

Usage:
  sbt 'runMain graft.Verify /root/testdata/sf0.001 /tmp/audit001'
  python3 tools/fixture_audit.py /tmp/audit001 [threshold]
"""
import glob
import sys

import pyarrow.parquet as pq


def main(out_dir: str, threshold: int = 3) -> int:
    rows = {}
    for d in sorted(glob.glob(f"{out_dir}/*")):
        if d.endswith(".json"):
            continue
        name = d.split("/")[-1]
        try:
            rows[name] = pq.read_table(d).num_rows
        except Exception as e:
            rows[name] = f"UNREADABLE: {e}"
    thin = {n: r for n, r in rows.items()
            if isinstance(r, str) or r < threshold}
    print(f"{len(rows)} queries, {len(thin)} below {threshold} rows:")
    for n, r in sorted(thin.items(), key=lambda kv: (str(kv[1]), kv[0])):
        print(f"  {n}: {r}")
    zero = [n for n, r in thin.items() if r == 0]
    if zero:
        print(f"FAIL: zero-row results (smoke gate would flag): {zero}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3))
