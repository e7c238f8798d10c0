#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, reads the Spark parquet result and executes the DuckDB
oracle over the same sf tables, then compares (a) row count, (b) schema
(column names), (c) column TYPES strictly, (d) values exactly — and
prints a per-query verdict.

Strictness matters: the real driver hashes *typed* values, so a DuckDB
HUGEINT (int128, what sum(BIGINT) widens to) vs a Spark int64 is a FAIL
even when the numbers are identical. Round 1 shipped 12 driver-red
queries because this script coerced dtypes and used np.allclose; it now
keeps both results in Arrow (duckdb .arrow(), pyarrow.parquet) so the
oracle's exact result types are visible, and compares with zero numeric
coercion and exact (bitwise for floats, NaN==NaN) equality.

This is a *local dev harness only*; the real gate is driver-side.

Every full run also writes the per-query verdict map to
CORRECTNESS_local.json at the repo root, shape-compatible with the
driver's CORRECTNESS_r{N}.json ({rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err} per query). Round 18's driver artifact
arrived empty ({}), and only a judge re-run of this script proved the
gate green — the committed local record makes that glitch immediately
diagnosable: diff the (possibly empty) round artifact against this file.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> pa.DataType:
    """Representation-only canonicalization: string vs large_string and
    list vs large_list carry identical values at identical width; all
    width/sign/precision differences (int32 vs int64, int64 vs
    decimal128 a.k.a. HUGEINT, float32 vs float64) stay distinct."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(canon_type(t.value_type))
    if pa.types.is_timestamp(t):
        # driver compares values post-read; unit/tz is reader metadata
        return pa.timestamp("us")
    return t


def type_report(spark_tbl: pa.Table, duck_tbl: pa.Table):
    """Return list of (col, spark_type, duck_type) mismatches."""
    bad = []
    for name in spark_tbl.schema.names:
        st = canon_type(spark_tbl.schema.field(name).type)
        dt = canon_type(duck_tbl.schema.field(name).type)
        if st != dt:
            bad.append((name, str(st), str(dt)))
    return bad


def to_sortable(df: pd.DataFrame) -> pd.DataFrame:
    """Make rows sortable WITHOUT changing any numeric representation:
    only lists→tuples (hashability) — no dtype coercion."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # canon_type passes timestamp unit/tz at the type gate (reader
        # metadata, matching the driver's post-read compare); mirror that
        # here by normalizing both sides to tz-naive us — otherwise a
        # tz-aware Spark column vs a naive DuckDB one would pass types
        # then fail values with an opaque "dtype-level difference".
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = df[c]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
            continue
        if df[c].dtype == object:
            if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame):
    """Exact per-column equality (Series.equals: bitwise values, dtype,
    NaN==NaN). Returns (ok, first_bad_col)."""
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False, None
    for c in a.columns:
        if not a[c].equals(b[c]):
            return False, c
    return True, None


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    verdicts = {}

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None, rows_only=False):
        verdicts[name] = {"rows_match": rows_match, "schema_match": schema_match,
                          "hash_match": hash_match, "spark_rows": spark_rows,
                          "oracle_rows": oracle_rows, "err": err}
        if rows_only:
            # no hash comparison ran — never let the artifact claim one did
            verdicts[name]["rows_only"] = True

    # Fail-closed: walk the union of result dirs found and the manifest
    # Verify wrote (the names it ATTEMPTED). An erred query writes no
    # dir — a dir-only glob would silently skip it and print ALL GREEN
    # on a red run (the observed subset-run footgun). Manifest names
    # with no result dir are hard FAILURES here.
    found = set(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                if not d.endswith(".json"))
    manifest_path = f"{out_dir}/manifest.json"
    attempted = set()
    registered = None
    if os.path.exists(manifest_path):
        m = json.load(open(manifest_path))
        attempted = set(m["attempted"])
        registered = m.get("registered")
    else:
        print("WARN: no manifest.json in dump dir — missing-result "
              "detection is OFF (pre-manifest dump?)")
    names = sorted(found | attempted)
    for name in names:
        if name not in found:
            print(f"FAIL {name}: attempted but no result dir "
                  f"(query erred during Verify — see its stderr line)")
            record(name, err="no result dir: query erred during Verify")
            failures += 1
            continue
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            record(name, err=f"spark result unreadable: {e}")
            failures += 1
            continue
        if name not in oracle:
            ok = spark_tbl.num_rows > 0
            print(f"{'OK  ' if ok else 'FAIL'} {name}: rows-only rows={spark_tbl.num_rows}")
            # hash_match stays False: no hash comparison ran, and the
            # committed artifact must not overstate coverage vs a driver
            # artifact diff — rows_only marks the weaker check
            record(name, rows_match=ok, schema_match=ok, hash_match=False,
                   spark_rows=spark_tbl.num_rows, rows_only=True,
                   err=None if ok else "rows-only check: 0 rows")
            failures += 0 if ok else 1
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            record(name, spark_rows=spark_tbl.num_rows, err=f"oracle error: {e}")
            failures += 1
            continue
        g_cols = sorted(spark_tbl.schema.names)
        w_cols = sorted(duck_tbl.schema.names)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns {g_cols} vs {w_cols}")
            record(name, rows_match=spark_tbl.num_rows == duck_tbl.num_rows,
                   spark_rows=spark_tbl.num_rows, oracle_rows=duck_tbl.num_rows,
                   err=f"columns {g_cols} vs {w_cols}")
            failures += 1
            continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {duck_tbl.num_rows}")
            record(name, schema_match=True, spark_rows=spark_tbl.num_rows,
                   oracle_rows=duck_tbl.num_rows, err="row count mismatch")
            failures += 1
            continue
        # strict type gate — this is what the old check.py missed
        bad_types = type_report(spark_tbl, duck_tbl)
        if bad_types:
            print(f"FAIL {name}: TYPE mismatch (driver hashes typed values)")
            for col, st, dt in bad_types:
                print(f"  col {col}: spark={st} oracle={dt}")
            record(name, rows_match=True, schema_match=False,
                   spark_rows=spark_tbl.num_rows, oracle_rows=duck_tbl.num_rows,
                   err="type mismatch: " + "; ".join(
                       f"{c} spark={s} oracle={d}" for c, s, d in bad_types))
            failures += 1
            continue
        g = to_sortable(spark_tbl.to_pandas())
        w = to_sortable(duck_tbl.to_pandas())
        ok, bad_col = values_match(g, w)
        if not ok:
            print(f"FAIL {name}: value mismatch")
            if bad_col is not None:
                neq = g[bad_col] != w[bad_col]
                # NaN != NaN is True elementwise; Series.equals treats them
                # equal, so mask positions where both are NaN-like
                both_na = g[bad_col].isna() & w[bad_col].isna()
                neq = neq & ~both_na
                if neq.any():
                    i = int(neq.idxmax())
                    print(f"  col {bad_col} first diff @{i}: "
                          f"spark={g[bad_col][i]!r} oracle={w[bad_col][i]!r}")
                else:
                    print(f"  col {bad_col}: dtype-level difference "
                          f"({g[bad_col].dtype} vs {w[bad_col].dtype})")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(g), oracle_rows=len(w),
                   err=f"value mismatch in col {bad_col}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(g), oracle_rows=len(w))
    # the committed local record is the FULL-run artifact — a subset
    # iteration must not overwrite 339 verdicts with 3 (observed while
    # testing the manifest gate); full = manifest covers every
    # registered query (pre-manifest dumps keep the old always-write)
    full_run = registered is None or len(attempted) >= registered
    if full_run:
        local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "..", "CORRECTNESS_local.json")
        with open(local_path, "w") as f:
            json.dump(verdicts, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"\nwrote {len(verdicts)} verdicts -> CORRECTNESS_local.json")
    else:
        print(f"\nsubset run ({len(attempted)}/{registered} attempted) — "
              "CORRECTNESS_local.json NOT rewritten")
    print(f"{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:3]))
