#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python tools/check_oracle.py [sfDir] [verifyOutDir]

Reads oracle_sql.json written by graft.Verify, runs each SQL in DuckDB over
views named after the parquet tables in sfDir, and compares against the
Spark-written parquet result: columns sorted by name, row order preserved,
exact value equality.
"""
import duckdb, glob, json, os, sys
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        got = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"{name:28s} NO-OUTPUT {e}")
        fails += 1
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-ERR {str(e).splitlines()[0][:120]}")
        fails += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"{name:28s} COLS got={list(got.columns)} exp={list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"{name:28s} ROWS got={len(got)} exp={len(exp)}")
        fails += 1
        continue
    # Driver-faithful dtype check: the driver's hasher normalizes int widths
    # and datetime units but NOT numeric kind, so a DuckDB HUGEINT column
    # (materialized as float64 by duckdb-python) against a Spark int64
    # parquet hash-mismatches even when values are numerically equal. Flag
    # any kind-level divergence (int vs float, numeric vs object, ...)
    # before the value compare. Fix the oracle with CAST(... AS BIGINT).
    def kind(dt):
        k = dt.kind  # i/u -> int, f -> float, M -> datetime, O -> object
        return {"u": "i"}.get(k, k)
    bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
           if kind(got[c].dtype) != kind(exp[c].dtype)]
    if bad:
        det = ", ".join(f"{c}: spark={g} oracle={e}" for c, g, e in bad)
        print(f"{name:28s} DTYPE {det}")
        fails += 1
        continue
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
        print(f"{name:28s} OK rows={len(got)}")
    except AssertionError as e:
        msg = str(e).replace("\n", " | ")[:300]
        print(f"{name:28s} VALUES {msg}")
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
