#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against DuckDB executions of oracle_sql.json on the same tables.
Usage: python3 scripts/check.py <sfdir> <outdir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    # driver-style compare: sort columns by name, sort rows, compare values
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        fails += 1
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(got)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
        diff = gs.compare(ws) if gs.shape == ws.shape else None
        if diff is not None and len(diff):
            print(diff.head(5).to_string())
        fails += 1
print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} oracled queries")
sys.exit(1 if fails else 0)
