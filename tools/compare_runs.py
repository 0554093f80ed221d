#!/usr/bin/env python3
"""Compare two Verify output dirs value-for-value (ALL queries, including
rows-only ones) — detects partitioning-dependent nondeterminism."""
import sys, glob, os
import duckdb

a, b = sys.argv[1], sys.argv[2]
names = sorted(os.path.basename(p) for p in glob.glob(f"{a}/q_*"))
fails = 0
for name in names:
    try:
        da = duckdb.sql(f"SELECT * FROM read_parquet('{a}/{name}/*.parquet')").df()
        db = duckdb.sql(f"SELECT * FROM read_parquet('{b}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"ERROR  {name}: {e}")
        fails += 1
        continue
    if list(da.columns) != list(db.columns):
        print(f"SCHEMA {name}")
        fails += 1
        continue
    da = da.sort_values(by=list(da.columns)).reset_index(drop=True)
    db = db.sort_values(by=list(db.columns)).reset_index(drop=True)
    if len(da) != len(db):
        print(f"ROWS   {name}: {len(da)} vs {len(db)}")
        fails += 1
        continue
    if not da.equals(db):
        diff = (da != db) & ~(da.isna() & db.isna())
        ncell = int(diff.values.sum())
        cols = [c for c in da.columns if diff[c].any()]
        print(f"VALUE  {name}: {ncell} differing cells in {cols}")
        fails += 1
    else:
        print(f"OK     {name}")
print(f"\n{len(names) - fails}/{len(names)} queries identical")
sys.exit(1 if fails else 0)
