#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: compare Verify parquet
dumps against DuckDB oracle SQL (value-level, column-name-sorted)."""
import sys, json, glob, math
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name} (no spark output)")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails += 1
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"SCHEMA   {name}: spark={list(g.columns)} oracle={list(w.columns)}")
        fails += 1
        continue
    if len(g) != len(w):
        print(f"ROWS     {name}: spark={len(g)} oracle={len(w)}")
        fails += 1
        continue
    # order-insensitive compare: sort by all columns
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    w = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    ok = True
    for c in g.columns:
        for i, (a, b) in enumerate(zip(g[c], w[c])):
            if isinstance(a, float) or isinstance(b, float):
                af, bf = float(a), float(b)
                if math.isnan(af) and math.isnan(bf):
                    continue
                if af != bf:
                    print(f"VALUE    {name}.{c}[{i}]: spark={a!r} oracle={b!r}")
                    ok = False
                    break
            elif a != b:
                print(f"VALUE    {name}.{c}[{i}]: spark={a!r} oracle={b!r}")
                ok = False
                break
        if not ok:
            break
    if ok:
        print(f"OK       {name} ({len(g)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
