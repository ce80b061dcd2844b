#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name + rows, and diff values."""
import json, sys, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fail += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM parquet_scan('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark result unreadable {e}")
        fail += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
        fail += 1
        continue
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = None
    for c in want.columns:
        a, b = ws[c], gs[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            bad = [(x, y) for x, y in zip(a, b)
                   if not (x == y or (isinstance(x, float) and isinstance(y, float)
                                      and math.isnan(x) and math.isnan(y)))]
        else:
            bad = [(x, y) for x, y in zip(a.astype(str), b.astype(str)) if x != y]
        if bad:
            mismatch = (c, bad[:3])
            break
    if mismatch:
        print(f"FAIL {name}: col {mismatch[0]} diffs e.g. {mismatch[1]}")
        fail += 1
    else:
        print(f"ok   {name} ({len(got)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
