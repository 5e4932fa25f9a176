#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running the declared oracle SQL on the same tables.

Usage: python3 tools/check.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json, math, sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        bad += 1
        continue
    ecols, gcols = sorted(exp.columns), sorted(got.columns)
    if ecols != gcols:
        print(f"FAIL {name}: columns {gcols} != {ecols}")
        bad += 1
        continue
    exp, got = exp[ecols], got[ecols]
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        bad += 1
        continue
    exp = exp.sort_values(ecols).reset_index(drop=True)
    got = got.sort_values(ecols).reset_index(drop=True)
    mismatch = None
    for c in ecols:
        for i, (a, b) in enumerate(zip(exp[c], got[c])):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                if a is None or b is None or (math.isnan(a) and math.isnan(b)):
                    if (a is None) != (b is None):
                        mismatch = (c, i, a, b)
                        break
                    continue
                if a != b:  # exact: our design goal is bit-identical values
                    mismatch = (c, i, a, b)
                    break
            elif str(a) != str(b):
                mismatch = (c, i, a, b)
                break
        if mismatch:
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: col {c} row {i}: oracle={a!r} got={b!r}")
        bad += 1
    else:
        print(f"ok   {name} ({len(exp)} rows)")
        ok += 1
print(f"\n{ok} ok, {bad} fail")
sys.exit(1 if bad else 0)
