#!/usr/bin/env python3
"""Dev-only local oracle check (mimics the driver's t2 gate).

NOT part of the engine — the engine is pure Scala/Spark. This script just
gives a fast local feedback loop: it assumes `sbt "runMain graft.Verify
<sfDir> <outDir>"` has already produced parquet results + oracle_sql.json,
then runs each oracle in DuckDB over the same tables and diffs values.

Usage: python3 scripts/selfcheck.py [sfDir] [outDir] [query ...]
"""
import json, math, sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = passes = 0
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e)[:200]}")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {str(e)[:120]}")
        fails += 1
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fails += 1
        continue
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:  # exact: engine parity is the contract
                    bad = (c, i, a, b)
                    break
            elif a != b:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}")
        fails += 1
    else:
        print(f"ok   {name} ({len(exp)} rows)")
        passes += 1
print(f"\n{passes} passed, {fails} failed")
sys.exit(1 if fails else 0)
