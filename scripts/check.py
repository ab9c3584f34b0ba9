#!/usr/bin/env python3
"""Local dev mimic of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]
Runs DuckDB on each oracle_sql.json entry over the sfDir tables, loads the
Spark result parquet written by graft.Verify, and compares schema + sorted
rows. (Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, json, glob, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # driver sorts columns by name
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1; continue
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        bad = None
        for c in exp.columns:
            ev, gv = es[c].tolist(), gs[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                af = isinstance(a, float); bf = isinstance(b, float)
                if af and bf and math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} spark={b!r}")
            fails += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
