#!/usr/bin/env python3
"""Local dev mimic of the driver's correctness gate — representation-strict.

Usage: python3 scripts/check.py [sfDir] [outDir]

Mimics the driver faithfully: the ORACLE side goes through duckdb
`fetchdf()` (which coerces DECIMAL -> float64 and DATE -> datetime64), the
SPARK side through `pandas.read_parquet` (which keeps Decimal / date
objects). Cells are compared by canonical repr, not numeric tolerance —
so a DECIMAL(38,6) column that is numerically equal to the oracle still
FAILS here, exactly like the driver's bit-hash. Moral: output schemas may
only contain BIGINT/INT, DOUBLE, VARCHAR, BOOLEAN.
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, json, glob, math, datetime, decimal
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

BANNED = (decimal.Decimal, datetime.date, datetime.datetime, datetime.time)

def canon(v):
    """Canonical cell repr; floats by exact bits (repr). None and NaN each
    normalize to their own fixed token (NOT unified): SQL NULL in float
    columns surfaces as NaN on both sides (fetchdf / read_parquet), so the
    distinct tokens still compare equal across engines."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, BANNED):
        return f"BANNED<{type(v).__name__}>:{v!r}"
    return repr(v)

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
items = sorted(oracle.items())
if only:
    items = [(n, s) for n, s in items if n in only]
for name, sql in items:
    try:
        exp = con.execute(sql).fetchdf()
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = pd.read_parquet(files)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1; continue
        # canonicalize first, then sort rows by the canonical strings —
        # representation differences can't hide behind sort coercion
        ec = exp.apply(lambda s: s.map(canon))
        gc = got.apply(lambda s: s.map(canon))
        es = ec.sort_values(by=list(ec.columns)).reset_index(drop=True)
        gs = gc.sort_values(by=list(gc.columns)).reset_index(drop=True)
        bad = None
        for c in es.columns:
            ev, gv = es[c].tolist(), gs[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a != b:
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={a} spark={b}")
            fails += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1
print(f"\n{len(items)-fails}/{len(items)} passed")
sys.exit(1 if fails else 0)
