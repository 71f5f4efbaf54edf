#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables. Usage:
  python3 scripts/check.py [sfdir] [outdir] [query ...]
(driver-side tooling only — not part of the shipped library)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fail += 1
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fail += 1
        continue
    try:
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype != e.dtype:
                g = g.astype("object")
                e = e.astype("object")
            if not g.equals(e):
                diff = (g != e)
                i = diff[diff].index[0]
                raise AssertionError(
                    f"col {c} first diff at row {i}: {g[i]!r} vs {e[i]!r}")
        print(f"ok   {name} ({len(got)} rows)")
        ok += 1
    except AssertionError as e:
        print(f"FAIL {name}: {e}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
