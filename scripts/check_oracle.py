#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs their DuckDB oracles.

Mimics the driver's t2 gate: run graft.Verify first (writes per-query
parquet + oracle_sql.json), then this script replays each oracle SQL in
DuckDB over the same test tables and diffs. Dev tooling only — the Scala
library has no Python dependency.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")])
    except ValueError:
        print(f"FAIL {name}: empty spark output"); fail += 1; continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}"); fail += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fail += 1; continue
    # arrays/objects aren't sortable/hashable -> compare stringified
    for c in got.columns:
        if got[c].dtype == object:
            got[c] = got[c].astype(str)
        if want[c].dtype == object:
            want[c] = want[c].astype(str)
    g = got.sort_values(by=list(got.columns), ignore_index=True)
    w = want.sort_values(by=list(want.columns), ignore_index=True)
    # normalize dtypes: compare stringified values (like a value hash would)
    diff_cols = []
    for c in g.columns:
        gs, ws = g[c], w[c]
        try:
            if gs.dtype != ws.dtype:
                gs = gs.astype(ws.dtype)
        except (TypeError, ValueError):
            pass
        eq = (gs.astype(str) == ws.astype(str))
        if not eq.all():
            diff_cols.append((c, int((~eq).sum()),
                              gs[~eq].iloc[0], ws[~eq].iloc[0]))
    if diff_cols:
        print(f"FAIL {name}: value diffs {diff_cols[:3]}"); fail += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print("RESULT:", "FAIL" if fail else "ALL OK", f"({len(oracle)-fail}/{len(oracle)})")
sys.exit(1 if fail else 0)
