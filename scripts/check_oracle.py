#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs their DuckDB oracles.

Mimics the driver's t2 gate: run graft.Verify first (writes per-query
parquet + oracle_sql.json), then this script replays each oracle SQL in
DuckDB over the same test tables and diffs. Dev tooling only — the Scala
library has no Python dependency.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

With a third argument, also writes a machine-readable summary (the
repo-committed CORRECTNESS_sf1.json standing-gate artifact).
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
results = {}
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    def bad(msg):
        global fail
        print(f"FAIL {name}: {msg}"); fail += 1
        results[name] = {"ok": False, "why": msg}
    if not os.path.isdir(spark_dir):
        bad("no spark output dir"); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_dir}/*.parquet")])
    except ValueError:
        bad("empty spark output"); continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        bad(f"oracle SQL error: {str(e)[:200]}"); continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        bad(f"columns {list(got.columns)} vs {list(want.columns)}"); continue
    if len(got) != len(want):
        bad(f"rows {len(got)} vs {len(want)}"); continue
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
        bad(f"value diffs {[(c, n, str(a)[:60], str(b)[:60]) for c, n, a, b in diff_cols[:3]]}")
    else:
        print(f"OK   {name}: {len(got)} rows")
        results[name] = {"ok": True, "rows": int(len(got))}
print("RESULT:", "FAIL" if fail else "ALL OK", f"({len(oracle)-fail}/{len(oracle)})")
if len(sys.argv) > 3:
    json.dump({"sf_dir": sfdir, "n_queries": len(oracle),
               "n_pass": len(oracle) - fail, "n_fail": fail,
               "queries": results}, open(sys.argv[3], "w"), indent=1)
sys.exit(1 if fail else 0)
