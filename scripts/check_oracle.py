#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs their DuckDB oracles.

Mimics the driver's t2 gate: run graft.Verify first (writes per-query
parquet + oracle_sql.json), then this script replays each oracle SQL in
DuckDB over the same test tables and diffs. Dev tooling only — the Scala
library has no Python dependency.

STRICTNESS: the driver's hash is type- and value-sensitive, so this gate
must be at least as strict as the driver or it predicts nothing (round 8
shipped 4 driver-red queries behind a locally-green gate that sorted
columns and stringify-coerced dtypes). Hence:
  - column NAMES must match positionally (no sorting);
  - dtypes must match after mapping arrow<->duckdb equivalents
    (datetime64 units collapse; no other coercion);
  - an oracle whose result schema contains HUGEINT fails outright — the
    SQL forgot a CAST(... AS BIGINT) around an integer sum (DuckDB
    promotes sum(BIGINT) -> HUGEINT; Spark stays BIGINT).

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


def norm_dtype(dt):
    """Collapse representation-only differences between pyarrow->pandas
    (spark parquet) and duckdb->pandas dtypes. Everything else must match
    exactly — int64 vs float64 (the nullable-int promotion) only matches
    when BOTH converters promoted, which they do iff the column really
    has nulls on both sides."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"  # ns vs us tick unit is a converter choice
    return s


oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional query filter: ONLY=q_a,q_b python3 scripts/check_oracle.py ...
# (dev iteration / re-checking a single environmentally-failed query —
# e.g. a DuckDB temp-spill disk collision — without a full multi-hour
# sf1 replay). The summary denominators shrink to the filtered set.
only = os.environ.get("ONLY")
if only:
    keep = {q.strip() for q in only.split(",")}
    oracle = {k: v for k, v in oracle.items() if k in keep}
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
        rel = con.sql(sql)
        otypes = [str(t) for t in rel.types]
        want = rel.df()
    except Exception as e:
        bad(f"oracle SQL error: {str(e)[:200]}"); continue
    huge = [c for c, t in zip(rel.columns, otypes) if "HUGEINT" in t.upper()]
    if huge:
        bad(f"oracle emits HUGEINT column(s) {huge} — wrap the sum in "
            f"CAST(... AS BIGINT)"); continue
    if list(got.columns) != list(want.columns):
        bad(f"column order/names {list(got.columns)} vs {list(want.columns)}")
        continue
    dt_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if norm_dtype(got[c].dtype) != norm_dtype(want[c].dtype)]
    if dt_bad:
        bad(f"dtype mismatch (spark vs oracle): {dt_bad}"); continue
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
    diff_cols = []
    for c in g.columns:
        gs, ws = g[c], w[c]
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
