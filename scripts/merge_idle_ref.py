#!/usr/bin/env python3
"""Merge N full-surface idle bench JSONs into the committed per-query idle
reference (BENCH_IDLE_REF.tsv): element-wise MIN across runs — the
measurement procedure the r11 host note established (per-run minima spread
across runs under a noisy hypervisor; the element-wise min is the stable
idle estimate). Usage:
  python3 scripts/merge_idle_ref.py BENCH_IDLE_a.json BENCH_IDLE_b.json ...
Writes BENCH_IDLE_REF.tsv (with the #sf header taken from the first run;
all runs must share it) and prints the merged total.
"""
import json, sys, os

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "pass at least one bench json"
for p, r in zip(sys.argv[1:], runs):
    assert r.get("sf"), f"{p}: missing 'sf' key — refusing to write an empty #sf header"
sfs = {os.path.basename(r["sf"]) for r in runs}
assert len(sfs) == 1, f"mixed SFs: {sfs}"
sf = sfs.pop()
if len(runs) < 3:
    print(f"WARNING: only {len(runs)} run(s) — the committed reference "
          f"procedure is min over >= 3 separate JVM invocations",
          file=sys.stderr)
keys = set()
for r in runs:
    keys |= set(r["queries"].keys())
merged = {}
partial = []
for k in sorted(keys):
    vals = [r["queries"][k] for r in runs if k in r["queries"]
            and r["queries"][k] >= 0]
    assert vals, f"{k} failed in every run"
    if len(vals) < len(runs):
        partial.append((k, len(vals)))
    merged[k] = min(vals)
for k, n in partial:
    print(f"WARNING: {k} covered by only {n}/{len(runs)} runs — its 'min' "
          f"is a {n}-sample estimate", file=sys.stderr)
with open("BENCH_IDLE_REF.tsv", "w") as f:
    f.write(f"#sf\t{sf}\n")
    for k, v in merged.items():
        f.write(f"{k}\t{v:.3f}\n")
total = sum(merged.values())
print(f"merged {len(runs)} runs, {len(merged)} queries, "
      f"total {total:.1f}s = {total/len(merged):.3f} s/query at {sf}")
