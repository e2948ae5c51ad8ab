#!/usr/bin/env python3
"""Refresh tools/bench_prior.json — the CROSS-ROUND arbitration
baseline graft.Bench loads at startup — from a committed clean bench
artifact (normally the round's quiet *_local.json capture):

    python3 tools/update_bench_prior.py BENCH_r17_local.json

The prior is a flat {query -> warm seconds} map. Bench flags any row
whose warm time lands >3x its prior value even when its two sweeps
agree (two sweeps inside one long contention window agree with each
other and would otherwise pass arbitration — the r8/r10/r16 failure
mode), re-times it, and publishes a `suspect` marker if it stays high.
Refresh the prior ONLY from a capture taken on a quiet host
(load_contended == false), or the guard inherits the contamination it
exists to catch.
"""
import json
import sys

if len(sys.argv) != 2:
    sys.exit(__doc__)
src = json.load(open(sys.argv[1]))
if src.get("load_contended"):
    sys.exit(f"refusing: {sys.argv[1]} is marked load_contended — "
             "the prior must come from a clean capture")
if src.get("n_err", 0) > 0:
    sys.exit(f"refusing: {sys.argv[1]} carries {src['n_err']} errored row(s) "
             "whose slots hold elapsed-time-to-failure — a poisoned prior "
             "would mask a real regression on those queries")
if src.get("n_suspect", 0) > 0:
    sys.exit(f"refusing: {sys.argv[1]} carries {src['n_suspect']} suspect "
             "row(s) (>3x their own prior after retiming) — adopting them "
             "would teach the guard the contamination it exists to catch")
queries = src["queries"]
if "queries_note" in src:
    sys.exit(f"refusing: {sys.argv[1]} carries a truncated top-40 map — "
             "use the full per-query line")
out = {k: queries[k] for k in sorted(queries)}
# the prior is only comparable at ITS OWN scale factor — Bench disarms
# the guard when the run's SPARK_GRAFT_SF_DIR differs from this tag
out["_sf"] = src["sf"]
dst = "tools/bench_prior.json"
with open(dst, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"wrote {dst}: {len(out) - 1} queries at sf={src['sf']} from {sys.argv[1]}")
