#!/usr/bin/env python3
"""Per-query drift adjudicator (VERDICT r11 task 1's consumer): read a
bench JSON carrying the `passes` field (per-pass per-query times, START
offsets, and interleaved calibration probes as [queries_completed,
calib_s] pairs) and, for each query, estimate the HOST SPEED in effect
when it ran — the probe nearest its position in the pass — so a slow
reading can be attributed to host load vs plan change after the fact.

For each query prints: min-across-passes time, each pass's time, and
each pass's local calib (linear interpolation between the bracketing
probes by queries-completed index). The `local_norm` column is the
min over passes of (time * best_calib / local_calib) — the reading
re-expressed at the run's best host speed.

Usage: bench_drift.py [bench.json] [--top N | --query NAME ...]
"""
import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("bench", nargs="?", default="target/bench.json")
p.add_argument("--top", type=int, default=15)
p.add_argument("--query", action="append", default=[])
args = p.parse_args()

with open(args.bench) as f:
    d = json.load(f)
passes = d.get("passes")
if not passes:
    raise SystemExit("no `passes` field — run a Bench built after r12")
# median across all probes: a single anomalously fast probe must not
# rescale every local_norm (observed 0.103 among thirty 0.23-0.41)
allp = sorted(c for ps in passes for _, c in ps["probes"])
best = allp[len(allp) // 2]

def local_calib(ps, name):
    # position of the query within the pass = rank of its start offset
    order = sorted(ps["ts"], key=lambda k: ps["ts"][k])
    idx = order.index(name)
    probes = sorted(ps["probes"])
    lo = max((p for p in probes if p[0] <= idx), default=probes[0])
    hi = min((p for p in probes if p[0] >= idx), default=probes[-1])
    if hi[0] == lo[0]:
        return lo[1]
    w = (idx - lo[0]) / (hi[0] - lo[0])
    return lo[1] + w * (hi[1] - lo[1])

rows = []
for name in passes[0]["t"]:
    per = [(ps["t"][name], local_calib(ps, name)) for ps in passes]
    raw_min = min(t for t, _ in per)
    norm_min = min(t * best / c for t, c in per)
    rows.append((name, raw_min, norm_min, per))

sel = [r for r in rows if r[0] in args.query] if args.query else \
    sorted(rows, key=lambda r: -r[1])[:args.top]
print(f"median calib {best:.3f}s; per-pass (time@calib):")
for name, raw_min, norm_min, per in sel:
    detail = "  ".join(f"{t:7.2f}s@{c:.3f}" for t, c in per)
    print(f"{name:34s} min={raw_min:7.2f}  local_norm={norm_min:7.2f}  {detail}")
