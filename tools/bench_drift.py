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
min over passes of (time * median_calib / local_calib) — the reading
re-expressed at the run's MEDIAN host speed (not the best/min: a
single anomalously fast probe must not rescale every ratio).

Both calib uses are outlier-guarded (VERDICT r12 what's-wrong #2):
the reference speed is the median across all probes, and each pass's
probes are Tukey-fenced (outside Q1-1.5*IQR..Q3+1.5*IQR dropped)
BEFORE interpolating, with the interpolated value further clamped to
[0.5x, 2x] of the pass median as a backstop — one bad probe in the
denominator otherwise mints fake outliers (q326 read 7.84s local_norm
purely off the run-edge probes at positions 0/351, which measure the
cold JVM at 0.10-0.20 vs the pass's 0.27-0.43 body, while its raw
readings were ordinary).

Usage: bench_drift.py [bench.json] [--top N | --query NAME ...]
"""
import argparse
import json

p = argparse.ArgumentParser()
p.add_argument("bench", nargs="?", default="target/bench.json")
p.add_argument("--top", type=int, default=15)
p.add_argument("--query", action="append", default=[])
p.add_argument("--xround", help="previous round's bench.json: print "
               "calib_med-ratio cross-round normalized totals over the "
               "shared query set (r14 verdict task 5)")
args = p.parse_args()

with open(args.bench) as f:
    d = json.load(f)

if args.xround:
    with open(args.xround) as f:
        prev = json.load(f)
    shared = sorted(set(d["queries"]) & set(prev["queries"]))
    cur_t = sum(d["queries"][q] for q in shared)
    prev_t = sum(prev["queries"][q] for q in shared)
    cm, pm = d.get("calib_med"), prev.get("calib_med")
    print(f"shared queries: {len(shared)}  raw: {cur_t:.1f}s vs "
          f"{prev_t:.1f}s = x{cur_t / prev_t:.3f}")
    if cm and pm:
        # identical probe work each round: re-express this run at the
        # previous round's host speed before calling anything a regression
        xn = cur_t * pm / cm
        print(f"calib_med: {cm:.3f} vs {pm:.3f} (host x{cm / pm:.3f}); "
              f"host-normalized: {xn:.1f}s = x{xn / prev_t:.3f}")
    raise SystemExit(0)
passes = d.get("passes")
if not passes:
    raise SystemExit("no `passes` field — run a Bench built after r12")
# median across all probes: a single anomalously fast probe must not
# rescale every local_norm (observed 0.103 among thirty 0.23-0.41)
allp = sorted(c for ps in passes for _, c in ps["probes"])
median_calib = allp[len(allp) // 2]


def pass_median(ps):
    cs = sorted(c for _, c in ps["probes"])
    return cs[len(cs) // 2]


def fenced_probes(ps):
    # Tukey fence on the pass's probe VALUES: the run-edge probes
    # (positions 0 and n) systematically read the cold/torn-down JVM
    # 1.5-3x faster than the body and would drag every nearby query's
    # local calib with them. Keep all probes if the fence leaves < 2.
    probes = sorted(ps["probes"])
    vals = sorted(c for _, c in probes)
    q1 = vals[len(vals) // 4]
    q3 = vals[(3 * len(vals)) // 4]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    kept = [p for p in probes if lo <= p[1] <= hi]
    return kept if len(kept) >= 2 else probes


def local_calib(ps, name):
    # position of the query within the pass = rank of its start offset
    order = sorted(ps["ts"], key=lambda k: ps["ts"][k])
    idx = order.index(name)
    probes = fenced_probes(ps)
    lo = max((p for p in probes if p[0] <= idx), default=probes[0])
    hi = min((p for p in probes if p[0] >= idx), default=probes[-1])
    if hi[0] == lo[0]:
        raw = lo[1]
    else:
        w = (idx - lo[0]) / (hi[0] - lo[0])
        raw = lo[1] + w * (hi[1] - lo[1])
    # clamp: a single anomalous neighboring probe must not rescale the
    # queries nearest it (the denominator-side twin of the median guard)
    med = pass_median(ps)
    return max(0.5 * med, min(2.0 * med, raw))


rows = []
for name in passes[0]["t"]:
    per = [(ps["t"][name], local_calib(ps, name)) for ps in passes]
    raw_min = min(t for t, _ in per)
    norm_min = min(t * median_calib / c for t, c in per)
    rows.append((name, raw_min, norm_min, per))

sel = [r for r in rows if r[0] in args.query] if args.query else \
    sorted(rows, key=lambda r: -r[1])[:args.top]
print(f"median calib {median_calib:.3f}s; per-pass (time@calib):")
for name, raw_min, norm_min, per in sel:
    detail = "  ".join(f"{t:7.2f}s@{c:.3f}" for t, c in per)
    print(f"{name:34s} min={raw_min:7.2f}  local_norm={norm_min:7.2f}  {detail}")
