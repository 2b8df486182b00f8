#!/usr/bin/env python3
"""Bench cost-share tripwire: read a bench JSON (full per-query map,
target/bench.json by default), print the top-5 queries by share of the
total, and WARN loudly when any single query exceeds the threshold
(default 20%). Round 5's q102 grew to 63% of the bench inside a green
run — this is the check that makes that impossible to miss.

Also surfaces the bench's per-query error flags: a query that threw
during the bench has a recorded time (time-to-failure) that must not be
read as query cost.

Exit code: 0 always (a hot query is a finding, not a failure) unless
--strict is passed, then 1 when the tripwire fires OR any query errored.
"""
import argparse
import json
import sys

p = argparse.ArgumentParser()
p.add_argument("bench", nargs="?", default="target/bench.json")
p.add_argument("--threshold", type=float, default=0.20)
p.add_argument("--strict", action="store_true")
args = p.parse_args()

with open(args.bench) as f:
    d = json.load(f)
queries = d["queries"] if "queries" in d else d
total = sum(queries.values())
if total <= 0:
    print("bench_share: empty/zero bench", file=sys.stderr)
    sys.exit(0)

top = sorted(queries.items(), key=lambda kv: -kv[1])[:5]
print(f"total {total:.2f}s over {len(queries)} queries; top-5 by share:")
for name, t in top:
    print(f"  {name:32s} {t:8.2f}s  {100 * t / total:5.1f}%")

hot = [(n, t) for n, t in top if t > args.threshold * total]
for name, t in hot:
    print(
        f"WARNING: {name} takes {100 * t / total:.1f}% of the bench "
        f"(>{args.threshold:.0%} tripwire) — investigate before it hides "
        "in a green run",
        file=sys.stderr,
    )

errors = d.get("errors", []) if isinstance(d, dict) else []
for name in errors:
    print(
        f"ERROR: {name} FAILED during the bench — its recorded time is "
        "time-to-failure, not query cost",
        file=sys.stderr,
    )
sys.exit(1 if ((hot or errors) and args.strict) else 0)
