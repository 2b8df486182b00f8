#!/usr/bin/env python3
"""Planted-bad-probe regression test for bench_drift.py (VERDICT r12
task 2's "done" witness): a pass whose body probes read 0.30 gets one
planted 0.10 edge probe; the query bracketed by it must NOT be
re-normalized through the bad value. Run: python3 tools/test_bench_drift.py
"""
import json
import subprocess
import sys
import tempfile
import os

names = [f"q{i:02d}" for i in range(10)]
ts = {n: float(i) for i, n in enumerate(names)}
t = {n: 1.0 for n in names}
good = [[i, 0.30] for i in range(2, 10, 2)]


def run(probes):
    bench = {"passes": [{"t": t, "ts": ts, "probes": probes}]}
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(bench, f)
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "bench_drift.py"),
             path, "--query", "q00"],
            capture_output=True, text=True, check=True).stdout
    finally:
        os.unlink(path)
    # local_norm of q00 (raw 1.0s)
    for line in out.splitlines():
        if line.startswith("q00"):
            return float(line.split("local_norm=")[1].split()[0])
    raise AssertionError(f"q00 missing in output:\n{out}")


clean = run(good)
planted = run([[0, 0.10]] + good)  # bad probe at position 0, brackets q00
assert abs(clean - 1.0) < 0.05, f"clean local_norm {clean} != ~1.0"
assert abs(planted - clean) < 0.05, (
    f"planted bad probe leaked into local_norm: {planted} vs clean {clean}")
print(f"ok: clean={clean} planted={planted} — bad edge probe fenced")
