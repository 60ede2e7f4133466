#!/usr/bin/env python
"""Sustained per-core-delivery control (the interpretive key for the 2v8
scaling sessions).

The quiet-window probes (bench.cpu_control_reading) are ~1.5 s bursts: 8
concurrent probes reading ~solo time proves the host can deliver 8 cores
for seconds. The scaling legs demand 2 or 8 pinned cores for MINUTES —
and quiet-certified 8-core legs still vary 36% (session P pairs 0-1:
4885 vs 3579 files/s, every control at calibration). This control asks
the question directly, with no Spark anywhere: for W in (2, 4, 8), run W
worker processes, each pinned to its own core, each looping the SAME
warmed NumPy sort block for --seconds; report per-core sustained
block rates. If per-core rate at W=8 is materially below W=2, the host
throttles sustained aggregate demand even inside probe-quiet windows, and
2v8 build efficiency is ceiling-limited by the HOST, not the engine's
shuffle/partition design (the engine is then evidenced at the widths the
host sustains linearly, e.g. 1v4).

Usage: python BENCH/sustained_control.py [--seconds 120] [--widths 2,4,8]
Appends one JSON line per width to BENCH/sessions.jsonl (mode=sustained).
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SESSIONS = REPO / "BENCH" / "sessions.jsonl"

_WORKER_SRC = """
import sys, time, numpy as np
deadline = float(sys.argv[1])
# STATIONARY workload: sort a fresh copy of the SAME unsorted source every
# iteration. The first version fed each block's output back into the next
# (a = b*1.0000001 + roll(b,1)), which doubles magnitudes per iteration and
# overflows to inf/nan after ~255 blocks -- post-overflow sorts run much
# faster, so the FASTER level's median landed post-overflow and the
# "delivery ratio" measured overflow position, not host delivery. Every
# block below does identical work forever.
src = np.random.default_rng(0).standard_normal(4_000_000)
acc = 0.0
for _ in range(2):          # warmup: fault pages in, settle the allocator
    acc += float(np.sort(src)[0])
times = []
# at high widths, allocation+warmup can consume the whole window while all
# workers fault pages concurrently -- always record at least one block
while not times or time.monotonic() < deadline:
    t0 = time.monotonic()
    for _ in range(4):
        b = np.sort(src)
        acc += float(b[0]) + float(b[-1])
    times.append(time.monotonic() - t0)
print(__import__("json").dumps(times))
"""


_STREAM_WORKER_SRC = """
import sys, time, numpy as np
deadline = float(sys.argv[1])
# DRAM-bound STREAM-triad block: the sort worker's 32MB working set is
# mostly L3-resident on this host, so it reads CPU delivery, not memory
# bandwidth -- which is what Spark's shuffle/parquet/hash phases contend
# on at width 8. 64M doubles x 3 arrays = 1.5GB per worker, far past LLC.
n = 64_000_000
b = np.full(n, 1.5); c = np.full(n, 0.5); a = np.empty(n)
for _ in range(2):
    np.multiply(b, 1.0000001, out=a); a += c   # warmup faults pages in
times = []
# at high widths, allocation+warmup can consume the whole window while all
# workers fault pages concurrently -- always record at least one block
while not times or time.monotonic() < deadline:
    t0 = time.monotonic()
    for _ in range(4):
        np.multiply(b, 1.0000001, out=a)
        a += c
    times.append(time.monotonic() - t0)
print(__import__("json").dumps(times))
"""


_GATHER_WORKER_SRC = """
import sys, time, numpy as np
deadline = float(sys.argv[1])
# Random-access gather block: closest stationary proxy for Spark's
# hash-join / shuffle / dictionary traffic (DRAM latency-bound, defeats
# the prefetcher the STREAM triad rewards). 128M floats = 1GB table,
# 16M random indices per gather.
rng = np.random.default_rng(0)
table = rng.standard_normal(128_000_000).astype(np.float32)
idx = rng.integers(0, table.size, 16_000_000)
acc = 0.0
for _ in range(2):
    acc += float(table[idx[:1_000_000]].sum())   # warmup
times = []
# at high widths, allocation+warmup can consume the whole window while all
# workers fault pages concurrently -- always record at least one block
while not times or time.monotonic() < deadline:
    t0 = time.monotonic()
    for _ in range(4):
        acc += float(table[idx].sum())
    times.append(time.monotonic() - t0)
print(__import__("json").dumps(times))
"""

def run_width(width: int, seconds: float, mode: str = "sort") -> dict:
    deadline = time.monotonic() + seconds
    src = {"stream": _STREAM_WORKER_SRC,
           "gather": _GATHER_WORKER_SRC}.get(mode, _WORKER_SRC)
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(core), sys.executable, "-c", src,
             str(deadline)],
            stdout=subprocess.PIPE, text=True,
        )
        for core in range(width)
    ]
    per_core = [json.loads(p.communicate()[0]) for p in procs]
    block_meds = [round(statistics.median(t), 3) for t in per_core]
    blocks = sum(len(t) for t in per_core)
    return {
        "mode": "sustained", "width": width, "seconds": seconds,
        "blocks_total": blocks,
        "blocks_per_core_sec": round(blocks / width / seconds, 4),
        "block_med_per_core": block_meds,
        "block_med_overall": round(
            statistics.median([x for t in per_core for x in t]), 3
        ),
        "t_end": round(time.time(), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--widths", default="2,8,4,8,2")
    ap.add_argument("--label", default="S-sustained")
    ap.add_argument("--mode", default="sort",
                    choices=("sort", "stream", "gather"))
    args = ap.parse_args()
    sys.path.insert(0, str(REPO))
    from bench import cpu_control_reading

    out = {"mode": "sustained_session", "label": args.label,
           "workload": args.mode,
           "pre": cpu_control_reading(), "widths": []}
    for w in (int(x) for x in args.widths.split(",")):
        rec = run_width(w, args.seconds, mode=args.mode)
        out["widths"].append(rec)
        print(json.dumps(rec), flush=True)
        time.sleep(5)
    out["post"] = cpu_control_reading()
    with open(SESSIONS, "a") as f:
        f.write(json.dumps(out) + "\n")
    base_w = min(r["width"] for r in out["widths"])
    base = statistics.median(
        [r["block_med_overall"] for r in out["widths"] if r["width"] == base_w]
    )
    print(json.dumps({
        "summary": {
            str(r["width"]): {
                "block_med": r["block_med_overall"],
                f"per_core_delivery_vs_w{base_w}": round(
                    base / r["block_med_overall"], 3
                ),
            }
            for r in out["widths"]
        }
    }))


if __name__ == "__main__":
    main()
