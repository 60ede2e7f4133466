#!/usr/bin/env python
"""Bandwidth-bracketed 2v8 build pairs.

The burst CPU probes gate compute weather but are blind to MEMORY-
BANDWIDTH co-tenants: paired gather/stream controls (GATHER-1, STREAM-2/3)
show w8 per-core delivery swinging 0.66-0.98 on the minutes timescale
while w2 stays flat — pressure lands almost entirely on the wider level.
This instrument brackets every build leg with a stream delivery pair
(w2 + w8 blocks) so each 2v8 build efficiency can be read against the
DRAM weather it actually ran under.

Usage: python BENCH/bw_bracketed_pairs.py [--pairs 3] [--files 800000]
Appends one mode="bw_bracketed" line to BENCH/sessions.jsonl.
"""
from __future__ import annotations

import argparse
import json
import statistics
import time

from scaling_session import append_session, ensure_corpus, run_leg
from sustained_control import run_width


def stream_pair(seconds: float = 30.0) -> dict:
    lo = run_width(2, seconds, mode="stream")
    hi = run_width(8, seconds, mode="stream")
    return {
        "w2_block": lo["block_med_overall"],
        "w8_block": hi["block_med_overall"],
        "delivery_w8_vs_w2": round(
            lo["block_med_overall"] / hi["block_med_overall"], 3
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--files", type=int, default=800_000)
    ap.add_argument("--label", default="BW-1")
    args = ap.parse_args()
    corpus = ensure_corpus(args.files)

    legs: list[dict] = []
    brackets: list[dict] = [stream_pair()]
    print(json.dumps({"bracket": brackets[-1]}), flush=True)
    for p in range(args.pairs):
        order = ((2, "0-1"), (8, "0-7")) if p % 2 == 0 else ((8, "0-7"), (2, "0-1"))
        for cpus, cores in order:
            time.sleep(5)
            rec = run_leg(cpus, cores, args.files, corpus)
            rec.update(pair=p, label=args.label)
            legs.append(rec)
            print(json.dumps({k: rec[k] for k in
                              ("cpus", "files_per_sec", "build_sec")} | {"pair": p}),
                  flush=True)
            brackets.append(stream_pair())
            print(json.dumps({"bracket": brackets[-1]}), flush=True)

    pair_rows = []
    for p in range(args.pairs):
        pls = [r for r in legs if r["pair"] == p]
        tl = next(r["files_per_sec"] for r in pls if r["cpus"] == 2)
        th = next(r["files_per_sec"] for r in pls if r["cpus"] == 8)
        # brackets surrounding this pair: indices 2p, 2p+1, 2p+2
        bs = brackets[2 * p: 2 * p + 3]
        pair_rows.append({
            "pair": p, "eff": round(th / (4 * tl), 3),
            "lo_files_per_sec": tl, "hi_files_per_sec": th,
            "delivery_readings": [b["delivery_w8_vs_w2"] for b in bs],
            "delivery_med": round(statistics.median(
                b["delivery_w8_vs_w2"] for b in bs), 3),
        })
        print(json.dumps(pair_rows[-1]), flush=True)

    summary = dict(mode="bw_bracketed", label=args.label, n_files=args.files,
                   lo=2, hi=8, legs=legs, brackets=brackets, pairs=pair_rows)
    append_session(summary)


if __name__ == "__main__":
    main()
