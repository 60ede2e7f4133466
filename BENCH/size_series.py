#!/usr/bin/env python
"""Corpus-size series: the decomposition experiment the 2v8 pair pool can't do.

A single 2v8 pair at one corpus size cannot distinguish "the fixed
per-build overhead grows with corpus" from "the per-core parallel rate
drops at 8 cores" — both produce sub-0.8 pair efficiencies. Build time
vs corpus size at EACH core count separates them: fitting
t(W) = a + W / (c * r) per level gives that level's fixed overhead (the
intercept a) and its per-core parallel rate (from the slope)
independently. If r(8) ~= r(2), the engine's parallel region scales and
any measured pair inefficiency is overhead amortization; if r(8) < r(2)
on quiet legs, the gap is either host per-core delivery under sustained
width-8 demand (read the stationary sustained_control alongside) or an
engine-side width-dependent cost.

Runs quiet-gated taskset-pinned build-only legs at --sizes for both
--lo and --hi core counts, size-interleaved with order flipping (so
drift cannot favor a level), then appends one mode="size_series" line
to BENCH/sessions.jsonl with per-level affine fits.

Usage: python BENCH/size_series.py [--sizes 200,400,800,1600] \
          [--lo 2 --hi 8] [--label SS-1]
"""
from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np

from scaling_session import (
    append_session,
    cpu_control,
    ensure_corpus,
    multi_control,
    run_leg,
    wait_quiet_multi,
)


def fit_affine(sizes: list[float], times: list[float], cpus: int) -> dict:
    """Least-squares t = a + s*W; returns overhead a, per-core rate, R^2."""
    w = np.asarray(sizes, dtype=float)
    t = np.asarray(times, dtype=float)
    A = np.vstack([np.ones_like(w), w]).T
    (a, s), res, *_ = np.linalg.lstsq(A, t, rcond=None)
    pred = A @ np.array([a, s])
    ss_tot = float(((t - t.mean()) ** 2).sum())
    r2 = 1.0 - float(((t - pred) ** 2).sum()) / ss_tot if ss_tot else 1.0
    return {
        "overhead_sec": round(float(a), 2),
        "per_core_files_per_sec": round(1.0 / (s * cpus), 1) if s > 0 else None,
        "slope_sec_per_file": float(s),
        "r2": round(r2, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="200,400,800,1600",
                    help="comma-separated corpus sizes in thousands of files")
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--label", default="SS-1")
    args = ap.parse_args()

    sizes = [int(s) * 1000 for s in args.sizes.split(",")]
    core_of = {args.lo: f"0-{args.lo - 1}", args.hi: f"0-{args.hi - 1}"}
    corpus_of = {n: ensure_corpus(n) for n in sizes}
    calib = min(cpu_control() for _ in range(3))

    legs: list[dict] = []
    for i, n in enumerate(sizes):
        order = (args.lo, args.hi) if i % 2 == 0 else (args.hi, args.lo)
        for cpus in order:
            time.sleep(10)
            mctl_pre = wait_quiet_multi()
            ctl_pre = cpu_control()
            rec = run_leg(cpus, core_of[cpus], n, corpus_of[n])
            ctl_post = cpu_control()
            mctl_post = multi_control()
            rec.update(ctl_pre=round(ctl_pre, 3), ctl_post=round(ctl_post, 3),
                       mctl_pre=round(mctl_pre, 3), mctl_post=round(mctl_post, 3),
                       mode="size_series", label=args.label,
                       calib=round(calib, 3))
            legs.append(rec)
            print(json.dumps({k: rec[k] for k in
                              ("cpus", "n_files", "files_per_sec", "build_sec",
                               "ctl_pre", "ctl_post", "mctl_pre", "mctl_post")}),
                  flush=True)

    fits = {}
    for cpus in (args.lo, args.hi):
        pts = [(r["n_files"], r["build_sec"]) for r in legs if r["cpus"] == cpus]
        fits[str(cpus)] = fit_affine([p[0] for p in pts], [p[1] for p in pts],
                                     cpus)
    lo_r = fits[str(args.lo)]["per_core_files_per_sec"]
    hi_r = fits[str(args.hi)]["per_core_files_per_sec"]
    summary = dict(
        mode="size_series", label=args.label, lo=args.lo, hi=args.hi,
        sizes=sizes, calib=round(calib, 3), legs=legs, fits=fits,
        per_core_rate_ratio_hi_vs_lo=(
            round(hi_r / lo_r, 3) if lo_r and hi_r else None),
        all_quiet=all(max(r["ctl_pre"], r["ctl_post"]) <= 1.6 * calib
                      for r in legs),
        all_multi_quiet=all(max(r["mctl_pre"], r["mctl_post"]) <= 1.2
                            for r in legs),
    )
    append_session(summary)
    print(json.dumps({"label": args.label, "fits": fits,
                      "per_core_rate_ratio_hi_vs_lo":
                          summary["per_core_rate_ratio_hi_vs_lo"],
                      "all_quiet": summary["all_quiet"],
                      "all_multi_quiet": summary["all_multi_quiet"]},
                     indent=2), flush=True)


if __name__ == "__main__":
    main()
