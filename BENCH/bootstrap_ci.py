#!/usr/bin/env python
"""Bootstrap CIs on the pooled sequential scaling-pair pool (B11 evidence).

Reads BENCH/sessions.jsonl, pools every seq-mode constant-corpus session
at the requested parallelism pair (default 2v8 at 200k files), and
reports per-pair efficiencies plus per-leg throughputs:

  * pair-median 95%/90% bootstrap CI (resample pairs with replacement),
  * pooled-level-medians efficiency (median hi / (ratio x median lo))
    and its bootstrap CI (resample legs per level independently),
  * P(pair median >= 0.8) under the bootstrap distribution.

Deterministic (seeded) so the reported numbers are reproducible:
    python BENCH/bootstrap_ci.py [--seed 20260817] [--n 100000]
    python BENCH/bootstrap_ci.py --lo 1 --hi 4 --files 400000 \
        --include-all-quiet     # the 1v4 below-the-bandwidth-wall pool
"""
from __future__ import annotations

import argparse
import json
import statistics
from pathlib import Path

import numpy as np

SESSIONS = Path(__file__).resolve().parent / "sessions.jsonl"


def load_pool(
    lo_cpus: int = 2, hi_cpus: int = 8, files: int = 200_000,
    include_all_quiet: bool = False,
) -> tuple[list[float], list[float], list[float], list[str]]:
    pair_effs: list[float] = []
    lo_legs: list[float] = []
    hi_legs: list[float] = []
    labels: list[str] = []
    with open(SESSIONS) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            if rec.get("mode") != "seq" or \
                    (rec.get("lo"), rec.get("hi")) != (lo_cpus, hi_cpus):
                continue
            # sessions whose legs failed the solo-control gate measure the
            # co-tenant, not the engine — excluded from pairs AND legs
            # (e.g. V14-400k-HEAD4, whose one finished pair read a spurious
            # superlinear 1.162 off a throttled lo leg)
            if rec.get("control_invalid"):
                continue
            # pool ONLY constant-corpus pairs at the requested size: key on
            # lo_files/hi_files (the per-level truth), not n_files —
            # sessions launched with --lo-files/--hi-files used to record
            # n_files from the env default (session P: 1.6M legs labeled
            # n_files=200000). Equal-exposure sessions
            # (lo_files != hi_files) are a different instrument — reported
            # separately, not pooled.
            lo_f = rec.get("lo_files", rec.get("n_files"))
            hi_f = rec.get("hi_files", rec.get("n_files"))
            if lo_f != files or hi_f != files:
                continue
            # all-quiet sessions are a different REGIME for the default
            # 2v8/200k pool: session N showed throttle stretches the
            # parallel region but not the fixed per-build overhead, so
            # throttled constant-corpus pairs read the amortized
            # (larger-corpus-equivalent) efficiency while quiet pairs read
            # the true 200k one (~0.49, overhead-bound). Mixing them would
            # average two different quantities; quiet sessions are the
            # headline evidence in BASELINE.md instead. For other pools
            # (e.g. 1v4) pass --include-all-quiet to pool every session.
            if not include_all_quiet and \
                    rec.get("all_quiet") and rec.get("all_multi_quiet"):
                continue
            pair_effs.extend(rec["pair_effs"])
            labels.append(rec.get("label", "?"))
            for leg in rec.get("legs", []):
                (lo_legs if leg["cpus"] == lo_cpus else hi_legs).append(
                    leg["files_per_sec"]
                )
    return pair_effs, lo_legs, hi_legs, labels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=20260817)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--lo", type=int, default=2, help="lo-level core count")
    ap.add_argument("--hi", type=int, default=8, help="hi-level core count")
    ap.add_argument("--files", type=int, default=200_000,
                    help="constant corpus size (lo_files == hi_files)")
    ap.add_argument("--include-all-quiet", action="store_true",
                    help="pool all-quiet sessions too (non-2v8 pools)")
    args = ap.parse_args()

    pair_effs, lo_legs, hi_legs, labels = load_pool(
        args.lo, args.hi, args.files, args.include_all_quiet
    )
    if not pair_effs:
        raise SystemExit(f"no pooled pairs for {args.lo}v{args.hi} "
                         f"at {args.files} files")
    ratio = args.hi / args.lo
    rng = np.random.default_rng(args.seed)
    pe = np.array(pair_effs)
    lo = np.array(lo_legs)
    hi = np.array(hi_legs)

    med_boot = np.median(
        pe[rng.integers(0, len(pe), size=(args.n, len(pe)))], axis=1
    )
    pooled_boot = np.median(
        hi[rng.integers(0, len(hi), size=(args.n, len(hi)))], axis=1
    ) / (ratio * np.median(
        lo[rng.integers(0, len(lo), size=(args.n, len(lo)))], axis=1
    ))

    def ci(a: np.ndarray, lvl: float) -> list[float]:
        q = (1 - lvl) / 2
        return [round(float(np.quantile(a, q)), 3),
                round(float(np.quantile(a, 1 - q)), 3)]

    out = {
        "pool": f"{args.lo}v{args.hi}@{args.files}",
        "sessions": labels,
        "n_pairs": len(pair_effs),
        "pair_effs_sorted": sorted(round(x, 3) for x in pair_effs),
        "pair_median": round(statistics.median(pair_effs), 3),
        "pair_mean": round(statistics.mean(pair_effs), 3),
        "pair_median_ci95": ci(med_boot, 0.95),
        "pair_median_ci90": ci(med_boot, 0.90),
        "p_pair_median_ge_0.8": round(float((med_boot >= 0.8).mean()), 3),
        "pooled_medians_eff": round(
            statistics.median(hi_legs)
            / (ratio * statistics.median(lo_legs)), 3
        ),
        "pooled_medians_ci95": ci(pooled_boot, 0.95),
        "pooled_medians_ci90": ci(pooled_boot, 0.90),
        "p_pooled_ge_0.8": round(float((pooled_boot >= 0.8).mean()), 3),
        "med_lo": round(statistics.median(lo_legs), 1),
        "med_hi": round(statistics.median(hi_legs), 1),
        "seed": args.seed,
        "n_resamples": args.n,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
