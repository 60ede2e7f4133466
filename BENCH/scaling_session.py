#!/usr/bin/env python
"""Scaling-evidence session harness (SURVEY.md B11; BASELINE.json north_rule).

The north rule's two-cluster-size criterion (N vs 4N executors, efficiency
>= 0.8) cannot use a real cluster in this sandbox; the evidence is the same
job at two parallelism levels on the same input.  This VM has documented
~4x bimodal throttle phases flipping on the minutes timescale (see
BENCH/BASELINE.md round-3 session analysis), so two methodologies:

  seq    — sequential alternating build-only legs, each pinned via taskset,
           gated on a single-thread CPU control probe.  Clean when the VM is
           in a quiet phase (probe ~= calibration); the probe value is
           recorded per leg so the reader can audit phase-consistency.
  window — co-scheduled: BOTH levels run simultaneously on disjoint pinned
           core sets, legs looping back-to-back, so every instant of VM
           throttle applies to both sides and cancels in the ratio.
           Efficiency is computed over the common wall interval with
           partial legs pro-rated.

Both modes use SPARK_GRAFT_BENCH_BUILD_ONLY=1 + a shared pre-generated
corpus so legs measure index build only (constant, comparable load).
Raw legs append to BENCH/sessions.jsonl for cross-session aggregation.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BENCH_PY = REPO / "bench.py"
SESSIONS = REPO / "BENCH" / "sessions.jsonl"
CORPUS = os.environ.get("SPARK_GRAFT_BENCH_CORPUS_DIR", "/tmp/gar2_shared_corpus_200k")
N_FILES = int(os.environ.get("SPARK_GRAFT_SCALING_FILES", "200000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_control() -> float:
    """Warmed single-thread sort probe; identical work each call (see
    bench.py run_scaling for the round-3 rationale)."""
    import numpy as np

    a = np.random.default_rng(0).standard_normal(4_000_000)
    for _ in range(2):
        a = np.sort(a) * 1.0000001
    t0 = time.monotonic()
    for _ in range(4):
        b = np.sort(a)
        a = b * 1.0000001 + np.roll(b, 1)
    return time.monotonic() - t0


def multi_control() -> float:
    """8-way concurrent probe median (bench.cpu_control_reading): the ONLY
    control that detects this VM's aggregate-capacity throttle phases —
    round-4 controls proved single-thread probes stay at calibration while
    co-scheduled multi-core throughput drops ~4x."""
    sys.path.insert(0, str(REPO))
    from bench import cpu_control_reading

    return cpu_control_reading()["multi8_med"]


def wait_quiet_multi(threshold: float = 1.2, max_probes: int = 8,
                     sleep_sec: float = 45.0) -> float:
    """Bounded wait for a DUAL-criterion quiet window (bench.py's multi8
    AND solo thresholds — session P's pair-0 lo leg started with the solo
    control at 3.3 s because this gate originally checked only the
    multi-core family); returns the last multi reading (caller records it —
    legs run regardless after the budget, marked by their readings)."""
    sys.path.insert(0, str(REPO))
    from bench import cpu_control_reading

    for _ in range(max_probes):
        r = cpu_control_reading()
        if r["quiet"]:
            return r["multi8_med"]
        time.sleep(sleep_sec)
    return r["multi8_med"]


def corpus_dir_for(n_files: int) -> str:
    """Per-size shared corpus dir; the 200k default keeps its historical
    path so existing sessions.jsonl records stay comparable."""
    if n_files == 200_000 and os.path.isdir(CORPUS):
        return CORPUS
    return f"/tmp/gar2_shared_corpus_{n_files // 1000}k"


def ensure_corpus(n_files: int) -> str:
    """Pre-generate (once, OUTSIDE any timed leg) the deterministic corpus
    for ``n_files`` so legs measure index build only."""
    path = corpus_dir_for(n_files)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    sys.path.insert(0, str(REPO))
    from geometric_aware_retrieval_v2_spark.session import get_spark
    from geometric_aware_retrieval_v2_spark.sources.corpus import (
        corpus_to_docs,
        synth_corpus_files,
    )

    spark = get_spark(app_name=f"gen-corpus-{n_files}", master="local[16]",
                      shuffle_partitions=16)
    corpus_to_docs(
        synth_corpus_files(spark, n_files, partitions=16)
    ).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def leg_env(cpus: int, n_files: int | None = None,
            corpus: str | None = None) -> dict:
    return dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_BENCH_FILES=str(n_files or N_FILES),
        SPARK_GRAFT_BENCH_BUILD_ONLY="1",
        SPARK_GRAFT_BENCH_CORPUS_DIR=corpus or CORPUS,
    )


def run_leg(cpus: int, cores: str, n_files: int | None = None,
            corpus: str | None = None) -> dict:
    cmd = [sys.executable, str(BENCH_PY)]
    taskset = shutil.which("taskset")
    if taskset:
        cmd = [taskset, "-c", cores] + cmd
    t_start = time.time()
    out = subprocess.run(cmd, env=leg_env(cpus, n_files, corpus),
                         capture_output=True, text=True,
                         timeout=7200)
    t_end = time.time()
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec.update(t_start=round(t_start, 2), t_end=round(t_end, 2), cores=cores)
    return rec


def append_session(rec: dict) -> None:
    SESSIONS.parent.mkdir(exist_ok=True)
    with open(SESSIONS, "a") as f:
        f.write(json.dumps(rec) + "\n")


# ---------------------------------------------------------------- sequential
def run_seq(pairs: int, lo: int, hi: int, label: str,
            quiet_gate: bool = False,
            lo_files: int | None = None, hi_files: int | None = None) -> None:
    """Alternating (lo,hi) build-only legs; order flips each pair so slow VM
    drift cannot systematically favor one level. With ``quiet_gate`` every
    leg additionally waits (bounded) for the MULTI-core control to read
    quiet — the round-5 instrument for throttle phases that single-thread
    probes cannot see — and records its pre/post readings.

    ``lo_files``/``hi_files`` enable the EQUAL-EXPOSURE variant (round 5):
    with a single corpus size the lo leg runs ~(hi/lo)x longer than the hi
    leg, so minutes-scale throttle phases are integrated asymmetrically —
    session K showed this can bias pairs super-linear (long lo legs eat
    whole throttle phases that short hi legs dodge). Sizing the corpora so
    build WALL TIME matches per level (e.g. lo=100k, hi=400k at 2v8 cores)
    gives both legs the same phase exposure; efficiency stays
    tp_hi / (ratio * tp_lo) since throughput is files/sec regardless of
    corpus length (fixed per-build overhead ~5-8 s is an equal share of
    equal wall times)."""
    files_of = {lo: lo_files or N_FILES, hi: hi_files or N_FILES}
    corpus_of = {c: ensure_corpus(f) for c, f in files_of.items()}
    calib = statistics.median(cpu_control() for _ in range(5))
    legs: list[dict] = []
    core_of = {lo: f"0-{lo - 1}", hi: f"0-{hi - 1}"}
    for p in range(pairs):
        order = (lo, hi) if p % 2 == 0 else (hi, lo)
        for cpus in order:
            time.sleep(10)
            mctl_pre = (
                wait_quiet_multi() if quiet_gate else multi_control()
            )
            ctl_pre = cpu_control()
            rec = run_leg(cpus, core_of[cpus], files_of[cpus], corpus_of[cpus])
            ctl_post = cpu_control()
            mctl_post = multi_control()
            rec.update(ctl_pre=round(ctl_pre, 3), ctl_post=round(ctl_post, 3),
                       mctl_pre=round(mctl_pre, 3), mctl_post=round(mctl_post, 3),
                       pair=p, mode="seq", label=label, calib=round(calib, 3))
            legs.append(rec)
            print(json.dumps({k: rec[k] for k in
                              ("cpus", "files_per_sec", "build_sec", "ctl_pre",
                               "ctl_post", "mctl_pre", "mctl_post", "pair")}),
                  flush=True)
    ratio = hi // lo
    pair_effs = []
    for p in range(pairs):
        pls = [r for r in legs if r["pair"] == p]
        tl = next(r["files_per_sec"] for r in pls if r["cpus"] == lo)
        th = next(r["files_per_sec"] for r in pls if r["cpus"] == hi)
        pair_effs.append(round(th / (ratio * tl), 3))
    med_lo = statistics.median(r["files_per_sec"] for r in legs if r["cpus"] == lo)
    med_hi = statistics.median(r["files_per_sec"] for r in legs if r["cpus"] == hi)
    quiet = all(
        max(r["ctl_pre"], r["ctl_post"]) <= 1.6 * calib for r in legs
    )
    multi_quiet = all(
        max(r["mctl_pre"], r["mctl_post"]) <= 1.2 for r in legs
    )
    # n_files mirrors the ACTUAL hi-level corpus (not the env default) so
    # pool filters keyed on corpus size cannot mistake a --lo-files/--hi-files
    # session for a 200k one (session P was mislabeled this way)
    summary = dict(mode="seq", label=label, lo=lo, hi=hi, n_files=files_of[hi],
                   lo_files=files_of[lo], hi_files=files_of[hi],
                   calib=round(calib, 3), legs=legs, pair_effs=pair_effs,
                   pair_eff_median=round(statistics.median(pair_effs), 3),
                   eff_of_medians=round(med_hi / (ratio * med_lo), 3),
                   med_lo=med_lo, med_hi=med_hi, all_quiet=quiet,
                   all_multi_quiet=multi_quiet)
    append_session(summary)
    print(json.dumps({k: summary[k] for k in
                      ("label", "pair_effs", "pair_eff_median", "eff_of_medians",
                       "med_lo", "med_hi", "all_quiet")}), flush=True)


# ---------------------------------------------------------------- co-scheduled
def run_loop(cpus: int, cores: str, until: float, out_path: str) -> None:
    """Back-to-back build-only legs until the wall deadline; each leg appends
    one JSON line.  Back-to-back (no settle gaps) keeps the contention the
    other side sees CONSTANT — round-3 window 1 showed gaps bias lo upward."""
    while time.time() < until:
        rec = run_leg(cpus, cores)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def run_window(window_sec: int, lo: int, hi: int, label: str) -> None:
    calib = statistics.median(cpu_control() for _ in range(3))
    deadline = time.time() + window_sec
    lo_cores = f"0-{lo - 1}"
    hi_cores = f"{lo}-{lo + hi - 1}"
    tmp = REPO / "BENCH" / f".window_{label}"
    lo_file, hi_file = f"{tmp}_lo.jsonl", f"{tmp}_hi.jsonl"
    for p in (lo_file, hi_file):
        Path(p).unlink(missing_ok=True)
    procs = [
        subprocess.Popen([sys.executable, __file__, "loop", "--cpus", str(c),
                          "--cores", cr, "--until", str(deadline),
                          "--out", f])
        for c, cr, f in ((lo, lo_cores, lo_file), (hi, hi_cores, hi_file))
    ]
    for pr in procs:
        pr.wait()
    ctl_post = cpu_control()

    def load(path):
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]

    lo_legs, hi_legs = load(lo_file), load(hi_file)
    if not lo_legs or not hi_legs:
        print(json.dumps({"label": label, "error": "a side produced no legs"}))
        return
    # common wall interval; pro-rate legs that straddle its edges
    w0 = max(lo_legs[0]["t_start"], hi_legs[0]["t_start"])
    w1 = min(lo_legs[-1]["t_end"], hi_legs[-1]["t_end"])

    def weighted(legs):
        files = 0.0
        for r in legs:
            ov = max(0.0, min(r["t_end"], w1) - max(r["t_start"], w0))
            dur = r["t_end"] - r["t_start"]
            files += r["n_files"] * (ov / dur if dur > 0 else 0.0)
        return files / (w1 - w0)

    tp_lo, tp_hi = weighted(lo_legs), weighted(hi_legs)
    ratio = hi // lo
    eff = tp_hi / (ratio * tp_lo)
    summary = dict(mode="window", label=label, lo=lo, hi=hi, n_files=N_FILES,
                   window_sec=window_sec, calib=round(calib, 3),
                   ctl_post=round(ctl_post, 3),
                   common_interval_sec=round(w1 - w0, 1),
                   lo_legs=lo_legs, hi_legs=hi_legs,
                   tp_lo=round(tp_lo, 1), tp_hi=round(tp_hi, 1),
                   efficiency=round(eff, 3))
    append_session(summary)
    print(json.dumps({k: summary[k] for k in
                      ("label", "tp_lo", "tp_hi", "efficiency",
                       "common_interval_sec", "calib", "ctl_post")}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("seq")
    s.add_argument("--pairs", type=int, default=3)
    s.add_argument("--lo", type=int, default=2)
    s.add_argument("--hi", type=int, default=8)
    s.add_argument("--label", default="seq")
    s.add_argument("--quiet-gate", action="store_true",
                   help="wait (bounded) for the multi-core control before each leg")
    s.add_argument("--lo-files", type=int, default=None,
                   help="corpus size for the lo level (equal-exposure pairs)")
    s.add_argument("--hi-files", type=int, default=None,
                   help="corpus size for the hi level (equal-exposure pairs)")
    w = sub.add_parser("window")
    w.add_argument("--window", type=int, default=900)
    w.add_argument("--lo", type=int, default=2)
    w.add_argument("--hi", type=int, default=8)
    w.add_argument("--label", default="F")
    l = sub.add_parser("loop")
    l.add_argument("--cpus", type=int, required=True)
    l.add_argument("--cores", required=True)
    l.add_argument("--until", type=float, required=True)
    l.add_argument("--out", required=True)
    args = ap.parse_args()
    if args.cmd == "seq":
        run_seq(args.pairs, args.lo, args.hi, args.label,
                quiet_gate=args.quiet_gate,
                lo_files=args.lo_files, hi_files=args.hi_files)
    elif args.cmd == "window":
        run_window(args.window, args.lo, args.hi, args.label)
    else:
        run_loop(args.cpus, args.cores, args.until, args.out)
