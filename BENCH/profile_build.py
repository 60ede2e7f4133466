#!/usr/bin/env python
"""Phase-level build profiler (companion to BENCH/profile_query.py).

Times each manifest-committed stage of ``build_index`` by intercepting the
commit calls, so the fixed-vs-parallel split behind the scaling analysis in
BENCH/BASELINE.md is reproducible in one command:

    taskset -c 0-7 python BENCH/profile_build.py --cpus 8 \
        --corpus /tmp/gar2_shared_corpus_200k

Session N (the first all-quiet scaling session) measured the total fixed
per-build overhead at ~32 s; the per-stage commit timeline this prints is
how that number is attributed (docmap + merge barrier stages, manifest
round-trips, job-submission gaps, per-partition job imbalance tails).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--corpus", default="/tmp/gar2_shared_corpus_200k")
    ap.add_argument("--n-partitions", type=int, default=2)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--tokenizer", default="code")
    args = ap.parse_args()

    from geometric_aware_retrieval_v2_spark.operators import index as I
    from geometric_aware_retrieval_v2_spark.plans import manifest as mf
    from geometric_aware_retrieval_v2_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-build-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    corpus = spark.read.parquet(args.corpus).select("doc_id", "content")
    idx = tempfile.mkdtemp(prefix="gar2_profile_build_")
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.monotonic()
    marks: list[tuple[str, int, float]] = []
    orig = mf.append_manifest

    def timed(spark, index_dir, rows):
        marks.append((rows[0][1], rows[0][2], round(time.monotonic() - t0, 2)))
        return orig(spark, index_dir, rows)

    mf.append_manifest = timed
    I.mf.append_manifest = timed
    try:
        I.build_index(
            spark, corpus, idx,
            n_partitions=args.n_partitions, n_shards=args.n_shards,
            block_size=128, tokenizer_mode=args.tokenizer,
        )
        total = time.monotonic() - t0
    finally:
        mf.append_manifest = orig
        I.mf.append_manifest = orig

    walls = {
        (r.stage, r.partition_id): r.wall_ms / 1000.0
        for r in spark.read.parquet(f"{idx}/manifest")
        .select("stage", "partition_id", "wall_ms")
        .collect()
    }
    print(json.dumps({
        "cpus": args.cpus,
        "corpus": args.corpus,
        "build_sec": round(total, 2),
        "commit_timeline": [
            {"stage": s, "part": p, "t_commit": t,
             "wall_sec": walls.get((s, p))}
            for s, p, t in marks
        ],
    }))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
