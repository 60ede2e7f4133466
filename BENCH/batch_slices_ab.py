#!/usr/bin/env python
"""Round-6 session-2 A/B: 20-query batch over a 500k-doc index.

Plans compared in ONE warm session, alternating legs (guide §1 + this
host's phase noise):
  A  current routing (grouped exchange + applyInPandas + coordinator merge)
  B  single-stage mapInArrow, one job (parallelism = n_shards)
  C  sliced single-stage: qids split into N volume-balanced slices, each an
     independent shuffle-free job, submitted concurrently (guide §2.6) —
     parallelism = N x n_shards, no exchange, no per-query broadcast.

Usage: python BENCH/batch_slices_ab.py [n_files] [n_legs]
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(n_files: int, n_legs: int) -> None:
    from geometric_aware_retrieval_v2_spark.code_queryset import CODE_QUERY_SET
    from geometric_aware_retrieval_v2_spark.localrel import local_queries_df
    from geometric_aware_retrieval_v2_spark.operators import index as ix
    from geometric_aware_retrieval_v2_spark.operators.index import (
        IndexHandle,
        bm25_topk_indexed,
        build_index,
    )
    from geometric_aware_retrieval_v2_spark.session import get_spark
    from geometric_aware_retrieval_v2_spark.sources.corpus import (
        corpus_to_docs,
        synth_corpus_files,
    )

    spark = get_spark(app_name="batch-slices-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    corpus_dir = tempfile.mkdtemp(prefix="gar2_bs_c_")
    corpus_to_docs(
        synth_corpus_files(spark, n_files, partitions=max(CPUS, 8))
    ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir).select("doc_id", "content")
    idx_dir = tempfile.mkdtemp(prefix="gar2_bs_i_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.monotonic()
    build_index(spark, corpus, idx_dir, n_partitions=2, n_shards=8,
                block_size=128, tokenizer_mode="code")
    print(f"build {time.monotonic()-t0:.1f}s", file=sys.stderr)
    handle = IndexHandle(spark, idx_dir).cache()

    qall = local_queries_df(spark, list(CODE_QUERY_SET))
    trip = ix._interactive_trip(handle, qall)
    assert trip is not ix._BULK and trip
    total_df = sum(t[2] for t in trip)
    print(f"sum(df) = {total_df}", file=sys.stderr)

    k, k1, b = 10, 1.2, 0.75
    keep_n = k + 32

    def leg_A() -> float:
        t = time.monotonic()
        bm25_topk_indexed(spark, handle, qall, k=k, method="wand").collect()
        return time.monotonic() - t

    def leg_B() -> float:
        t = time.monotonic()
        partial = ix._interactive_partials(handle, trip, keep_n, k1, b, True)
        ix._driver_finish_topk(handle, partial, k)
        return time.monotonic() - t

    def _slices(n_slices: int) -> list[list]:
        per_qid: dict[int, list] = {}
        for tup in trip:
            per_qid.setdefault(tup[0], []).append(tup)
        loads = sorted(
            ((sum(t[2] for t in v), q) for q, v in per_qid.items()),
            reverse=True,
        )
        bins: list[tuple[int, list]] = [(0, []) for _ in range(n_slices)]
        for load, q in loads:
            i = min(range(n_slices), key=lambda j: bins[j][0])
            bins[i] = (bins[i][0] + load, bins[i][1] + per_qid[q])
        return [b_ for _, b_ in bins if b_]

    def leg_C(n_slices: int) -> float:
        t = time.monotonic()
        sls = _slices(n_slices)

        def run(sl):
            partial = ix._interactive_partials(handle, sl, keep_n, k1, b, True)
            return partial.collect()

        with ThreadPoolExecutor(max_workers=len(sls)) as ex:
            rows = [r for rs in ex.map(run, sls) for r in rs]
        # driver merge (same shape as _driver_finish_topk, timed inline)
        by_qid: dict[int, list] = {}
        for r in rows:
            by_qid.setdefault(r.qid, []).append((r.score, r.ord))
        for qid, lst in by_qid.items():
            sorted(lst, key=lambda x: (-x[0], x[1]))[:k]
        return time.monotonic() - t

    # warm every plan once
    leg_A(); leg_B(); leg_C(3); leg_C(4); leg_C(5)

    res: dict[str, list[float]] = {"A": [], "B": [], "C3": [], "C4": [], "C5": []}
    for _ in range(n_legs):
        res["A"].append(leg_A())
        res["B"].append(leg_B())
        res["C3"].append(leg_C(3))
        res["C4"].append(leg_C(4))
        res["C5"].append(leg_C(5))
    print(json.dumps({
        "n_files": n_files, "sum_df": total_df,
        "legs": {k_: [round(v, 3) for v in vs] for k_, vs in res.items()},
        "median": {k_: round(statistics.median(vs), 3) for k_, vs in res.items()},
    }, indent=1))
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 5)
