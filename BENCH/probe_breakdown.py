#!/usr/bin/env python
"""Round-6 session-2 measurement: decompose warm interactive WAND query
latency into driver-side phases (guide §1 — measure before changing).

Phases per query, timed separately over a warm cached handle:
  qdf      local_queries_df construction (spark.sql VALUES parse+bind)
  trip     _interactive_trip probe (Catalyst tokenize fold + collect, warm
           df cache so no dictionary job)
  partials _interactive_partials plan build + .collect() (the one real job)
  finish   _driver_finish_topk given pre-collected partial rows is inside
           the partials collect here; measured as full-call minus phases
  full     end-to-end bm25_topk_indexed incl. everything

Usage: python BENCH/probe_breakdown.py [n_files]
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(n_files: int) -> None:
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

    spark = get_spark(app_name="probe-breakdown", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    corpus_dir = tempfile.mkdtemp(prefix="gar2_pb_c_")
    corpus_to_docs(
        synth_corpus_files(spark, n_files, partitions=max(CPUS, 8))
    ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir).select("doc_id", "content")
    idx_dir = tempfile.mkdtemp(prefix="gar2_pb_i_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_index(spark, corpus, idx_dir, n_partitions=2, n_shards=8,
                block_size=128, tokenizer_mode="code")
    handle = IndexHandle(spark, idx_dir).cache()

    # warm everything once
    bm25_topk_indexed(spark, handle, local_queries_df(spark, [(0, "def")]),
                      k=10).collect()
    for qid, text in CODE_QUERY_SET:
        bm25_topk_indexed(spark, handle,
                          local_queries_df(spark, [(qid, text)]), k=10,
                          method="wand").collect()

    res = {}
    for qid, text in CODE_QUERY_SET:
        legs = {"qdf": [], "trip": [], "partials": [], "full": []}
        for _ in range(5):
            t0 = time.monotonic()
            q = local_queries_df(spark, [(qid, text)])
            t1 = time.monotonic()
            trip = ix._interactive_trip(handle, q)
            t2 = time.monotonic()
            if trip and trip is not ix._BULK:
                partial = ix._interactive_partials(
                    handle, trip, 42, 1.2, 0.75, True)
                ix._driver_finish_topk(handle, partial, 10)
            else:
                ix._empty_topk_df(spark)
            t3 = time.monotonic()
            t4 = time.monotonic()
            bm25_topk_indexed(spark, handle,
                              local_queries_df(spark, [(qid, text)]),
                              k=10, method="wand").collect()
            t5 = time.monotonic()
            legs["qdf"].append(t1 - t0)
            legs["trip"].append(t2 - t1)
            legs["partials"].append(t3 - t2)
            legs["full"].append(t5 - t4)
        res[f"q{qid}"] = {k: round(statistics.median(v), 4)
                          for k, v in legs.items()}

    meds = {k: round(statistics.median([r[k] for r in res.values()]), 4)
            for k in ("qdf", "trip", "partials", "full")}
    print(json.dumps({"n_files": n_files, "median": meds,
                      "per_query": res}, indent=1))
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50_000)
