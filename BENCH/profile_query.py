#!/usr/bin/env python
"""Count Spark jobs + wall time for one interactive WAND query.

The single-query p50 is dominated by fixed per-job overhead (scheduling,
Python<->JVM round trips), not scoring — so the cheapest latency win is
removing whole jobs from the interactive path. This script builds a tiny
index, runs one query, and reports how many Spark jobs the query itself
scheduled plus its wall time. History it verified: baseline 9 jobs per
2-term query; coalesce(1) probe + coordinator-merge finish -> 7; hot
dictionary/docmap caches on IndexHandle -> 5 warm; inline-VALUES local
relations for qt and the result -> 4 warm; empty-LocalRelation all-OOV
result -> cold all-OOV 2 (probe + dictionary miss fetch), warm all-OOV 1
(the probe alone — the empty result collects job-free).

Run: python BENCH/profile_query.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from geometric_aware_retrieval_v2_spark.operators import index as ix
from geometric_aware_retrieval_v2_spark.sources.corpus import (
    corpus_to_docs,
    synth_corpus_files,
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .appName("profile_query")
        .getOrCreate()
    )
    sc = spark.sparkContext
    docs = corpus_to_docs(synth_corpus_files(spark, n_files=2000,
                                             partitions=4))
    idx_dir = "/tmp/profile_query_idx"
    import shutil

    shutil.rmtree(idx_dir, ignore_errors=True)
    ix.build_index(spark, docs, idx_dir, n_partitions=4, n_shards=2,
                   block_size=64)
    handle = ix.IndexHandle(spark, idx_dir).cache()

    def q(qid: int, text: str):
        from geometric_aware_retrieval_v2_spark.localrel import local_queries_df

        return local_queries_df(spark, [(qid, text)])

    # warmup (fills caches, JIT, broadcast machinery)
    ix.bm25_topk_indexed(spark, handle, q(0, "def return"), k=10).collect()

    tracker = sc.statusTracker()
    for label, text in [("2-term", "def return"), ("all-oov", "zz_q_zz")]:
        # snapshot the SAME job group being measured: both labels share the
        # "probe" group, so a group-None snapshot let the second label
        # accumulate the first label's jobs (over-counted all-oov by the
        # 2-term count in earlier recordings)
        before = set(tracker.getJobIdsForGroup("probe") or [])
        sc.setJobGroup("probe", label)
        t0 = time.monotonic()
        rows = ix.bm25_topk_indexed(spark, handle, q(1, text), k=10).collect()
        dt = time.monotonic() - t0
        jobs = set(tracker.getJobIdsForGroup("probe") or [])
        print(f"{label}: jobs={len(jobs - before)} wall={dt:.3f}s "
              f"rows={len(rows)}")
        sc.setJobGroup(None, None)
    spark.stop()


if __name__ == "__main__":
    main()
