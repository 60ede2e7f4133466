#!/usr/bin/env python
"""Round-6 optimization instrumentation (guide §1): per-stage build timing,
noop-sink isolation of the bench query paths, and plan dumps.

NOT the driver bench — bench.py is frozen for measurement. This harness
exists so OPTIMIZATION_r06.md can cite stage-level numbers that bench.py's
end-to-end seconds cannot resolve.

Usage:
  python bench_extra.py build   [n_files]   # build + manifest stage breakdown
  python bench_extra.py query               # per-query WAND latency + phases
  python bench_extra.py rerank              # rerank pipeline, noop-isolated
  python bench_extra.py flagship            # flagship indexed, noop-isolated
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from geometric_aware_retrieval_v2_spark.session import get_spark

    return get_spark(app_name=f"bench-extra-{CPUS}", master=f"local[{CPUS}]",
                     shuffle_partitions=max(CPUS, 8))


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def manifest_stage_breakdown(index_dir: str) -> dict:
    import pyarrow.dataset as ds

    tab = ds.dataset(f"{index_dir}/manifest", format="parquet").to_table()
    rows = tab.to_pylist()
    agg: dict[str, list] = defaultdict(list)
    for r in rows:
        agg[r["stage"]].append(r["wall_ms"])
    return {s: {"n": len(v), "wall_ms_sum": sum(v), "wall_ms": sorted(v)}
            for s, v in agg.items()}


def run_build(n_files: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from geometric_aware_retrieval_v2_spark.operators.index import build_index
    from geometric_aware_retrieval_v2_spark.sources.corpus import (
        corpus_to_docs,
        synth_corpus_files,
    )

    spark = _spark()
    shared = os.environ.get("SPARK_GRAFT_BENCH_CORPUS_DIR")
    if shared and os.path.isdir(shared):
        corpus_dir, own = shared, False
    else:
        corpus_dir, own = tempfile.mkdtemp(prefix="gar2_bx_corpus_"), True
        corpus_to_docs(
            synth_corpus_files(spark, n_files, partitions=max(CPUS, 8))
        ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir).select("doc_id", "content")

    idx_dir = tempfile.mkdtemp(prefix="gar2_bx_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.sparkContext.setJobDescription("bx: build_index")
    t0 = time.monotonic()
    build_index(spark, corpus, idx_dir, n_partitions=2, n_shards=8,
                block_size=128, tokenizer_mode="code")
    build_sec = time.monotonic() - t0
    out = {
        "n_files": n_files,
        "build_sec": round(build_sec, 2),
        "files_per_sec": round(n_files / build_sec, 1),
        "stages": manifest_stage_breakdown(idx_dir),
    }
    print(json.dumps(out, indent=2))
    shutil.rmtree(idx_dir, ignore_errors=True)
    if own:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


def _build_query_index(spark, n_files: int):
    from geometric_aware_retrieval_v2_spark.operators.index import (
        IndexHandle,
        build_index,
    )
    from geometric_aware_retrieval_v2_spark.sources.corpus import (
        corpus_to_docs,
        synth_corpus_files,
    )

    corpus_dir = tempfile.mkdtemp(prefix="gar2_bx_qc_")
    corpus_to_docs(
        synth_corpus_files(spark, n_files, partitions=max(CPUS, 8))
    ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir).select("doc_id", "content")
    idx_dir = tempfile.mkdtemp(prefix="gar2_bx_qi_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_index(spark, corpus, idx_dir, n_partitions=2, n_shards=8,
                block_size=128, tokenizer_mode="code")
    return IndexHandle(spark, idx_dir).cache(), idx_dir, corpus_dir


def run_query(n_files: int) -> None:
    from geometric_aware_retrieval_v2_spark.code_queryset import CODE_QUERY_SET
    from geometric_aware_retrieval_v2_spark.localrel import local_queries_df
    from geometric_aware_retrieval_v2_spark.operators.index import bm25_topk_indexed

    spark = _spark()
    handle, idx_dir, corpus_dir = _build_query_index(spark, n_files)

    def qdf(qid, text):
        return local_queries_df(spark, [(qid, text)])

    bm25_topk_indexed(spark, handle, qdf(0, "def"), k=10).collect()  # warm
    per_query = {}
    for qid, text in CODE_QUERY_SET:
        legs = []
        for _ in range(3):
            t = time.monotonic()
            bm25_topk_indexed(spark, handle, qdf(qid, text), k=10,
                              method="wand").collect()
            legs.append(time.monotonic() - t)
        per_query[f"q{qid}"] = round(statistics.median(legs), 4)
    qall = local_queries_df(spark, list(CODE_QUERY_SET))
    blegs = []
    for _ in range(3):
        t = time.monotonic()
        bm25_topk_indexed(spark, handle, qall, k=10, method="wand").collect()
        blegs.append(time.monotonic() - t)
    print(json.dumps({
        "n_files": n_files,
        "p50": round(statistics.median(per_query.values()), 4),
        "queries": per_query,
        "batch20_sec": round(statistics.median(blegs), 4),
        "build_stages": manifest_stage_breakdown(idx_dir),
    }, indent=2))
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


def run_rerank() -> None:
    from pyspark.sql import functions as F

    from geometric_aware_retrieval_v2_spark.operators.rerank import (
        cosine_topk,
        geodesic_rerank,
    )
    from geometric_aware_retrieval_v2_spark.sources.tables import load_table

    spark = _spark()
    emb = load_table(spark, SF_DIR, "embeddings")
    qvecs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    # stage isolation with noop sinks
    spark.sparkContext.setJobDescription("bx: cosine_topk only")
    hits = cosine_topk(emb, qvecs, k=100)
    t_cos = _noop(hits)
    spark.sparkContext.setJobDescription("bx: cands join")
    cands = (
        hits.select("qid", "doc_id")
        .join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .join(qvecs, "qid")
        .select("qid", "doc_id", "embedding", "qvec")
    )
    t_cands = _noop(cands)
    spark.sparkContext.setJobDescription("bx: full rerank pipeline")
    legs = []
    for _ in range(3):
        t = time.monotonic()
        geodesic_rerank(cands, k=10, connect_k=10, knn_k=10).collect()
        legs.append(round(time.monotonic() - t, 4))
    print(json.dumps({
        "cosine_topk_noop_sec": round(t_cos, 4),
        "cands_noop_sec": round(t_cands, 4),
        "full_pipeline_secs": legs,
    }, indent=2))
    spark.stop()


def run_flagship() -> None:
    from geometric_aware_retrieval_v2_spark.operators.index import IndexHandle, build_index
    from geometric_aware_retrieval_v2_spark.operators.pipelines import (
        bm25_geodesic_indexed,
    )
    from geometric_aware_retrieval_v2_spark.queryset import queries_df
    from geometric_aware_retrieval_v2_spark.sources.tables import (
        docs_from_documents,
        load_table,
    )

    spark = _spark()
    emb = load_table(spark, SF_DIR, "embeddings")
    doc_idx = tempfile.mkdtemp(prefix="gar2_bx_docidx_")
    shutil.rmtree(doc_idx, ignore_errors=True)
    build_index(spark, docs_from_documents(spark, SF_DIR), doc_idx,
                n_partitions=2, n_shards=8, block_size=128)
    dh = IndexHandle(spark, doc_idx).cache()
    legs = []
    for _ in range(4):
        t = time.monotonic()
        bm25_geodesic_indexed(spark, dh, emb, queries_df(spark), k=10,
                              search_k=100).collect()
        legs.append(round(time.monotonic() - t, 4))
    print(json.dumps({"flagship_secs": legs}, indent=2))
    shutil.rmtree(doc_idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    if mode == "build":
        run_build(n)
    elif mode == "query":
        run_query(n)
    elif mode == "rerank":
        run_rerank()
    elif mode == "flagship":
        run_flagship()
    else:
        raise SystemExit(f"unknown mode {mode}")
