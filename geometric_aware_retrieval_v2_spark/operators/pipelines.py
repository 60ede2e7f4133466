"""End-to-end retrieval pipelines: BM25 (exhaustive or WAND-indexed)
candidate generation -> embedding join -> geometric re-rank.

This is the engine's flagship shape (BASELINE.json north_star): exact BM25
top-k, then the reference's geometric re-ranking over the per-query candidate
set. E2/E3 lifecycle parity (SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.functions.hashing import encode_queries
from geometric_aware_retrieval_v2_spark.functions.tokenizer import doc_stats, tokenize_terms
from geometric_aware_retrieval_v2_spark.operators import bm25, rerank


# largest candidate doc_id set still compiled into the embeddings scan as an
# IN literal (parquet row-group stat skipping); past this the filter is
# dropped and the join alone prunes
_EMB_PRUNE_MAX_IDS = 32_768


def attach_candidates(
    hits: DataFrame, emb: DataFrame, qvecs: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
    prune_ids: "list[int] | None" = None,
) -> DataFrame:
    """(qid, doc_id, ...) hits -> (qid, doc_id, bm25, embedding, qvec).

    The embedding join shuffles on doc_id (hits are tiny: q x search_k rows,
    so AQE turns this into a broadcast of the hits side); qvecs is broadcast.

    ``prune_ids``: when the caller already knows the candidate doc_ids
    driver-side (the interactive index path materializes its top-k), they
    are pushed into the embeddings scan as an isin filter — a broadcast
    join still STREAMS the whole probe side, so without this a 10^12-row
    embeddings table would be scanned end-to-end to fetch a few hundred
    vectors; with it the scan row-group-skips on the doc_id column stats.
    Semantically a no-op: the inner join keeps exactly these ids anyway.
    """
    e = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("embedding"))
    if prune_ids is not None and 0 < len(prune_ids) <= _EMB_PRUNE_MAX_IDS:
        e = e.filter(F.col("doc_id").isin(sorted(set(prune_ids))))
    return (
        hits.select("qid", "doc_id", F.col("score").alias("bm25"))
        .join(e, "doc_id")
        .join(F.broadcast(qvecs), "qid")
    )


def bm25_geodesic(
    spark: SparkSession,
    docs: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    search_k: int = 100,
    connect_k: int = 10,
    knn_k: int = 10,
    dim: int = 64,
    tokenizer_mode: str = "ws",
) -> DataFrame:
    """Flagship: exhaustive BM25 top-search_k -> geodesic Strategy C rerank.
    -> (qid, doc_id, bm25, geo_dist, rank)."""
    from geometric_aware_retrieval_v2_spark.config import GeoConfig

    # the reference's config contract gates the geometric-stage entry point
    GeoConfig(k_graph=knn_k, geodesic=True)
    hits = bm25.bm25_topk(
        tokenize_terms(docs, mode=tokenizer_mode),
        doc_stats(docs, mode=tokenizer_mode),
        queries,
        k=search_k,
        query_mode=tokenizer_mode,
    )
    qvecs = encode_queries(queries, dim=dim)
    cands = attach_candidates(hits, emb, qvecs)
    # bm25 rides through the rerank kernel (already 6dp-rounded by the
    # scorer): joining it back onto `cands` would recompute the whole
    # retrieval subtree a second time
    return rerank.geodesic_rerank(
        cands, k=k, connect_k=connect_k, knn_k=knn_k, passthrough=("bm25",)
    )


def bm25_geodesic_indexed(
    spark: SparkSession,
    index,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    search_k: int = 100,
    connect_k: int = 10,
    knn_k: int = 10,
    dim: int = 64,
    method: str = "wand",
) -> DataFrame:
    """The production flagship (reference E1 lifecycle over a PERSISTED
    index, /root/reference/geoIR/cli.py:39-61 -> retrieval/index.py:171-189):
    compressed-index block-max WAND top-search_k -> embedding join ->
    geodesic Strategy C rerank. -> (qid, doc_id, bm25, geo_dist, rank).

    ``index`` is an index_dir path or an IndexHandle (pass a .cache()d handle
    to amortize index loading across query batches). Both this and the
    exhaustive ``bm25_geodesic`` are exact, so on the same corpus + queries
    their outputs are bit-identical (pytest-asserted): WAND changes which
    blocks are DECODED, never the scores of surviving top-k docs, and query
    text is tokenized with the index's own tokenizer_mode.
    """
    from geometric_aware_retrieval_v2_spark.config import GeoConfig
    from geometric_aware_retrieval_v2_spark.operators.index import (
        IndexHandle,
        bm25_topk_indexed,
    )

    GeoConfig(k_graph=knn_k, geodesic=True)
    handle = IndexHandle(spark, index) if isinstance(index, str) else index
    hits = bm25_topk_indexed(spark, handle, queries, k=search_k, method=method)
    qvecs = encode_queries(queries, dim=dim)
    local = getattr(hits, "_spark_graft_local_topk", None)
    cands = attach_candidates(
        hits, emb, qvecs,
        prune_ids=[r[1] for r in local] if local is not None else None,
    )
    # bm25 rides through the kernel: a join back onto `cands` would run the
    # WAND scan + scoring kernel TWICE per query batch (observed ~2x the
    # engine work in the flagship bench job before this)
    return rerank.geodesic_rerank(
        cands, k=k, connect_k=connect_k, knn_k=knn_k, passthrough=("bm25",)
    )


def bm25_ppr(
    spark: SparkSession,
    docs: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 50,
    search_k: int = 100,
    adjacency: str = "cosine",
    dim: int = 64,
) -> DataFrame:
    """BM25 top-search_k -> PPR diffusion rerank (eval/metrics.py:55-92 shape).
    -> (qid, doc_id, ppr, rank)."""
    hits = bm25.bm25_topk(tokenize_terms(docs), doc_stats(docs), queries, k=search_k)
    qvecs = encode_queries(queries, dim=dim)
    cands = attach_candidates(hits, emb, qvecs)
    return rerank.ppr_rerank(cands, k=k, adjacency=adjacency)
