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


def attach_candidates(
    hits: DataFrame, emb: DataFrame, qvecs: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """(qid, doc_id, ...) hits -> (qid, doc_id, bm25, embedding, qvec).

    The embedding join shuffles on doc_id (hits are tiny: q x search_k rows,
    so AQE turns this into a broadcast of the hits side); qvecs is broadcast.
    """
    e = emb.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("embedding"))
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
) -> DataFrame:
    """Flagship: exhaustive BM25 top-search_k -> geodesic Strategy C rerank.
    -> (qid, doc_id, bm25, geo_dist, rank)."""
    from geometric_aware_retrieval_v2_spark.config import GeoConfig

    # the reference's config contract gates the geometric-stage entry point
    GeoConfig(k_graph=knn_k, geodesic=True)
    hits = bm25.bm25_topk(
        tokenize_terms(docs), doc_stats(docs), queries, k=search_k
    )
    qvecs = encode_queries(queries, dim=dim)
    cands = attach_candidates(hits, emb, qvecs)
    reranked = rerank.geodesic_rerank(cands, k=k, connect_k=connect_k, knn_k=knn_k)
    return (
        reranked.join(
            cands.select("qid", "doc_id", F.round("bm25", 6).alias("bm25")),
            ["qid", "doc_id"],
        )
        .select("qid", "doc_id", "bm25", "geo_dist", "rank")
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
