"""Okapi BM25 scoring as declarative DataFrame ops (the exhaustive path).

The whole scorer is JVM-side: query terms are broadcast, postings are
semi-joined on term (Catalyst prunes the scan to query terms), contributions
are computed in whole-stage codegen, and the per-query top-k is the grouped
partial-top-k window. No Python executes per row anywhere.

Formula (Lucene-style Okapi BM25; public: Robertson & Zaragoza 2009):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

Determinism contract (BASELINE.json "rank-identical docIDs and scores"):
  * float64 everywhere;
  * ranks ordered by (round(score, 6) desc, doc_id asc) — the rounded key
    makes rank order immune to <=1-ulp cross-engine libm differences, and the
    doc_id tie-break is pinned (cf. the reference's pinned-but-opposite
    cosine tie-break at /root/reference/geoIR/retrieval/index.py:166);
  * duplicate query terms are deduplicated (bag-of-distinct-terms queries).

Scale notes: at 10^12 docs the tf frame is replaced by the compressed
posting-block table (operators/postings.py + wand.py); this exhaustive
module remains the correctness oracle path and the planner for small scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.functions.tokenizer import _terms_col
from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
SCORE_DECIMALS = 6


def term_stats(tf: DataFrame) -> DataFrame:
    """(term, df): document frequency. One hash aggregate (map-side partial)."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(dstats: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl). Stays a DataFrame so downstream plans can
    broadcast it instead of a driver collect."""
    return dstats.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("doc_len").cast("double")).alias("avgdl"),
    )


def query_terms(queries: DataFrame, text_col: str = "text", mode: str = "ws") -> DataFrame:
    """(qid, term) distinct — queries are bags of distinct terms.

    ``mode`` must match the tokenizer mode the documents side used: on a
    ``code``/``code2`` index the postings store lowercased (sub)tokens, so a
    raw whitespace split of 'parseHTTPServer' would match nothing. The
    indexed query path passes IndexMeta.tokenizer_mode through here."""
    return (
        queries.select("qid", F.explode(_terms_col(text_col, mode)).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )


def bm25_scores(
    tf: DataFrame,
    dstats: DataFrame,
    queries: DataFrame,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    query_mode: str = "ws",
) -> DataFrame:
    """-> (qid, doc_id, score). Exhaustive: every doc containing >=1 query term.

    Join strategy: qterms and term-df are broadcast (tiny), doc stats join is
    a shuffle on doc_id which AQE coalesces; at index scale the tf scan is
    term-partition-pruned so only query-term postings are read.
    """
    qterms = query_terms(queries, mode=query_mode)
    # df is aggregated ONLY over query-term postings (semi-join pushes the
    # term restriction below the aggregate): the previous full term_stats
    # both aggregated and BROADCAST the entire vocabulary-sized df table —
    # unbounded at corpus scale (the docmap-broadcast defect class). df per
    # surviving term is unchanged, so scores are identical.
    qterm_set = qterms.select("term").distinct()
    tstats = term_stats(tf.join(F.broadcast(qterm_set), "term", "left_semi"))
    cstats = corpus_stats(dstats)

    matched = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(tstats), "term")
        .join(dstats.select("doc_id", "doc_len"), "doc_id")
        .join(F.broadcast(cstats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("doc_len") / F.col("avgdl")
    )
    contrib = idf * tf_d * F.lit(k1 + 1.0) / norm
    return (
        matched.select("qid", "doc_id", contrib.alias("contrib"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def bm25_topk(
    tf: DataFrame,
    dstats: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    query_mode: str = "ws",
) -> DataFrame:
    """-> (qid, doc_id, score, rank): per-query top-k, deterministic order."""
    scores = bm25_scores(tf, dstats, queries, k1=k1, b=b, query_mode=query_mode).withColumn(
        "score", F.round(F.col("score"), SCORE_DECIMALS)
    )
    return grouped_topk(
        scores,
        keys=["qid"],
        order=[F.col("score").desc(), F.col("doc_id").asc()],
        k=k,
    ).select("qid", "doc_id", "score", "rank")
