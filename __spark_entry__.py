"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (BM25 over documents at sf0.001 +
geometric re-rank once Stage 5 lands). ``queries()`` / ``oracle_sql()`` pair
every implemented operator with a DuckDB oracle (CORRECTNESS gate).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from geometric_aware_retrieval_v2_spark import oracles
from geometric_aware_retrieval_v2_spark.functions.tokenizer import doc_stats, tokenize_terms
from geometric_aware_retrieval_v2_spark.operators import bm25
from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk
from geometric_aware_retrieval_v2_spark.queryset import queries_df
from geometric_aware_retrieval_v2_spark.sources.tables import docs_from_documents, load_table

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- lexical ops

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs_from_documents(spark, sf_dir)


def q_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenize_terms(_docs(spark, sf_dir))


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_stats(_docs(spark, sf_dir))


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.term_stats(tokenize_terms(_docs(spark, sf_dir)))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25.corpus_stats(doc_stats(_docs(spark, sf_dir))).select(
        "n_docs", F.round("avgdl", 6).alias("avgdl")
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return bm25.bm25_topk(
        tokenize_terms(docs), doc_stats(docs), queries_df(spark), k=10
    )


def _index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Build (once, resumable) the compressed inverted index for a testdata
    scale under /tmp; reused across driver invocations in the same sandbox."""
    import hashlib

    from geometric_aware_retrieval_v2_spark.operators.index import build_index

    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    idx = f"/tmp/gar2_index_{tag}"
    build_index(
        spark, _docs(spark, sf_dir), idx, n_partitions=4, n_shards=8, block_size=128
    )
    return idx


def q_bm25_topk_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-index block-max WAND path; must be rank-identical (and
    score-identical) to the exhaustive oracle SQL."""
    from geometric_aware_retrieval_v2_spark.operators.index import bm25_topk_indexed

    idx = _index_dir_for(spark, sf_dir)
    return bm25_topk_indexed(spark, idx, queries_df(spark), k=10, method="wand")


# ------------------------------------------------------- classic SQL coverage

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02 00:00:00"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    joined = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey).select(
        "c_custkey", "c_name", "revenue", "n_orders"
    )
    return grouped_topk(
        joined, keys=[], order=[F.col("revenue").desc(), F.col("c_custkey").asc()], k=20
    ).select("c_custkey", "c_name", "revenue", "n_orders", "rank")


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# -------------------------------------------------------------- driver surface

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus for the fixed
    reference query set (geometric re-rank joins in at Stage 5)."""
    return q_bm25_topk(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize_tf": q_tokenize_tf,
        "doc_stats": q_doc_stats,
        "term_df": q_term_df,
        "corpus_stats": q_corpus_stats,
        "bm25_topk": q_bm25_topk,
        "bm25_topk_wand": q_bm25_topk_wand,
        "tpch_q1": q_tpch_q1,
        "top_customers": q_top_customers,
        "events_hourly": q_events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tokenize_tf": oracles.tokenize_tf_sql(),
        "doc_stats": oracles.doc_stats_sql(),
        "term_df": oracles.term_df_sql(),
        "corpus_stats": oracles.corpus_stats_sql(),
        "bm25_topk": oracles.bm25_topk_sql(k=10),
        "bm25_topk_wand": oracles.bm25_topk_sql(k=10),
        "tpch_q1": oracles.tpch_q1_sql(),
        "top_customers": oracles.top_customers_sql(k=20),
        "events_hourly": oracles.events_hourly_sql(),
    }
