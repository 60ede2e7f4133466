"""The fixed reference query set (FIXTURES.md §B).

Hand-pinned literals drawn from the driver corpus vocabulary so the identical
list can be inlined into both the Spark plan and the DuckDB oracle SQL:
mix of hot terms, the rare `dup` marker, duplicate-term queries (dedup to a
term set), out-of-vocabulary terms, and one guaranteed zero-hit query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

QUERY_SET: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "table scan"),
    (3, "sort merge join"),
    (4, "window agg batch"),
    (5, "spark stream"),
    (6, "dup"),
    (7, "dup filter row"),
    (8, "zzz_missing_term"),
    (9, "the a"),
    (10, "vector column scan filter"),
    (11, "group order key"),
    (12, "customer line value"),
    (13, "big small slow fast"),
    (14, "query data table row column"),
    (15, "merge part"),
    (16, "dup dup merge"),
    (17, "stream window watermark"),
    (18, "agg"),
    (19, "hash hash hash join"),
    (20, "scan filter project order limit"),
]


def queries_df(spark: SparkSession) -> DataFrame:
    # LocalRelation, not createDataFrame: the interactive index path probes
    # query text driver-side, and a parallelize-backed scan pays a Python
    # worker round trip per slice (see localrel module docstring)
    from geometric_aware_retrieval_v2_spark.localrel import local_queries_df

    return local_queries_df(spark, list(QUERY_SET))


def queries_values_sql() -> str:
    """DuckDB VALUES clause with the identical literals."""
    rows = ", ".join(f"({qid}, '{text}')" for qid, text in QUERY_SET)
    return f"(VALUES {rows}) AS q(qid, qtext)"
