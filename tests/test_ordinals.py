"""assign_ordinals must be a 0..n-1 bijection equal to the global
(doc_len, doc_id) rank — at a row count where boundary sampling is no longer
exhaustive (the round-1 repartitionByRange bug corrupted exactly this regime),
and independent of the input partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.operators.ordinals import assign_ordinals

N = 60_000


def _dstats(spark, partitions: int):
    return (
        spark.range(N)
        .repartition(partitions)
        .select(
            F.col("id").alias("doc_id"),
            F.pmod(F.xxhash64("id"), F.lit(37)).alias("doc_len"),
        )
    )


def test_ordinals_bijection_and_rank_at_50k(spark):
    dstats = _dstats(spark, partitions=16)
    got = {r.doc_id: r.ord for r in assign_ordinals(dstats, n_ranges=8).collect()}
    assert len(got) == N
    assert sorted(got.values()) == list(range(N))
    rows = [(r.doc_len, r.doc_id) for r in dstats.collect()]
    want = {doc_id: i for i, (_, doc_id) in enumerate(sorted(rows))}
    assert got == want


def test_ordinals_permutation_invariant(spark):
    a = {r.doc_id: r.ord for r in assign_ordinals(_dstats(spark, 3), n_ranges=8).collect()}
    b = {r.doc_id: r.ord for r in assign_ordinals(_dstats(spark, 29), n_ranges=8).collect()}
    assert a == b
