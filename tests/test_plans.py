"""Physical-plan assertions: the optimizations the 100 TB design depends on
must be visible in `.explain()` output, not assumed.

  * postings scans are pruned to query terms (PushedFilters reaches parquet)
  * only metadata columns are read when payload bytes aren't needed
  * the tiny dims of the BM25 join (query terms, dictionary, corpus stats)
    go broadcast, not shuffle
  * tokenize + BM25 scoring stays inside WholeStageCodegen
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.functions.tokenizer import doc_stats, tokenize_terms
from geometric_aware_retrieval_v2_spark.operators import bm25
from geometric_aware_retrieval_v2_spark.queryset import queries_df
from geometric_aware_retrieval_v2_spark.sources.tables import docs_from_documents
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    from geometric_aware_retrieval_v2_spark.operators.index import build_index

    d = str(tmp_path_factory.mktemp("planidx") / "idx")
    build_index(
        spark, docs_from_documents(spark, SF_SMOKE), d,
        n_partitions=2, n_shards=4, block_size=64,
    )
    return d


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_postings_scan_prunes_terms(spark, index_dir):
    postings = spark.read.parquet(f"{index_dir}/postings")
    ids = [
        r.i
        for r in spark.createDataFrame([("hash",), ("join",)], "t string")
        .select(F.xxhash64("t").alias("i"))
        .collect()
    ]
    q = postings.filter(F.col("term_id").isin(ids))
    plan = _plan(q)
    assert "PushedFilters" in plan and "In(term_id" in plan, plan


def test_metadata_only_scan_skips_bytes(spark, index_dir):
    postings = spark.read.parquet(f"{index_dir}/postings")
    q = postings.groupBy("term_id").agg(F.sum("n").alias("df"))
    plan = _plan(q)
    # ReadSchema must not include the payload column
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "bytes" not in read_schema[0], plan


def test_bm25_broadcasts_small_sides(spark):
    docs = docs_from_documents(spark, SF_SMOKE)
    df = bm25.bm25_topk(tokenize_terms(docs), doc_stats(docs), queries_df(spark), k=10)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_bm25_stays_in_codegen(spark):
    docs = docs_from_documents(spark, SF_SMOKE)
    df = bm25.bm25_scores(tokenize_terms(docs), doc_stats(docs), queries_df(spark))
    df.collect()  # AQE finalizes THIS df's physical plan only on execution
    plan = _plan(df)
    # "*(n)" prefixes mark WholeStageCodegen stages in the executed plan
    assert "isFinalPlan=true" in plan and "*(" in plan, plan
    # no Python evaluation anywhere in the lexical scoring path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

def test_ingest_input_scan_is_partition_pruned(spark, tmp_path_factory):
    """Above n_partitions=8 the build materializes partitionBy(bp) input;
    a per-partition job's filter must show up as a PartitionFilter on the
    scan (directory pruning), not a post-scan predicate over all files."""
    from geometric_aware_retrieval_v2_spark.operators.index import build_index

    d = str(tmp_path_factory.mktemp("ingestplan") / "idx")
    build_index(
        spark, docs_from_documents(spark, SF_SMOKE), d,
        n_partitions=10, n_shards=2, block_size=64,
    )
    docs = spark.read.parquet(f"{d}/input")
    q = docs.filter(F.col("bp") == 3)
    plan = _plan(q)
    part_filters = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_filters and "bp" in part_filters[0], plan


def test_quick_experiment_reference_parity():
    """quick_experiment mirrors the reference prototype exactly: same
    validation rules, same UserWarning, same hard-coded mock metrics
    (geoIR/__init__.py:114-128 returns mocks in EVERY environment)."""
    import warnings

    import pytest

    from geometric_aware_retrieval_v2_spark import quick_experiment

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = quick_experiment("bge-base", "beir/fiqa", geometric=True)
    assert any("mock results" in str(w.message) for w in rec)
    assert out["ndcg_10"] == 0.456
    assert out["map"] == 0.234
    assert out["recall_100"] == 0.789
    assert out["config"]["trainer"]["lambda_ricci"] == 0.1
    assert out["config"]["encoder"]["model_name"] == "bge-base"

    classic = quick_experiment(geometric=False)
    assert classic["config"]["trainer"]["lambda_ricci"] == 0.0
    assert classic["config"]["trainer"]["geodesic"] is False

    # reference validators: k_graph >= 5 hard error, extra fields forbidden
    with pytest.raises(ValueError, match="k_graph must be >= 5"):
        quick_experiment(k=3)
    with pytest.raises(ValueError, match="Unknown trainer parameters"):
        quick_experiment(bogus_param=1)
    with pytest.raises(ValueError, match="non-negative"):
        quick_experiment(lambda_ricci=-1.0)
    with pytest.warns(UserWarning, match="computationally expensive"):
        quick_experiment(k=101)
