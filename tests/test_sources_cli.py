"""Reference-parity scans (sources/readers.py vs geoIR/data/loader.py:9-37),
the re-expression of the reference's test_retriever.py over its 6-doc corpus
(with the hashing encoder standing in for the HF model), a CLI round-trip
smoke test, and the config validation contract (geoIR/core/config.py:35-57)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.sources.readers import (
    load_eval_jsonl,
    load_text_corpus,
    load_triplets,
)

# the reference's own fixture corpus (tests/test_retriever.py:8-17)
SMALL_CORPUS = [
    "A man is eating food.",
    "A man is eating a piece of bread.",
    "The girl is carrying a baby.",
    "A man is riding a horse.",
    "A woman is playing violin.",
    "A man is riding a white horse on an enclosed track.",
]


# ------------------------------------------------------------------ readers

def test_load_text_corpus_blank_strip_and_limit(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("doc zero\n\n   \ndoc one  \n\tdoc two\ndoc three\n")
    rows = load_text_corpus(spark, str(p)).collect()
    got = {r.doc_id: r.content for r in rows}
    assert got == {0: "doc zero", 1: "doc one", 2: "doc two", 3: "doc three"}
    limited = load_text_corpus(spark, str(p), max_docs=2).collect()
    assert sorted(r.content for r in limited) == ["doc one", "doc zero"]


def test_load_triplets_drops_malformed(spark, tmp_path):
    p = tmp_path / "trip.tsv"
    p.write_text("q1\tpos1\tneg1\nbad line no tabs\nq2\tpos2\tneg2\nq3\tonly_pos\n")
    rows = load_triplets(spark, str(p)).collect()
    assert sorted((r.query, r.pos, r.neg) for r in rows) == [
        ("q1", "pos1", "neg1"),
        ("q2", "pos2", "neg2"),
    ]


def test_load_eval_jsonl_schema(spark, tmp_path):
    p = tmp_path / "eval.jsonl"
    cases = [
        {"query": "a", "docs": ["d1", "d2"], "reference": "ref a"},
        {"query": "b", "docs": ["d3"], "gt_docs": ["g"], "new_docs": ["n"]},
    ]
    p.write_text("\n".join(json.dumps(c) for c in cases))
    df = load_eval_jsonl(spark, str(p))
    assert set(df.columns) == {"query", "docs", "reference", "gt_docs", "new_docs"}
    rows = {r.query: r for r in df.collect()}
    assert rows["a"].docs == ["d1", "d2"] and rows["a"].reference == "ref a"
    assert rows["b"].gt_docs == ["g"] and rows["b"].reference is None


# --------------------------------- reference test_retriever re-expression

@pytest.fixture(scope="module")
def small_corpus_tables(spark):
    """docs + hashing-encoder embeddings for the reference's 6-doc corpus."""
    from geometric_aware_retrieval_v2_spark.functions.hashing import embed_text

    docs = spark.createDataFrame(
        list(enumerate(SMALL_CORPUS)), schema="doc_id long, content string"
    )
    emb = spark.createDataFrame(
        [(i, embed_text(t).tolist()) for i, t in enumerate(SMALL_CORPUS)],
        schema="vec_id long, embedding array<double>",
    )
    return docs, emb


def _qvec_df(spark, query: str):
    from geometric_aware_retrieval_v2_spark.functions.hashing import embed_text

    return spark.createDataFrame(
        [(0, embed_text(query).tolist())], schema="qid long, qvec array<double>"
    )


def test_indexing_shapes(spark, small_corpus_tables):
    """test_retriever.py:test_indexing — embeddings row count == corpus size,
    the k-NN graph exists (k_graph=2 like the reference call)."""
    from geometric_aware_retrieval_v2_spark.operators.knn import knn_edges

    docs, emb = small_corpus_tables
    assert emb.count() == len(SMALL_CORPUS)
    edges = knn_edges(emb, k=2, metric="cosine", n_blocks=1)
    assert edges.count() > 0
    nodes = {r.src for r in edges.collect()} | {r.dst for r in edges.collect()}
    assert nodes <= set(range(len(SMALL_CORPUS)))


def test_search_metrics_cosine_and_geodesic(spark, small_corpus_tables):
    """test_retriever.py:test_search_metrics — both metrics return top_k
    integer doc ids; the horse query's best cosine hit is a horse doc."""
    from geometric_aware_retrieval_v2_spark.operators.rerank import (
        cosine_topk,
        geodesic_rerank,
    )

    docs, emb = small_corpus_tables
    qvecs = _qvec_df(spark, "A man on a horse")
    top_k = 3

    cos = cosine_topk(emb, qvecs, k=top_k).collect()
    assert len(cos) == top_k
    assert all(isinstance(r.doc_id, int) for r in cos)
    best = min(cos, key=lambda r: r.rank).doc_id
    assert best in (3, 5)  # the two horse documents

    hits = cosine_topk(emb, qvecs, k=len(SMALL_CORPUS))
    cands = (
        hits.select("qid", "doc_id")
        .join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .join(qvecs, "qid")
        .select("qid", "doc_id", "embedding", "qvec")
    )
    geo = geodesic_rerank(cands, k=top_k, connect_k=3, knn_k=3).collect()
    assert 0 < len(geo) <= top_k
    assert all(isinstance(r.doc_id, int) for r in geo)


def test_invalid_parameters_raise(spark, small_corpus_tables):
    """test_retriever.py:test_search_metrics invalid-metric branch, mapped to
    this engine's validation surfaces."""
    from geometric_aware_retrieval_v2_spark.functions.tokenizer import tokenize_terms
    from geometric_aware_retrieval_v2_spark.operators.rerank import curvature_mix_topk

    docs, emb = small_corpus_tables
    with pytest.raises(ValueError):
        tokenize_terms(docs, mode="invalid_mode")
    with pytest.raises(ValueError):
        curvature_mix_topk(emb, _qvec_df(spark, "q"), emb, alpha=1.5)


# ---------------------------------------------------------------------- CLI

def test_cli_build_search_roundtrip(spark, tmp_path, capsys):
    from geometric_aware_retrieval_v2_spark import cli

    docs = spark.createDataFrame(
        list(enumerate(SMALL_CORPUS)), schema="doc_id long, content string"
    )
    corpus = str(tmp_path / "corpus.parquet")
    docs.write.parquet(corpus)
    index = str(tmp_path / "idx")

    rc = cli.main(
        ["build-index", "--input", corpus, "--index", index,
         "--partitions", "2", "--shards", "2", "--tokenizer", "ws"],
        spark=spark,
    )
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_docs"] == len(SMALL_CORPUS)

    rc = cli.main(
        ["search", "--index", index, "--query", "man riding horse", "--k", "3"],
        spark=spark,
    )
    assert rc == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == 3
    assert hits[0]["rank"] == 1
    assert {h["doc_id"] for h in hits} <= set(range(len(SMALL_CORPUS)))
    # spark session must survive an injected-session CLI call
    assert spark.range(1).count() == 1

    rc = cli.main(["compact", "--index", index], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted_blocks"] > 0
    # the swap must take hold: queries now read the COMPACTED postings and
    # the rebuilt dictionary, and return identical results
    assert out["swapped"] is True
    assert out["output"] == f"{index}/postings"
    import os

    assert not os.path.isdir(f"{index}/postings_compacted")
    rc = cli.main(
        ["search", "--index", index, "--query", "man riding horse", "--k", "3"],
        spark=spark,
    )
    assert rc == 0
    hits2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits2 == hits


def test_cli_audit(spark, tmp_path, capsys):
    """audit: embeddings parquet -> kNN graph -> Forman curvature summary."""
    from geometric_aware_retrieval_v2_spark import cli
    from geometric_aware_retrieval_v2_spark.sources.tables import load_table

    emb_path = str(tmp_path / "emb.parquet")
    load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    ).write.parquet(emb_path)
    rc = cli.main(["audit", "--embeddings", emb_path, "--k", "5"], spark=spark)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"mean_kappa", "min_kappa", "max_kappa"}
    assert out["min_kappa"] <= out["mean_kappa"] <= out["max_kappa"]

    # exact Ollivier-Ricci backend: hop-metric kappa is bounded in [-2, 1]
    rc = cli.main(
        ["audit", "--embeddings", emb_path, "--k", "5",
         "--curvature", "ollivier"],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert -2.0 <= out["min_kappa"] <= out["mean_kappa"] <= out["max_kappa"] <= 1.0


def test_cli_eval(spark, tmp_path, capsys):
    """eval: run + qrels parquet -> mean nDCG/recall@k."""
    from geometric_aware_retrieval_v2_spark import cli

    run = spark.createDataFrame(
        [(0, d, 10.0 - d) for d in range(5)] + [(1, d, 5.0 - d) for d in range(3)],
        schema="qid long, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [(0, 0, 1), (0, 3, 1), (1, 9, 1)], schema="qid long, doc_id long, rel int"
    )
    run_path, qrels_path = str(tmp_path / "run.parquet"), str(tmp_path / "qrels.parquet")
    run.write.parquet(run_path)
    qrels.write.parquet(qrels_path)
    rc = cli.main(
        ["eval", "--run", run_path, "--qrels", qrels_path, "--k", "5"], spark=spark
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["k"] == 5
    # qid 0 found both rels (recall 1, ndcg > 0); qid 1 found none
    assert 0.0 < out["ndcg"] < 1.0
    assert out["recall"] == 0.5


# ------------------------------------------------------------------- config

def test_config_validation():
    from geometric_aware_retrieval_v2_spark.config import GeoConfig, IndexConfig

    GeoConfig(k_graph=5)  # boundary accepted
    with pytest.raises(ValueError):
        GeoConfig(k_graph=4)
    with pytest.raises(ValueError):
        GeoConfig(lambda_ricci=-0.1)
    with pytest.raises(ValueError):
        GeoConfig(lambda_forman=-1.0)
    with pytest.raises(ValueError):
        GeoConfig(ricci_backend="nope")
    with pytest.warns(UserWarning):
        GeoConfig(k_graph=101)
    with pytest.warns(UserWarning):
        GeoConfig(lambda_ricci=11.0)
    with pytest.raises(ValueError):
        IndexConfig(tokenizer_mode="nope")
    with pytest.raises(ValueError):
        IndexConfig(block_size=4)
