"""Dedup-family and multimodal plumbing tests beyond the DuckDB oracle gate
(which already checks exact values at sf0.01): recall/containment properties
and Arrow batch shapes."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.operators import dedup, multimodal
from geometric_aware_retrieval_v2_spark.sources.tables import docs_from_documents
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return docs_from_documents(spark, SF_SMOKE)


def test_minhash_lsh_contains_high_jaccard_pairs(spark, docs):
    """LSH (16 hashes, bands of 2) must surface every pair with jaccard
    >= 0.9: P(miss) = (1-j^2)^8 < 1e-5 at j=0.9, and the fixture dups are
    ~0.99."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert exact, "fixture should contain near-duplicate docs"
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.9).collect()
    }
    assert exact <= lsh
    # and LSH-verified output never exceeds the exact pair set at the same
    # threshold (verification makes it a subset of all-pairs jaccard)
    exact_05 = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh_05 = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    assert lsh_05 <= exact_05


def test_simhash_python_oracle(spark, docs):
    """Engine simhash equals a naive per-doc Python computation."""
    from geometric_aware_retrieval_v2_spark.functions.tokenizer import tokenize_terms

    got = {
        r.doc_id: r.simhash
        for r in dedup.simhash(tokenize_terms(docs)).filter(F.col("doc_id") < 20).collect()
    }
    rows = docs.filter(F.col("doc_id") < 20).collect()
    for r in rows:
        counts: dict[str, int] = {}
        for t in r.content.split():
            counts[t] = counts.get(t, 0) + 1
        acc = [0] * 60
        for term, tf in counts.items():
            h = int(hashlib.md5(term.encode()).hexdigest()[:15], 16)
            for j in range(60):
                acc[j] += tf * (1 if (h >> j) & 1 else -1)
        want = sum((1 << j) for j in range(60) if acc[j] > 0)
        assert got[r.doc_id] == want, f"doc {r.doc_id}"


def test_media_features_match_python(spark, docs):
    media = multimodal.synth_media(docs.filter(F.col("doc_id") < 10))
    feats = {r.media_id: r for r in multimodal.extract_features(media).collect()}
    for r in docs.filter(F.col("doc_id") < 10).collect():
        payload = r.content.encode("utf-8")
        arr = np.frombuffer(payload, dtype=np.uint8)
        f = feats[r.doc_id]
        assert f.n_bytes == len(arr)
        assert f.first_byte == int(arr[0])
        assert f.byte_sum_mod == int(arr.astype(np.int64).sum()) % 1_000_003
        hist, _ = np.histogram(arr, bins=4, range=(0, 256))
        assert np.allclose(f.histogram, hist / len(arr))


def test_frame_sample_shapes(spark, docs):
    media = multimodal.synth_media(docs.filter(F.col("doc_id") < 5))
    frames = multimodal.frame_sample(media, every=64).collect()
    by_id: dict[int, list] = {}
    for fr in frames:
        by_id.setdefault(fr.media_id, []).append(fr)
    for r in docs.filter(F.col("doc_id") < 5).collect():
        payload = r.content.encode("utf-8")
        fs = sorted(by_id[r.doc_id], key=lambda x: x.frame_no)
        assert len(fs) == (len(payload) + 63) // 64
        assert b"".join(bytes(f.frame_bytes) for f in fs) == payload


def test_decode_media_is_stubbed(spark, docs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(multimodal.synth_media(docs))


def test_fingerprint_is_order_sensitive(spark):
    a = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, content string")
    b = spark.createDataFrame([(1, "gamma beta alpha")], "doc_id long, content string")
    from geometric_aware_retrieval_v2_spark.operators.textstats import doc_fingerprint

    fa = doc_fingerprint(a).collect()[0].fingerprint
    fb = doc_fingerprint(b).collect()[0].fingerprint
    assert fa != fb

def test_embedding_neardup_ivf_contains_brute_force(spark):
    """IVF-bucketed near-dup (nprobe=4 multi-assignment) must surface every
    brute-force pair at the driver threshold on the test embeddings, and its
    verified output is a subset of the brute-force pair set."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    bf = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    assert bf, "fixture should contain near-dup embedding pairs at 0.4"
    ivf = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_neardup_pairs_ivf(
            emb, threshold=0.4, every=50, nprobe=4
        ).collect()
    }
    assert bf <= ivf
    assert ivf <= bf  # exact verification: no false positives


def test_embedding_neardup_ivf_plan_has_no_nested_loop_pair_join(spark):
    """The O(n^2) trap this replaces was `a.join(b, id_a < id_b)` — a
    BroadcastNestedLoopJoin carrying the pair predicate over ALL vector
    pairs. In the IVF plan the pair join must be an equi-join on cell
    (hash/sort-merge); the only nested-loop joins allowed are the bounded
    broadcast-centroid cross joins of the assignment step (small side is
    the centroid table by construction)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = dedup.embedding_neardup_pairs_ivf(emb, threshold=0.4, every=10, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    nlj_lines = [l for l in plan.splitlines() if "NestedLoopJoin" in l]
    assert all("id_a" not in l and "id_b" not in l for l in nlj_lines), nlj_lines
    # and the pair-generation join on cell is an equi-join
    assert any(
        ("SortMergeJoin [cell" in l) or ("BroadcastHashJoin [cell" in l)
        for l in plan.splitlines()
    ), plan


def test_simhash_agg_matches_explode_formulation(spark, docs):
    """The 60-column aggregate simhash must equal the explode-formulated
    per-bit computation (the DuckDB oracle shape) bit for bit."""
    from geometric_aware_retrieval_v2_spark.functions.tokenizer import tokenize_terms

    tf = tokenize_terms(docs)
    got = {r.doc_id: r.simhash for r in dedup.simhash(tf).collect()}
    bits = tf.select(
        "doc_id",
        "tf",
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast("long").alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("j"),
    ).select("doc_id", "j", F.expr("((shiftright(h, j) & 1) * 2 - 1) * tf").alias("v"))
    want_df = (
        bits.groupBy("doc_id", "j")
        .agg(F.sum("v").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("IF(s > 0, shiftleft(cast(1 AS BIGINT), j), cast(0 AS BIGINT))")
            ).alias("simhash")
        )
    )
    want = {r.doc_id: r.simhash for r in want_df.collect()}
    assert got == want
