"""Round-3 IVF quantizer scale model (fixed n_cells, GEMM assignment, seeded
Lloyd's k-means) — equivalence + recall gates.

The round-2 stride quantizer grew centroids linearly with the corpus (n/50)
making assignment O(n^2 d / 50); the fixed-n_cells model keeps assignment at
O(n * n_cells * d). These tests pin: (a) the GEMM assignment is bit-identical
to the JVM broadcast-join assignment (same round(cos,9) desc / cell asc
tie-break), (b) centroid counts are bounded as configured, (c) k-means
strictly improves quantization distortion over its seed sample and holds the
approximate-graph recall bar.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.operators.simsearch import (
    assign_ivf,
    assign_ivf_gemm,
    centroids_every,
    centroids_fixed,
    default_n_cells,
    ivf_topk,
    kmeans_centroids,
)
from tests.conftest import SF_CORRECTNESS


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECTNESS}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _pairs(df):
    return sorted((r.vec_id, r.cell) for r in df.collect())


@pytest.mark.parametrize("nprobe", [1, 3])
def test_gemm_assignment_equals_jvm(spark, emb, nprobe):
    cents = centroids_fixed(emb, n_cells=22)
    jvm = _pairs(assign_ivf(emb, cents, nprobe=nprobe))
    gemm = _pairs(assign_ivf_gemm(emb, cents, nprobe=nprobe))
    assert gemm == jvm


def test_fixed_centroid_count_is_bounded(spark, emb):
    n = emb.count()
    for n_cells in (7, 22, 100):
        got = centroids_fixed(emb, n_cells=n_cells).count()
        assert got <= n_cells
        assert got >= n_cells * 0.8  # dense ids -> close to the target
    assert default_n_cells(n) == int(np.sqrt(n))
    assert default_n_cells(10**12) == 65536  # broadcast stays bounded


def test_fixed_equals_every_at_derived_stride(spark, emb):
    """centroids_fixed(n_cells) IS centroids_every(ceil(n/n_cells)) — the
    oracle identity the driver gate relies on."""
    n = emb.count()
    n_cells = 22
    every = -(-n // n_cells)
    a = sorted((r.cell, tuple(r.cvec)) for r in centroids_fixed(emb, n_cells).collect())
    b = sorted((r.cell, tuple(r.cvec)) for r in centroids_every(emb, every).collect())
    assert a == b


def _distortion(emb_np: np.ndarray, C: np.ndarray) -> float:
    """Mean (1 - best cosine) over all vectors — spherical k-means objective."""
    En = emb_np / np.maximum(np.linalg.norm(emb_np, axis=1, keepdims=True), 1e-30)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    return float(np.mean(1.0 - (En @ Cn.T).max(axis=1)))


def test_kmeans_reduces_distortion_and_is_deterministic(spark, emb):
    emb_np = np.asarray(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    seed_sample = kmeans_centroids(emb, n_cells=22, iters=0, seed=7)
    trained = kmeans_centroids(emb, n_cells=22, iters=3, seed=7)
    C0 = np.asarray([r.cvec for r in seed_sample.orderBy("cell").collect()])
    C3 = np.asarray([r.cvec for r in trained.orderBy("cell").collect()])
    assert len(C0) == len(C3) == 22
    d0, d3 = _distortion(emb_np, C0), _distortion(emb_np, C3)
    assert d3 < d0, f"k-means did not improve distortion: {d3:.4f} vs {d0:.4f}"
    # same seed -> same centroids (deterministic init + deterministic blocks)
    again = np.asarray(
        [r.cvec for r in kmeans_centroids(emb, n_cells=22, iters=3, seed=7)
         .orderBy("cell").collect()]
    )
    assert np.allclose(C3, again, atol=1e-9)


def test_kmeans_stride_init_matches_fixed_picks(spark, emb):
    """init='stride' (the SQL-expressible init behind the ivf_topk_kmeans
    driver gate) must start Lloyd from exactly the centroids_fixed picks,
    relabeled 0..k-1, L2-normalized — and stay deterministic."""
    n_cells = 16
    picks = np.asarray(
        [r.cvec for r in centroids_fixed(emb, n_cells).orderBy("cell").collect()],
        dtype=np.float64,
    )
    picks = picks / np.linalg.norm(picks, axis=1, keepdims=True)
    c0 = kmeans_centroids(emb, n_cells, iters=0, init="stride")
    got = np.asarray([r.cvec for r in c0.orderBy("cell").collect()])
    assert [r.cell for r in c0.orderBy("cell").collect()] == list(range(len(picks)))
    assert np.allclose(got, picks, atol=1e-12)
    a = kmeans_centroids(emb, n_cells, iters=2, init="stride").orderBy("cell").collect()
    b = kmeans_centroids(emb, n_cells, iters=2, init="stride").orderBy("cell").collect()
    assert [r.cvec for r in a] == [r.cvec for r in b]
    with pytest.raises(ValueError):
        kmeans_centroids(emb, n_cells, init="nope")


def test_ivf_topk_fixed_gemm_recall(spark, emb):
    """Production configuration (fixed n_cells + GEMM assignment) must beat
    the random-coverage baseline decisively. The driver embeddings are
    deliberately structureless (max pairwise cos ~0.5, no clusters), so
    absolute ANN recall tracks the probed fraction (nprobe / n_cells); the
    meaningful property is that cosine-directed probing recovers far more
    of the exact top-k than probing the same number of random cells."""
    from geometric_aware_retrieval_v2_spark.operators.rerank import cosine_topk

    qvecs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qvec"),
    )
    exact = {
        (r.qid, r.doc_id)
        for r in cosine_topk(emb, qvecs, k=10).select("qid", "doc_id").collect()
    }
    approx = {
        (r.qid, r.doc_id)
        for r in ivf_topk(
            emb, qvecs, n_cells=22, nprobe=4, k=10, assign_method="gemm"
        ).select("qid", "doc_id").collect()
    }
    recall = len(exact & approx) / len(exact)
    coverage_baseline = 4 / 22  # nprobe / n_cells ~= fraction of corpus scored
    assert recall >= 2 * coverage_baseline, (
        f"IVF fixed+gemm recall {recall:.3f} vs coverage {coverage_baseline:.3f}"
    )


def test_knn_edges_ivf_kmeans_recall(spark, emb):
    """Approximate graph with the data-adaptive quantizer + GEMM assignment
    holds the same recall bar as the stride-quantizer gate."""
    from geometric_aware_retrieval_v2_spark.operators.knn import knn_edges, knn_edges_ivf

    exact = {(r.src, r.dst) for r in knn_edges(emb, k=5, n_blocks=4).collect()}
    approx = {
        (r.src, r.dst)
        for r in knn_edges_ivf(
            emb, k=5, n_cells=22, nprobe=4, quantizer="kmeans", assign_method="gemm"
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF kmeans+gemm graph recall {recall:.3f}"
