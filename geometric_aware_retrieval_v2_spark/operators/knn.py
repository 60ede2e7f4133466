"""Exact global k-NN graph construction over an embedding table.

Reference parity: build_knn_graph (/root/reference/geoIR/geo/graph.py:24-87)
— per node the k nearest by cosine (1-cos distance) or euclidean, self
excluded, undirected weighted edges. The reference densifies an O(n^2)
distance matrix ("enough for <10k nodes", graph.py:3-6); this operator is the
distributed re-design: a block-nested-loop similarity join.

Physical plan:
  1. embeddings are grouped into B hash blocks; each block densifies to one
     NumPy (n_b, d) matrix row (applyInPandas);
  2. the B x B block-pair cross join runs one GEMM per pair inside
     mapInPandas, each pair emitting only its per-source top-k candidates
     (k << n_b, so the shuffle carries O(n*k*B) rows, not O(n^2));
  3. a per-source top-k window merges candidates globally.

At 100 TB-scale this is the standard exact-kNN fallback; the ANN path
(operators/simsearch.py IVF) bounds the pair fan-out instead. Tie-break is
pinned to (round(dist, 9) asc, dst asc) — the reference's stable-argsort
order — so results are partition-invariant and oracle-comparable.

The undirected edge set keeps (src < dst) canonical rows: nx.Graph semantics
(an edge exists if either endpoint selected it; duplicate add keeps one).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk

DIST_DECIMALS = 9
WEIGHT_DECIMALS = 6


# per-cell byte budget for the packed block matrices: same defect class and
# same treatment as postings.pack_width / the docmap broadcast cap — a fixed
# n_blocks packs corpus/n_blocks vectors into ONE Arrow binary cell, which
# at 10M x d=64 float64 is ~640 MB/cell against Arrow's 2 GiB cell ceiling
# (each GEMM task then densifies two cells plus their product)
BLOCK_BYTES_TARGET = 128 * 1024 * 1024


def derive_n_blocks(
    n_rows: int, dim: int, parallelism: int,
    target_bytes: int = BLOCK_BYTES_TARGET,
) -> int:
    """Block count sized from the DATA (VERDICT r5 #1): enough blocks that
    one block's (n/B, d) float64 matrix stays under ``target_bytes``, with a
    parallelism floor so small corpora still spread over the cluster. The
    edge set is invariant to B by construction (per-src top-k within every
    block pair is a superset of the global top-k; the final window applies
    the same pinned total order) — pinned by test_knn_edges_block_count_invariant."""
    by_size = -(-int(n_rows) * int(dim) * 8 // int(target_bytes))
    return min(max(int(parallelism), by_size, 1), max(int(n_rows), 1))


def _pack_blocks(emb: DataFrame, n_blocks: int, id_col: str, vec_col: str) -> DataFrame:
    # project FIRST: applyInPandas ships every input column through Arrow,
    # so an un-pruned emb frame would move (and scan) payload columns the
    # pack never touches (guide §4.1)
    tagged = emb.select(id_col, vec_col).withColumn(
        "block", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                "block": [int(key[0])],
                "ids": [ids.tobytes()],
                "mat": [mat.tobytes()],
                "n": [len(ids)],
                "d": [mat.shape[1]],
            }
        )

    return tagged.groupBy("block").applyInPandas(
        pack, schema="block int, ids binary, mat binary, n int, d int"
    )


def knn_candidates(
    emb: DataFrame,
    k: int,
    metric: str = "cosine",
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Directed candidate edges (src, dst, dist): per-src top-k within each
    block pair; finalize with the global window in ``knn_edges``.

    ``n_blocks=None`` (default) derives the block count from the corpus
    size so per-cell bytes stay bounded at any scale (derive_n_blocks);
    an explicit value is respected unchanged — the result is invariant
    either way."""
    if n_blocks is None:
        n = emb.count()
        head = emb.select(vec_col).head(1)
        d = len(head[0][0]) if head else 1
        n_blocks = derive_n_blocks(
            n, d, emb.sparkSession.sparkContext.defaultParallelism
        )
    blocks = _pack_blocks(emb, n_blocks, id_col, vec_col)
    pairs = (
        blocks.alias("a")
        .crossJoin(blocks.alias("b"))
        .select(
            F.col("a.ids").alias("ids_a"), F.col("a.mat").alias("mat_a"),
            F.col("a.n").alias("n_a"), F.col("a.d").alias("d"),
            F.col("b.ids").alias("ids_b"), F.col("b.mat").alias("mat_b"),
            F.col("b.n").alias("n_b"),
        )
    )

    def gemm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids_a = np.frombuffer(row.ids_a, dtype=np.int64)
                ids_b = np.frombuffer(row.ids_b, dtype=np.int64)
                A = np.frombuffer(row.mat_a, dtype=np.float64).reshape(row.n_a, row.d)
                Bm = np.frombuffer(row.mat_b, dtype=np.float64).reshape(row.n_b, row.d)
                if normalize and metric == "cosine":
                    A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-30)
                    Bm = Bm / np.maximum(np.linalg.norm(Bm, axis=1, keepdims=True), 1e-30)
                if metric == "cosine":
                    dist = 1.0 - A @ Bm.T
                else:
                    sq = (
                        np.sum(A * A, axis=1)[:, None]
                        + np.sum(Bm * Bm, axis=1)[None, :]
                        - 2.0 * (A @ Bm.T)
                    )
                    dist = np.sqrt(np.maximum(sq, 0.0))
                # mask self-pairs, keep per-src top-k within the pair
                self_mask = ids_a[:, None] == ids_b[None, :]
                dist = np.where(self_mask, np.inf, dist)
                kk = min(k, dist.shape[1])
                part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
                srcs = np.repeat(ids_a, kk)
                dsts = ids_b[part.ravel()]
                ds = np.take_along_axis(dist, part, axis=1).ravel()
                keep = np.isfinite(ds)
                yield pd.DataFrame(
                    {"src": srcs[keep], "dst": dsts[keep], "dist": ds[keep]}
                )

    return pairs.mapInPandas(gemm, schema="src long, dst long, dist double")


def knn_edges(
    emb: DataFrame,
    k: int,
    metric: str = "cosine",
    n_blocks: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """Undirected weighted k-NN graph: (src, dst, weight) with src < dst.

    weight = distance (1-cos or L2), rounded to 6 decimals for cross-engine
    hash stability. Mirrors nx.Graph dedup of the reference edge build
    (graph.py:74-82).
    """
    cand = knn_candidates(emb, k, metric, n_blocks, id_col, vec_col, normalize)
    directed = grouped_topk(
        cand.withColumn("dist_r", F.round("dist", DIST_DECIMALS)),
        keys=["src"],
        order=[F.col("dist_r").asc(), F.col("dst").asc()],
        k=k,
    )
    # weight rounds the RAW distance once (round(round(x,9),6) would create
    # exact .5 midpoints at the 6dp boundary — double-rounding hazard)
    return (
        directed.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.round("dist", WEIGHT_DECIMALS).alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )


def knn_edges_ivf(
    emb: DataFrame,
    k: int = 5,
    every: int | None = None,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    quantizer: str = "stride",
    assign_method: str = "jvm",
) -> DataFrame:
    """Approximate global k-NN graph via IVF buckets — the ANN scale path
    for graph construction (the exact ``knn_edges`` GEMM sweep is O(n^2)
    work even blocked). Every vector is multi-assigned to its ``nprobe``
    nearest coarse cells; per-src top-k is searched only among co-assigned
    vectors, so candidate fan-out is bounded by |corpus| * nprobe^2 /
    n_cells per cell. Output contract and tie-breaks are identical to
    ``knn_edges`` (cosine metric): (src < dst, weight = round(1-cos, 6),
    per-src selection on (round(dist,9) asc, dst asc))."""
    from geometric_aware_retrieval_v2_spark.operators.simsearch import (
        _factored_cos,
        _with_norm,
        make_assign,
        make_centroids,
    )

    cents = make_centroids(emb, every, n_cells, quantizer, id_col, vec_col)
    assign = make_assign(emb, cents, nprobe, assign_method, id_col, vec_col)
    cand = (
        assign.select(F.col(id_col).alias("src"), "cell")
        .join(assign.select(F.col(id_col).alias("dst"), "cell"), "cell")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # norms factored out of the candidate joins: each vector sits in
    # ~k*nprobe candidate pairs, and the inline cosine re-ran its O(d)
    # norm chain once per pair (guide §2.3; bit-identical, see _with_norm)
    va = _with_norm(emb.withColumnRenamed(id_col, "src"), vec_col, "_a", "_na", "src")
    vb = _with_norm(emb.withColumnRenamed(id_col, "dst"), vec_col, "_b", "_nb", "dst")
    dist = (F.lit(1.0) - _factored_cos("_a", "_na", "_b", "_nb")).alias("dist")
    scored = cand.join(va, "src").join(vb, "dst").select("src", "dst", dist)
    directed = grouped_topk(
        scored.withColumn("dist_r", F.round("dist", DIST_DECIMALS)),
        keys=["src"],
        order=[F.col("dist_r").asc(), F.col("dst").asc()],
        k=k,
    )
    return (
        directed.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.round("dist", WEIGHT_DECIMALS).alias("weight"),
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
