"""Similarity search over an embedding column.

  * Brute-force cosine top-k: operators/rerank.cosine_topk (JVM expressions)
    and operators/knn.knn_candidates (blocked GEMM) are the exact baselines.
  * IVF (inverted-file) ANN: deterministic coarse quantizer — every vector is
    assigned to its nearest centroid; a query probes only the nprobe nearest
    centroid cells. Classic IVF-Flat (Jegou et al., PAMI 2011) re-expressed
    as joins + windows, entirely JVM-side.

Quantizer scale model (round-3 redesign; replaces the linear-centroid
design): ``n_cells`` is a FIXED parameter (default min(sqrt(n), 65536)), so
assignment work is O(n * n_cells * d) — O(n^1.5 d) at the default, never the
O(n^2 d / stride) the round-2 stride quantizer degenerated to — and the
broadcast centroid table is bounded (<= 65536 x d doubles = 32 MB at d=64)
regardless of corpus size. Three quantizers share one query plan:

  * ``centroids_every``   — stride pick (deterministic, oracle-expressible in
    SQL): the small-scale correctness oracle, and the seed for the others.
  * ``centroids_fixed``   — stride derived from a fixed n_cells: the same
    determinism with the production complexity model.
  * ``kmeans_centroids``  — seeded Lloyd's spherical k-means (blocked-GEMM
    assignment + per-cell mean-reduce, a handful of Spark jobs): the
    data-adaptive production quantizer.

Assignment itself has two equivalent physical forms (pytest asserts they
agree): ``assign_ivf`` (broadcast cross join + JVM array ops — the oracle
twin) and ``assign_ivf_gemm`` (pack vectors into per-block matrices, one
NumPy GEMM per block against the broadcast centroid matrix — the 100 TB
path: BLAS instead of |corpus| x n_cells codegen'd array lambdas).

The probe is a partition-pruned join on cell id. The cells give the
posting-list analogue for vectors: per-cell lists bound the scored
candidates to |corpus| * nprobe / n_cells.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.operators.rerank import (
    RANK_KEY_DECIMALS,
    SCORE_DECIMALS,
    _sum_arr,
)
from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk


def _with_norm(df: DataFrame, vec_col: str, out_vec: str, out_norm: str,
               *keep: str) -> DataFrame:
    """Project (keep..., out_vec=cast(vec), out_norm=||vec||) BEFORE a join:
    norms are join-independent, so evaluating them inside a joined frame
    re-runs the O(d) array chain once per matched pair (guide §2.3). The
    downstream ``dot / (na * nb)`` tree is unchanged, so cosines are
    bit-identical to the inline form."""
    v = F.col(vec_col).cast("array<double>")
    n = F.sqrt(_sum_arr(F.transform(v, lambda x: x * x)))
    return df.select(*keep, v.alias(out_vec), n.alias(out_norm))


def _factored_cos(a_vec: str, a_norm: str, b_vec: str, b_norm: str):
    dot = _sum_arr(F.zip_with(F.col(a_vec), F.col(b_vec), lambda x, y: x * y))
    return dot / (F.col(a_norm) * F.col(b_norm))

N_CELLS_CAP = 65536


def centroids_every(emb: DataFrame, every: int = 50, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer: every `every`-th vector by id.

    Small-scale oracle path ONLY: n_cells grows linearly with the corpus
    (n/every), which is exactly the scale flaw ``centroids_fixed`` /
    ``kmeans_centroids`` exist to avoid. Kept because it is expressible as
    one SQL predicate (id % every = 0), which the DuckDB oracle mirrors."""
    return emb.filter(F.col(id_col) % every == 0).select(
        (F.col(id_col) / every).cast("long").alias("cell"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )


def default_n_cells(n: int) -> int:
    """sqrt(n) capped: balances per-cell list length (n/n_cells) against
    assignment work (n * n_cells); the cap bounds the broadcast table."""
    return max(1, min(N_CELLS_CAP, int(math.isqrt(max(n, 1)))))


def centroids_fixed(emb: DataFrame, n_cells: int, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Stride quantizer with a FIXED cell count: stride = ceil(n / n_cells),
    so the centroid table never grows past n_cells no matter the corpus.
    Deterministic and oracle-expressible (the oracle is centroids_every at
    every = ceil(n / n_cells))."""
    n = emb.count()
    every = max(1, -(-n // n_cells))
    return centroids_every(emb, every=every, id_col=id_col, vec_col=vec_col)


def assign_ivf(emb: DataFrame, cents: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """-> (vec_id, cell): the ``nprobe`` nearest centroids by cosine (ties:
    lower cell). nprobe=1 is the classic single-cell assignment; nprobe>1 is
    the multi-assignment used for recall-bounded candidate generation (a
    vector is listed in several cells, so near neighbors meet in >=1)."""
    e = _with_norm(emb, vec_col, "_a", "_na", id_col)
    c = _with_norm(cents, "cvec", "_b", "_nb", "cell")
    # doc-side norm factored out of the crossJoin: inline it re-ran the
    # O(d) chain n_cells times per vector (65536x at the capped quantizer)
    scored = e.crossJoin(F.broadcast(c)).select(
        id_col, "cell",
        F.round(_factored_cos("_a", "_na", "_b", "_nb"),
                RANK_KEY_DECIMALS).alias("sim"),
    )
    best = grouped_topk(
        scored, keys=[id_col], order=[F.col("sim").desc(), F.col("cell").asc()], k=nprobe
    )
    return best.select(id_col, "cell")


def _collect_centroids(cents: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """-> (cell_ids int64, C float64 (n_cells, d)) — driver-side; bounded by
    construction (n_cells <= N_CELLS_CAP under the default sizing)."""
    rows = cents.select("cell", "cvec").collect()
    cells = np.asarray([r.cell for r in rows], dtype=np.int64)
    C = np.asarray([r.cvec for r in rows], dtype=np.float64)
    return cells, C


def assign_ivf_gemm(emb: DataFrame, cents: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", nprobe: int = 1,
                    n_blocks: int = 32) -> DataFrame:
    """GEMM twin of ``assign_ivf`` — same output contract and tie-break
    (round(cos, 9) desc, cell asc), equivalence-tested. Vectors are packed
    into per-block dense matrices (knn._pack_blocks); each block runs ONE
    BLAS matmul against the broadcast centroid matrix instead of
    |block| x n_cells codegen'd array-lambda evaluations. This is the
    production assignment: at n=10^9, d=64, n_cells=65536 the JVM path
    evaluates 6.5e13 per-element lambdas; the GEMM path is ~300 dgemm
    TFLOP-scale calls that saturate the executor's BLAS."""
    from geometric_aware_retrieval_v2_spark.operators.knn import _pack_blocks

    cells, C = _collect_centroids(cents)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    # tie-break parity with assign_ivf needs (rounded sim desc, cell asc) in
    # CELL-ID order, so pre-sort the centroid matrix by cell id
    o = np.argsort(cells)
    cells, Cn = cells[o], Cn[o]
    scale = 10.0 ** RANK_KEY_DECIMALS
    blocks = _pack_blocks(emb, n_blocks, id_col, vec_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                ids = np.frombuffer(row.ids, dtype=np.int64)
                A = np.frombuffer(row.mat, dtype=np.float64).reshape(row.n, row.d)
                An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-30)
                sim = An @ Cn.T
                # HALF_UP at 9dp — bit-matches JVM F.round for the positive
                # and negative non-midpoint values float cosines produce
                simr = np.floor(np.abs(sim) * scale + 0.5) / scale * np.sign(sim)
                kk = min(nprobe, simr.shape[1])
                # per-row top-nprobe on (sim desc, cell asc): argsort on -sim
                # is stable, and columns are already in cell-id order
                part = np.argsort(-simr, axis=1, kind="stable")[:, :kk]
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(ids, kk),
                        "cell": cells[part.ravel()],
                    }
                )

    return blocks.mapInPandas(run, schema=f"{id_col} long, cell long")


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 32,
    init: str = "hash",
) -> DataFrame:
    """Seeded Lloyd's spherical k-means — the data-adaptive production
    quantizer (stride picks are arbitrary w.r.t. the data distribution).

    Init (``init=``):
      * 'hash' (default) — the n_cells vectors with the smallest
        xxhash64(id, seed): a deterministic uniform sample independent of id
        density (works for sparse/hashed id spaces where stride picking does
        not).
      * 'stride' — the centroids_fixed picks (every ceil(n/n_cells)-th id).
        SQL-expressible, so the driver gate can unroll the Lloyd iterations
        as a DuckDB oracle (xxhash64 has no DuckDB twin); the iteration
        machinery being gated is identical for both inits.

    Each iteration: blocked-GEMM assignment (one matmul per packed block)
    emitting per-block per-cell partial sums, a (cell, dim) sum/count
    reduce, then a driver-side renormalize of the (n_cells x d) table —
    O(n * n_cells * d) work and one small shuffle per iteration, n_cells
    rows collected. Assignment sims are rounded HALF_UP at
    RANK_KEY_DECIMALS with ties to the lowest cell — the same key policy as
    assign_ivf/assign_ivf_gemm, which pins bit-parity with the SQL oracle's
    round(cos, 9) window. Empty cells keep their previous centroid. Returns
    (cell, cvec) like the other quantizers; plug into assign_ivf /
    assign_ivf_gemm unchanged."""
    from geometric_aware_retrieval_v2_spark.operators.knn import _pack_blocks

    spark = emb.sparkSession
    if init == "stride":
        rows = (
            centroids_fixed(emb, n_cells, id_col=id_col, vec_col=vec_col)
            .orderBy("cell")
            .select("cvec")
            .collect()
        )
    elif init == "hash":
        rows = (
            emb.select(
                F.col(id_col),
                F.col(vec_col).cast("array<double>").alias("cvec"),
                F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"),
            )
            .orderBy("h", id_col)
            .limit(n_cells)
            .select("cvec")
            .collect()
        )
    else:
        raise ValueError(f"unknown init: {init}")
    C = np.asarray([r.cvec for r in rows], dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    k, d = C.shape

    blocks = _pack_blocks(emb, n_blocks, id_col, vec_col).cache()
    try:
        for _ in range(iters):
            Cn = C

            def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    for row in pdf.itertuples(index=False):
                        A = np.frombuffer(row.mat, dtype=np.float64).reshape(row.n, row.d)
                        An = A / np.maximum(
                            np.linalg.norm(A, axis=1, keepdims=True), 1e-30
                        )
                        sim = An @ Cn.T
                        # HALF_UP at the rank-key precision before argmax:
                        # ties go to the lowest cell (argmax returns the
                        # first max; columns are in cell order) — exactly
                        # the oracle's (round(cos,9) DESC, cell ASC) window
                        scale = 10.0 ** RANK_KEY_DECIMALS
                        simr = (
                            np.floor(np.abs(sim) * scale + 0.5)
                            / scale
                            * np.sign(sim)
                        )
                        best = np.argmax(simr, axis=1)
                        cells_here = np.unique(best)
                        sums = np.zeros((len(cells_here), row.d))
                        np.add.at(sums, np.searchsorted(cells_here, best), An)
                        cnt = np.bincount(
                            np.searchsorted(cells_here, best), minlength=len(cells_here)
                        )
                        yield pd.DataFrame(
                            {
                                "cell": cells_here.astype(np.int64),
                                "cnt": cnt.astype(np.int64),
                                "vsum": list(sums),
                            }
                        )

            agg = (
                blocks.mapInPandas(
                    partials, schema="cell long, cnt long, vsum array<double>"
                )
                .select("cell", "cnt", F.posexplode("vsum").alias("pos", "v"))
                .groupBy("cell", "pos")
                .agg(F.sum("v").alias("s"), F.sum("cnt").alias("c"))
                .collect()
            )
            newC = C.copy()  # empty cells keep their previous centroid
            S = np.zeros((k, d))
            n_in = np.zeros(k)
            for r in agg:
                S[r.cell, r.pos] = r.s
                n_in[r.cell] = r.c
            nz = n_in > 0
            newC[nz] = S[nz] / np.maximum(
                np.linalg.norm(S[nz], axis=1, keepdims=True), 1e-30
            )
            C = newC
    finally:
        blocks.unpersist()

    # plain Python values: the non-Arrow createDataFrame path (driver
    # sessions without spark.sql.execution.arrow enabled) rejects numpy
    # scalars inside array<double>
    return spark.createDataFrame(
        [(int(i), row) for i, row in enumerate(C.tolist())],
        schema="cell long, cvec array<double>",
    )


def make_centroids(
    emb: DataFrame,
    every: int | None = None,
    n_cells: int | None = None,
    quantizer: str = "stride",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantizer dispatch shared by all IVF consumers (ivf_topk,
    knn_edges_ivf, embedding_neardup_pairs_ivf):

      * ``every`` set        -> centroids_every (the SQL-oracle path; pins
                                the exact round-2 behavior for gated queries)
      * quantizer='kmeans'   -> kmeans_centroids at n_cells (data-adaptive)
      * otherwise            -> centroids_fixed at n_cells

    n_cells defaults to min(sqrt(n), 65536) — the fixed-complexity model."""
    if every is not None:
        return centroids_every(emb, every=every, id_col=id_col, vec_col=vec_col)
    cells = n_cells or default_n_cells(emb.count())
    if quantizer == "kmeans":
        return kmeans_centroids(emb, cells, id_col=id_col, vec_col=vec_col)
    if quantizer != "stride":
        raise ValueError(f"unknown quantizer: {quantizer}")
    return centroids_fixed(emb, cells, id_col=id_col, vec_col=vec_col)


def make_assign(
    emb: DataFrame,
    cents: DataFrame,
    nprobe: int,
    assign_method: str = "jvm",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assignment dispatch: 'jvm' (oracle twin) or 'gemm' (production BLAS
    path) — equivalence-tested in tests/test_simsearch_quantizer.py."""
    if assign_method == "gemm":
        return assign_ivf_gemm(emb, cents, id_col=id_col, vec_col=vec_col, nprobe=nprobe)
    if assign_method != "jvm":
        raise ValueError(f"unknown assign_method: {assign_method}")
    return assign_ivf(emb, cents, id_col=id_col, vec_col=vec_col, nprobe=nprobe)


def ivf_topk(
    emb: DataFrame,
    qvecs: DataFrame,
    every: int | None = None,
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    quantizer: str = "stride",
    assign_method: str = "jvm",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """-> (qid, doc_id, sim, rank): ANN top-k probing nprobe cells.

    ``centroids``: a precomputed (cell, cvec) quantizer table (e.g. from
    kmeans_centroids) — when given, the quantizer parameters are ignored and
    the table plugs straight into assignment + probing."""
    cents = (
        centroids
        if centroids is not None
        else make_centroids(emb, every, n_cells, quantizer, id_col, vec_col)
    )
    assign = make_assign(emb, cents, 1, assign_method, id_col, vec_col)

    # which cells does each query probe? (centroid norms factored: inline
    # they were re-evaluated once per query per cell)
    qcells = grouped_topk(
        _with_norm(qvecs, "qvec", "_b", "_nb", "qid")
        .crossJoin(F.broadcast(_with_norm(cents, "cvec", "_a", "_na", "cell")))
        .select(
            "qid",
            "cell",
            F.round(
                _factored_cos("_a", "_na", "_b", "_nb"), RANK_KEY_DECIMALS
            ).alias("csim"),
        ),
        keys=["qid"],
        order=[F.col("csim").desc(), F.col("cell").asc()],
        k=nprobe,
    ).select("qid", "cell")

    # score only vectors in probed cells; norms factored out of the joins
    # (a vector met by several probed cells re-scored its norm per pair)
    cand = (
        qcells.join(assign, "cell")
        .join(_with_norm(emb, vec_col, "_a", "_na", id_col), id_col)
        .join(_with_norm(qvecs, "qvec", "_b", "_nb", "qid"), "qid")
    )
    cos = _factored_cos("_a", "_na", "_b", "_nb")
    scored = cand.select(
        "qid",
        F.col(id_col).alias("doc_id"),
        F.round(cos, RANK_KEY_DECIMALS).alias("sim_key"),
        F.round(cos, SCORE_DECIMALS).alias("sim"),
    )
    return grouped_topk(
        scored, keys=["qid"], order=[F.col("sim_key").desc(), F.col("doc_id").asc()], k=k
    ).select("qid", "doc_id", "sim", "rank")
