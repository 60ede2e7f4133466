"""Similarity search over an embedding column.

  * Brute-force cosine top-k: operators/rerank.cosine_topk (JVM expressions)
    and operators/knn.knn_candidates (blocked GEMM) are the exact baselines.
  * IVF (inverted-file) ANN: deterministic coarse quantizer — every vector is
    assigned to its nearest centroid; a query probes only the nprobe nearest
    centroid cells. Classic IVF-Flat (Jegou et al., PAMI 2011) re-expressed
    as joins + windows, entirely JVM-side.

Centroid choice is deterministic (every C-th vector by id) so results are
reproducible and oracle-checkable; on a real corpus the centroid table would
come from a k-means job — the query plan is identical either way.

Scale: the vector-to-centroid assignment is a broadcast join (centroid table
is small by construction); the probe is a partition-pruned join on cell id.
The cells give the posting-list analogue for vectors: per-cell lists bound
the scored candidates to |corpus| * nprobe / n_cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.operators.rerank import (
    RANK_KEY_DECIMALS,
    SCORE_DECIMALS,
    cosine_expr,
)
from geometric_aware_retrieval_v2_spark.operators.topk import grouped_topk


def centroids_every(emb: DataFrame, every: int = 50, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer: every `every`-th vector by id."""
    return emb.filter(F.col(id_col) % every == 0).select(
        (F.col(id_col) / every).cast("long").alias("cell"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )


def assign_ivf(emb: DataFrame, cents: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """-> (vec_id, cell): the ``nprobe`` nearest centroids by cosine (ties:
    lower cell). nprobe=1 is the classic single-cell assignment; nprobe>1 is
    the multi-assignment used for recall-bounded candidate generation (a
    vector is listed in several cells, so near neighbors meet in >=1)."""
    joined = emb.select(
        F.col(id_col), F.col(vec_col).alias("embedding")
    ).crossJoin(F.broadcast(cents.withColumnRenamed("cvec", "qvec")))
    scored = joined.select(
        id_col, "cell", F.round(cosine_expr("embedding"), RANK_KEY_DECIMALS).alias("sim")
    )
    best = grouped_topk(
        scored, keys=[id_col], order=[F.col("sim").desc(), F.col("cell").asc()], k=nprobe
    )
    return best.select(id_col, "cell")


def ivf_topk(
    emb: DataFrame,
    qvecs: DataFrame,
    every: int = 50,
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (qid, doc_id, sim, rank): ANN top-k probing nprobe cells."""
    cents = centroids_every(emb, every=every, id_col=id_col, vec_col=vec_col)
    assign = assign_ivf(emb, cents, id_col=id_col, vec_col=vec_col)

    # which cells does each query probe?
    qcells = grouped_topk(
        qvecs.crossJoin(F.broadcast(cents)).select(
            "qid",
            "cell",
            F.round(
                cosine_expr("cvec", "qvec"), RANK_KEY_DECIMALS
            ).alias("csim"),
        ),
        keys=["qid"],
        order=[F.col("csim").desc(), F.col("cell").asc()],
        k=nprobe,
    ).select("qid", "cell")

    # score only vectors in probed cells
    cand = (
        qcells.join(assign, "cell")
        .join(emb.select(F.col(id_col), F.col(vec_col).alias("embedding")), id_col)
        .join(qvecs, "qid")
    )
    cos = cosine_expr("embedding")
    scored = cand.select(
        "qid",
        F.col(id_col).alias("doc_id"),
        F.round(cos, RANK_KEY_DECIMALS).alias("sim_key"),
        F.round(cos, SCORE_DECIMALS).alias("sim"),
    )
    return grouped_topk(
        scored, keys=["qid"], order=[F.col("sim_key").desc(), F.col("doc_id").asc()], k=k
    ).select("qid", "doc_id", "sim", "rank")
