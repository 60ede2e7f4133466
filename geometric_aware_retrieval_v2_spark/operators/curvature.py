"""Forman-Ricci curvature over a weighted undirected edge list — fully
declarative (joins + aggregations), no UDF anywhere.

Reference parity: forman_ricci_weighted
(/root/reference/geoIR/geo/curvature.py:14-68):

    kappa(u,v) = w_uv*(1/s_u + 1/s_v)
                 - sum_{e=(u,x), x!=v} w_uv / sqrt(w_uv * w_ux)
                 - sum_{e=(v,x), x!=u} w_uv / sqrt(w_uv * w_vx)

with s_u the weighted degree ("strength"). The reference loops per edge per
neighbor, O(E*d_max) single-threaded. Distributed re-design: the neighbor
sums factor through per-node aggregates —

    sum_{e=(u,x), x!=v} w_uv/sqrt(w_uv*w_ux)
        = sqrt(w_uv) * (r_u - 1/sqrt(w_uv)),   r_u := sum_{e at u} 1/sqrt(w_e)

so curvature needs only one explode + one hash aggregate (node stats s, r)
and two broadcast-able joins back to the edge list. O(E) total work, two
shuffles, scales to any graph. Zero-weight edges and zero-strength nodes are
skipped exactly as in the reference (curvature.py:41-48).

Also here: per-node average curvature (lazy `_avg_curv` memo of the
reference, /root/reference/geoIR/retrieval/index.py:150-161) and the
Ollivier dispatch note — the reference's Ollivier path needs an optional
external package and falls back to Forman (curvature.py:127-142); the engine
implements the always-available Forman path and records that choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KAPPA_DECIMALS = 6


def node_strengths(edges: DataFrame) -> DataFrame:
    """(node, strength, rsqrt_sum) from undirected (src, dst, weight)."""
    both = edges.select(
        F.explode(F.array("src", "dst")).alias("node"), "weight"
    )
    return both.groupBy("node").agg(
        F.sum("weight").alias("strength"),
        F.sum(F.lit(1.0) / F.sqrt("weight")).alias("rsqrt_sum"),
    )


def forman_curvature(edges: DataFrame, rounded: bool = True) -> DataFrame:
    """-> (src, dst, kappa); skips w=0 edges / s=0 endpoints like the ref.

    ``rounded=False`` keeps raw float64 kappa — required by downstream
    averaging (rounding first would put means exactly on round-6 midpoints,
    where engines disagree)."""
    e = edges.filter(F.col("weight") != 0)
    stats = node_strengths(e)
    su = stats.select(
        F.col("node").alias("src"),
        F.col("strength").alias("s_u"),
        F.col("rsqrt_sum").alias("r_u"),
    )
    sv = stats.select(
        F.col("node").alias("dst"),
        F.col("strength").alias("s_v"),
        F.col("rsqrt_sum").alias("r_v"),
    )
    j = e.join(F.broadcast(su), "src").join(F.broadcast(sv), "dst")
    w = F.col("weight")
    sqrt_w = F.sqrt(w)
    term1 = w * (F.lit(1.0) / F.col("s_u") + F.lit(1.0) / F.col("s_v"))
    sum_u = sqrt_w * (F.col("r_u") - F.lit(1.0) / sqrt_w)
    sum_v = sqrt_w * (F.col("r_v") - F.lit(1.0) / sqrt_w)
    kappa = term1 - sum_u - sum_v
    return (
        j.filter((F.col("s_u") != 0) & (F.col("s_v") != 0))
        .select(
            "src",
            "dst",
            (F.round(kappa, KAPPA_DECIMALS) if rounded else kappa).alias("kappa"),
        )
    )


def node_avg_curvature(curv_raw: DataFrame) -> DataFrame:
    """Per-node mean of incident-edge curvatures -> (node, avg_kappa).
    Feed RAW kappas (forman_curvature(rounded=False)); the mean is rounded
    once here."""
    return (
        curv_raw.select(F.explode(F.array("src", "dst")).alias("node"), "kappa")
        .groupBy("node")
        .agg(F.round(F.avg("kappa"), KAPPA_DECIMALS).alias("avg_kappa"))
    )
