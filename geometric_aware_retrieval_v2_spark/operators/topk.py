"""Grouped top-k: the engine's single implementation of "per-key best k".

Physically this is Spark's partial top-k pattern: ``row_number`` over a
window is executed as a per-partition sort + final merge per key; with AQE on,
skewed key groups are split upstream. For the *global* (ungrouped) top-k the
plan collapses to ``TakeOrderedAndProject`` — no full sort materialized.

Rank keys are always pinned with a deterministic tie-break column so results
are stable across partitionings (SURVEY.md §4 "rank-identical floats").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
