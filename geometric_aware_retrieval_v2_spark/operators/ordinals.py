"""Distributed dense-ordinal assignment (document identifier reordering).

Public practice in inverted-index engines (e.g. docID reassignment literature:
Silvestri, "Sorting out the document identifier assignment problem", ECIR
2007): remap sparse/hashed docIDs to dense ordinals sorted by a locality key.
We sort by (doc_len, doc_id), which buys two things at once:

  * delta gaps become tiny dense integers (~1 byte varbyte instead of ~9 for
    xxhash64 ids) — a ~5x posting-payload shrink;
  * doc_len is nearly constant within a posting block, so the block's
    (max_tf, min_dl) upper bound is tight and block-max WAND actually prunes.

The rank is computed WITHOUT a global single-task sort: range-repartition on
the key, count per range, prefix-sum the counts driver-side (tiny), then each
partition assigns offset + local rank. The resulting ordinal is the exact
global rank — independent of partition boundaries — so the docmap is
deterministic under any input partitioning (permutation-invariance test).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_ordinals(
    dstats: DataFrame, n_ranges: int = 8, keys: tuple[str, str] = ("doc_len", "doc_id")
) -> DataFrame:
    """(doc_id, doc_len, ...) -> docmap(doc_id, ord) with ord = dense global
    rank by ``keys`` (unique because doc_id is)."""
    k1, k2 = keys
    parts = dstats.select(k1, k2).repartitionByRange(n_ranges, F.col(k1), F.col(k2))
    parts = parts.sortWithinPartitions(k1, k2).withColumn(
        "pid", F.spark_partition_id()
    )
    sizes = {r.pid: r.n for r in parts.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["pid"].iat[0])] + local
            yield pd.DataFrame(
                {
                    "doc_id": pdf[k2].to_numpy(),
                    "ord": base + pd.RangeIndex(len(pdf)).to_numpy(),
                }
            )
            local += len(pdf)

    return parts.mapInPandas(assign, schema="doc_id long, ord long")
