"""Deterministic hashing encoder: text -> L2-normalized float vector.

Stands in for the reference's HF transformer encoder
(/root/reference/geoIR/retrieval/encoder.py:106-155), which cannot run
offline. Classic feature-hashing (Weinberger et al., ICML 2009): each token
hashes to a dimension and a sign; the bag vector is L2-normalized, so cosine
similarity is well-defined. Pure function of the text — partition-invariant,
reproducible inside both Spark UDFs and the single-node test oracle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def embed_text(text: str, dim: int = 64) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float64)
    for tok in text.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        idx = h % dim
        sign = 1.0 if (h >> 8) & 1 else -1.0
        vec[idx] += sign
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def encode_queries(queries: DataFrame, dim: int = 64, text_col: str = "text") -> DataFrame:
    """(qid, text) -> (qid, qvec array<double>), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "qvec": [embed_text(t, dim).tolist() for t in pdf[text_col]],
                }
            )

    return queries.select("qid", text_col).mapInPandas(
        run, schema="qid long, qvec array<double>"
    )
