"""Readers over the driver-provided parquet tables (TESTDATA.md) and the
normalization step that turns any corpus-shaped table into the engine's
canonical ``docs(doc_id long, content string, lang string)`` frame.

Reference parity: the reference models a corpus as ``List[str]`` with implicit
positional docIDs (/root/reference/geoIR/retrieval/index.py:97-101). The
engine's canonical docs frame replaces position with an explicit stable id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver parquet table. Column pruning + predicate pushdown are
    Catalyst's job — callers select/filter and the parquet scan shrinks."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def docs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> canonical docs frame."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("text").alias("content"), "lang")
    )
