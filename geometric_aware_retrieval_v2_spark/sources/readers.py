"""Scans mirroring the reference's loaders, re-expressed declaratively.

Reference parity targets:
  * one-doc-per-line text scan with blank-strip + max_docs limit
    (/root/reference/geoIR/data/fallback.py:47-83, loader.py:27-37)
  * triplet TSV scan dropping malformed rows (/root/reference/geoIR/data/loader.py:9-25)
  * eval JSONL scan (/root/reference/geoIR/cli.py:101-127)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_text_corpus(spark: SparkSession, path: str, max_docs: int | None = None) -> DataFrame:
    """One document per non-blank line -> docs(doc_id, content).

    docIDs reproduce the reference's positional ids (list index after blank
    filtering). Line order within a single text file is well-defined, so we
    use RDD ``zipWithIndex`` (deterministic for a fixed input file set); this
    is a small-corpus parity utility — the at-scale ingest path is the
    content-addressed ``corpus_to_docs``.
    """
    # NOT F.trim: Spark trim strips only 0x20 spaces, while the reference's
    # Python str.strip() strips all whitespace (tabs included)
    lines = spark.read.text(path).select(
        F.regexp_replace("value", r"^\s+|\s+$", "").alias("content")
    )
    lines = lines.filter(F.length("content") > 0)
    if max_docs is not None:
        lines = lines.limit(max_docs)
    indexed = lines.rdd.zipWithIndex().map(lambda t: (t[1], t[0]["content"]))
    return spark.createDataFrame(indexed, schema="doc_id long, content string")


def load_triplets(spark: SparkSession, path: str) -> DataFrame:
    """TSV ``query\\tpos\\tneg``; malformed (short) rows dropped."""
    schema = T.StructType(
        [
            T.StructField("query", T.StringType()),
            T.StructField("pos", T.StringType()),
            T.StructField("neg", T.StringType()),
        ]
    )
    df = spark.read.option("sep", "\t").schema(schema).csv(path)
    return df.where(
        F.col("query").isNotNull() & F.col("pos").isNotNull() & F.col("neg").isNotNull()
    )


EVAL_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType()),
        T.StructField("docs", T.ArrayType(T.StringType())),
        T.StructField("reference", T.StringType()),
        T.StructField("gt_docs", T.ArrayType(T.StringType())),
        T.StructField("new_docs", T.ArrayType(T.StringType())),
    ]
)


def load_eval_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd JSONL eval-case scan (no inference)."""
    return spark.read.schema(EVAL_JSONL_SCHEMA).json(path)
