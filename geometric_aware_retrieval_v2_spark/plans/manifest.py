"""Iceberg-style manifest table: per-partition lineage, metrics, and the
checkpoint/resume contract (SURVEY.md B10; BASELINE.json "checkpoint-resumable
with per-partition lineage and metrics logged to an Iceberg manifest table").

No Iceberg runtime jar exists in this environment, so the manifest is a plain
append-only parquet directory with Iceberg-like semantics: every completed
build partition appends one immutable row; a partition is *committed* iff its
row exists with status='done' — data files are written first, the manifest row
last, so a crash between the two leaves an orphan file that is simply
rewritten on resume (idempotent: same input partition -> same bytes). With a
real Iceberg catalog this module swaps to `spark.table(...)` appends
unchanged.

The reference's analogue is the run-dir + config-dump + result-save scaffold
(/root/reference/geoIR/core/runner.py:34-80,113-148) and the report bundle
(/root/reference/geoIR/retrieval/index.py:241-255) — single-process, no
partition granularity; the manifest generalizes both.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "run_id string, stage string, partition_id int, input_fingerprint string, "
    "rows long, bytes long, wall_ms long, status string, output_path string, "
    "committed_at double"
)


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def append_manifest(spark: SparkSession, index_dir: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(rows, schema=MANIFEST_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(manifest_path(index_dir))


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame | None:
    path = manifest_path(index_dir)
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def completed_partitions(spark: SparkSession, index_dir: str, stage: str) -> dict[int, str]:
    """partition_id -> input_fingerprint for committed partitions of a stage."""
    m = read_manifest(spark, index_dir)
    if m is None:
        return {}
    rows = (
        m.filter((m.stage == stage) & (m.status == "done"))
        .select("partition_id", "input_fingerprint")
        .collect()
    )
    return {r.partition_id: r.input_fingerprint for r in rows}


def manifest_row(
    run_id: str,
    stage: str,
    partition_id: int,
    input_fingerprint: str,
    rows: int,
    n_bytes: int,
    wall_ms: int,
    output_path: str,
    status: str = "done",
) -> tuple:
    return (
        run_id,
        stage,
        partition_id,
        input_fingerprint,
        rows,
        n_bytes,
        wall_ms,
        status,
        output_path,
        time.time(),
    )
