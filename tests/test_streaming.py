"""Streaming correctness contract: stream(finite input) == batch(same input)
for windowed aggregates, session windows, and the custom stateful operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geometric_aware_retrieval_v2_spark.streaming import ingest
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream(spark):
    return ingest.read_events_stream(spark, SF_SMOKE)


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_hourly_counts_stream_equals_batch(spark, events_stream, events_batch):
    got = ingest.run_to_memory(
        ingest.hourly_counts_stream(events_stream), "hourly_mem", "complete"
    )
    want = (
        events_batch.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    cols = ["hour_epoch", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_windows_stream(spark, events_stream, events_batch):
    got = ingest.run_to_memory(
        ingest.user_sessions_stream(events_stream), "sessions_mem", "complete"
    )
    # sanity: every user appears; session bounds ordered; event counts add up
    assert got.count() > 0
    assert got.filter(F.col("session_end") < F.col("session_start")).count() == 0
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == events_batch.count()


def test_stateful_running_counts(spark, events_stream, events_batch):
    got = ingest.run_to_memory(
        ingest.running_user_counts_stream(events_stream), "running_mem", "update"
    )
    # with availableNow the final update per user equals the batch totals
    final = got.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    want = events_batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    cols = ["user_id", "n_events"]
    assert _rows(final, cols) == _rows(want, cols)
