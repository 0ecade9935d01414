"""Structured Streaming slice: stream (availableNow) == batch semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ic_spark.streaming.windows import (
    dedup_within_watermark,
    run_to_memory_sink,
    session_window_agg,
    stream_events,
    tumbling_window_counts,
)
from ic_spark.tables import load_table

from tests.conftest import SF_DIR, normalize


def batch_events(spark):
    return load_table(spark, SF_DIR, "events")


def test_tumbling_stream_equals_batch(spark):
    stream = tumbling_window_counts(stream_events(spark, SF_DIR))
    got = run_to_memory_sink(spark, stream, "t_tumble", "complete")
    want = tumbling_window_counts(batch_events(spark))
    assert normalize(map(tuple, got.collect())) == normalize(map(tuple, want.collect()))


def test_session_window_stream_equals_batch(spark):
    stream = session_window_agg(stream_events(spark, SF_DIR))
    got = run_to_memory_sink(spark, stream, "t_session", "complete")
    want = session_window_agg(batch_events(spark))
    assert normalize(map(tuple, got.collect())) == normalize(map(tuple, want.collect()))


def test_streaming_dedup(spark):
    stream = dedup_within_watermark(stream_events(spark, SF_DIR))
    got = run_to_memory_sink(spark, stream, "t_dedup", "append")
    n_ids = batch_events(spark).select("event_id").distinct().count()
    assert got.count() == n_ids
