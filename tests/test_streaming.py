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


def test_stateful_running_totals(spark):
    """applyInPandasWithState: final per-user totals == batch aggregate."""
    import pyspark.sql.functions as F

    from ic_spark.streaming.stateful import running_user_totals

    stream = running_user_totals(stream_events(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends a row per (batch, user); the LAST row per user
    # is the final running total.
    got = (
        spark.table("t_stateful")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value"))
    )
    want = (
        batch_events(spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    assert normalize(map(tuple, got.collect())) == normalize(map(tuple, want.collect()))


def test_sliding_window_stream_equals_batch(spark):
    from ic_spark.streaming.windows import sliding_window_counts

    stream = sliding_window_counts(stream_events(spark, SF_DIR))
    got = run_to_memory_sink(spark, stream, "t_slide", "complete")
    want = sliding_window_counts(batch_events(spark))
    assert normalize(map(tuple, got.collect())) == normalize(map(tuple, want.collect()))


def test_stream_static_join_equals_batch(spark):
    from ic_spark.streaming.joins import stream_static_join

    static = (
        batch_events(spark)
        .select("user_id")
        .distinct()
        .withColumn("flag", F.col("user_id") % 2 == 0)
    )
    stream = stream_static_join(
        stream_events(spark, SF_DIR).select("event_id", "user_id", "value"),
        static,
        on="user_id",
    )
    got = run_to_memory_sink(spark, stream, "t_ss_join", "append")
    want = stream_static_join(
        batch_events(spark).select("event_id", "user_id", "value"), static, on="user_id"
    )
    assert normalize(map(tuple, got.collect())) == normalize(map(tuple, want.collect()))


@pytest.mark.slow
def test_stream_stream_interval_join_equals_batch(spark):
    """Watermarked stream-stream join with a mandatory time bound ==
    the equivalent batch interval join (availableNow drains both
    sides)."""
    from ic_spark.streaming.joins import stream_stream_interval_join

    def left_side(df):
        return df.select("event_id", "user_id", F.col("ts").alias("l_ts"))

    def right_side(df):
        return df.select(
            F.col("event_id").alias("r_event_id"),
            "user_id",
            F.col("ts").alias("r_ts"),
            "value",
        )

    stream = stream_stream_interval_join(
        left_side(stream_events(spark, SF_DIR)),
        right_side(stream_events(spark, SF_DIR)),
        key="user_id",
        left_time="l_ts",
        right_time="r_ts",
        max_delay="10 minutes",
    )
    got = run_to_memory_sink(spark, stream, "t_ssij", "append")

    b = batch_events(spark)
    lb, rb = left_side(b), right_side(b)
    cond = (
        (lb["user_id"] == rb["user_id"])
        & (rb["r_ts"] >= lb["l_ts"] - F.expr("INTERVAL 10 minutes"))
        & (rb["r_ts"] <= lb["l_ts"])
    )
    want = lb.join(rb, cond).select(
        lb["user_id"], "event_id", "l_ts", "r_event_id", "r_ts", "value"
    )
    got = got.select("user_id", "event_id", "l_ts", "r_event_id", "r_ts", "value")
    assert got.count() == want.count() > 0
    assert normalize(map(tuple, got.collect())) == normalize(map(tuple, want.collect()))


def test_stateful_last_ts_never_regresses():
    """last_ts is part of STATE, not recomputed per batch: a
    late-but-in-watermark event must not move the emitted 'last event
    time' backwards while the counters advance (r9 review find).
    Driven directly through the state-update function with a fake
    GroupState (the streaming harness around it is covered above)."""
    import datetime as dt

    import pandas as pd

    from ic_spark.streaming.stateful import _update_user_state

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    t10 = dt.datetime(2024, 6, 1, 10)
    t9 = dt.datetime(2024, 6, 1, 9)
    b1 = pd.DataFrame({"value": [1.0], "ts": [pd.Timestamp(t10)]})
    (out1,) = _update_user_state((7,), [b1], st)
    assert out1["last_ts"][0] == t10
    # late event: counters advance, last_ts must NOT regress
    b2 = pd.DataFrame({"value": [2.0], "ts": [pd.Timestamp(t9)]})
    (out2,) = _update_user_state((7,), [b2], st)
    assert out2["n_events"][0] == 2
    assert out2["last_ts"][0] == t10, "last event time went backwards"


def test_interval_join_right_outer_keeps_right_key(spark):
    """rightOuter/fullOuter: an unmatched right row has a NULL left
    side, so the collapsed key must coalesce to the RIGHT key instead
    of emitting NULL (r9 review find).  withWatermark is a no-op on
    batch frames, so the same code path is testable in batch."""
    import datetime as dt

    from ic_spark.streaming.joins import stream_stream_interval_join

    t = dt.datetime(2024, 6, 1, 12)
    left = spark.createDataFrame(
        [(1, t, "l1")], "user_id long, l_ts timestamp, l_tag string"
    )
    right = spark.createDataFrame(
        [
            (1, t, "r1"),  # matches
            (99, t, "r-unmatched"),  # no left row
        ],
        "user_id long, r_ts timestamp, r_tag string",
    )
    out = stream_stream_interval_join(
        left, right, key="user_id",
        left_time="l_ts", right_time="r_ts",
        max_delay="10 minutes", how="rightOuter",
    )
    rows = {r.r_tag: r.user_id for r in out.collect()}
    assert rows["r1"] == 1
    assert rows["r-unmatched"] == 99, "unmatched right row lost its key"
