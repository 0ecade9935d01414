"""Streaming windowed aggregations with watermarks.

The reference is batch-only (its scan declares
``Boundedness::Bounded``, reference
core/src/executor/datafusion/iceberg_file_task_scan.rs:93-98); the
declared engine surface adds the streaming slice via Structured
Streaming (SURVEY.md §2.2).

Design: every transformation here takes a DataFrame and works
identically on a batch frame or a ``readStream`` frame — the batch
query surface (ic_spark.queries.analytics) and the streaming path
share semantics, and tests verify stream (availableNow over the
parquet fixture) == batch for each window shape.

Watermarks bound state: at 100 TB/day ingest, an unbounded window
state is the failure mode — every op here requires an explicit
watermark delay.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ic_spark.tables import table_path


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture (one-file-per-trigger keeps
    availableNow deterministic).  ts arrives as long nanos (the fixture
    is TIMESTAMP(NANOS)); truncate to micros exactly like the batch
    loader."""
    from ic_spark.tables import ensure_session_confs

    ensure_session_confs(spark)
    batch_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # FileStreamSource needs a directory; point it at sf_dir and filter
    # to the events file.
    df = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        from ic_spark.tables import nanos_ts_to_micros

        df = nanos_ts_to_micros(df)
    elif ts_type == "timestamp_ntz":
        # withWatermark requires TIMESTAMP (with tz).  The session tz is
        # pinned to UTC (ensure_session_confs), so this cast preserves
        # the wall clock and stream results collect identically to the
        # batch path that windows the NTZ column directly.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-close semantics match the batch
    sessionization query in ic_spark.queries.analytics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory_sink(
    spark: SparkSession, streaming_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming query with availableNow (process everything,
    then stop) into an in-memory table; returns the result as a batch
    DataFrame.  Used by tests to assert stream == batch.
    ``output_mode``: 'complete' for aggregations, 'append' for
    row-level ops (dedup, map-only)."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
