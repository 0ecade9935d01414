"""SparkSession factory.

Defaults are tuned for the test environment (local[32], 128 GiB) but the
settings themselves are the ones that matter on a real cluster: AQE on
(runtime join-strategy switching + skew-join splitting), shuffle
partitions sized to cores, Arrow enabled for the pandas_udf boundary.

At 100 TB scale the same session settings hold; only
``spark.sql.shuffle.partitions`` (or AQE's coalesce target) and
executor sizing change — both are externalized via env vars.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "ic_spark", shuffle_partitions: str | None = None) -> SparkSession:
    """Build (or reuse) the SparkSession with scale-appropriate defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{DEFAULT_CPUS}]")
        # AQE: runtime re-plan — coalesce small shuffle partitions, switch
        # sort-merge -> broadcast when a side turns out small, split skewed
        # partitions. Strictly better than static planning at any scale.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
        # Arrow for the pandas_udf / applyInPandas boundary (vectorized
        # transfer instead of pickled rows).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in the fixtures are TIMESTAMP (no tz); keep session UTC
        # so DuckDB oracle comparisons are stable.
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off: the oracle (DuckDB) and the reference both use
        # permissive SQL semantics for casts/overflow.
        .config("spark.sql.ansi.enabled", "false")
        # The events fixture stores TIMESTAMP(NANOS); Spark has no ns
        # timestamps (SURVEY §1.2) — read as long and convert at load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
