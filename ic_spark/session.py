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
        # parallelismFirst stays at Spark's default (true): the r13
        # interleaved A/B of `false` (coalesce toward the advisory
        # size) serialized every sort-merge row at fixture scale —
        # mor_full_merge_on_read 0.98 -> 1.75 s (3/3 pairs) because the
        # 20 MB join inputs coalesced to one partition and the
        # sort-merge ran single-threaded.  Negative result recorded in
        # OPTIMIZATION_r13.md; the knob remains env-overridable for
        # clusters whose shuffles are block-count-bound.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_BYTES", "64m"),
        )
        # Let AQE rewrite a sort-merge join to a shuffled-hash join at
        # runtime when every post-shuffle partition of the build side
        # is small (default 0 = never; guide §3.1).  The per-task hash
        # build is bounded by the post-shuffle partition size, so this
        # cannot OOM where the sort-merge would not have spilled
        # anyway.  r13 interleaved A/B: mor_full_merge_on_read's two
        # delete-side SMJs become SHJs, 0.98 -> 0.81 s (3/3 pairs);
        # dedup_token_jaccard/prepare_training improve, nothing
        # regresses (VERDICT r12 #4).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP_BYTES", "64m"),
        )
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
