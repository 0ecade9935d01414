"""Interval (range) join: match left timestamps into right [start, end)
intervals.

Two regimes:

- **With an equi key** (the common time-series case — device/user id):
  a plain hash equi-join on the key with the range as a post-join
  filter.  Catalyst executes this as a shuffled hash join; no
  explosion.
- **Without an equi key**: a naive theta-join is a nested-loop cross
  product.  ``interval_join`` instead BUCKETS both sides into
  fixed-width time buckets: each interval registers in every bucket it
  overlaps, each left row in exactly one, and the join becomes an
  equi-join on bucket + residual filter.  Shuffle is O(rows + intervals
  × avg_buckets_per_interval) — linear, no cross product.  Pick
  ``bucket_width`` near the typical interval length: too small explodes
  interval replication, too large degrades to many false candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_width_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals containing their timestamp
    (start inclusive, end exclusive)."""
    in_range = (F.col(left_time) >= F.col(right_start)) & (
        F.col(left_time) < F.col(right_end)
    )
    if on is not None:
        return left.join(right, on=on, how=how).where(in_range)

    w = bucket_width_seconds
    l_bucketed = left.withColumn(
        "__bucket", F.floor(F.col(left_time).cast("long") / w)
    )
    r_bucketed = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start).cast("long") / w),
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach into the next bucket.
                F.floor((F.col(right_end).cast("long") - 1) / w),
            )
        ),
    )
    return (
        l_bucketed.join(r_bucketed, on="__bucket", how=how)
        .where(in_range)
        .drop("__bucket")
    )
