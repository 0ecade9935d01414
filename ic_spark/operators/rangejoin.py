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
    (start inclusive, end exclusive).

    The range predicate is part of the JOIN CONDITION, not a post-join
    filter — a post-join ``.where`` on a left/full join would silently
    drop the null-extended unmatched rows, degenerating the outer join
    to inner.
    """
    how = how.replace("outer", "").rstrip("_") or "full"
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    in_range = (F.col(left_time) >= F.col(right_start)) & (
        F.col(left_time) < F.col(right_end)
    )
    if on is not None:
        cond = (left[on] == right[on]) & in_range
        joined = left.join(right, cond, how)
        # Collapse the duplicated key column the way `on=<name>` would:
        # for outer joins the surviving side's key may be null.
        if how == "full":
            key = F.coalesce(left[on], right[on])
        elif how == "right":
            key = right[on]
        else:
            key = left[on]
        return joined.select(
            key.alias(on),
            *[left[c] for c in left.columns if c != on],
            *[right[c] for c in right.columns if c != on],
        )

    w = bucket_width_seconds

    def _epoch_seconds(name: str):
        # TIMESTAMP_NTZ (how stock Spark 4 reads tz-less parquet µs)
        # cannot cast straight to BIGINT under ANSI; hop through
        # TIMESTAMP first (legal for both types; session tz is a
        # consistent shift on both sides, so bucket alignment holds).
        return F.col(name).cast("timestamp").cast("long")

    l_bucketed = left.withColumn(
        "__bucket", F.floor(_epoch_seconds(left_time) / w)
    )
    r_bucketed = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch_seconds(right_start) / w),
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach into the next bucket.
                F.floor((_epoch_seconds(right_end) - 1) / w),
            )
        ),
    )
    inner = (
        l_bucketed.join(r_bucketed, on="__bucket", how="inner")
        .where(in_range)
        .drop("__bucket")
    )
    if how == "inner":
        return inner
    if how == "left":
        # Bucket replication makes a direct outer join wrong (one
        # null-extended row per probed bucket).  Instead: inner matches
        # plus an anti-join for left rows with no in-range interval.
        unmatched = l_bucketed.join(
            r_bucketed,
            (l_bucketed["__bucket"] == r_bucketed["__bucket"]) & in_range,
            "left_anti",
        ).drop("__bucket")
        null_right = unmatched.select(
            "*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in right.schema]
        )
        return inner.unionByName(null_right)
    raise ValueError(
        f"interval_join without an equi key supports how='inner'/'left', got {how!r}"
    )
