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
from pyspark.sql import Column, DataFrame


def _epoch_seconds(col: Column) -> Column:
    """Epoch seconds of a timestamp column.  TIMESTAMP_NTZ (how stock
    Spark 4 reads tz-less parquet µs) cannot cast straight to BIGINT
    under ANSI; hop through TIMESTAMP first (legal for both types; the
    session tz is a consistent shift on both sides, so bucket alignment
    holds).  ONE shared spelling for both joins below — the two copies
    this module used to carry could drift (r10 review find)."""
    return col.cast("timestamp").cast("long")


def _bucket_seq(start: Column, end: Column, width: int) -> Column:
    """Every bucket id the half-open interval [start, end) touches.

    Exclusive end: the last included instant is ``end - 1µs`` (exact
    for fractional-second ends, unlike ``sec(end) - 1`` which drops the
    final partial second and can miss a bucket-boundary-straddling
    match).  The upper bound is clamped to at least the first bucket:
    ``F.sequence`` defaults to step -1 when start > stop, so one
    INVERTED interval (end <= start — a corrupt row or epoch-0
    sentinel) otherwise generated a multi-million-element DESCENDING
    bucket array and exploded a single row into executor-OOM territory
    (r10 review find).  One clamped bucket is semantically right: an
    inverted interval can only satisfy the joins' predicates against
    counterparts that span its whole [end, start] gap, and those
    register its start bucket too — while the residual predicate
    filters everything a real interval wouldn't match."""
    first = F.floor(_epoch_seconds(start) / width)
    last = F.floor(
        _epoch_seconds(end - F.expr("INTERVAL 1 MICROSECOND")) / width
    )
    # Spark's greatest() SKIPS nulls, so a bare greatest(first, last)
    # turned NULL-end rows — previously dropped whole at the explode
    # (sequence(first, NULL) is NULL) — into one-bucket rows that
    # shuffle and replicate before the join predicate finally drops
    # them (r10 ADVICE find).  Gate the clamp on end being present so
    # NULL-end intervals still vanish at the explode.
    stop = F.when(last.isNotNull(), F.greatest(first, last))
    return F.explode(F.sequence(first, stop))


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
    to inner.  Range columns are referenced DataFrame-qualified, so a
    column name shared across the two sides (e.g. both carry ``ts``)
    never hits AMBIGUOUS_REFERENCE (r10 review find).
    """
    how = how.replace("outer", "").rstrip("_") or "full"
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    if on is not None:
        in_range = (left[left_time] >= right[right_start]) & (
            left[left_time] < right[right_end]
        )
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
    l_bucketed = left.withColumn(
        "__bucket", F.floor(_epoch_seconds(F.col(left_time)) / w)
    )
    r_bucketed = right.withColumn(
        "__bucket",
        _bucket_seq(F.col(right_start), F.col(right_end), w),
    )
    in_range = (l_bucketed[left_time] >= r_bucketed[right_start]) & (
        l_bucketed[left_time] < r_bucketed[right_end]
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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_width_seconds: int = 86400,
) -> DataFrame:
    """Interval-OVERLAP join (both sides are intervals, half-open):
    pairs where ``l_start < r_end AND r_start < l_end``.

    With an equi key: hash join on the key with the overlap predicate
    folded into the join condition.  Without one, a theta join would be
    a cross product; instead BOTH sides register in every time bucket
    they touch and pairs meet on the bucket key — and each pair is
    emitted exactly ONCE, in the canonical bucket where the later of
    the two intervals starts (no distinct/dedup pass, which would
    shuffle the matched output a second time).  Shuffle is linear in
    rows x buckets-per-interval, never quadratic.
    """
    overlap = (F.col(left_start) < F.col(f"__r_{right_end}")) & (
        F.col(f"__r_{right_start}") < F.col(left_end)
    )
    r = right
    for c in (right_start, right_end):
        r = r.withColumnRenamed(c, f"__r_{c}")
    if on is not None:
        cond = (left[on] == r[on]) & overlap
        return (
            left.join(r, cond, "inner")
            .drop(r[on])
            .withColumnsRenamed({f"__r_{right_start}": right_start,
                                 f"__r_{right_end}": right_end})
        )

    w = bucket_width_seconds
    lb = left.withColumn(
        "__bucket", _bucket_seq(F.col(left_start), F.col(left_end), w)
    )
    rb = r.withColumn(
        "__bucket",
        _bucket_seq(
            F.col(f"__r_{right_start}"), F.col(f"__r_{right_end}"), w
        ),
    )
    canonical = F.col("__bucket") == F.greatest(
        F.floor(_epoch_seconds(F.col(left_start)) / w),
        F.floor(_epoch_seconds(F.col(f"__r_{right_start}")) / w),
    )
    return (
        lb.join(rb, on="__bucket", how="inner")
        .where(overlap & canonical)
        .drop("__bucket")
        .withColumnsRenamed({f"__r_{right_start}": right_start,
                             f"__r_{right_end}": right_end})
    )
