"""As-of join (point-in-time join).

For each left row, attach the most recent right row with
``right.time <= left.time`` within the same key — the standard
time-series "last known value" join (DuckDB/kdb ASOF JOIN semantics).

Spark-first strategy: union-and-window, NOT a range-join:

  1. tag right rows, union both sides on (key, time) schema;
  2. one window per key ordered by (time, side) carries the last
     non-null right payload forward (``last(..., ignorenulls=True)``);
  3. keep left rows.

Cost = ONE shuffle on the key (the window sort) — same order as a
plain join — versus the naive inequality-join which explodes to
O(left × right-per-key) then re-aggregates.  At 100 TB the union
approach scales linearly and AQE handles key skew; the only caveat is
a single hot key serializing into one window partition (salt upstream
if a key exceeds a partition's memory).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    suffix: str = "",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join: latest right row at-or-before the left time.

    ``allow_exact_matches=False`` makes it strictly-before (matches
    pandas.merge_asof semantics switch).
    """
    payload = right_payload or [c for c in right.columns if c not in (on, right_time)]
    if not payload:
        return left.select(*left.columns)

    left_cols = left.columns
    from pyspark.sql import types as T

    # ONE struct carries the whole right payload so the fill picks the
    # matched right ROW atomically: per-column last(..., ignorenulls)
    # let a matched row's NULL column inherit an OLDER row's value —
    # a franken-row mixing two right rows (r10 review find; DuckDB's
    # ASOF JOIN returns the matched row whole, NULLs included).
    r_struct_t = T.StructType([right.schema[c] for c in payload])
    # Common unioned schema: key, event time, side marker, left cols,
    # right payload struct (null on the left side).
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # At equal times, __side orders right (0) before left (1) so an
    # exact-time right row is visible to the left row; flip the order
    # for strictly-before semantics.
    side_order = F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, -1 if not allow_exact_matches else 0)
    )
    filled = unioned.select(
        "*",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__f"),
    )
    out_names = [f"{c}{suffix}" if c in left_cols else c for c in payload]
    return filled.where(F.col("__side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[
            F.col("__f").getField(c).alias(n)
            for c, n in zip(payload, out_names)
        ],
    )
