"""Grouped top-k.

``row_number`` over a (partitionBy keys, orderBy measure) window,
filtered to ``<= k``.  Spark executes this with partial top-k pushed
into the shuffle (``WindowGroupLimit`` since Spark 3.5): each map task
keeps only k rows per group before shuffling, so the shuffle volume is
O(groups × k), not O(rows) — the right plan at any scale.

Always pass deterministic tiebreak columns: at 100 TB ties WILL occur,
and a non-deterministic top-k breaks retried-task consistency (Spark
may recompute a lost partition and get different rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def grouped_top_k(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
