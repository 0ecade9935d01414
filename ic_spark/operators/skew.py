"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (on in this engine's session) handles most
skew at runtime; these explicit operators cover the cases AQE can't:

- ``salted_join`` — a *broadcast-infeasible* join where one key holds a
  macroscopic share of the left side.  Salting the left key into
  ``salt_n`` shards and EXPLODING the right side across the shards
  turns one hot partition into ``salt_n`` even ones.  Cost: right side
  duplicated ``salt_n`` times — use only when the right side is far
  smaller than the hot key's row count.
- ``two_stage_agg`` — aggregation where one group dominates: partial
  agg on (key, salt) first, then final agg on key.  For algebraic
  aggregates Spark's map-side partial aggregation already does this
  within partitions; the explicit form helps when the combine must
  happen across partitions before the final shuffle (e.g. collect-like
  or high-cardinality-intermediate aggregates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted into salt_n shards.

    Deterministic: the salt is a hash of the full left row's monotonic
    spread — we use ``pmod(xxhash64(all left columns), salt_n)`` so the
    same input always lands in the same shard (retried tasks agree).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_n))
    l_salted = left.withColumn("__salt", salt)
    r_exploded = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = l_salted.join(r_exploded, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_n: int = 16,
) -> DataFrame:
    """Aggregate with an explicit pre-shuffle combine on (keys, salt).

    ``partial_aggs`` run per (keys, salt) shard; ``final_aggs`` combine
    the shards per key.  Column naming contract: partial outputs must be
    the inputs the final aggs reference.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)
