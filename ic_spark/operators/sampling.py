"""Deterministic stratified sampling — training-data mixture control.

Corpus mixing wants "n_k documents per stratum" (language, source,
quality band), reproducibly.  ``df.sampleBy`` is fraction-based and
seed-dependent across engines; this instead takes the first ``n_k``
rows per stratum under a deterministic integer SCRAMBLE of the id —
a fixed pseudo-random order both Spark and any SQL oracle compute
bit-identically (Knuth multiplicative hashing: ``id * 2654435761 mod
2^32``), so the selected set is exact, engine-independent, and
hash-checkable.

Scale: one shuffle on the stratum key; the per-stratum top-n uses the
same WindowGroupLimit partial-limit path as every other top-k — shuffle
traffic is O(strata × n), not corpus-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

KNUTH = 2654435761  # 2^32 / golden ratio, classic multiplicative hash


def scramble(id_col: F.Column | str) -> F.Column:
    """Deterministic pseudo-random order key: (id * KNUTH) mod 2^32.

    Pure int64 arithmetic (no overflow for ids < 2^31 — pmod the input
    first if bigger), identical in any engine.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.pmod(c.cast("long"), F.lit(2**31)) * F.lit(KNUTH), F.lit(2**32))


def stratified_sample(
    df: DataFrame, stratum_cols: list[str], id_col: str, n_per_stratum: int
) -> DataFrame:
    """First ``n_per_stratum`` rows per stratum in scrambled-id order
    (ties broken by the raw id — total order, fully reproducible)."""
    w = Window.partitionBy(*stratum_cols).orderBy(
        scramble(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def u01(id_col: F.Column | str) -> F.Column:
    """Deterministic uniform-[0,1) from an id: the Knuth scramble
    divided by 2^32 — pure integer arithmetic then one exact division,
    so ANY SQL engine reproduces it bit-identically (no seed, no md5
    hex-parsing portability problems)."""
    return scramble(id_col).cast("double") / F.lit(float(2**32))


def temperature_sample(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    target_total: int,
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-weighted corpus mixing (the multilingual-training
    alpha-sampling scheme): stratum s gets expected share
    ``n_s^alpha / sum_t n_t^alpha`` of ``target_total`` rows, taken as
    an independent deterministic Bernoulli per row with acceptance
    ``min(1, target * share / n_s)`` — alpha < 1 upsamples the tail
    strata relative to their natural frequency.

    Deterministic and engine-portable: the per-row coin is ``u01(id)``
    (Knuth-scramble arithmetic), so the selected set is exact and
    oracle-checkable — no seed-dependent ``sample()``.  Scale: one stratum-count aggregate
    (strata-sized), broadcast back; the filter is a scan-side predicate,
    no shuffle of the corpus.
    """
    counts = df.groupBy(*stratum_cols).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).alias("__z")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        *stratum_cols,
        F.least(
            F.lit(1.0),
            F.lit(float(target_total))
            * F.pow(F.col("__n").cast("double"), F.lit(alpha))
            / F.col("__z")
            / F.col("__n").cast("double"),
        ).alias("__p"),
    )
    # NULL-SAFE equi-join on the strata: the counts aggregate includes
    # a NULL stratum (its n^alpha inflates __z), so a plain `on=`
    # join — which never matches null keys — silently dropped every
    # null-stratum row while still shrinking everyone else's rate
    # (r10 review find).  stratified_sample treats NULL as a normal
    # window partition; this now does too.
    cond = None
    for c in stratum_cols:
        eq = df[c].eqNullSafe(rates[c])
        cond = eq if cond is None else (cond & eq)
    return (
        df.join(F.broadcast(rates), cond)
        .drop(*[rates[c] for c in stratum_cols])
        .where(u01(id_col) < F.col("__p"))
        .drop("__p")
    )
