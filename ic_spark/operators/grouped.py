"""Grouped Arrow-UDF operators: ``applyInPandas`` (grouped map) and
grouped-aggregate ``pandas_udf`` (UDAF) — the two declared UDF surfaces
(SURVEY.md §2.2 "UDF/UDAF/UDTF") not covered by ``mapInPandas`` /
``applyInPandasWithState`` elsewhere.

Both operators are robust-statistics passes a corpus-quality pipeline
needs and a single Spark aggregate can't express (nested medians /
trimmed bounds require two dependent passes over each group's values):

- ``mad_outliers`` — per-group median, median-absolute-deviation, and
  |x - med| > k*MAD outlier count, in ONE grouped Arrow pass.
- ``trimmed_mean`` — per-group mean of values inside the
  [trim, 1-trim] quantile band (numpy linear interpolation, which
  matches DuckDB's ``quantile_cont`` exactly — the oracle pins this).

Scale notes: ``applyInPandas`` shuffles each group to one task and
materializes it in memory — correct for bounded per-group cardinality
(language/source strata). For groups that can reach ~10^9 rows at
100 TB, the approximate expression path (two-pass ``percentile_approx``
+ join) is the right plan; these operators pin the EXACT semantics and
the Arrow plumbing. Each task holds only its groups' (key, value)
columns — Catalyst prunes the rest of the row before the shuffle.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def mad_outliers(
    df: DataFrame, group_col: str, value_col: str, k: float = 3.0
) -> DataFrame:
    """Per-group robust outlier stats via grouped-map ``applyInPandas``.

    Returns one row per group: ``(group, n_rows, med, mad, n_outliers)``
    where ``n_outliers`` counts |x - median| > k * MAD.  MAD is the
    median of absolute deviations from the group median — two dependent
    medians, hence the grouped-map form.  ``n_rows`` counts NON-NULL
    values, the sample the stats are computed over (it previously
    counted nulls too, disagreeing with ``trimmed_mean``'s ``n_rows``
    on the same data — r10 review find).
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # Group field type comes from the input schema — the old hardcoded
    # `string` crashed Arrow conversion for any non-string group column
    # (r10 review find).
    out_schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField("n_rows", LongType()),
            StructField("med", DoubleType()),
            StructField("mad", DoubleType()),
            StructField("n_outliers", LongType()),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("float64")
        med = x.median()
        adev = (x - med).abs()
        mad = adev.median()
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_rows": [int(x.notna().sum())],
                "med": [med],
                "mad": [mad],
                "n_outliers": [int((adev > k * mad).sum())],
            }
        )

    pruned = df.select(group_col, value_col)
    return pruned.groupBy(group_col).applyInPandas(stats, schema=out_schema)


def trimmed_mean(
    df: DataFrame, group_col: str, value_col: str, trim: float = 0.1
) -> DataFrame:
    """Per-group trimmed mean via a grouped-aggregate ``pandas_udf``
    (a UDAF: Arrow-batched, partial-aggregation-free single pass per
    group).  Values outside the [trim, 1-trim] quantile band (numpy
    linear interpolation == DuckDB ``quantile_cont``) are dropped;
    the band's endpoints are inclusive."""
    if not 0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5): {trim}")

    @pandas_udf("double")
    def tmean(v: pd.Series) -> float:
        x = v.astype("float64")
        lo, hi = x.quantile(trim), x.quantile(1 - trim)
        kept = x[(x >= lo) & (x <= hi)]
        return float(kept.mean())

    # Catalyst refuses mixing grouped-agg pandas UDFs with JVM
    # aggregates in one agg, so the row count is a pandas UDAF too.
    @pandas_udf("long")
    def pcount(v: pd.Series) -> int:
        return int(v.notna().sum())

    return (
        df.select(group_col, value_col)
        .groupBy(group_col)
        .agg(
            tmean(F.col(value_col)).alias("trimmed_mean"),
            pcount(F.col(value_col)).alias("n_rows"),
        )
    )
