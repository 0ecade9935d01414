"""Iceberg partition transforms as Spark column expressions.

Port of the transform surface the reference decodes
(``core/proto/iceberg.proto:18-61``, ``core/src/parser/proto.rs:295-377``):
Identity, Year, Month, Day, Hour, Void, Bucket(n), Truncate(w).

Used by the fanout writer (reference O14) to route rows to partitions:
``df.repartition(*exprs).write.partitionBy(*names)``.

Parity notes (SURVEY §7 hard part 4):
- Year/Month/Day/Hour follow Iceberg semantics: ordinal counts from
  epoch (years/months since 1970, days since epoch, hours since epoch)
  — NOT calendar field extraction.
- ``bucket`` — Iceberg specifies murmur3_x86_32 over a type-specific
  byte serialization.  Spark's ``F.hash`` IS murmur3_x86_32 but with
  seed 42 over Spark's internal layout, so bucket ids differ from
  Iceberg's for the same value.  The fast default (``bucket``) is
  engine-consistent; the SPEC-EXACT variant (``iceberg_bucket``,
  ``functions/iceberg_hash.py``) reproduces Iceberg's hash bit-for-bit
  in pure Catalyst expressions — verified against the spec's published
  test vectors — so layouts interoperate with Iceberg-written tables
  without the iceberg-spark runtime.
- ``truncate`` — ints/longs floor toward negative infinity in width-
  sized bins; strings truncate to width chars; decimals scale-preserve.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import DecimalType


def identity(col: Column) -> Column:
    return col


def void(col: Column) -> Column:
    """Void transform: always-null partition value (reference Void)."""
    return F.lit(None)


def years(col: Column) -> Column:
    """Years since 1970 (Iceberg ordinal, not the calendar year)."""
    return (F.year(col) - F.lit(1970)).cast("int")


def months(col: Column) -> Column:
    """Months since 1970-01."""
    return ((F.year(col) - 1970) * 12 + F.month(col) - 1).cast("int")


def days(col: Column) -> Column:
    """Days since epoch."""
    return F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast("int")


def hours(col: Column) -> Column:
    """Hours since epoch (timestamp inputs)."""
    return F.floor(col.cast("long") / 3600).cast("int")


def bucket(n: int, col: Column) -> Column:
    """Hash bucket in [0, n) — murmur3-based via F.hash (see parity
    note: consistent within this engine, not bit-identical to Iceberg's
    byte-serialization buckets)."""
    return F.pmod(F.hash(col), F.lit(n)).cast("int")


def truncate_decimal(width: int, col: Column, data_type: DecimalType) -> Column:
    """Decimal truncate: bin the unscaled value toward negative infinity."""
    unscaled = (col * (10 ** data_type.scale)).cast("long")
    trunc = unscaled - F.pmod(unscaled, F.lit(width))
    return (trunc / (10 ** data_type.scale)).cast(data_type)


def truncate_numeric(width: int, col: Column) -> Column:
    """Int/long truncate: v - (v mod W); pmod keeps floor semantics for
    negative values (Iceberg truncates toward negative infinity)."""
    return col - F.pmod(col, F.lit(width))


def truncate_string(width: int, col: Column) -> Column:
    return F.substring(col, 1, width)


TRANSFORMS = {
    "identity": identity,
    "void": void,
    "year": years,
    "month": months,
    "day": days,
    "hour": hours,
}


def transform_column(spec: dict, col: Column, data_type=None) -> Column:
    """Apply a transform spec {"transform": name, ...params} to a column.

    Examples: {"transform": "identity"}, {"transform": "bucket", "n": 16},
    {"transform": "truncate", "width": 10}, {"transform": "day"}.
    """
    name = spec["transform"]
    if name in TRANSFORMS:
        return TRANSFORMS[name](col)
    if name == "bucket":
        return bucket(int(spec["n"]), col)
    if name == "iceberg_bucket":
        from ic_spark.functions.iceberg_hash import iceberg_bucket

        return iceberg_bucket(int(spec["n"]), col, data_type, spec.get("logical"))
    if name == "truncate":
        width = int(spec["width"])
        from pyspark.sql.types import StringType

        if isinstance(data_type, StringType):
            return truncate_string(width, col)
        if isinstance(data_type, DecimalType):
            return truncate_decimal(width, col, data_type)
        return truncate_numeric(width, col)
    raise ValueError(f"unknown transform: {spec}")
