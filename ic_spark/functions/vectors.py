"""Vector math over ``array<float|double>`` columns.

All pure Catalyst expressions (``zip_with``/``aggregate`` higher-order
functions) — they run inside whole-stage codegen on the JVM, no Python
boundary, so a 100 TB embedding scan stays vectorized end to end.
Accumulation is in DOUBLE regardless of input element type (matches the
DuckDB oracle casting to DOUBLE[]).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double accumulation)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def linf_norm(a: Column | str) -> Column:
    """max(|x|) — the symmetric-quantization scale denominator."""
    return F.array_max(F.transform(_as_double(a), lambda x: F.abs(x)))


def quantize_int8(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: round(127 * x / max|x|).

    The storage form for 100 TB embedding corpora — 4x smaller than
    float32, and cosine ranking degrades only at the 1/127 resolution.
    Keep the scale (``linf_norm / 127``) alongside to dequantize.
    Zero vectors map to zeros (guarded denominator).
    """
    denom = F.greatest(linf_norm(a), F.lit(1e-30))
    return F.transform(
        _as_double(a),
        lambda x: F.round(F.lit(127.0) * x / denom).cast("tinyint"),
    )


def dequantize_int8(q: Column | str, scale: Column) -> Column:
    """int8 codes × per-vector scale → approximate float64 vector."""
    qc = F.col(q) if isinstance(q, str) else q
    return F.transform(qc, lambda x: x.cast("double") * scale)
