"""Z-order (Morton) clustering keys.

A single sort column only skips scans filtering on THAT column;
interleaving the bits of several columns yields a curve where rows near
each other are near in every dimension, so footer min/max stats prune
files for predicates on ANY of the interleaved columns — the standard
lakehouse multi-dimensional clustering trick (Delta OPTIMIZE ZORDER /
Iceberg sort-order extensions).

Bit-spreading uses the classic magic-number sequence (5 shift-mask ops
per column instead of per-bit loops), pure codegen arithmetic: shifts
and bitwise ops never overflow-error under ANSI mode.  Inputs must be
NON-NEGATIVE integers — rank or bucket real values first (e.g.
``F.dense_rank``, epoch-days, a hash bucket).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# (shift, mask) pairs spreading the low 32 bits of a long so one empty
# bit follows each data bit (2-column interleave).
_SPREAD_2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
# Spread the low 21 bits with two empty bits after each (3 columns).
_SPREAD_3 = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread_bits(col: Column, table: list[tuple[int, int]], in_mask: int) -> Column:
    c = col.cast("long").bitwiseAND(F.lit(in_mask))
    for shift, mask in table:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def zorder_key(*cols: Column | str) -> Column:
    """Morton-interleaved long key over 2 or 3 non-negative int columns.

    2 columns use 31 bits each (62-bit key — bit 32 would reach the
    long SIGN bit and invert the order for the largest values); 3
    columns 21 bits each (63 total).  Values above the per-column
    budget are masked — rank/bucket first if the domain is larger.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    if len(cs) == 2:
        # 31 bits, not 32: bit 31 of the second column would interleave
        # into the LONG SIGN BIT (key(0, 2^31) sorted before key(0, 1)),
        # destroying Morton monotonicity exactly at the largest values
        # (r9 review find, confirmed numerically).  62-bit keys stay
        # positive.
        spread = [_spread_bits(c, _SPREAD_2, 0x7FFFFFFF) for c in cs]
    elif len(cs) == 3:
        spread = [_spread_bits(c, _SPREAD_3, 0x1FFFFF) for c in cs]
    else:
        raise ValueError("zorder_key supports 2 or 3 columns")
    out = spread[0]
    for i, s in enumerate(spread[1:], start=1):
        out = out.bitwiseOR(F.shiftleft(s, i))
    return out
