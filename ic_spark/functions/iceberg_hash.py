"""Bit-exact Iceberg bucket hashing as pure Spark expressions.

Iceberg's ``bucket[N]`` transform is ``(murmur3_x86_32(serialize(v),
seed=0) & Integer.MAX_VALUE) % N`` over a type-specific byte
serialization (Iceberg spec, Appendix B).  Spark's built-in ``F.hash``
is also murmur3_x86_32 but with seed 42 over Spark's internal layout,
so its buckets differ from Iceberg's — an engine-consistent but
non-interoperable deviation (SURVEY §7 hard part 4).

This module closes that gap WITHOUT a UDF: murmur3_x86_32 is built from
Catalyst bitwise/arithmetic expressions, masked to 32 bits at every
step so the math stays inside signed-64 range (ANSI-safe: the largest
intermediate is < 2^49).  Shared subexpressions are let-bound through
one-element higher-order functions (see ``_let``) to keep the tree
linear; per-row cost is a few dozen JVM long ops plus the HOF binds —
no Python anywhere.

Serializations implemented (spec Appendix B):

- int / long / date (days) / time (micros) / timestamp[tz] (micros):
  8-byte little-endian of the promoted long value.
- string: UTF-8 bytes (via a hex-string block walk — variable length,
  folded with ``aggregate``); binary: raw bytes the same way.

Verified against the spec's published test vectors
(``tests/test_types_transforms.py``) and cross-checked against a
driver-side Python reference on random inputs.
"""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
from pyspark.sql import Column

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def iceberg_hash_long(col: Column) -> Column:
    """murmur3_x86_32(little_endian_8_bytes(v), seed=0) — the Iceberg
    hash for int/long/date/time/timestamp values promoted to long."""
    return _let(
        col.cast("long"),
        lambda v: _fmix_b(
            _mix_block_b(
                _mix_block_b(
                    F.lit(0).cast("long"), v.bitwiseAND(F.lit(_M32))
                ),
                F.shiftright(v, 32).bitwiseAND(F.lit(_M32)),
            ),
            F.lit(8),
        ),
    )


def _let(x: Column, f) -> Column:
    """Let-binding for Column expressions: bind ``x`` to a lambda
    variable so ``f`` can reference it many times WITHOUT duplicating
    the subtree.  Without this, each helper that mentions its argument
    k times multiplies tree size by k — the nested murmur3 rounds turn
    into a multi-million-node tree (minutes of analysis, 60 MiB task
    binaries).  The HOF subexpressions evaluate interpreted rather than
    in whole-stage codegen; ~20 one-element-array binds per hash is a
    fine trade for a linear tree.
    """
    return F.get(F.transform(F.array(x), f), 0)


def _mul32_b(x: Column, c: int) -> Column:
    return _let(
        x,
        lambda xv: (
            xv.bitwiseAND(F.lit(0xFFFF)) * F.lit(c)
            + F.shiftleft(
                (F.shiftright(xv, 16) * F.lit(c)).bitwiseAND(F.lit(0xFFFF)), 16
            )
        ).bitwiseAND(F.lit(_M32)),
    )


def _rotl32_b(x: Column, r: int) -> Column:
    return _let(
        x,
        lambda xv: F.shiftleft(xv, r)
        .bitwiseAND(F.lit(_M32))
        .bitwiseOR(F.shiftright(xv, 32 - r)),
    )


def _mix_block_b(h: Column, k: Column) -> Column:
    k = _mul32_b(_rotl32_b(_mul32_b(k, _C1), 15), _C2)
    return _let(
        _rotl32_b(h.bitwiseXOR(k), 13),
        lambda hv: (_mul32_b(hv, 5) + F.lit(0xE6546B64)).bitwiseAND(F.lit(_M32)),
    )


def _fmix_b(h: Column, n_bytes: Column) -> Column:
    h = _let(
        h.bitwiseXOR(n_bytes.cast("long")),
        lambda v: v.bitwiseXOR(F.shiftright(v, 16)),
    )
    h = _let(_mul32_b(h, 0x85EBCA6B), lambda v: v.bitwiseXOR(F.shiftright(v, 13)))
    h = _let(_mul32_b(h, 0xC2B2AE35), lambda v: v.bitwiseXOR(F.shiftright(v, 16)))
    return _let(
        h,
        lambda v: F.when(v >= F.lit(1 << 31), v - F.lit(1 << 32)).otherwise(v),
    ).cast("int")


def iceberg_hash_bytes(col: Column) -> Column:
    """murmur3_x86_32(bytes, seed=0) for a BINARY column (and therefore
    UTF-8 strings via ``F.encode``).

    Byte access goes through ``hex()`` (2 hex chars per byte) and a
    block fold with ``aggregate`` — variable-length input needs a loop,
    and higher-order functions are the loop Catalyst has.  Interpreted
    per block, so reserve for partition keys, not 100-MB payloads.
    """
    return _hash_hex(F.hex(col), F.length(col))


def _hash_hex(hx: Column, n_bytes: Column) -> Column:
    """murmur3_x86_32 over bytes given as a hex STRING (2 chars/byte)."""
    n_blocks = F.floor(n_bytes / 4).cast("int")

    def byte_at(i: Column) -> Column:
        # 1-indexed substring over the hex string; missing -> 0.
        two = F.substring(hx, i * 2 + 1, F.lit(2))
        return F.coalesce(
            F.nullif(F.conv(two, 16, 10), F.lit("")).cast("long"), F.lit(0)
        )

    def le_word(first_byte: Column, width: Column) -> Column:
        # little-endian accumulation of `width` bytes from first_byte.
        w = F.lit(0)
        for j in range(4):
            w = w + F.when(
                F.lit(j) < width,
                F.shiftleft(byte_at(first_byte + j), 8 * j),
            ).otherwise(F.lit(0))
        return w

    body = F.aggregate(
        F.sequence(F.lit(0), n_blocks - 1, F.lit(1)),
        F.lit(0).cast("long"),
        lambda h, i: _mix_block_b(h, _let(i, lambda iv: le_word(iv * 4, F.lit(4)))),
    )
    # sequence(0, -1) when n_blocks == 0 would DESCEND; guard to skip.
    body = F.when(n_blocks > 0, body).otherwise(F.lit(0))
    tail_len = n_bytes - n_blocks * 4
    tail = le_word(n_blocks * 4, tail_len)
    tk = _mul32_b(_rotl32_b(_mul32_b(tail, _C1), 15), _C2)
    h = _let(
        body, lambda b: F.when(tail_len > 0, b.bitwiseXOR(tk)).otherwise(b)
    )
    return _fmix_b(h, n_bytes)


def iceberg_hash_string(col: Column) -> Column:
    return iceberg_hash_bytes(F.encode(col, "UTF-8"))


def iceberg_hash_uuid(col: Column) -> Column:
    """UUID in canonical string form hashes its 16 big-endian bytes
    (spec: java.util.UUID msb/lsb serialization == the hex digits).
    NULL hashes to NULL (spec: transforms map null to null — the
    coalescing hex reader otherwise hashed 16 zero bytes into a real
    bucket; r9 review find).  Malformed input fails LOUDLY: the hex
    reader coalesces short/garbage input to zero bytes, which would
    otherwise land the row in a deterministic valid-looking bucket —
    silently non-interoperable placement (r10 review find)."""
    hexed = F.upper(F.replace(col, F.lit("-"), F.lit("")))
    return F.when(
        col.isNotNull(),
        F.when(
            F.assert_true(
                hexed.rlike("^[0-9A-F]{32}$"),
                F.concat(
                    F.lit("iceberg_hash_uuid: not a canonical uuid: "),
                    col,
                ),
            ).isNull(),
            _hash_hex(hexed, F.lit(16)),
        ),
    )


def iceberg_hash_decimal(col: Column, scale: int) -> Column:
    """Decimal(p<=18, s): hash of the UNSCALED value's minimal-length
    two's-complement big-endian bytes (java BigInteger.toByteArray).

    The unscaled long renders as 16 fixed hex chars via ``conv`` (which
    wraps negatives to 64-bit two's complement); the minimal byte count
    is picked with exact signed-range comparisons (no float log), and
    the hex tail of that length IS the minimal big-endian encoding.
    """
    u = (col * F.lit(10**scale)).cast("long")
    # NULL -> NULL (spec rule): _min_signed_bytes(NULL) fell through to
    # 8 and the hex reader coalesced to zero bytes, landing NULL rows
    # in a concrete bucket instead of the null partition (r9 find).
    return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(_let(
        u,
        lambda uv: _let(
            _min_signed_bytes(uv),
            lambda nb: _hash_hex(
                F.substring(
                    F.lpad(F.conv(uv.cast("string"), 10, 16), 16, "0"),
                    (F.lit(17) - nb * 2).cast("int"),
                    (nb * 2).cast("int"),
                ),
                nb,
            ),
        ),
    ))


def _min_signed_bytes(v: Column) -> Column:
    """Minimal two's-complement byte length of a long: the smallest L
    with -2^(8L-1) <= v < 2^(8L-1) (exact comparisons, matches
    BigInteger.toByteArray: -128 -> 1 byte, -129 -> 2, 0 -> 1)."""
    out = F.lit(8)
    for L in range(7, 0, -1):
        lo, hi = -(1 << (8 * L - 1)), (1 << (8 * L - 1)) - 1
        out = F.when((v >= F.lit(lo)) & (v <= F.lit(hi)), F.lit(L)).otherwise(out)
    return out


def iceberg_bucket(
    n: int, col: Column, data_type=None, logical: str | None = None
) -> Column:
    """Spec-exact Iceberg bucket id in [0, n): ``(hash & MaxInt) % n``.

    Dispatches on the column's Spark type: strings/binary hash their
    bytes; date promotes to days-from-epoch; timestamps promote to
    micros; decimals hash minimal big-endian unscaled bytes; int/long
    hash as 8-byte LE longs.  ``logical="uuid"`` marks a StringType
    column carrying canonical UUIDs (Iceberg UUID maps to Spark string
    — the bytes, not the text, must hash).
    """
    from pyspark.sql.types import (
        BinaryType,
        DateType,
        DecimalType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    if logical == "uuid":
        h = iceberg_hash_uuid(col)
    elif isinstance(data_type, StringType):
        h = iceberg_hash_string(col)
    elif isinstance(data_type, BinaryType):
        h = iceberg_hash_bytes(col)
    elif isinstance(data_type, DecimalType):
        if data_type.precision > 18:
            raise NotImplementedError(
                "iceberg_bucket on decimal needs precision <= 18 "
                "(unscaled value must fit a long)"
            )
        h = iceberg_hash_decimal(col, data_type.scale)
    elif isinstance(data_type, DateType):
        h = iceberg_hash_long(
            F.datediff(col, F.lit("1970-01-01").cast("date"))
        )
    elif isinstance(data_type, TimestampNTZType):
        # Iceberg reads an NTZ wall clock AS epoch micros directly; a
        # cast-to-timestamp here would re-interpret the wall clock in
        # the SESSION timezone and silently diverge under non-UTC
        # sessions.  Decompose arithmetically instead — date/hour/
        # minute/date_part on an NTZ column are all tz-independent.
        micros = (
            F.datediff(col.cast("date"), F.lit("1970-01-01").cast("date")).cast(
                "long"
            )
            * F.lit(86_400_000_000).cast("long")
            + F.hour(col).cast("long") * F.lit(3_600_000_000).cast("long")
            + F.minute(col).cast("long") * F.lit(60_000_000).cast("long")
            # date_part SECOND is decimal(8,6) incl. the micro fraction.
            + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast("long")
        )
        h = iceberg_hash_long(micros)
    elif isinstance(data_type, TimestampType):
        h = iceberg_hash_long(F.unix_micros(col))
    else:
        from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

        if data_type is not None and not isinstance(
            data_type, (ByteType, ShortType, IntegerType, LongType)
        ):
            # float/double bucketing is forbidden by the spec; anything
            # else unlisted has no serialization here.  Failing eagerly
            # beats the ANSI-off silent alternative (cast -> NULL ->
            # every row in bucket NULL, layout quietly non-interoperable).
            raise NotImplementedError(
                f"iceberg_bucket: unsupported type {data_type} "
                "(pass the correct data_type for string/binary/decimal/"
                "date/timestamp columns)"
            )
        v = col.cast("long")
        if data_type is None:
            # No type given: require a genuinely INTEGRAL column, not
            # merely a long-castable one — timestamp casts to epoch
            # SECONDS and digit strings parse, both legal casts that
            # would silently hash the wrong serialization (r10 review
            # find; the old isNotNull guard only caught uncastable
            # values).  typeof() is per-row but constant-folded cheap,
            # and assert_true keeps the failure LOUD even with ANSI off.
            v = F.when(
                F.assert_true(
                    F.typeof(col).isin(
                        "tinyint", "smallint", "int", "bigint"
                    ),
                    F.concat(
                        F.lit(
                            "iceberg_bucket: data_type required for "
                            "non-integral column (typeof="
                        ),
                        F.typeof(col),
                        F.lit(")"),
                    ),
                ).isNull(),
                v,
            )
        h = iceberg_hash_long(v)
    return F.pmod(h.cast("long").bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n)).cast(
        "int"
    )


# ------------------------------------------------------------ reference
def py_murmur3_32(data: bytes, seed: int = 0) -> int:
    """Driver-side reference implementation (spec-checked); used by
    tests to cross-validate the expression on random inputs."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M32

    h = seed
    n = len(data) // 4
    for i in range(n):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * _C1) & _M32
        k = rotl(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[n * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = rotl(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h if h < 1 << 31 else h - (1 << 32)


def py_hash_long(v: int) -> int:
    return py_murmur3_32(struct.pack("<q", v))


def py_min_signed_be(v: int) -> bytes:
    """Minimal two's-complement big-endian bytes (BigInteger.toByteArray
    parity: -128 -> b'\\x80', 0 -> b'\\x00')."""
    if v >= 0:
        length = v.bit_length() // 8 + 1
    else:
        length = (-v - 1).bit_length() // 8 + 1
    return v.to_bytes(length, "big", signed=True)
