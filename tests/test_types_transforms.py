"""Type-system decode/encode and partition transforms.

Models the reference's proto schema-decode tests
(core/src/parser/proto.rs:549-786: struct, list, map, deeply-nested)
and partition-spec decode (:295-377).
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DecimalType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructType,
    TimestampNTZType,
)

from ic_spark.compaction.transforms import transform_column
from ic_spark.compaction.types import decode_schema, decode_type, encode_schema


def test_decode_primitives():
    assert decode_type("int") == IntegerType()
    assert decode_type("time") == LongType()  # µs since midnight
    assert decode_type("timestamp") == TimestampNTZType()
    assert decode_type("timestamp_ns") == LongType()
    assert decode_type("uuid") == StringType()
    assert decode_type({"type": "fixed", "length": 16}) == BinaryType()
    assert decode_type({"type": "decimal", "precision": 10, "scale": 2}) == DecimalType(10, 2)


def test_decode_deeply_nested():
    """map<string, list<struct<id int, tags list<string>>>> — mirrors the
    reference's nested decode test (proto.rs:690-786)."""
    desc = {
        "type": "map",
        "key": "string",
        "value": {
            "type": "list",
            "element": {
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": True, "field_type": "int"},
                    {
                        "id": 2,
                        "name": "tags",
                        "required": False,
                        "field_type": {"type": "list", "element": "string"},
                    },
                ],
            },
        },
    }
    t = decode_type(desc)
    assert isinstance(t, MapType)
    assert isinstance(t.valueType, ArrayType)
    inner = t.valueType.elementType
    assert isinstance(inner, StructType)
    assert inner["id"].dataType == IntegerType()
    assert not inner["id"].nullable
    assert isinstance(inner["tags"].dataType, ArrayType)


def test_schema_roundtrip_preserves_field_ids():
    fields = [
        {"id": 1, "name": "id", "required": True, "field_type": "long"},
        {"id": 2, "name": "name", "required": False, "field_type": "string"},
        {
            "id": 3,
            "name": "dec",
            "required": False,
            "field_type": {"type": "decimal", "precision": 18, "scale": 2},
        },
    ]
    schema = decode_schema(fields)
    assert schema["id"].metadata["iceberg.field_id"] == 1
    back = encode_schema(schema)
    assert [f["id"] for f in back] == [1, 2, 3]
    assert back[2]["field_type"] == {"type": "decimal", "precision": 18, "scale": 2}


@pytest.fixture(scope="module")
def ts_df(spark):
    return spark.createDataFrame(
        [
            (1, datetime.datetime(1970, 1, 1, 5, 0, 0), "alphabet", 105),
            (2, datetime.datetime(1971, 3, 2, 1, 30, 0), "beta", -3),
            (3, datetime.datetime(2024, 12, 31, 23, 0, 0), "ga", 99),
        ],
        "id int, ts timestamp, s string, v long",
    )


def test_time_transforms_ordinal_semantics(spark, ts_df):
    out = ts_df.select(
        transform_column({"transform": "year"}, F.col("ts")).alias("y"),
        transform_column({"transform": "month"}, F.col("ts")).alias("m"),
        transform_column({"transform": "day"}, F.col("ts")).alias("d"),
        transform_column({"transform": "hour"}, F.col("ts")).alias("h"),
    ).collect()
    r1, r2, r3 = out
    # Iceberg ordinals: counts since epoch, not calendar values.
    assert (r1.y, r1.m, r1.d, r1.h) == (0, 0, 0, 5)
    assert (r2.y, r2.m) == (1, 14)  # 1971-03 → 14 months since 1970-01
    assert r3.y == 54
    assert r2.d == (datetime.date(1971, 3, 2) - datetime.date(1970, 1, 1)).days


def test_truncate_and_bucket(spark, ts_df):
    from pyspark.sql.types import StringType as ST

    out = ts_df.select(
        transform_column({"transform": "truncate", "width": 10}, F.col("v")).alias("tv"),
        transform_column({"transform": "truncate", "width": 3}, F.col("s"), ST()).alias("ts3"),
        transform_column({"transform": "bucket", "n": 8}, F.col("id")).alias("b"),
        transform_column({"transform": "void"}, F.col("id")).alias("nothing"),
    ).collect()
    assert [r.tv for r in out] == [100, -10, 90]  # floor toward -inf
    assert [r.ts3 for r in out] == ["alp", "bet", "ga"]
    assert all(0 <= r.b < 8 for r in out)
    assert all(r.nothing is None for r in out)
    # bucket is deterministic across evaluations
    again = ts_df.select(
        transform_column({"transform": "bucket", "n": 8}, F.col("id")).alias("b")
    ).collect()
    assert [r.b for r in out] == [r.b for r in again]


def test_fanout_write_with_transforms(spark, ts_df, tmp_path):
    """Partitioned rewrite via transform exprs (reference O14 fanout)."""
    out_dir = str(tmp_path / "fanout")
    with_part = ts_df.withColumn(
        "p_day", transform_column({"transform": "day"}, F.col("ts"))
    )
    with_part.repartition("p_day").write.partitionBy("p_day").parquet(out_dir)
    back = spark.read.parquet(out_dir)
    assert back.count() == 3
    assert sorted(r.p_day for r in back.select("p_day").distinct().collect()) == sorted(
        {0, (datetime.date(1971, 3, 2) - datetime.date(1970, 1, 1)).days,
         (datetime.date(2024, 12, 31) - datetime.date(1970, 1, 1)).days}
    )


def test_iceberg_bucket_spec_vectors(spark):
    """The pure-expression murmur3 must reproduce the Iceberg spec's
    published hash test vectors (Appendix B) bit-for-bit, ANSI on."""
    import pyspark.sql.functions as F

    from ic_spark.functions.iceberg_hash import (
        iceberg_hash_long,
        iceberg_hash_string,
        iceberg_hash_bytes,
    )

    ns = spark.newSession()
    ns.conf.set("spark.sql.ansi.enabled", "true")
    micros_ts = 1510871468000000  # 2017-11-16T22:31:08 UTC
    time_us = (22 * 3600 + 31 * 60 + 8) * 1_000_000
    df = ns.createDataFrame(
        [(34, 17486, micros_ts, time_us, "iceberg", bytearray(b"\x00\x01\x02\x03"))],
        "v long, d long, ts long, t long, s string, b binary",
    )
    r = df.select(
        iceberg_hash_long(F.col("v")).alias("hl"),
        iceberg_hash_long(F.col("d")).alias("hd"),
        iceberg_hash_long(F.col("ts")).alias("hts"),
        iceberg_hash_long(F.col("t")).alias("ht"),
        iceberg_hash_string(F.col("s")).alias("hs"),
        iceberg_hash_bytes(F.col("b")).alias("hb"),
    ).collect()[0]
    assert r.hl == 2017239379  # int/long 34
    assert r.hd == -653330422  # date 2017-11-16
    assert r.hts == -2047944441  # timestamp 2017-11-16T22:31:08
    assert r.ht == -662762989  # time 22:31:08
    assert r.hs == 1210000089  # string "iceberg"
    assert r.hb == -188683207  # binary 0x00010203

    import decimal

    from ic_spark.functions.iceberg_hash import (
        iceberg_hash_decimal,
        iceberg_hash_uuid,
    )

    df2 = ns.createDataFrame(
        [(decimal.Decimal("14.20"), "f79c3e09-677c-4bbd-a479-3f349cb785e7")],
        "d decimal(10,2), u string",
    )
    r2 = df2.select(
        iceberg_hash_decimal(F.col("d"), 2).alias("hd"),
        iceberg_hash_uuid(F.col("u")).alias("hu"),
    ).collect()[0]
    assert r2.hd == -500754589  # decimal 14.20
    assert r2.hu == 1488055340  # uuid f79c3e09-...


def test_iceberg_bucket_ntz_session_tz_independent(spark):
    """TIMESTAMP_NTZ bucketing must read the wall clock AS epoch micros
    (Iceberg spec) regardless of session timezone — a tz-dependent cast
    would silently shift bucket ids under non-UTC sessions."""
    import datetime

    import pyspark.sql.functions as F
    from pyspark.sql.types import TimestampNTZType

    from ic_spark.functions.iceberg_hash import iceberg_bucket, iceberg_hash_long

    wall = datetime.datetime(2017, 11, 16, 22, 31, 8, 123456)
    micros = int(
        wall.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )
    got = {}
    for tz in ("UTC", "Asia/Kolkata", "America/New_York"):
        ns = spark.newSession()
        ns.conf.set("spark.sql.session.timeZone", tz)
        ns.conf.set("spark.sql.ansi.enabled", "true")
        df = ns.createDataFrame([(wall, micros)], "ts timestamp_ntz, us long")
        row = df.select(
            iceberg_bucket(4096, F.col("ts"), data_type=TimestampNTZType()).alias(
                "b"
            ),
            F.pmod(
                iceberg_hash_long(F.col("us")).cast("long").bitwiseAND(
                    F.lit(0x7FFFFFFF)
                ),
                F.lit(4096),
            ).alias("want"),
        ).collect()[0]
        assert row.b == row.want, tz
        got[tz] = row.b
    assert len(set(got.values())) == 1, got


def test_iceberg_hash_matches_python_reference(spark):
    """Expression == driver-side reference murmur3 on random longs,
    strings (incl. multi-byte UTF-8 and empty), and binaries."""
    import random

    import pyspark.sql.functions as F

    from ic_spark.functions.iceberg_hash import (
        iceberg_hash_bytes,
        iceberg_hash_long,
        iceberg_hash_string,
        py_hash_long,
        py_murmur3_32,
    )

    random.seed(11)
    longs = [random.randint(-2**63, 2**63 - 1) for _ in range(200)] + [
        0, -1, 2**63 - 1, -(2**63)]
    ldf = spark.createDataFrame([(v,) for v in longs], "v long")
    got = [r.h for r in ldf.select(iceberg_hash_long(F.col("v")).alias("h")).collect()]
    assert got == [py_hash_long(v) for v in longs]

    strs = [""] + [
        "".join(random.choice("abz09 é中\U0001F600") for _ in range(random.randint(0, 19)))
        for _ in range(150)
    ]
    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    got = [r.h for r in sdf.select(iceberg_hash_string(F.col("s")).alias("h")).collect()]
    assert got == [py_murmur3_32(s.encode()) for s in strs]

    bins = [bytes(random.randint(0, 255) for _ in range(random.randint(0, 13)))
            for _ in range(80)]
    bdf = spark.createDataFrame([(bytearray(b),) for b in bins], "b binary")
    got = [r.h for r in bdf.select(iceberg_hash_bytes(F.col("b")).alias("h")).collect()]
    assert got == [py_murmur3_32(b) for b in bins]

    # decimals: minimal two's-complement BE incl. the -128/-129 boundary
    import decimal

    from ic_spark.functions.iceberg_hash import (
        iceberg_hash_decimal,
        py_min_signed_be,
    )

    dvals = [decimal.Decimal(v) / 100 for v in
             [0, -1, 127, 128, -128, -129, 10**16, -(10**16)] +
             [random.randint(-10**15, 10**15) for _ in range(60)]]
    ddf = spark.createDataFrame([(v,) for v in dvals], "d decimal(18,2)")
    got = [r.h for r in ddf.select(
        iceberg_hash_decimal(F.col("d"), 2).alias("h")).collect()]
    assert got == [py_murmur3_32(py_min_signed_be(int(v * 100))) for v in dvals]


def test_iceberg_bucket_transform_dispatch(spark, ts_df):
    """iceberg_bucket partition transform: correct range, type dispatch
    (date/timestamp/string/long), deterministic, and usable in a
    partitioned fanout write."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import DateType, StringType

    from ic_spark.functions.iceberg_hash import py_hash_long
    from ic_spark.compaction.transforms import transform_column

    spec = {"transform": "iceberg_bucket", "n": 8}
    out = ts_df.select(
        transform_column(spec, F.col("id")).alias("bi"),
        transform_column(spec, F.col("ts").cast("date"), DateType()).alias("bd"),
        transform_column(spec, F.col("ts").cast("string"), StringType()).alias("bs"),
    ).collect()
    assert all(0 <= r.bi < 8 and 0 <= r.bd < 8 and 0 <= r.bs < 8 for r in out)
    ids = [r.id for r in ts_df.select("id").collect()]
    assert [r.bi for r in out] == [(py_hash_long(v) & 0x7FFFFFFF) % 8 for v in ids]


def test_apply_transform_py_iceberg_bucket_source_type_gated():
    """Prune-side bucket evaluation dispatches on the RECORDED source
    type, not the literal's Python class — an ISO string against a
    timestamp-bucketed column previously hashed its UTF-8 text and
    silently pruned matching files (r10 review find)."""
    import datetime as dt
    import uuid as uuid_mod

    from ic_spark.compaction.transforms import apply_transform_py
    from ic_spark.functions.iceberg_hash import py_hash_long, py_murmur3_32

    spec = {"transform": "iceberg_bucket", "n": 64}
    micros = 1510871468000000  # 2017-11-16T22:31:08 UTC

    # temporal source + ISO string literal -> the MICROS bucket
    ok, b = apply_transform_py(spec, "2017-11-16T22:31:08", "timestamptz")
    assert ok and b == (py_hash_long(micros) & 0x7FFFFFFF) % 64
    # same via datetime literal and via internal int literal
    ok2, b2 = apply_transform_py(
        spec, dt.datetime(2017, 11, 16, 22, 31, 8), "timestamp"
    )
    ok3, b3 = apply_transform_py(spec, micros, "timestamptz")
    assert (ok2, b2) == (True, b) and (ok3, b3) == (True, b)
    # date source: string / date / internal days all agree
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    want_d = (py_hash_long(days) & 0x7FFFFFFF) % 64
    assert apply_transform_py(spec, "2017-11-16", "date") == (True, want_d)
    assert apply_transform_py(spec, dt.date(2017, 11, 16), "date") == (
        True,
        want_d,
    )
    assert apply_transform_py(spec, days, "date") == (True, want_d)
    # type mismatches OPT OUT instead of hashing the wrong bytes
    assert apply_transform_py(spec, 123, "string")[0] is False
    assert apply_transform_py(spec, "123", "long")[0] is False
    # uuid source hashes the 16 msb/lsb bytes (spec), matching the
    # expression's published vector; malformed uuids opt out
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    want_u = (py_murmur3_32(uuid_mod.UUID(u).bytes) & 0x7FFFFFFF) % 64
    assert apply_transform_py(spec, u, "uuid") == (True, want_u)
    assert py_murmur3_32(uuid_mod.UUID(u).bytes) == 1488055340  # spec vec
    assert apply_transform_py(spec, "not-a-uuid", "uuid")[0] is False
    # unrecorded source_type keeps the literal-shape dispatch (hive)
    assert apply_transform_py(spec, "iceberg", None) == (
        True,
        (py_murmur3_32(b"iceberg") & 0x7FFFFFFF) % 64,
    )


def test_iceberg_bucket_rejects_untyped_nonintegral_column(spark):
    """data_type=None accepts only genuinely integral columns: a
    timestamp column casts to epoch SECONDS (a legal cast the old
    isNotNull guard let through) and would silently hash the wrong
    serialization (r10 review find)."""
    import datetime

    import pyspark.sql.functions as F
    import pytest

    from ic_spark.functions.iceberg_hash import iceberg_bucket

    df = spark.createDataFrame(
        [(datetime.datetime(2020, 1, 1), 7, "123")],
        "ts timestamp, v long, s string",
    )
    assert df.select(iceberg_bucket(16, F.col("v")).alias("b")).collect()[
        0
    ].b in range(16)
    with pytest.raises(Exception, match="typeof=timestamp"):
        df.select(iceberg_bucket(16, F.col("ts")).alias("b")).collect()
    with pytest.raises(Exception, match="typeof=string"):
        df.select(iceberg_bucket(16, F.col("s")).alias("b")).collect()


def test_iceberg_hash_uuid_rejects_malformed(spark):
    """Malformed uuid strings fail LOUDLY — the coalescing hex reader
    previously zero-padded them into a deterministic valid-looking
    bucket (r10 review find); NULL still hashes to NULL."""
    import pyspark.sql.functions as F
    import pytest

    from ic_spark.functions.iceberg_hash import iceberg_hash_uuid

    good = spark.createDataFrame(
        [("f79c3e09-677c-4bbd-a479-3f349cb785e7",), (None,)], "u string"
    )
    rows = good.select(iceberg_hash_uuid(F.col("u")).alias("h")).collect()
    assert sorted(
        [r.h for r in rows], key=lambda x: (x is None, x)
    ) == [1488055340, None]
    bad = spark.createDataFrame(
        [("{f79c3e09-677c-4bbd-a479-3f349cb785e7}",)], "u string"
    )
    with pytest.raises(Exception, match="not a canonical uuid"):
        bad.select(iceberg_hash_uuid(F.col("u")).alias("h")).collect()


def test_partition_spec_records_uuid_logical(tmp_path):
    """Spec-metadata parsing marks uuid sources with logical='uuid' so
    both the write-side transform_column and prune-side
    apply_transform_py hash the 16 uuid bytes, not the 36-char text
    (r10 review find)."""
    import json
    import os

    from ic_spark.compaction.iceberg_meta import IcebergTable

    loc = str(tmp_path / "t")
    os.makedirs(os.path.join(loc, "metadata"))
    meta = {
        "format-version": 2,
        "table-uuid": "0" * 8 + "-0000-0000-0000-" + "0" * 12,
        "location": loc,
        "last-sequence-number": 0,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "uid", "required": False, "type": "uuid"},
                    {"id": 2, "name": "v", "required": False, "type": "long"},
                ],
            }
        ],
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "uid_bucket",
                        "transform": "bucket[16]",
                        "source-id": 1,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "last-partition-id": 1000,
        "properties": {},
        "snapshots": [],
        "partition-statistics": [],
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
    }
    with open(os.path.join(loc, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(loc, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    tbl = IcebergTable(loc)
    fields = tbl.partition_spec()
    assert fields[0]["transform"] == "iceberg_bucket"
    assert fields[0]["source_type"] == "uuid"
    assert fields[0]["logical"] == "uuid"
