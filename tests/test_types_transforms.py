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
