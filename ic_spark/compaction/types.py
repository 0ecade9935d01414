"""Type-system mapping: Iceberg-style schema descriptors → Spark types.

Port of the reference's schema decode surface
(``core/src/parser/proto.rs:171-279``; nested-type tests ``:549-786``)
using the documented mappings from SURVEY.md §1.2:

| descriptor          | Spark type                  | note |
|---------------------|-----------------------------|------|
| boolean/int/long/float/double/date/string/binary | natives | |
| time                | LongType (µs since midnight)| no Spark native |
| timestamp           | TimestampNTZType (µs)       | |
| timestamptz         | TimestampType (µs)          | |
| timestamp_ns / timestamptz_ns | LongType (ns)     | Spark has no ns |
| uuid                | StringType (canonical form) | |
| decimal(p, s)       | DecimalType(p, s)           | |
| fixed(len)          | BinaryType                  | length unenforced |
| struct/list/map     | StructType/ArrayType/MapType| recursive |

Descriptors are JSON-ish dicts mirroring the proto shape:
``{"type": "decimal", "precision": 10, "scale": 2}``,
``{"type": "list", "element": {...}, "element_required": bool}``,
``{"type": "struct", "fields": [{"id", "name", "required", "field_type"}]}``,
``{"type": "map", "key": {...}, "value": {...}}``.
Field IDs are preserved in Spark column metadata so a round-trip keeps
Iceberg field identity.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_PRIMITIVES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "date": DateType(),
    "time": LongType(),  # µs since midnight
    "timestamp": TimestampNTZType(),
    "timestamptz": TimestampType(),
    "timestamp_ns": LongType(),  # ns since epoch
    "timestamptz_ns": LongType(),
    "string": StringType(),
    "uuid": StringType(),
    "binary": BinaryType(),
}


def decode_type(descriptor: dict[str, Any] | str) -> DataType:
    """Type descriptor → Spark DataType (recursive)."""
    if isinstance(descriptor, str):
        descriptor = {"type": descriptor}
    kind = descriptor["type"]
    if kind in _PRIMITIVES:
        return _PRIMITIVES[kind]
    if kind == "decimal":
        return DecimalType(int(descriptor["precision"]), int(descriptor["scale"]))
    if kind == "fixed":
        return BinaryType()  # length not enforced by Spark
    if kind == "struct":
        return decode_schema(descriptor["fields"])
    if kind == "list":
        return ArrayType(
            decode_type(descriptor["element"]),
            containsNull=not descriptor.get("element_required", False),
        )
    if kind == "map":
        return MapType(
            decode_type(descriptor["key"]),
            decode_type(descriptor["value"]),
            valueContainsNull=not descriptor.get("value_required", False),
        )
    raise ValueError(f"unknown type descriptor: {descriptor}")


def decode_schema(fields: list[dict[str, Any]]) -> StructType:
    """Ordered NestedField list → StructType, preserving field IDs in
    column metadata (Iceberg field identity survives the round trip)."""
    out = []
    for f in fields:
        meta = {"iceberg.field_id": f["id"]} if "id" in f else None
        out.append(
            StructField(
                f["name"],
                decode_type(f["field_type"]),
                nullable=not f.get("required", False),
                metadata=meta,
            )
        )
    return StructType(out)


def encode_schema(schema: StructType) -> list[dict[str, Any]]:
    """StructType → descriptor list (inverse of decode_schema for the
    supported surface; used by the service layer round trip)."""

    def enc_type(dt: DataType) -> dict[str, Any]:
        for name, t in _PRIMITIVES.items():
            # TimestampNTZ/Long map from several descriptors; encode the
            # canonical one (first match wins — dict is ordered).
            if dt == t:
                return {"type": name}
        if isinstance(dt, DecimalType):
            return {"type": "decimal", "precision": dt.precision, "scale": dt.scale}
        if isinstance(dt, StructType):
            return {"type": "struct", "fields": encode_schema(dt)}
        if isinstance(dt, ArrayType):
            return {
                "type": "list",
                "element": enc_type(dt.elementType),
                "element_required": not dt.containsNull,
            }
        if isinstance(dt, MapType):
            return {
                "type": "map",
                "key": enc_type(dt.keyType),
                "value": enc_type(dt.valueType),
                "value_required": not dt.valueContainsNull,
            }
        raise ValueError(f"unsupported Spark type: {dt}")

    out = []
    for f in schema.fields:
        d: dict[str, Any] = {
            "name": f.name,
            "required": not f.nullable,
            "field_type": enc_type(f.dataType),
        }
        if f.metadata and "iceberg.field_id" in f.metadata:
            d["id"] = f.metadata["iceberg.field_id"]
        out.append(d)
    return out
