"""Protobuf wire-format codec for the compactor service messages.

The reference speaks protobuf over gRPC (``core/proto/iceberg.proto``,
decoded in ``core/src/parser/proto.rs:36-154,380-434``).  The container
has no protobuf runtime, so this module implements the proto3 WIRE
FORMAT directly — varints, tags, length-delimited fields, packed
repeated scalars — driven by per-message field tables that mirror the
reference .proto field numbers exactly.  Messages are plain dicts; the
bridge functions at the bottom convert to/from the engine's dataclasses
(``RewriteFilesRequest`` / ``RewriteFilesResponse``) and Spark
``StructType`` schemas.

Field-id convention: the reference keys delete-equality ids and column
stats by Iceberg field id.  The engine uses column NAMES; the bridge
assigns ids by schema position (1-based, the same ids Iceberg assigns a
fresh schema) and resolves them back by position on decode.
"""

from __future__ import annotations

import json
import struct
from typing import Any

from pyspark.sql import types as T

from ic_spark.compaction.request import (
    DataFileMeta,
    FileContent,
    FileScanTask,
    RewriteFilesRequest,
    RewriteFilesResponse,
    RewriteFilesStat,
)

# ------------------------------------------------------------------ wire

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _enc_varint(n: int) -> bytes:
    if n < 0:  # proto3 int32/int64: negatives are 10-byte two's complement
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _signed(n: int, bits: int = 64) -> int:
    return n - (1 << bits) if n >= 1 << (bits - 1) else n


def _tag(field: int, wt: int) -> bytes:
    return _enc_varint((field << 3) | wt)


# ------------------------------------------------- message field tables
#
# {message: {field_number: (name, kind)}}; kind is one of
#   "varint" | "bool" | "float" | "double" | "string" | "bytes"
#   ("msg", Message) | ("rep_msg", Message) | ("packed", "varint")
#   ("map", key_kind, val_kind)   — map<k,v> as repeated {1:k, 2:v}
# Field numbers are copied from core/proto/iceberg.proto (cited above).

MESSAGES: dict[str, dict[int, tuple]] = {
    "Transform": {
        1: ("transform_without_inner", "varint"),
        2: ("bucket", "varint"),
        3: ("truncate", "varint"),
    },
    "PartitionField": {
        1: ("source_id", "varint"),
        2: ("field_id", "varint"),
        3: ("name", "string"),
        4: ("transform", ("msg", "Transform")),
    },
    "PartitionSpec": {
        1: ("spec_id", "varint"),
        2: ("partition_fields", ("rep_msg", "PartitionField")),
    },
    "Decimal": {1: ("precision", "varint"), 2: ("scale", "varint")},
    "PrimitiveType": {
        1: ("kind_without_inner", "varint"),
        2: ("decimal", ("msg", "Decimal")),
        3: ("fixed", "varint"),
    },
    "StructType": {1: ("fields", ("rep_msg", "NestedFieldDescriptor"))},
    "MapType": {
        1: ("key_field", ("msg", "NestedFieldDescriptor")),
        2: ("value_field", ("msg", "NestedFieldDescriptor")),
    },
    "NestedFieldDescriptor": {
        1: ("id", "varint"),
        2: ("name", "string"),
        3: ("required", "bool"),
        4: ("primitive", ("msg", "PrimitiveType")),
        5: ("struct", ("msg", "StructType")),
        6: ("list", ("msg", "NestedFieldDescriptor")),
        7: ("map", ("msg", "MapType")),
    },
    "SchemaDescriptor": {
        1: ("schema_id", "varint"),
        2: ("fields", ("rep_msg", "NestedFieldDescriptor")),
    },
    "FileScanTaskDescriptor": {
        1: ("start", "varint"),
        2: ("length", "varint"),
        3: ("record_count", "varint"),
        4: ("data_file_path", "string"),
        5: ("data_file_content", "varint"),
        6: ("data_file_format", "varint"),
        7: ("project_field_ids", ("packed", "varint")),
        8: ("sequence_number", "varint"),
        9: ("equality_ids", ("packed", "varint")),
    },
    "FileIoBuilder": {
        1: ("scheme_str", "string"),
        2: ("props", ("map", "string", "string")),
    },
    "RewriteFilesRequest": {
        1: ("file_scan_task_descriptor", ("rep_msg", "FileScanTaskDescriptor")),
        2: ("rewrite_file_config", ("map", "string", "string")),
        3: ("dir_path", "string"),
        4: ("file_io_builder", ("msg", "FileIoBuilder")),
        5: ("schema", ("msg", "SchemaDescriptor")),
        6: ("partition_spec", ("msg", "PartitionSpec")),
    },
    "PrimitiveLiteral": {
        1: ("boolean", "bool"),
        2: ("int", "varint"),
        3: ("long", "varint"),
        4: ("float", "float"),
        5: ("double", "double"),
        6: ("string", "string"),
        7: ("binary", "bytes"),
        8: ("int128", "bytes"),
        9: ("uint128", "bytes"),
        10: ("kind_without_inner_literal", "varint"),
    },
    "OptionalLiteral": {1: ("value", ("msg", "Literal"))},
    "StructLiteralDescriptor": {1: ("inner", ("rep_msg", "OptionalLiteral"))},
    "MapLiteral": {
        1: ("keys", ("rep_msg", "Literal")),
        2: ("values", ("rep_msg", "OptionalLiteral")),
    },
    "Literal": {
        1: ("primitive", ("msg", "PrimitiveLiteral")),
        2: ("struct", ("msg", "StructLiteralDescriptor")),
        3: ("list", ("msg", "StructLiteralDescriptor")),
        4: ("map", ("msg", "MapLiteral")),
    },
    "DataFile": {
        1: ("content", "varint"),
        2: ("file_path", "string"),
        3: ("file_format", "varint"),
        4: ("partition", ("msg", "StructLiteralDescriptor")),
        5: ("record_count", "varint"),
        6: ("file_size_in_bytes", "varint"),
        7: ("column_sizes", ("map", "varint", "varint")),
        8: ("value_counts", ("map", "varint", "varint")),
        9: ("null_value_counts", ("map", "varint", "varint")),
        10: ("nan_value_counts", ("map", "varint", "varint")),
        11: ("lower_bounds", ("map", "varint", "bytes")),
        12: ("upper_bounds", ("map", "varint", "bytes")),
        13: ("key_metadata", "bytes"),
        14: ("split_offsets", ("packed", "varint")),
        15: ("equality_ids", ("packed", "varint")),
        16: ("sort_order_id", "varint"),
        17: ("partition_spec_id", "varint"),
    },
    "RewriteFilesStat": {
        2: ("rewritten_files_count", "varint"),
        3: ("added_files_count", "varint"),
        4: ("rewritten_bytes", "varint"),
        5: ("failed_data_files_count", "varint"),
    },
    "RewriteFilesResponse": {
        1: ("data_files", ("rep_msg", "DataFile")),
        2: ("stat", ("msg", "RewriteFilesStat")),
    },
    "EchoRequest": {1: ("message", "string")},
    "EchoResponse": {1: ("message", "string")},
}


def _enc_scalar(kind: str, v: Any) -> tuple[int, bytes]:
    if kind in ("varint", "bool"):
        return _VARINT, _enc_varint(int(v))
    if kind == "float":
        return _I32, struct.pack("<f", v)
    if kind == "double":
        return _I64, struct.pack("<d", v)
    if kind == "string":
        b = v.encode("utf-8")
        return _LEN, _enc_varint(len(b)) + b
    if kind == "bytes":
        return _LEN, _enc_varint(len(v)) + v
    raise ValueError(kind)


def encode(message: str, data: dict[str, Any]) -> bytes:
    """dict → proto3 bytes (fields emitted in field-number order)."""
    fields = MESSAGES[message]
    out = bytearray()
    for num in sorted(fields):
        name, kind = fields[num]
        v = data.get(name)
        if v is None:
            continue
        if isinstance(kind, str):
            wt, payload = _enc_scalar(kind, v)
            out += _tag(num, wt) + payload
        elif kind[0] == "msg":
            body = encode(kind[1], v)
            out += _tag(num, _LEN) + _enc_varint(len(body)) + body
        elif kind[0] == "rep_msg":
            for item in v:
                body = encode(kind[1], item)
                out += _tag(num, _LEN) + _enc_varint(len(body)) + body
        elif kind[0] == "packed":
            body = b"".join(_enc_varint(int(x)) for x in v)
            out += _tag(num, _LEN) + _enc_varint(len(body)) + body
        elif kind[0] == "map":
            _, kk, vk = kind
            for mk, mv in v.items():
                entry = bytearray()
                wt, payload = _enc_scalar(kk, mk)
                entry += _tag(1, wt) + payload
                wt, payload = _enc_scalar(vk, mv)
                entry += _tag(2, wt) + payload
                out += _tag(num, _LEN) + _enc_varint(len(entry)) + bytes(entry)
        else:
            raise ValueError(kind)
    return bytes(out)


def _dec_scalar(kind: str, wt: int, buf: bytes, i: int) -> tuple[Any, int]:
    if kind in ("varint", "bool"):
        n, i = _dec_varint(buf, i)
        return (bool(n) if kind == "bool" else _signed(n)), i
    if kind == "float":
        return struct.unpack("<f", buf[i : i + 4])[0], i + 4
    if kind == "double":
        return struct.unpack("<d", buf[i : i + 8])[0], i + 8
    ln, i = _dec_varint(buf, i)
    raw = buf[i : i + ln]
    return (raw.decode("utf-8") if kind == "string" else raw), i + ln


def _skip(wt: int, buf: bytes, i: int) -> int:
    if wt == _VARINT:
        return _dec_varint(buf, i)[1]
    if wt == _I64:
        return i + 8
    if wt == _I32:
        return i + 4
    ln, i = _dec_varint(buf, i)
    return i + ln


def decode(message: str, buf: bytes) -> dict[str, Any]:
    """proto3 bytes → dict (unknown fields skipped, like any decoder)."""
    fields = MESSAGES[message]
    out: dict[str, Any] = {}
    i = 0
    while i < len(buf):
        key, i = _dec_varint(buf, i)
        num, wt = key >> 3, key & 7
        if num not in fields:
            i = _skip(wt, buf, i)
            continue
        name, kind = fields[num]
        if isinstance(kind, str):
            out[name], i = _dec_scalar(kind, wt, buf, i)
        elif kind[0] == "msg":
            ln, i = _dec_varint(buf, i)
            out[name] = decode(kind[1], buf[i : i + ln])
            i += ln
        elif kind[0] == "rep_msg":
            ln, i = _dec_varint(buf, i)
            out.setdefault(name, []).append(decode(kind[1], buf[i : i + ln]))
            i += ln
        elif kind[0] == "packed":
            acc = out.setdefault(name, [])
            if wt == _LEN:  # packed encoding
                ln, i = _dec_varint(buf, i)
                end = i + ln
                while i < end:
                    n, i = _dec_varint(buf, i)
                    acc.append(_signed(n))
            else:  # decoders must also accept unpacked scalars
                n, i = _dec_varint(buf, i)
                acc.append(_signed(n))
        elif kind[0] == "map":
            _, kk, vk = kind
            ln, i = _dec_varint(buf, i)
            entry = buf[i : i + ln]
            i += ln
            j = 0
            mk = "" if kk == "string" else 0
            mv: Any = "" if vk == "string" else (b"" if vk == "bytes" else 0)
            while j < len(entry):
                ekey, j = _dec_varint(entry, j)
                enum_, ewt = ekey >> 3, ekey & 7
                if enum_ == 1:
                    mk, j = _dec_scalar(kk, ewt, entry, j)
                elif enum_ == 2:
                    mv, j = _dec_scalar(vk, ewt, entry, j)
                else:
                    j = _skip(ewt, entry, j)
            out.setdefault(name, {})[mk] = mv
    return out


# -------------------------------------------- Spark schema <-> proto

_PRIMITIVE_KINDS: list[tuple[type, int]] = [
    (T.BooleanType, 0),  # BOOLEAN
    (T.IntegerType, 1),  # INT
    (T.LongType, 2),  # LONG
    (T.FloatType, 3),  # FLOAT
    (T.DoubleType, 4),  # DOUBLE
    (T.DateType, 5),  # DATE
    (T.TimestampNTZType, 7),  # TIMESTAMP
    (T.TimestampType, 8),  # TIMESTAMPTZ (Spark session-TZ timestamps)
    (T.StringType, 11),  # STRING
    (T.BinaryType, 13),  # BINARY
]
_KIND_TO_SPARK = {k: t for t, k in _PRIMITIVE_KINDS}


class _Ids:
    """Sequential field-id allocator (fresh-schema Iceberg numbering)."""

    def __init__(self) -> None:
        self.n = 0

    def next(self) -> int:
        self.n += 1
        return self.n


def _field_to_proto(name: str, dt: T.DataType, nullable: bool, ids: _Ids) -> dict:
    fid = ids.next()
    d: dict[str, Any] = {"id": fid, "name": name, "required": not nullable}
    if isinstance(dt, T.DecimalType):
        d["primitive"] = {"decimal": {"precision": dt.precision, "scale": dt.scale}}
    elif isinstance(dt, T.StructType):
        d["struct"] = {
            "fields": [
                _field_to_proto(f.name, f.dataType, f.nullable, ids) for f in dt.fields
            ]
        }
    elif isinstance(dt, T.ArrayType):
        d["list"] = _field_to_proto("element", dt.elementType, dt.containsNull, ids)
    elif isinstance(dt, T.MapType):
        d["map"] = {
            "key_field": _field_to_proto("key", dt.keyType, False, ids),
            "value_field": _field_to_proto(
                "value", dt.valueType, dt.valueContainsNull, ids
            ),
        }
    else:
        for spark_t, kind in _PRIMITIVE_KINDS:
            if isinstance(dt, spark_t):
                d["primitive"] = {"kind_without_inner": kind}
                break
        else:
            raise ValueError(f"unsupported type for proto schema: {dt}")
    return d


def _field_from_proto(d: dict) -> tuple[str, T.DataType, bool]:
    name, nullable = d.get("name", ""), not d.get("required", False)
    if "primitive" in d:
        p = d["primitive"]
        if "decimal" in p:
            dec = p["decimal"]
            dt: T.DataType = T.DecimalType(dec.get("precision", 10), dec.get("scale", 0))
        else:
            dt = _KIND_TO_SPARK[p.get("kind_without_inner", 0)]()
    elif "struct" in d:
        dt = T.StructType(
            [
                T.StructField(n, t, nl)
                for n, t, nl in map(_field_from_proto, d["struct"].get("fields", []))
            ]
        )
    elif "list" in d:
        _, et, enl = _field_from_proto(d["list"])
        dt = T.ArrayType(et, enl)
    elif "map" in d:
        _, kt, _ = _field_from_proto(d["map"]["key_field"])
        _, vt, vnl = _field_from_proto(d["map"]["value_field"])
        dt = T.MapType(kt, vt, vnl)
    else:
        raise ValueError(f"field without a type: {d}")
    return name, dt, nullable


def schema_to_proto(schema: T.StructType, schema_id: int = 0) -> dict:
    ids = _Ids()
    return {
        "schema_id": schema_id,
        "fields": [
            _field_to_proto(f.name, f.dataType, f.nullable, ids) for f in schema.fields
        ],
    }


def schema_from_proto(d: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(n, t, nl)
            for n, t, nl in map(_field_from_proto, d.get("fields", []))
        ]
    )


# --------------------------------- request/response <-> proto bridges

_PARQUET = 2  # DataFileFormat.PARQUET

# DataFileFormat enum (iceberg.proto:11; decode_data_file_format,
# reference proto.rs:282-289): 0=Avro, 1=Orc, 2=Parquet.
_FORMAT_ENUM = {"avro": 0, "orc": 1, "parquet": _PARQUET}
_FORMAT_NAME = {v: k for k, v in _FORMAT_ENUM.items()}

# Transform.TransformWithoutInner enum (iceberg.proto:19-34).
_TRANSFORM_ENUM = {
    "identity": 0,
    "year": 1,
    "month": 2,
    "day": 3,
    "hour": 4,
    "void": 5,
}
_ENUM_TRANSFORM = {v: k for k, v in _TRANSFORM_ENUM.items()}


def _partition_spec_to_proto(spec: list[dict], name_to_id: dict[str, int]) -> dict:
    fields = []
    for i, p in enumerate(spec):
        name = p["transform"]
        if name == "bucket":
            tf = {"bucket": int(p["n"])}
        elif name == "truncate":
            tf = {"truncate": int(p["width"])}
        else:
            tf = {"transform_without_inner": _TRANSFORM_ENUM[name]}
        fields.append(
            {
                "source_id": name_to_id.get(p.get("source", p["name"]), 0),
                "field_id": 1000 + i,  # Iceberg partition-field id range
                "name": p["name"],
                "transform": tf,
            }
        )
    return {"spec_id": 0, "partition_fields": fields}


def _partition_spec_from_proto(d: dict, id_to_name: dict[int, str]) -> list[dict]:
    out = []
    for f in d.get("partition_fields", []):
        tf = f.get("transform", {})
        entry: dict[str, Any] = {
            "name": f.get("name", ""),
            "source": id_to_name.get(f.get("source_id", 0), ""),
        }
        if "bucket" in tf:
            entry["transform"] = "bucket"
            entry["n"] = tf["bucket"]
        elif "truncate" in tf:
            entry["transform"] = "truncate"
            entry["width"] = tf["truncate"]
        else:
            entry["transform"] = _ENUM_TRANSFORM[tf.get("transform_without_inner", 0)]
        out.append(entry)
    return out


def _top_level_ids(schema: T.StructType) -> dict[str, int]:
    """Column name → field id for TOP-LEVEL columns under the same
    sequential numbering ``schema_to_proto`` emits."""
    ids = _Ids()
    out = {}
    for f in schema.fields:
        d = _field_to_proto(f.name, f.dataType, f.nullable, ids)
        out[f.name] = d["id"]
    return out


def request_to_proto(req: RewriteFilesRequest) -> bytes:
    name_to_id = _top_level_ids(req.schema)
    tasks = []
    for t in req.data_files + req.position_delete_files + req.equality_delete_files:
        if t.file_format not in _FORMAT_ENUM:
            # The reference DataFileFormat enum has no puffin/DV entry —
            # fail with a routable message instead of KeyError('puffin')
            # (r9 review find).
            raise ValueError(
                f"file format {t.file_format!r} is not representable on "
                "the proto wire (reference DataFileFormat: avro/orc/"
                "parquet); compact deletion vectors locally or use the "
                "JSON transport"
            )
        tasks.append(
            {
                "start": 0,
                "length": t.file_size_in_bytes,
                "record_count": t.record_count,
                "data_file_path": t.data_file_path,
                "data_file_content": t.content.value,
                "data_file_format": _FORMAT_ENUM[t.file_format],
                "sequence_number": t.sequence_number,
                "equality_ids": [name_to_id[c] for c in t.equality_ids],
            }
        )
    config = {
        "target_partitions": str(req.target_partitions),
        "data_file_prefix": req.data_file_prefix,
        "max_records_per_file": str(req.max_records_per_file),
    }
    if req.partition_by:
        # JSON, not ",".join — same comma-safety rule as
        # bloom_filter_cols (r9 review find).
        config["partition_by"] = json.dumps(req.partition_by)
    if req.sort_order:
        # The reference request proto carries no sort-order message
        # (only DataFile.sort_order_id); ride the config map.
        config["sort_order"] = json.dumps(req.sort_order)
        config["sort_order_id"] = str(req.sort_order_id)
    if req.zorder_by:
        config["zorder_by"] = json.dumps(req.zorder_by)
    if req.compression:
        config["compression"] = req.compression
    if req.bloom_filter_cols:
        # JSON, not ",".join — a column name containing a comma must
        # survive the round trip (same encoding as bloom_filter_ndv).
        config["bloom_filter_cols"] = json.dumps(req.bloom_filter_cols)
    if req.bloom_filter_ndv:
        config["bloom_filter_ndv"] = json.dumps(req.bloom_filter_ndv)
    if req.name_mapping:
        # Iceberg carries this as the schema.name-mapping.default table
        # property; the request proto has no field for it → config map.
        config["name_mapping"] = json.dumps(req.name_mapping)
    msg: dict[str, Any] = {
        "file_scan_task_descriptor": tasks,
        "rewrite_file_config": config,
        "dir_path": req.dir_path,
        "schema": schema_to_proto(req.schema),
    }
    if req.file_io:
        msg["file_io_builder"] = {
            "scheme_str": req.file_io.get("scheme", ""),
            "props": req.file_io.get("props", {}),
        }
    if req.partition_spec:
        msg["partition_spec"] = _partition_spec_to_proto(
            req.partition_spec, name_to_id
        )
    return encode("RewriteFilesRequest", msg)


def _parse_partition_by(raw: str | None) -> list[str]:
    """Comma-safe partition_by decoding: new writers send JSON (same
    rule as bloom_filter_cols); legacy payloads sent ",".join — accept
    both so old clients keep working (r9 review find)."""
    if not raw:
        return []
    if raw.startswith("["):
        try:
            return list(json.loads(raw))
        except ValueError:
            pass
    return raw.split(",")


def request_from_proto(buf: bytes) -> RewriteFilesRequest:
    d = decode("RewriteFilesRequest", buf)
    schema = schema_from_proto(d.get("schema", {}))
    id_to_name = {v: k for k, v in _top_level_ids(schema).items()}
    buckets: dict[FileContent, list[FileScanTask]] = {c: [] for c in FileContent}
    for t in d.get("file_scan_task_descriptor", []):
        content = FileContent(t.get("data_file_content", 0))
        buckets[content].append(
            FileScanTask(
                data_file_path=t.get("data_file_path", ""),
                sequence_number=t.get("sequence_number", 0),
                content=content,
                equality_ids=tuple(
                    id_to_name[i] for i in t.get("equality_ids", [])
                ),
                file_size_in_bytes=t.get("length", 0),
                record_count=t.get("record_count", 0),
                file_format=_FORMAT_NAME[t.get("data_file_format", _PARQUET)],
            )
        )
    cfg = d.get("rewrite_file_config", {})
    fio = d.get("file_io_builder")
    pspec = d.get("partition_spec")
    return RewriteFilesRequest(
        file_io=(
            {"scheme": fio.get("scheme_str", ""), "props": fio.get("props", {})}
            if fio
            else None
        ),
        partition_spec=(
            _partition_spec_from_proto(pspec, id_to_name) if pspec else None
        ),
        sort_order=(
            json.loads(cfg["sort_order"])
            if "sort_order" in cfg
            else None
        ),
        sort_order_id=int(cfg.get("sort_order_id", 0)),
        zorder_by=(
            json.loads(cfg["zorder_by"]) if "zorder_by" in cfg else None
        ),
        bloom_filter_cols=(
            json.loads(cfg["bloom_filter_cols"])
            if cfg.get("bloom_filter_cols")
            else None
        ),
        bloom_filter_ndv=(
            json.loads(cfg["bloom_filter_ndv"])
            if cfg.get("bloom_filter_ndv")
            else None
        ),
        compression=cfg.get("compression"),
        name_mapping=(
            json.loads(cfg["name_mapping"]) if cfg.get("name_mapping") else None
        ),
        schema=schema,
        data_files=buckets[FileContent.DATA],
        position_delete_files=buckets[FileContent.POSITION_DELETES],
        equality_delete_files=buckets[FileContent.EQUALITY_DELETES],
        dir_path=d.get("dir_path", ""),
        partition_by=_parse_partition_by(cfg.get("partition_by")),
        target_partitions=int(cfg.get("target_partitions", 4)),
        data_file_prefix=cfg.get("data_file_prefix", "10"),
        max_records_per_file=int(cfg.get("max_records_per_file", 0)),
    )


def response_to_proto(resp: RewriteFilesResponse, schema: T.StructType | None = None) -> bytes:
    name_to_id = _top_level_ids(schema) if schema is not None else {}
    files = []
    for f in resp.data_files:
        d: dict[str, Any] = {
            "content": 0,
            "file_path": f.file_path,
            "file_format": _FORMAT_ENUM.get(f.file_format, _PARQUET),
            "record_count": f.record_count,
            "file_size_in_bytes": f.file_size_in_bytes,
        }
        if f.partition_values:
            # The reference's StructLiteralDescriptor tables carry typed
            # partition tuples; the hive-dir string values are the same
            # information — ride the key_metadata bytes field as JSON
            # (reserved-for-encryption field the reference leaves empty).
            d["key_metadata"] = json.dumps(f.partition_values).encode()
        if f.sort_order_id is not None:
            d["sort_order_id"] = f.sort_order_id
        if f.column_stats and name_to_id:
            nulls, lowers, uppers = {}, {}, {}
            for col, st in f.column_stats.items():
                fid = name_to_id.get(col)
                if fid is None:
                    continue
                if st.get("null_count") is not None:
                    nulls[fid] = st["null_count"]
                # Bounds travel as UTF-8 of the stat's string form (the
                # reference uses Iceberg's binary single-value encoding;
                # same information, simpler codec).
                if st.get("min") is not None:
                    lowers[fid] = str(st["min"]).encode()
                if st.get("max") is not None:
                    uppers[fid] = str(st["max"]).encode()
            d["null_value_counts"] = nulls
            d["lower_bounds"] = lowers
            d["upper_bounds"] = uppers
        files.append(d)
    stat = {
        "rewritten_files_count": resp.stat.rewritten_files_count,
        "added_files_count": resp.stat.added_files_count,
        "rewritten_bytes": resp.stat.rewritten_bytes,
        "failed_data_files_count": resp.stat.failed_data_files_count,
    }
    return encode("RewriteFilesResponse", {"data_files": files, "stat": stat})


def response_from_proto(buf: bytes, schema: T.StructType | None = None) -> RewriteFilesResponse:
    d = decode("RewriteFilesResponse", buf)
    id_to_name = (
        {v: k for k, v in _top_level_ids(schema).items()} if schema is not None else {}
    )
    files = []
    for f in d.get("data_files", []):
        stats: dict[str, dict] = {}
        for fid, n in f.get("null_value_counts", {}).items():
            col = id_to_name.get(fid, str(fid))
            stats.setdefault(col, {})["null_count"] = n
        for key, label in (("lower_bounds", "min"), ("upper_bounds", "max")):
            for fid, raw in f.get(key, {}).items():
                col = id_to_name.get(fid, str(fid))
                stats.setdefault(col, {})[label] = raw.decode("utf-8", "replace")
        pv = None
        if f.get("key_metadata"):
            try:
                pv = json.loads(bytes(f["key_metadata"]).decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                pv = None
        files.append(
            DataFileMeta(
                file_path=f.get("file_path", ""),
                file_format=_FORMAT_NAME.get(
                    f.get("file_format", _PARQUET), "parquet"
                ),
                record_count=f.get("record_count", 0),
                file_size_in_bytes=f.get("file_size_in_bytes", 0),
                column_stats=stats or None,
                sort_order_id=f.get("sort_order_id"),
                partition_values=pv,
            )
        )
    s = d.get("stat", {})
    return RewriteFilesResponse(
        data_files=files,
        stat=RewriteFilesStat(
            rewritten_files_count=s.get("rewritten_files_count", 0),
            added_files_count=s.get("added_files_count", 0),
            rewritten_bytes=s.get("rewritten_bytes", 0),
            failed_data_files_count=s.get("failed_data_files_count", 0),
        ),
    )
