"""Distributed Avro DATA-file scans without the spark-avro module.

The reference scans Avro file tasks (format enum at
``core/src/parser/proto.rs:282-289`` — 0=Avro, 1=Orc, 2=Parquet), so an
engine claiming its surface must read Avro *data* files, not just Avro
*metadata*.  ``spark-avro`` is not bundled in this container, so this
module provides a genuinely distributed fallback:

    binaryFile scan (whole-file bytes, one row per file, executor-side)
      → mapInArrow (pure-Python Avro codec from sources/avro_io.py,
        Arrow-batched output)

Parallelism is per-file (each executor task decodes whole files) rather
than per-block — at scale the JVM ``spark-avro`` reader (splittable,
vectorized) is strictly better and ``read_files`` prefers it whenever
the class is present; this path keeps the format WORKING everywhere.

Row positions are computed during decode as the running record index
per file — exactly the reference's ``index_start`` accumulation
(``iceberg_file_task_scan.rs:234-247``) — so merge-on-read hidden
columns (file_path, pos) are exact over Avro data files too.
"""

from __future__ import annotations

import datetime
import decimal
import json
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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

from ic_spark.sources.avro_io import MAGIC, _decode

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


# ---------------------------------------------------- schema conversion


def _nonnull_branch(schema: Any) -> tuple[Any, bool]:
    """Unwrap an Avro ``[null, X]`` union → (X, nullable)."""
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise ValueError(f"only null-unions supported, got {schema}")
        return branches[0], True
    return schema, False


def avro_to_spark_type(schema: Any):
    """Avro writer schema → Spark type (logical types included)."""
    schema, _ = _nonnull_branch(schema)
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if logical == "date":
            return DateType()
        if logical in ("timestamp-micros", "timestamp-millis"):
            return TimestampType()
        if logical in ("local-timestamp-micros", "local-timestamp-millis"):
            return TimestampNTZType()
        if logical == "decimal":
            return DecimalType(schema["precision"], schema.get("scale", 0))
        if logical in ("time-micros", "time-millis"):
            # No native TIME in Spark: micros-since-midnight long
            # (SURVEY §1.2 mapping, same as Iceberg-Spark).
            return LongType()
        if t == "record":
            return StructType(
                [
                    StructField(
                        f["name"],
                        avro_to_spark_type(f["type"]),
                        _nonnull_branch(f["type"])[1],
                    )
                    for f in schema["fields"]
                ]
            )
        if t == "array":
            item, nullable = _nonnull_branch(schema["items"])
            return ArrayType(avro_to_spark_type(item), nullable)
        if t == "map":
            val, nullable = _nonnull_branch(schema["values"])
            return MapType(StringType(), avro_to_spark_type(val), nullable)
        if t == "enum":
            return StringType()
        if t == "fixed":
            return BinaryType()
        schema = t  # plain primitive spelled as {"type": "long"}
    prim = {
        "boolean": BooleanType(),
        "int": IntegerType(),
        "long": LongType(),
        "float": FloatType(),
        "double": DoubleType(),
        "string": StringType(),
        "bytes": BinaryType(),
    }.get(schema)
    if prim is None:
        raise ValueError(f"unsupported avro type: {schema!r}")
    return prim


def avro_to_spark_schema(avro_schema: dict) -> StructType:
    if avro_schema.get("type") != "record":
        raise ValueError("top-level avro schema must be a record")
    return avro_to_spark_type(avro_schema)


def _converter(schema: Any) -> Callable[[Any], Any] | None:
    """Value converter for decoded Avro → python objects Arrow accepts
    for the Spark type from ``avro_to_spark_type`` (None = identity)."""
    schema, _ = _nonnull_branch(schema)
    if not isinstance(schema, dict):
        return None
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical == "date":
        return lambda v: _EPOCH_DATE + datetime.timedelta(days=v)
    if logical == "timestamp-micros" or logical == "local-timestamp-micros":
        return lambda v: _EPOCH_TS + datetime.timedelta(microseconds=v)
    if logical == "timestamp-millis" or logical == "local-timestamp-millis":
        return lambda v: _EPOCH_TS + datetime.timedelta(milliseconds=v)
    if logical == "time-millis":
        # the Spark mapping is micros-since-midnight (LongType): scale,
        # or millis and micros files mix two units in one column
        # (r9 review find)
        return lambda v: v * 1000
    if logical == "decimal":
        scale = schema.get("scale", 0)

        def conv_dec(v, scale=scale):
            unscaled = int.from_bytes(v, "big", signed=True)
            # widened context: default 28-digit precision would round
            # decimal(p>28) values during scaleb
            with decimal.localcontext() as ctx:
                ctx.prec = 80
                return decimal.Decimal(unscaled).scaleb(-scale)

        return conv_dec
    if t == "record":
        subs = {f["name"]: _converter(f["type"]) for f in schema["fields"]}
        if not any(subs.values()):
            return None

        def conv_rec(v, subs=subs):
            return {
                k: (c(x) if c is not None and x is not None else x)
                for (k, c), x in zip(subs.items(), (v[k2] for k2 in subs))
            }

        return conv_rec
    if t == "array":
        sub = _converter(schema["items"])
        if sub is None:
            return None
        return lambda v, sub=sub: [sub(x) if x is not None else None for x in v]
    if t == "map":
        sub = _converter(schema["values"])
        if sub is None:
            return None
        return lambda v, sub=sub: {
            k: (sub(x) if x is not None else None) for k, x in v.items()
        }
    return None


# ------------------------------------------------------- header / bytes


def read_header(path: str, probe_bytes: int = 1 << 16) -> dict:
    """Parse ONLY the header of an Avro container → writer schema.

    Driver-side schema discovery without decoding data blocks; grows the
    probe window if a huge embedded schema overflows it.
    """
    with open(path, "rb") as f:
        buf = f.read(probe_bytes)
        while True:
            try:
                if buf[:4] != MAGIC:
                    raise ValueError(f"{path}: not an Avro container file")
                meta, _ = _decode({"type": "map", "values": "bytes"}, buf, 4, {})
                return json.loads(meta["avro.schema"].decode("utf-8"))
            except IndexError:
                more = f.read(probe_bytes)
                if not more:
                    raise ValueError(f"{path}: truncated Avro header") from None
                buf += more


def decode_container_bytes(buf: bytes, label: str = "<bytes>") -> tuple[dict, list[dict]]:
    """Decode a whole Avro object-container from bytes →
    (schema, records).  Thin wrapper over the canonical loop in
    :func:`ic_spark.sources.avro_io.decode_container`."""
    from ic_spark.sources.avro_io import decode_container

    schema, _meta, records = decode_container(buf, label=label)
    return schema, records


# ---------------------------------------------------- distributed scan

FILE_PATH_COL = "_avro_file_path"
POS_COL = "_avro_pos"


def read_avro_distributed(
    spark: SparkSession,
    paths: list[str] | str,
    schema: StructType | None = None,
    columns: list[str] | None = None,
    with_path_pos: bool = False,
    with_path: bool = False,
    batch_rows: int = 65536,
) -> DataFrame:
    """Read Avro container files into a DataFrame without spark-avro.

    Files are distributed by a ``binaryFile`` scan; each executor task
    decodes its files with the pure-Python codec and emits Arrow
    batches via ``mapInArrow`` (float NaN survives as a value).
    ``with_path_pos=True`` appends
    ``_avro_file_path`` / ``_avro_pos`` (running record index per file,
    decode order) for merge-on-read hidden columns; ``with_path=True``
    appends only the path (partition fill needs no positions — skips
    building a position array per batch).

    ``schema`` (Spark) overrides discovery; otherwise the writer schema
    embedded in the first file's header defines it.  ``columns`` prunes
    the output post-decode (Avro is row-major: every field must be
    decoded to advance the stream, so pruning cannot reach the codec).
    """
    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        raise ValueError("no paths")

    if schema is None:
        # Driver-local header read ONLY for discovery: with an explicit
        # schema it was pure wasted I/O and crashed outright on remote
        # URIs/globs the distributed binaryFile scan handles fine
        # (r9 review find).
        schema = avro_to_spark_schema(read_header(paths[0]))
    field_names = [f.name for f in schema.fields]
    if columns:
        field_names = [c for c in field_names if c in set(columns)]
        schema = StructType([f for f in schema.fields if f.name in set(columns)])
    if not field_names and not (with_path or with_path_pos):
        # Arrow batches cannot carry rows without columns — a zero-
        # column projection silently returned 0 rows (same guard as the
        # ORC scan; r9 review find).
        raise ValueError(
            "read_avro_distributed: empty projection (no requested "
            "column exists in the schema and with_path/with_path_pos "
            "are False)"
        )

    with_path = with_path or with_path_pos
    out_schema = schema
    if with_path:
        extra = [StructField(FILE_PATH_COL, StringType(), False)]
        if with_path_pos:
            extra.append(StructField(POS_COL, LongType(), False))
        out_schema = StructType(list(schema.fields) + extra)

    wanted = set(field_names)

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_out = to_arrow_schema(out_schema)

    def decode_files(batches):
        # Converters are built PER FILE from each container's embedded
        # writer schema (cached by schema text): files whose schemas
        # diverged under evolution (e.g. timestamp-millis vs -micros)
        # each get their own logical-type conversion, instead of
        # inheriting the first file's.
        #
        # Output goes back as Arrow batches directly (mapInArrow):
        # pa.array() keeps float NaN a VALUE — the old pandas bridge's
        # from_pandas conversion silently collapsed NaN to null.
        conv_cache: dict[str, dict] = {}

        def converters_for(fschema: dict) -> dict:
            key = json.dumps(fschema, sort_keys=True)
            if key not in conv_cache:
                conv_cache[key] = {
                    f["name"]: _converter(f["type"])
                    for f in fschema["fields"]
                    if f["name"] in wanted
                }
            return conv_cache[key]

        for rb in batches:
            tbl = pa.table(rb)
            for path, content in zip(
                tbl.column("path").to_pylist(), tbl.column("content").to_pylist()
            ):
                fschema, records = decode_container_bytes(
                    bytes(content), str(path)
                )
                converters = converters_for(fschema)
                for start in range(0, max(len(records), 1), batch_rows):
                    chunk = records[start : start + batch_rows]
                    arrays = []
                    for name in field_names:
                        conv = converters.get(name)
                        vals = [r.get(name) for r in chunk]
                        if conv is not None:
                            vals = [
                                conv(v) if v is not None else None for v in vals
                            ]
                        arrays.append(
                            pa.array(vals, type=arrow_out.field(name).type)
                        )
                    if with_path:
                        arrays.append(
                            pa.array([str(path)] * len(chunk), type=pa.string())
                        )
                    if with_path_pos:
                        arrays.append(
                            pa.array(
                                range(start, start + len(chunk)), type=pa.int64()
                            )
                        )
                    yield pa.RecordBatch.from_arrays(arrays, schema=arrow_out)

    files = spark.read.format("binaryFile").load(paths)
    return files.select("path", "content").mapInArrow(
        decode_files, schema=out_schema
    )
