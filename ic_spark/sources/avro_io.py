"""Pure-Python Avro object-container codec (Avro 1.x spec, binary encoding).

The container lacks ``spark-avro``/``fastavro``, but Iceberg METADATA is
Avro: manifest lists and manifest files are Avro object-container files
(Iceberg spec, "Manifests").  Spec-format table metadata therefore needs
an Avro codec — hand-rolled here from the PUBLIC Avro 1.11 specification
(binary encoding + object container file), the same approach as the
hand-rolled proto3 wire codec in ``compaction/proto.py``.

Scope: everything Iceberg metadata uses — records, unions (null | X),
arrays, maps, all primitives, fixed, enums — with ``null`` and
``deflate`` (RFC 1951, raw zlib) block codecs.  Reading decodes strictly
by the writer schema embedded in the file header (no reader-schema
resolution: Iceberg metadata is always read with its own schema).

This is METADATA-scale I/O: manifests are KB-MB files read on the
driver during planning, exactly as the reference reads them
(core/src/compaction/mod.rs scan planning).  Avro DATA file scans remain
environment-gated in sources/formats.py — at 100 TB those must be
distributed executor reads, which needs spark-avro.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Iterable

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# ------------------------------------------------------------- encoding


def _zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift, u = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _resolve(schema: Any, named: dict[str, Any]) -> Any:
    """Follow a by-name schema reference (records/enums/fixed reuse)."""
    if isinstance(schema, str) and schema in named:
        return named[schema]
    return schema


def _register(schema: Any, named: dict[str, Any]) -> None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        name = schema.get("name")
        if name:
            named[name] = schema


def _encode(schema: Any, value: Any, out: bytearray, named: dict[str, Any]) -> None:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union: index + encoded branch
        idx = _union_branch(schema, value, named)
        out += _zigzag_encode(idx)
        _encode(schema[idx], value, out, named)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        b = bytes(value)
        out += _zigzag_encode(len(b)) + b
    elif t == "string":
        b = str(value).encode("utf-8")
        out += _zigzag_encode(len(b)) + b
    elif t == "fixed":
        _register(schema, named)
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size {schema['size']} != {len(b)}")
        out += b
    elif t == "enum":
        _register(schema, named)
        out += _zigzag_encode(schema["symbols"].index(value))
    elif t == "array":
        if value:
            out += _zigzag_encode(len(value))
            for item in value:
                _encode(schema["items"], item, out, named)
        out += _zigzag_encode(0)
    elif t == "map":
        if value:
            out += _zigzag_encode(len(value))
            for k, v in value.items():
                _encode("string", k, out, named)
                _encode(schema["values"], v, out, named)
        out += _zigzag_encode(0)
    elif t == "record":
        _register(schema, named)
        for f in schema["fields"]:
            try:
                _encode(f["type"], value.get(f["name"]), out, named)
            except Exception as e:
                raise ValueError(
                    f"encoding field '{f['name']}' of record "
                    f"'{schema.get('name')}': {e}"
                ) from e
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def _union_branch(union: list, value: Any, named: dict[str, Any]) -> int:
    def kind(s: Any) -> str:
        s = _resolve(s, named)
        return s["type"] if isinstance(s, dict) else s

    if value is None:
        for i, s in enumerate(union):
            if kind(s) == "null":
                return i
        raise ValueError("null not allowed by union")
    # first non-null branch that structurally accepts the value
    for i, s in enumerate(union):
        k = kind(s)
        if k == "null":
            continue
        if k in ("record", "map") and isinstance(value, dict):
            return i
        if k == "array" and isinstance(value, (list, tuple)):
            return i
        if k in ("bytes", "fixed") and isinstance(value, (bytes, bytearray)):
            return i
        if k in ("string", "enum") and isinstance(value, str):
            return i
        if k in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if k in ("float", "double") and isinstance(value, (int, float)) and not isinstance(value, bool):
            return i
        if k == "boolean" and isinstance(value, bool):
            return i
    raise ValueError(f"no union branch for {type(value).__name__}")


def _decode(schema: Any, buf: bytes, pos: int, named: dict[str, Any]) -> tuple[Any, int]:
    schema = _resolve(schema, named)
    if isinstance(schema, list):
        idx, pos = _zigzag_decode(buf, pos)
        return _decode(schema[idx], buf, pos, named)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    if t == "fixed":
        _register(schema, named)
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if t == "enum":
        _register(schema, named)
        idx, pos = _zigzag_decode(buf, pos)
        return schema["symbols"][idx], pos
    if t == "array":
        out = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                item, pos = _decode(schema["items"], buf, pos, named)
                out.append(item)
    if t == "map":
        out = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _decode("string", buf, pos, named)
                v, pos = _decode(schema["values"], buf, pos, named)
                out[k] = v
    if t == "record":
        _register(schema, named)
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _decode(f["type"], buf, pos, named)
        return rec, pos
    raise ValueError(f"unsupported avro type: {t!r}")


# ----------------------------------------------------- container files


def write_container(
    path: str,
    schema: dict,
    records: "list[dict] | Iterable[list[dict]]",
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
    sync_marker: bytes | None = None,
    filesystem=None,
) -> None:
    """Write an Avro object-container file.

    ``records`` as a plain list writes a single data block (Iceberg
    manifests are single-block files in practice; a deterministic
    ``sync_marker`` may be passed for reproducible bytes).  ``records``
    as any other iterable is treated as a stream of record CHUNKS —
    one container block per non-empty chunk, each encoded, compressed
    and written to disk before the next is pulled, so peak memory is
    one block, not the whole file (the data-file writer's flush units
    can be arbitrarily large).

    ``filesystem`` (a ``pyarrow.fs.FileSystem``) streams the container
    through ``open_output_stream`` instead of local ``open``.  No
    tmp+rename there: object stores make a single PUT atomically
    visible, and rename is the object-store anti-pattern the local
    path's ``os.replace`` would otherwise impose.
    """
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = sync_marker or os.urandom(SYNC_SIZE)
    if len(sync) != SYNC_SIZE:
        raise ValueError("sync marker must be 16 bytes")
    named: dict[str, Any] = {}

    meta = {"avro.schema": json.dumps(schema), "avro.codec": codec}
    for k, v in (metadata or {}).items():
        meta[k] = v

    head = bytearray()
    head += MAGIC
    _encode(
        {"type": "map", "values": "bytes"},
        {k: v.encode("utf-8") if isinstance(v, str) else v for k, v in meta.items()},
        head,
        named,
    )
    head += sync

    chunks = [records] if isinstance(records, list) else records

    def _stream(f) -> None:
        f.write(bytes(head))
        for chunk in chunks:
            if not chunk:
                continue
            body = bytearray()
            for rec in chunk:
                _encode(schema, rec, body, named)
            payload = bytes(body)
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw RFC-1951
            block = bytearray()
            block += _zigzag_encode(len(chunk))
            block += _zigzag_encode(len(payload))
            block += payload
            block += sync
            f.write(bytes(block))

    if filesystem is not None:
        with filesystem.open_output_stream(path) as f:
            _stream(f)
        return
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        _stream(f)
    os.replace(tmp, path)


def decode_container(
    buf: bytes, label: str = "<bytes>"
) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Decode one Avro object-container from bytes →
    (schema, raw metadata map, records).  The ONE block-decode loop —
    ``read_container`` and the distributed scan both delegate here
    (two hand-synced copies diverged once; r9 review find)."""
    if buf[:4] != MAGIC:
        raise ValueError(f"{label}: not an Avro container file")
    named: dict[str, Any] = {}
    meta, pos = _decode({"type": "map", "values": "bytes"}, buf, 4, named)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf[pos : pos + SYNC_SIZE]
    pos += SYNC_SIZE
    records: list[dict] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + SYNC_SIZE] != sync:
            raise ValueError(f"{label}: bad sync marker (corrupt block)")
        pos += SYNC_SIZE
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        bpos = 0
        for _ in range(count):
            rec, bpos = _decode(schema, block, bpos, named)
            records.append(rec)
    return schema, meta, records


def read_container(
    path: str, filesystem=None
) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an Avro object-container file → (schema, metadata, records).

    ``filesystem`` (a ``pyarrow.fs.FileSystem``) reads through
    ``open_input_stream`` — the read half of ``write_container``'s
    object-store routing (spec-table manifests on remote roots)."""
    if filesystem is not None:
        with filesystem.open_input_stream(path) as f:
            buf = f.readall()
    else:
        with open(path, "rb") as f:
            buf = f.read()
    schema, meta, records = decode_container(buf, label=path)
    return (
        schema,
        {k: v for k, v in meta.items() if not k.startswith("avro.")},
        records,
    )
