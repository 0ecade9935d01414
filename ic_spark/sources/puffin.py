"""Puffin file format + deletion-vector blobs (Iceberg v3 analog).

Iceberg v3 replaces position-delete FILES with deletion VECTORS: one
compressed bitmap of deleted row positions per data file, stored as a
``deletion-vector-v1`` blob inside a Puffin container.  Neither format
ships with Spark, so both are hand-rolled here from the PUBLIC specs —
the same approach as the Avro object-container codec
(sources/avro_io.py) and the proto3 wire codec (compaction/proto.py):

- **Puffin** (Apache Iceberg Puffin spec): ``PFA1`` magic, concatenated
  blobs, footer = magic + JSON payload (blob offsets/lengths/types/
  properties) + payload size + flags + magic.
- **Roaring bitmaps** (RoaringFormatSpec): the 64-bit "portable"
  layout — u64 bucket count, then per bucket a u32 high key + a
  standard 32-bit roaring serialization (array / bitmap / run
  containers).  Writing emits array/bitmap containers; reading accepts
  run containers too (other writers produce them).
- **DV blob framing** (Iceberg v3 spec): 4-byte big-endian length of
  magic+vector, magic ``D1 D3 39 64``, the portable vector, 4-byte
  big-endian CRC-32 of magic+vector.

Positions are non-negative row indexes (< 2^63); the bitmap makes a
100M-row delete set a few MB instead of a table-length parquet file.
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass, field

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"
DV_BLOB_TYPE = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_BITMAP_THRESHOLD = 4096  # containers above this cardinality use bitsets


# ------------------------------------------------- 32-bit roaring codec


def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard 32-bit roaring serialization (array/bitmap containers).

    ``values`` must be sorted unique uint32.
    """
    # split into (high16 -> low16 list) containers, preserving order
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        hi, lo = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == hi:
            containers[-1][1].append(lo)
        else:
            containers.append((hi, [lo]))
    n = len(containers)
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for hi, lows in containers:
        out += struct.pack("<HH", hi, len(lows) - 1)
    # offset header (always present for the no-run cookie)
    offset = len(out) + 4 * n
    for _, lows in containers:
        out += struct.pack("<I", offset)
        offset += (
            8192 if len(lows) > _BITMAP_THRESHOLD else 2 * len(lows)
        )
    for _, lows in containers:
        if len(lows) > _BITMAP_THRESHOLD:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            out += bits
        else:
            out += struct.pack(f"<{len(lows)}H", *lows)
    return bytes(out)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode a standard 32-bit roaring serialization → sorted values.

    Accepts array, bitmap and run containers.
    """
    (cookie,) = struct.unpack_from("<I", buf, pos)
    has_run = (cookie & 0xFFFF) == _SERIAL_COOKIE
    if has_run:
        n = (cookie >> 16) + 1
        pos += 4
        run_flags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
    else:
        raise ValueError(f"bad roaring cookie: {cookie}")
    keys_cards = []
    for i in range(n):
        hi, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((hi, card_m1 + 1))
    if not has_run or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header (we read sequentially)
    values: list[int] = []
    for i, (hi, card) in enumerate(keys_cards):
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        base = hi << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif card > _BITMAP_THRESHOLD:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    bit = b & -b
                    values.append(base + byte_i * 8 + bit.bit_length() - 1)
                    b ^= bit
        else:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + lo for lo in lows)
    return values, pos


# ------------------------------------------------- 64-bit portable codec


def serialize_roaring64(positions: list[int]) -> bytes:
    """Portable 64-bit roaring: u64 LE bucket count, then per bucket a
    u32 LE high key + standard 32-bit serialization of the lows."""
    vals = sorted(set(positions))
    if vals and (vals[0] < 0 or vals[-1] >= 1 << 63):
        raise ValueError("positions must be in [0, 2^63)")
    buckets: list[tuple[int, list[int]]] = []
    for v in vals:
        hi, lo = v >> 32, v & 0xFFFFFFFF
        if buckets and buckets[-1][0] == hi:
            buckets[-1][1].append(lo)
        else:
            buckets.append((hi, [lo]))
    out = bytearray(struct.pack("<Q", len(buckets)))
    for hi, lows in buckets:
        out += struct.pack("<I", hi)
        out += _serialize_roaring32(lows)
    return bytes(out)


def deserialize_roaring64(buf: bytes) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _deserialize_roaring32(buf, pos)
        values.extend((hi << 32) + lo for lo in lows)
    return values


# ------------------------------------------------------- DV blob framing


def serialize_dv_blob(positions: list[int]) -> bytes:
    """deletion-vector-v1 payload: len(magic+vector) BE, magic, vector,
    CRC-32(magic+vector) BE."""
    vector = serialize_roaring64(positions)
    body = DV_MAGIC + vector
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def deserialize_dv_blob(blob: bytes) -> list[int]:
    (body_len,) = struct.unpack_from(">I", blob, 0)
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError("bad deletion-vector magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    if crc != zlib.crc32(body) & 0xFFFFFFFF:
        raise ValueError("deletion-vector CRC mismatch")
    return deserialize_roaring64(body[4:])


# ----------------------------------------------------------- puffin file


@dataclass
class PuffinBlob:
    type: str
    data: bytes
    properties: dict[str, str] = field(default_factory=dict)
    # populated on read / after write
    offset: int = 0
    length: int = 0


def write_puffin(
    path: str,
    blobs: list[PuffinBlob],
    properties: dict | None = None,
    filesystem=None,
) -> None:
    """Write a Puffin container: magic, blobs, footer (magic + JSON
    payload + payload size LE + flags + magic).

    ``filesystem`` (a ``pyarrow.fs.FileSystem``) streams through
    ``open_output_stream`` + move — the object-store routing the
    avro/orc writers and the table-metadata plane use; local paths keep
    the temp + ``os.replace`` publish."""
    import os

    out = bytearray(PUFFIN_MAGIC)
    metas = []
    for b in blobs:
        b.offset = len(out)
        b.length = len(b.data)
        out += b.data
        metas.append(
            {
                "type": b.type,
                "fields": [],
                "offset": b.offset,
                "length": b.length,
                "compression-codec": None,
                "properties": b.properties,
            }
        )
    payload = json.dumps(
        {"blobs": metas, "properties": properties or {}}
    ).encode("utf-8")
    out += PUFFIN_MAGIC
    out += payload
    out += struct.pack("<I", len(payload))
    out += struct.pack("<I", 0)  # flags: footer payload uncompressed
    out += PUFFIN_MAGIC
    if filesystem is not None:
        import uuid as _uuid

        parent = path.rsplit("/", 1)[0] if "/" in path else ""
        if parent:
            filesystem.create_dir(parent, recursive=True)
        tmp = path + f".tmp-{_uuid.uuid4().hex[:8]}"
        with filesystem.open_output_stream(tmp) as f:
            f.write(bytes(out))
        filesystem.move(tmp, path)
        return
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(bytes(out))
    os.replace(tmp, path)


def read_puffin(source) -> list[PuffinBlob]:
    """Read a Puffin container from a path or bytes → blobs with data."""
    buf = source if isinstance(source, (bytes, bytearray)) else open(source, "rb").read()
    buf = bytes(buf)
    if buf[:4] != PUFFIN_MAGIC or buf[-4:] != PUFFIN_MAGIC:
        raise ValueError("not a Puffin file")
    (flags,) = struct.unpack_from("<I", buf, len(buf) - 8)
    (payload_size,) = struct.unpack_from("<I", buf, len(buf) - 12)
    payload = buf[len(buf) - 12 - payload_size : len(buf) - 12]
    if flags & 1:
        raise ValueError("compressed footer payload not supported")
    meta = json.loads(payload.decode("utf-8"))
    blobs = []
    for m in meta["blobs"]:
        blobs.append(
            PuffinBlob(
                type=m["type"],
                data=buf[m["offset"] : m["offset"] + m["length"]],
                properties=m.get("properties", {}),
                offset=m["offset"],
                length=m["length"],
            )
        )
    return blobs


def write_deletion_vector_file(
    path: str, dvs: dict[str, list[int]]
) -> dict[str, dict]:
    """Write one Puffin file holding one DV blob per referenced data
    file.  Returns {data_file_path: {"offset", "length", "cardinality"}}
    for manifest entries."""
    blobs = []
    for data_file, positions in sorted(dvs.items()):
        blobs.append(
            PuffinBlob(
                type=DV_BLOB_TYPE,
                data=serialize_dv_blob(positions),
                properties={
                    "referenced-data-file": data_file,
                    "cardinality": str(len(set(positions))),
                },
            )
        )
    write_puffin(path, blobs)
    return {
        b.properties["referenced-data-file"]: {
            "offset": b.offset,
            "length": b.length,
            "cardinality": int(b.properties["cardinality"]),
        }
        for b in blobs
    }


def read_deletion_vectors(source) -> dict[str, list[int]]:
    """Read every DV blob from a Puffin file → {data_file: positions}.
    Multiple blobs for one data file union (defensive; writers emit
    one per file)."""
    out: dict[str, set[int]] = {}
    for b in read_puffin(source):
        if b.type != DV_BLOB_TYPE:
            continue
        ref = b.properties.get("referenced-data-file", "")
        out.setdefault(ref, set()).update(deserialize_dv_blob(b.data))
    return {k: sorted(v) for k, v in out.items()}
