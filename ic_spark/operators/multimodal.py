"""Multimodal (image/audio/video) column plumbing.

Media items are opaque ``binary`` payloads plus a typed metadata
struct.  All Spark-side mechanics are real — schema, Arrow-batched
``mapInPandas`` transforms, partition sizing — and so are the common
codecs, implemented pure-Python/numpy in-repo (no external media
libraries):

- REAL decode: baseline + progressive JPEG (``jpeg_codec.py``),
  PNG incl. 16-bit, GIF (static + animated frame compositing with
  disposal 0-3), BMP, PPM/PGM, WAV-PCM, FLAC native and
  Ogg-encapsulated (``flac_codec.py``, CRC-8/CRC-16 verified),
  Ogg-Vorbis (``vorbis_codec.py`` — floor 1, residues 0/1/2,
  square-polar coupling, block switching), and MJPEG-AVI /
  animated-GIF frame extraction for video sampling.
- GATED (strict mode raises ``NotImplementedError``; non-strict
  produces a clearly-marked deterministic fake derived from the
  payload bytes): MP3, AAC, H.264/H.265 — see README "operating
  limits" for why these are gated rather than implemented (their
  normative code tables exist only as published table data with no
  authoritative copy here; Vorbis is self-describing, so it could be
  implemented conformantly).  Corrupt/truncated payloads of REAL
  formats decode to None (bad bytes are data, not errors, at 100 TB).

Scale notes baked into the design:

- ``mapInPandas`` processes Arrow batches; ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` bounds batch memory when payloads are large.
- Binary payloads should ride in their own column so Parquet column
  pruning skips them when a query touches only metadata.
- repartition by a size-balanced key before heavy decode so one
  executor doesn't get all the 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator
import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha", StringType(), True),
        # REAL header-parsed metadata (parse_media_header — pure-Python
        # container parsing, no codec library):
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        # pixel-level feature — the stubbed codec boundary:
        StructField("feature", StringType(), True),
    ]
)


# --------------------------------------------------- real header parsing
#
# Format-parsed metadata from container HEADERS — pure-Python byte
# parsing from the public format specs (PNG IHDR, JPEG SOF segments,
# GIF logical screen descriptor, RIFF/WAVE fmt+data chunks), the same
# hand-rolled-codec approach as sources/avro_io.py and
# sources/puffin.py.  This is REAL metadata (no codec library needed);
# only pixel/sample DECODE remains behind the strict-mode gate.

# JPEG SOF markers that carry frame dimensions (C4/C8/CC are
# huffman/arithmetic tables, not frames).
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def parse_media_header(payload: bytes | None) -> dict:
    """Sniff + parse a media container header → metadata dict.

    Returns ``{"format": str|None, "width": int|None, "height":
    int|None, "duration_ms": int|None}``; unknown or truncated payloads
    yield a dict of Nones (never raises — corrupt bytes are data, not
    errors, in a 100 TB ingest).  Parsed values are RANGE-VALIDATED to
    the output schema's Int32/Int64 domains: a corrupt PNG IHDR width
    of 2^32-1 previously crashed the whole mapInPandas task at
    pd.array(dtype='Int32') — one flipped header byte killing a 100 TB
    ingest job (r10 review find, reproduced)."""
    meta = _parse_media_header_raw(payload)
    for k, bound in (("width", 1 << 31), ("height", 1 << 31),
                     ("duration_ms", 1 << 63)):
        v = meta.get(k)
        if v is not None and not (0 <= v < bound):
            meta[k] = None
    return meta


def _parse_media_header_raw(payload: bytes | None) -> dict:
    none = {"format": None, "width": None, "height": None, "duration_ms": None}
    if not payload:
        return none
    b = bytes(payload)
    try:
        # PNG: 8-byte signature, then the IHDR chunk (must be first):
        # 4-byte length, "IHDR", width/height as big-endian u32.
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w = int.from_bytes(b[16:20], "big")
            h = int.from_bytes(b[20:24], "big")
            return {"format": "png", "width": w, "height": h, "duration_ms": None}
        # GIF: "GIF87a"/"GIF89a" + little-endian u16 screen w/h.
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w = int.from_bytes(b[6:8], "little")
            h = int.from_bytes(b[8:10], "little")
            return {"format": "gif", "width": w, "height": h, "duration_ms": None}
        # JPEG: walk the marker segments to the first SOFn frame header:
        # [precision u8][height u16][width u16] big-endian.
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xD9:  # EOI
                    break
                if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # bare markers
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in _JPEG_SOF and i + 9 <= len(b):
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return {
                        "format": "jpeg",
                        "width": w,
                        "height": h,
                        "duration_ms": None,
                    }
                i += 2 + seg_len
            return {"format": "jpeg", "width": None, "height": None, "duration_ms": None}
        # BMP: "BM" magic; BITMAPINFOHEADER width/height (little-endian,
        # height may be negative for top-down storage).
        if b[:2] == b"BM" and len(b) >= 26:
            w = int.from_bytes(b[18:22], "little", signed=True)
            h = abs(int.from_bytes(b[22:26], "little", signed=True))
            return {"format": "bmp", "width": w, "height": h, "duration_ms": None}
        # PPM/PGM (binary): "P6"/"P5" + ASCII width/height tokens.
        if b[:2] in (b"P6", b"P5"):
            toks = _ppm_header_tokens(b)
            if toks is not None:
                _, w, h, _, _ = toks
                return {
                    "format": "ppm" if b[:2] == b"P6" else "pgm",
                    "width": w,
                    "height": h,
                    "duration_ms": None,
                }
        # FLAC: "fLaC" magic; STREAMINFO (first metadata block) packs
        # rate(20) channels(3) bps(5) total_samples(36) after the
        # block-size/frame-size fields.  Ogg-encapsulated FLAC (RFC
        # 3533 "OggS" page whose first packet is "\x7fFLAC" + the
        # native fLaC stream) is the same container payload at an
        # offset — locate the embedded signature and parse from there.
        off = None
        if b[:4] == b"fLaC":
            off = 0
        elif b[:4] == b"OggS" and b"\x7fFLAC" in b[:128]:
            idx = b.find(b"fLaC", 0, 256)
            if idx >= 0:
                off = idx
        if off is not None and len(b) >= off + 8 + 18:
            b = b[off:]
            btype = b[4] & 0x7F
            size = int.from_bytes(b[5:8], "big")
            if btype == 0 and size >= 34 and len(b) >= 8 + 18:
                u = int.from_bytes(b[8 + 10 : 8 + 18], "big")
                rate = u >> 44
                total = u & ((1 << 36) - 1)
                dur = total * 1000 // rate if rate and total else None
                return {
                    "format": "flac",
                    "width": None,
                    "height": None,
                    "duration_ms": dur,
                }
            return {
                "format": "flac",
                "width": None,
                "height": None,
                "duration_ms": None,
            }
        # Ogg-Vorbis: the first packet is "\x01vorbis" + the ID header
        # (u32 version, u8 channels, u32 rate LE, ...); duration comes
        # from the LAST page's granule position (total PCM samples).
        if b[:4] == b"OggS" and b"\x01vorbis" in b[:128]:
            idx = b.find(b"\x01vorbis")
            rate = None
            if len(b) >= idx + 16:
                rate = int.from_bytes(b[idx + 12 : idx + 16], "little")
            # Granules must come from the VORBIS stream's pages only: a
            # multiplexed (e.g. Theora+Vorbis) or chained Ogg carries
            # other serials whose granules are frame counts, not PCM
            # samples.  The serial of the page holding the ID packet
            # identifies the audio stream.
            granule = None
            serial = None
            i = 0
            while i + 27 <= len(b) and b[i : i + 4] == b"OggS":
                nsegs = b[i + 26]
                page_end = i + 27 + nsegs + sum(b[i + 27 : i + 27 + nsegs])
                page_serial = int.from_bytes(b[i + 14 : i + 18], "little")
                if serial is None and i <= idx < page_end:
                    serial = page_serial
                if page_serial == serial:
                    g = int.from_bytes(
                        b[i + 6 : i + 14], "little", signed=True
                    )
                    if g > 0:
                        granule = g
                i = page_end
            dur = (
                granule * 1000 // rate if rate and granule else None
            )
            return {
                "format": "vorbis",
                "width": None,
                "height": None,
                "duration_ms": dur,
            }
        # MP4 / ISO-BMFF: walk top-level boxes to moov, then mvhd
        # (timescale + duration) and the first tkhd (track width/height
        # as 16.16 fixed-point).
        if len(b) >= 12 and b[4:8] == b"ftyp":
            return _parse_mp4(b)
        # AVI: RIFF container; avih main header carries
        # microsec-per-frame, total frames and frame dimensions.
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            i = 12
            stack = [(12, len(b))]
            while stack:
                s, e = stack.pop()
                i = s
                while i + 8 <= e:
                    cid = b[i : i + 4]
                    size = int.from_bytes(b[i + 4 : i + 8], "little")
                    body = i + 8
                    if body + size > e:
                        break
                    if cid == b"LIST":
                        stack.append((body + 4, body + size))
                    elif cid == b"avih" and size >= 40:
                        usec = int.from_bytes(b[body : body + 4], "little")
                        nfr = int.from_bytes(b[body + 16 : body + 20], "little")
                        w = int.from_bytes(b[body + 32 : body + 36], "little")
                        hh = int.from_bytes(b[body + 36 : body + 40], "little")
                        dur = usec * nfr // 1000 if usec and nfr else None
                        return {
                            "format": "avi",
                            "width": w or None,
                            "height": hh or None,
                            "duration_ms": dur,
                        }
                    i = body + size + (size % 2)
            return {
                "format": "avi",
                "width": None,
                "height": None,
                "duration_ms": None,
            }
        # WAV: RIFF container; fmt chunk gives byte rate, data chunk
        # size / byte rate gives duration.
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            byte_rate = None
            data_size = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                size = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 16 + 12 <= len(b):
                    byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
                elif cid == b"data":
                    data_size = size
                i += 8 + size + (size % 2)  # chunks are word-aligned
            dur = (
                int(data_size * 1000 / byte_rate)
                if byte_rate and data_size is not None
                else None
            )
            return {"format": "wav", "width": None, "height": None, "duration_ms": dur}
    except (IndexError, ValueError, ZeroDivisionError):
        return none
    return none


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in
    ``b[start:end]`` (32-bit and 64-bit largesize forms)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        btype = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            body = i + 16
        elif size == 0:  # to end of file
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, body, i + size
        i += size


def _parse_mp4(b: bytes) -> dict:
    """ISO-BMFF (MP4) header metadata: mvhd timescale/duration and the
    first visual track's tkhd width/height (16.16 fixed-point)."""
    out = {"format": "mp4", "width": None, "height": None, "duration_ms": None}
    for btype, s, e in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ityp, is_, ie in _mp4_boxes(b, s, e):
            if ityp == b"mvhd":
                ver = b[is_]
                if ver == 1:
                    ts = int.from_bytes(b[is_ + 20 : is_ + 24], "big")
                    dur = int.from_bytes(b[is_ + 24 : is_ + 32], "big")
                else:
                    ts = int.from_bytes(b[is_ + 12 : is_ + 16], "big")
                    dur = int.from_bytes(b[is_ + 16 : is_ + 20], "big")
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif ityp == b"trak":
                for ttyp, ts_, te in _mp4_boxes(b, is_, ie):
                    if ttyp != b"tkhd":
                        continue
                    # width sits after verflags + times/ids + the
                    # layer/volume block (16) + the 3x3 matrix (36):
                    # body+76 for version 0, body+88 for version 1.
                    ver = b[ts_]
                    off = ts_ + (76 if ver == 0 else 88)
                    w = int.from_bytes(b[off : off + 4], "big") >> 16
                    h = int.from_bytes(b[off + 4 : off + 8], "big") >> 16
                    if w and h and out["width"] is None:
                        out["width"] = w
                        out["height"] = h
        break
    return out


def with_media_headers(df: DataFrame) -> DataFrame:
    """Fill width/height/duration_ms from REAL header parsing over the
    payload column (Arrow-batched; already-set values win — a decode
    stage may have produced better numbers)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            parsed = [parse_media_header(p) for p in pdf["payload"]]
            for col, key in (
                ("width", "width"),
                ("height", "height"),
                ("duration_ms", "duration_ms"),
            ):
                vals = [m[key] for m in parsed]
                pdf[col] = [
                    cur if cur is not None and not pd.isna(cur) else new
                    for cur, new in zip(pdf[col], vals)
                ]
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def _ppm_header_tokens(b: bytes):
    """Parse a binary PPM/PGM header → (magic, width, height, maxval,
    data_offset) or None.  ASCII tokens separated by whitespace, ``#``
    comments to end-of-line, one whitespace byte before the raster."""
    try:
        magic = b[:2].decode("ascii")
        i, toks = 2, []
        while len(toks) < 3 and i < len(b):
            c = b[i : i + 1]
            if c == b"#":
                while i < len(b) and b[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(b) and not b[j : j + 1].isspace():
                    j += 1
                toks.append(int(b[i:j]))
                i = j
        if len(toks) < 3 or i >= len(b) or not b[i : i + 1].isspace():
            return None
        w, h, maxval = toks
        return magic, w, h, maxval, i + 1  # one whitespace byte, then raster
    except (ValueError, UnicodeDecodeError):
        return None


def _png_unfilter(raw, h: int, stride: int, bpp: int):
    """Reverse PNG scanline filtering (spec §9 Filtering) → (h, stride)
    uint8.  ``bpp`` is the filter unit in BYTES (channels × depth/8 —
    the spec's left reference is bpp bytes back, so 16-bit depths
    filter on byte pairs).  None/Sub/Up are vectorized; Average/Paeth
    carry a left dependency and run per-byte on their rows."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 1:  # Sub: cumulative sum over the byte lanes
            out[y] = (
                np.cumsum(row.reshape(-1, bpp).astype(np.uint32), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = row + prev  # uint8 wraps mod 256 — the spec's rule
        elif ftype in (3, 4):  # Average / Paeth: sequential left-dep
            cur = out[y]
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                bb = int(prev[i])
                if ftype == 3:
                    cur[i] = (int(row[i]) + ((a + bb) >> 1)) & 0xFF
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                    cur[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def _decode_png(b: bytes):
    """Stdlib-only PNG decode (zlib inflate + unfilter): 8- and 16-bit
    depths, color types 0/2/3/4/6, non-interlaced.  Returns an (h, w,
    channels) uint8 array (palette expanded to RGB; 16-bit samples
    reduced to their high byte) or None for PNG variants out of scope
    (interlaced, sub-byte depths)."""
    import numpy as np
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    i = 8
    ihdr = None
    plte = None
    idat = []
    while i + 8 <= len(b):
        length = int.from_bytes(b[i : i + 4], "big")
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + CRC
    if ihdr is None or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color, _comp, _filt, interlace = ihdr[8:13]
    if depth not in (8, 16) or interlace != 0 or w <= 0 or h <= 0:
        return None
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None or (color == 3 and plte is None):
        return None
    if depth == 16 and color == 3:
        return None  # 16-bit palette is not a valid PNG combination
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None  # corrupt stream is data, not an error
    bpp = nch * (depth // 8)
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        return None
    arr = _png_unfilter(raw, h, stride, bpp)
    if depth == 16:
        # big-endian sample pairs → high byte (the engine's pixel
        # surface is uint8; 16-bit precision folds to its top 8 bits)
        arr = arr.reshape(h, w, nch, 2)[..., 0]
    else:
        arr = arr.reshape(h, w, nch)
    if color == 3:  # palette indices -> RGB
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        arr = pal[arr.reshape(h, w)]
    return arr


def _gif_lzw(data: bytes, min_code_size: int, npix: int):
    """GIF's LZW variant (LSB-first bit packing, CLEAR/EOI codes,
    code width growing to 12 bits).  Returns the index list or None on
    a corrupt stream."""
    if not 2 <= min_code_size <= 11:  # LZW codes cap at 12 bits
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + code_size <= total and len(out) < npix:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: [i] for i in range(clear)}
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]
        else:
            return None
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        prev = entry
    return out[:npix] if len(out) >= npix else None


def _decode_gif(b: bytes):
    """Pure-Python GIF decode: first image frame, global/local color
    table, LZW indices, interlace rearrangement.  Returns an (h, w, 3)
    uint8 array or None."""
    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = b[10]
    gct = None
    i = 13
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = np.frombuffer(b, dtype=np.uint8, count=n * 3, offset=13).reshape(
            n, 3
        )
        i = 13 + n * 3
    while i < len(b):
        blk = b[i]
        if blk == 0x21:  # extension: label byte + terminated sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif blk == 0x2C:  # image descriptor
            iw = int.from_bytes(b[i + 5 : i + 7], "little")
            ih = int.from_bytes(b[i + 7 : i + 9], "little")
            p = b[i + 9]
            i += 10
            pal = gct
            if p & 0x80:
                n = 2 ** ((p & 7) + 1)
                pal = np.frombuffer(
                    b, dtype=np.uint8, count=n * 3, offset=i
                ).reshape(n, 3)
                i += n * 3
            if pal is None or iw <= 0 or ih <= 0:
                return None
            min_code = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                n = b[i]
                data += b[i + 1 : i + 1 + n]
                i += 1 + n
            idx = _gif_lzw(bytes(data), min_code, iw * ih)
            if idx is None or max(idx) >= len(pal):
                return None
            arr = pal[np.asarray(idx, dtype=np.int32)].reshape(ih, iw, 3)
            if p & 0x40:  # interlaced: four passes of rows
                order = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                out = np.empty_like(arr)
                out[order] = arr
                arr = out
            return arr
        elif blk == 0x3B:  # trailer
            return None
        else:
            return None
    return None


def _avi_mjpeg_frames(b: bytes):
    """(usec_per_frame, [jpeg_bytes, ...]) from a RIFF AVI whose video
    chunks are MJPEG — each '00dc'/'00db' chunk is a complete JPEG the
    engine's own codec decodes.  Never raises; None when the payload
    is not a parseable MJPEG AVI."""
    try:
        if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
            return None
        usec = None
        frames = []

        # Explicit stack, not recursion: ~12 bytes buy one LIST nesting
        # level, so a 12 KB crafted AVI overran Python's recursion
        # limit and the RecursionError escaped the except clause (r10
        # review find; parse_media_header's AVI walker is already
        # iterative for the same reason).
        stack = [(12, len(b))]
        while stack:
            i, end = stack.pop()
            while i + 8 <= end:
                cid = b[i : i + 4]
                size = int.from_bytes(b[i + 4 : i + 8], "little")
                body = i + 8
                if body + size > end:
                    break
                if cid == b"LIST":
                    stack.append((body + size + (size % 2), end))
                    i, end = body + 4, body + size
                    continue
                elif cid == b"avih" and size >= 4:
                    usec = int.from_bytes(b[body : body + 4], "little")
                elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                    frames.append(b[body : body + size])
                i = body + size + (size % 2)
        if not frames:
            return None
        return usec or 40000, frames
    except (IndexError, ValueError):
        return None


def _gif_frames(b: bytes):
    """([(ts_ms, canvas_rgb), ...], total_ms) — animated-GIF frames
    composited onto the logical screen per each frame's Graphic
    Control Extension (delay, transparency, restore-to-background
    disposal).  Never raises; None when not parseable."""
    import numpy as np

    try:
        if b[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw = int.from_bytes(b[6:8], "little")
        sh = int.from_bytes(b[8:10], "little")
        if sw <= 0 or sh <= 0:
            return None
        # Allocation bound BEFORE touching the canvas: a ~30-byte
        # header can declare a 65535x65535 screen (~12.9 GB canvas,
        # plus one canvas.copy() per frame) and MemoryError escaped
        # the except clause — corrupt bytes must decode to None, not
        # OOM the executor (r10 review find).  64 MP covers any real
        # GIF; the per-frame budget below caps total copies at ~1 GiB.
        if sw * sh > 64_000_000:
            return None
        budget = 1 << 30
        packed = b[10]
        gct = None
        i = 13
        if packed & 0x80:
            n = 2 ** ((packed & 7) + 1)
            if 13 + n * 3 > len(b):
                return None
            gct = np.frombuffer(b, dtype=np.uint8, count=n * 3, offset=13).reshape(
                n, 3
            )
            i = 13 + n * 3
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        frames = []
        ts = 0
        delay_ms = 0
        transparent = None
        disposal = 0
        while i < len(b):
            blk = b[i]
            if blk == 0x21:  # extension
                label = b[i + 1] if i + 1 < len(b) else 0
                j = i + 2
                if label == 0xF9 and j < len(b) and b[j] >= 4:
                    pk = b[j + 1]
                    disposal = (pk >> 2) & 7
                    delay_ms = int.from_bytes(b[j + 2 : j + 4], "little") * 10
                    transparent = b[j + 4] if pk & 1 else None
                while j < len(b) and b[j] != 0:
                    j += 1 + b[j]
                i = j + 1
            elif blk == 0x2C:  # image descriptor
                left = int.from_bytes(b[i + 1 : i + 3], "little")
                top = int.from_bytes(b[i + 3 : i + 5], "little")
                iw = int.from_bytes(b[i + 5 : i + 7], "little")
                ih = int.from_bytes(b[i + 7 : i + 9], "little")
                pk = b[i + 9]
                i += 10
                pal = gct
                if pk & 0x80:
                    n = 2 ** ((pk & 7) + 1)
                    pal = np.frombuffer(
                        b, dtype=np.uint8, count=n * 3, offset=i
                    ).reshape(n, 3)
                    i += n * 3
                if pal is None or iw <= 0 or ih <= 0:
                    return None
                min_code = b[i]
                i += 1
                data = bytearray()
                while i < len(b) and b[i] != 0:
                    n = b[i]
                    data += b[i + 1 : i + 1 + n]
                    i += 1 + n
                i += 1  # block terminator
                idx = _gif_lzw(bytes(data), min_code, iw * ih)
                if idx is None or max(idx) >= len(pal):
                    return None
                idx = np.asarray(idx, dtype=np.int32).reshape(ih, iw)
                if pk & 0x40:  # interlace
                    order = (
                        list(range(0, ih, 8))
                        + list(range(4, ih, 8))
                        + list(range(2, ih, 4))
                        + list(range(1, ih, 2))
                    )
                    out = np.empty_like(idx)
                    out[order] = idx
                    idx = out
                y1, x1 = min(top + ih, sh), min(left + iw, sw)
                if y1 <= top or x1 <= left:
                    return None
                sub = idx[: y1 - top, : x1 - left]
                region = canvas[top:y1, left:x1]
                # Disposal 3 (restore to previous) needs the pre-draw
                # pixels back after this frame is emitted.
                prev_region = region.copy() if disposal == 3 else None
                px = pal[sub]
                if transparent is not None:
                    mask = sub != transparent
                    region[mask] = px[mask]
                else:
                    region[:, :] = px
                if (len(frames) + 2) * sw * sh * 3 > budget:
                    return None  # crafted frame-count x canvas bomb
                frames.append((ts, canvas.copy()))
                ts += max(delay_ms, 10)
                if disposal == 2:  # restore to background
                    canvas[top:y1, left:x1] = 0
                elif disposal == 3:  # restore to previous
                    canvas[top:y1, left:x1] = prev_region
                transparent = None
                delay_ms = 0
                disposal = 0
            elif blk == 0x3B:
                break
            else:
                return None
        return (frames, ts) if frames else None
    except (IndexError, ValueError, MemoryError):
        return None


def decode_pixels(payload: bytes | None):
    """Pure-Python pixel decode for the formats a stdlib-only engine
    can genuinely handle — the real half of the codec boundary: BMP
    24/32-bit BI_RGB, binary PPM P6 / PGM P5 (maxval < 256), PNG (zlib
    inflate + unfilter — 8-bit, non-interlaced, all five color types),
    GIF (hand-rolled LZW, first frame, interlace handled), and JPEG —
    baseline AND progressive (operators/jpeg_codec.py).
    Returns ``(format, array)`` with a ``(height, width, channels)``
    uint8 numpy array in RGB(A)/gray order, or None when the payload
    needs a real codec (16-bit PNG stays behind the strict-mode
    gate)."""
    import numpy as np

    if not payload:
        return None
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            arr = _decode_png(b)
            return None if arr is None else ("png", arr)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            arr = _decode_gif(b)
            return None if arr is None else ("gif", arr)
        if b[:2] == b"\xff\xd8":
            from ic_spark.operators.jpeg_codec import decode_jpeg

            arr = decode_jpeg(b)
            return None if arr is None else ("jpeg", arr)
        if b[:2] == b"BM" and len(b) >= 54:
            data_off = int.from_bytes(b[10:14], "little")
            w = int.from_bytes(b[18:22], "little", signed=True)
            h_raw = int.from_bytes(b[22:26], "little", signed=True)
            bpp = int.from_bytes(b[28:30], "little")
            compression = int.from_bytes(b[30:34], "little")
            if compression != 0 or bpp not in (24, 32) or w <= 0 or h_raw == 0:
                return None  # compressed / palette BMPs: strict gate
            h = abs(h_raw)
            nch = bpp // 8
            stride = ((bpp * w + 31) // 32) * 4
            if data_off + stride * h > len(b):
                return None
            raster = np.frombuffer(
                b, dtype=np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
            if h_raw > 0:  # bottom-up storage
                raster = raster[::-1]
            # BGR(A) -> RGB(A)
            rgb = raster[..., [2, 1, 0] + ([3] if nch == 4 else [])]
            return "bmp", np.ascontiguousarray(rgb)
        if b[:2] in (b"P6", b"P5"):
            toks = _ppm_header_tokens(b)
            if toks is None:
                return None
            magic, w, h, maxval, off = toks
            if maxval >= 256 or w <= 0 or h <= 0:
                return None  # 16-bit rasters: out of scope
            nch = 3 if magic == "P6" else 1
            need = w * h * nch
            if off + need > len(b):
                return None
            arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
            return ("ppm" if nch == 3 else "pgm"), arr.reshape(h, w, nch)
    except (ValueError, IndexError):
        return None
    return None


def decode_audio_samples(payload: bytes | None):
    """Pure-Python sample decode for PCM WAV (8/16-bit integer PCM)
    FLAC payloads (operators/flac_codec.py — full native-FLAC
    subframe/Rice/stereo-decorrelation decode, validated losslessly
    against an independent test-side encoder), and Ogg-Vorbis
    (operators/vorbis_codec.py — floor-1/residue/coupling/IMDCT decode,
    round-trip-pinned against an independent test-side encoder, with
    the lapped reconstruction additionally pinned bit-exact against a
    direct-cosine reference).  Returns ``(samples, sample_rate,
    channels)`` with samples as a ``(frames, channels)`` numpy array
    (Vorbis floats scaled to int16 range), or None for formats that
    need a real codec (mp3/aac stay behind the strict-mode gate)."""
    import numpy as np

    if not payload:
        return None
    b = bytes(payload)
    if b[:4] == b"fLaC" or (
        b[:4] == b"OggS" and b"\x7fFLAC" in b[:128]
    ):
        from ic_spark.operators.flac_codec import decode_flac

        got = decode_flac(b)
        if got is None:
            return None
        samples, rate, channels = got
        return samples, rate, channels
    if b[:4] == b"OggS" and b"\x01vorbis" in b[:128]:
        from ic_spark.operators.vorbis_codec import decode_vorbis

        got = decode_vorbis(b)
        if got is None:
            return None
        samples, rate, channels = got
        pcm = np.clip(
            np.round(samples * 32767.0), -32768, 32767
        ).astype(np.int32)
        return pcm, rate, channels
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        i = 12
        fmt = None
        data = None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 8 + 16 <= len(b):
                fmt = (
                    int.from_bytes(b[i + 8 : i + 10], "little"),    # format
                    int.from_bytes(b[i + 10 : i + 12], "little"),   # channels
                    int.from_bytes(b[i + 12 : i + 16], "little"),   # rate
                    int.from_bytes(b[i + 22 : i + 24], "little"),   # bits
                )
            elif cid == b"data":
                data = b[i + 8 : i + 8 + size]
            i += 8 + size + (size % 2)
        if fmt is None or data is None:
            return None
        audio_format, channels, rate, bits = fmt
        if audio_format != 1 or channels < 1 or bits not in (8, 16):
            return None  # compressed / float WAV: strict gate
        dtype = np.uint8 if bits == 8 else np.dtype("<i2")
        frame_bytes = channels * (bits // 8)
        n_frames = len(data) // frame_bytes
        samples = np.frombuffer(
            data, dtype=dtype, count=n_frames * channels
        ).reshape(n_frames, channels)
        if bits == 8:  # 8-bit WAV is unsigned, center it
            samples = samples.astype(np.int16) - 128
        return samples, rate, channels
    except (ValueError, IndexError):
        return None


# Formats with a REAL in-repo decoder: a None decode for one of these
# means CORRUPT BYTES — per the module contract corrupt payloads are
# data (null feature / skipped row), not errors, and strict mode must
# not blame a missing codec for them (r10 review find: one flipped
# byte in a PNG killed a whole strict job with a message claiming PNG
# needs a codec).  mp3/aac/mp4(h26x) stay gated: those genuinely need
# a codec (README "operating limits").
DECODABLE_FORMATS = {
    "png", "gif", "jpeg", "bmp", "ppm", "pgm", "wav", "flac", "vorbis",
    "avi",
}


def _real_decode(payload: bytes | None) -> str | None:
    """Pixel/sample-level feature for decodable (uncompressed) formats:
    deterministic stats string computed from the REAL decoded data."""
    img = decode_pixels(payload)
    if img is not None:
        fmt, arr = img
        h, w, _ = arr.shape
        return (
            f"{fmt}-{w}x{h}-mean{arr.mean():.3f}-std{arr.std():.3f}"
            f"-min{int(arr.min())}-max{int(arr.max())}"
        )
    aud = decode_audio_samples(payload)
    if aud is not None:
        import numpy as np

        samples, rate, channels = aud
        x = samples.astype("float64")
        rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
        peak = int(np.abs(samples).max()) if samples.size else 0
        hdr = bytes(payload)
        # Native fLaC and Ogg-encapsulated FLAC both decode through
        # flac_codec; label them identically so the feature string is
        # container-independent.
        if hdr[:4] == b"fLaC" or (
            hdr[:4] == b"OggS" and b"\x7fFLAC" in hdr[:128]
        ):
            fmt = "flac"
        elif hdr[:4] == b"OggS" and b"\x01vorbis" in hdr[:128]:
            fmt = "vorbis"
        else:
            fmt = "wav-pcm"
        return (
            f"{fmt}-{rate}hz-{channels}ch-n{samples.shape[0]}"
            f"-rms{rms:.3f}-peak{peak}"
        )
    return None


def _fake_decode(payload: bytes | None, kind: str) -> str:
    """Deterministic stand-in for a real codec: sha-derived token.

    Replace with PIL/torchaudio/ffmpeg calls when available; the Spark
    plumbing (batch shape, schema, partitioning) is unchanged.
    """
    if payload is None:
        return "empty"
    digest = hashlib.sha256(payload).hexdigest()[:16]
    return f"{kind}-feat-{digest}"


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    format/width/height/duration_ms are REAL — parsed from the payload
    container headers (parse_media_header; no codec library needed).
    The pixel-level ``feature`` is REAL for uncompressed formats too
    (BMP/PPM/PGM pixel stats, PCM WAV sample stats — pure-Python
    decode, see :func:`decode_pixels` / :func:`decode_audio_samples`);
    only COMPRESSED formats remain the stub boundary: ``strict=True``
    raises NotImplementedError exactly where a real codec's forward
    pass belongs — and only when a payload actually needs one.
    """

    def feature(b, kind: str) -> str:
        real = _real_decode(b)
        if real is not None:
            return real
        if strict and b:
            fmt = parse_media_header(b)["format"]
            if fmt in DECODABLE_FORMATS:
                return None  # corrupt bytes of a REAL format: data
            raise NotImplementedError(
                f"no pure-Python decoder for compressed format "
                f"{fmt or 'unknown'!r}; plug a real codec into "
                "extract_features()"
            )
        return _fake_decode(b, kind)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "content_sha": pdf["payload"].map(
                        lambda b: "" if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "format": [m["format"] for m in parsed],
                    "width": pd.array(
                        [m["width"] for m in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m["duration_ms"] for m in parsed], dtype="Int64"
                    ),
                    "feature": [
                        feature(b, k)
                        for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, strict: bool = False
) -> DataFrame:
    """Arrow-batched image resize: same schema out, payload replaced by
    the resized bytes, width/height set to the target box.

    REAL for every stdlib-decodable format (PNG/BMP/PPM/PGM): decode →
    nearest-neighbor resample (numpy index gather) → re-encode as PNG,
    so the output payload is itself decodable and round-trips.  Only
    codec-requiring inputs (JPEG/GIF) fall to the deterministic fake
    (or raise under ``strict=True``, exactly where PIL/libvips would
    run).
    """
    target_w, target_h = width, height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def resize(b: bytes | None) -> bytes | None:
            if b is None:
                return None
            dec = decode_pixels(b)
            if dec is not None:
                _fmt, arr = dec
                h, w, _ = arr.shape
                ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                return encode_png(arr[ys][:, xs])
            if strict:
                fmt = parse_media_header(b)["format"]
                if fmt in DECODABLE_FORMATS:
                    return None  # corrupt bytes of a REAL format: data
                raise NotImplementedError(
                    f"no pure-Python decoder for compressed format "
                    f"{fmt or 'unknown'!r}; plug PIL/libvips into "
                    "resize_images()"
                )
            tag = f"-resized-{target_w}x{target_h}".encode()
            return hashlib.sha256(b).digest() + tag

        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(resize)
            pdf.loc[is_img, "width"] = target_w
            pdf.loc[is_img, "height"] = target_h
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def encode_png(arr) -> bytes:
    """Minimal stdlib PNG writer (filter 0, 8-bit): the re-encode half
    of the pure-Python codec path.  Accepts (h, w, channels) uint8 with
    1/2/3/4 channels (gray / gray+alpha / RGB / RGBA)."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, nch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def perceptual_hash(df: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, phash) — 64-bit difference hash (dHash) over decoded
    pixels: downsample to 9x8 grayscale (nearest-neighbor), emit one
    bit per left<right comparison.  Near-duplicate images (re-encodes,
    small edits, resizes) land within a few bits of Hamming distance —
    pair with :func:`ic_spark.operators.dedup.hamming_distance` for
    image near-dup detection, the visual analog of SimHash on text.

    REAL for stdlib-decodable formats; codec-requiring payloads yield a
    deterministic sha-derived hash (or raise under ``strict=True``) so
    exact-duplicate grouping still works for them.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("phash", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(b) -> int | None:
            if b is None:
                return None
            dec = decode_pixels(b)
            if dec is None:
                if strict:
                    fmt = parse_media_header(b)["format"]
                    if fmt in DECODABLE_FORMATS:
                        return None  # corrupt bytes of a REAL format
                    raise NotImplementedError(
                        f"no pure-Python decoder for "
                        f"{fmt or 'unknown'!r}; plug a codec "
                        "into perceptual_hash()"
                    )
                digest = hashlib.sha256(bytes(b)).digest()[:8]
                return int.from_bytes(digest, "big", signed=True)
            _fmt, arr = dec
            gray = arr[..., :3].mean(axis=2) if arr.shape[2] >= 3 else arr[..., 0]
            h, w = gray.shape
            ys = (np.arange(8) * h // 8).clip(0, h - 1)
            xs = (np.arange(9) * w // 9).clip(0, w - 1)
            small = gray[ys][:, xs]
            bits = (small[:, 1:] > small[:, :-1]).flatten()
            v = 0
            for bit in bits:
                v = (v << 1) | int(bit)
            # two's-complement into int64
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.array(
                        [one(b) for b in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(run, schema=out_schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Video → frame rows, one per ``every_ms`` of duration.

    REAL frame extraction for the containers a pure-Python engine can
    genuinely crack (r6): **MJPEG-in-AVI** — the RIFF walk yields one
    complete JPEG per '00dc' chunk, emitted VERBATIM (downstream
    ``decode_pixels`` / ``extract_features`` decode it with the
    engine's own T.81 codec) — and **animated GIF** — GCE-timed LZW
    frames composited per disposal onto the screen canvas and
    re-encoded as PNG.  Each ``every_ms`` tick emits the frame ACTIVE
    at that timestamp, so a 25fps clip sampled at 1000ms yields 1 in
    25 frames — the training-data sampling shape.  Containers that
    need a real codec (H.264 MP4 etc.) keep the honest stub:
    deterministic fake payloads, or NotImplementedError under
    ``strict=True``.  The fan-out stays ``mapInPandas`` (output rows ≫
    input rows; Arrow batch memory bounded by maxRecordsPerBatch).
    """

    def real_frames(b):
        """-> ([(ts_ms, payload)], total_ms) or None."""
        avi = _avi_mjpeg_frames(b)
        if avi is not None:
            usec, frames = avi
            ms = max(1, usec // 1000)
            return [(i * ms, f) for i, f in enumerate(frames)], ms * len(frames)
        gif = _gif_frames(b)
        if gif is not None:
            frames, total = gif
            return [(ts, encode_png(arr)) for ts, arr in frames], total
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                base = b"" if r["payload"] is None else bytes(r["payload"])
                real = real_frames(base)
                if real is not None:
                    frames, total = real
                    idx = 0
                    # One monotone cursor over the (ascending-ts) frame
                    # list: rescanning from frames[0] per tick made
                    # sampling O(ticks x frames) — ~1.6e8 Python-loop
                    # iterations for a 1-hour 25fps clip (r10 review
                    # find).  Ticks ascend, so the cursor never rewinds.
                    fi = 0
                    active = None
                    for tick in range(0, max(total, 1), every_ms):
                        # frame active at this tick (last ts <= tick)
                        while fi < len(frames) and frames[fi][0] <= tick:
                            active = frames[fi][1]
                            fi += 1
                        if active is None:
                            continue
                        rows["media_id"].append(r["media_id"])
                        rows["frame_idx"].append(idx)
                        rows["ts_ms"].append(tick)
                        rows["payload"].append(active)
                        idx += 1
                    continue
                if strict:
                    fmt = parse_media_header(r["payload"])["format"]
                    if fmt in DECODABLE_FORMATS:
                        continue  # corrupt bytes of a REAL container
                    raise NotImplementedError(
                        "no pure-Python decoder for this video container "
                        "(MJPEG-AVI and animated GIF are real; plug "
                        "ffmpeg into sample_frames() for the rest)"
                    )
                if r["duration_ms"] is None:
                    continue
                n = max(1, int(r["duration_ms"]) // every_ms)
                for i in range(n):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["payload"].append(
                        hashlib.sha256(base + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def audio_frames(
    df: DataFrame, frame_ms: int = 250, bands: int = 8, strict: bool = False
) -> DataFrame:
    """Audio → frame rows with REAL spectral features for PCM WAV:
    one row per ``frame_ms`` window carrying rms, peak, and
    ``bands`` log-spaced FFT band energies — the audio counterpart of
    ``sample_frames``'s video fan-out, decoded by
    :func:`decode_audio_samples` (no codec library).

    Output rows ≫ input rows (why this is ``mapInPandas``); each frame's
    feature vector feeds the same ANN/near-dup operators as embeddings.
    Compressed audio falls to the strict gate (raise) or is skipped.
    """
    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("rms", DoubleType(), True),
            StructField("peak", IntegerType(), True),
            StructField("band_energy", ArrayType(DoubleType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                "media_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "rms": [],
                "peak": [],
                "band_energy": [],
            }
            for _, r in pdf.iterrows():
                if r["kind"] != "audio" or r["payload"] is None:
                    continue
                dec = decode_audio_samples(r["payload"])
                if dec is None:
                    if strict:
                        fmt = parse_media_header(r["payload"])["format"]
                        if fmt in DECODABLE_FORMATS:
                            continue  # corrupt bytes of a REAL format
                        raise NotImplementedError(
                            f"no pure-Python decoder for {fmt!r} audio; "
                            "plug a codec into audio_frames()"
                        )
                    continue
                samples, rate, _ch = dec
                x = samples.astype("float64").mean(axis=1)
                spf = max(1, rate * frame_ms // 1000)
                for fi in range(max(1, len(x) // spf)):
                    seg = x[fi * spf : (fi + 1) * spf]
                    if not len(seg):
                        break
                    mag = np.abs(np.fft.rfft(seg))
                    edges = np.unique(
                        np.geomspace(1, max(len(mag) - 1, 1), bands + 1).astype(int)
                    )
                    be = np.zeros(bands)
                    for j in range(min(bands, len(edges) - 1)):
                        be[j] = mag[edges[j] : edges[j + 1] + 1].mean()
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(fi)
                    rows["ts_ms"].append(fi * frame_ms)
                    rows["rms"].append(float(np.sqrt((seg * seg).mean())))
                    rows["peak"].append(int(np.abs(seg).max()))
                    rows["band_energy"].append(be.tolist())
            # explicit object dtype: an all-skipped batch would infer
            # float64 for the (empty) list column and break Arrow
            rows["band_energy"] = pd.Series(rows["band_energy"], dtype=object)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=schema)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches the payload column, so
    Parquet column pruning skips the heavy bytes entirely."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(F.col("width")).alias("avg_width"),
        F.avg(F.col("duration_ms")).alias("avg_duration_ms"),
    )


MIME_BY_EXT = {
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"),
    "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"),
    "avi": ("video", "video/x-msvideo"),
    "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def ingest_binary_files(
    spark, path: str, glob: str | None = None, kind: str | None = None
) -> DataFrame:
    """Ingest raw media files into the MEDIA_SCHEMA shape via Spark's
    binaryFile source (whole-file bytes + path/length/modtime; scans
    distribute one file per task, so a directory of millions of images
    parallelizes naturally).

    ``media_id`` is xxhash64 of the file path — stable across re-runs,
    computed JVM-side.  kind/mime come from the extension (or the
    explicit ``kind`` override); width/height/duration stay null until
    a real decode fills them (extract_features / resize_images mark
    that codec boundary).
    """
    from ic_spark.sources.formats import read_files

    raw = read_files(spark, path, "binaryFile", **({"pathGlobFilter": glob} if glob else {}))
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind_col = F.lit(kind)
    mime_col = F.lit(None).cast("string")
    if kind is None:
        kind_col = F.lit("other")
        for e, (k, _m) in MIME_BY_EXT.items():
            kind_col = F.when(ext == e, F.lit(k)).otherwise(kind_col)
    for e, (_k, m) in MIME_BY_EXT.items():
        mime_col = F.when(ext == e, F.lit(m)).otherwise(mime_col)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        kind_col.alias("kind"),
        mime_col.alias("mime"),
        F.col("content").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def embed_media(df: DataFrame, dim: int = 16, strict: bool = False) -> DataFrame:
    """Arrow-batched media embedding: (media_id, kind, embedding) with
    ``array<float>`` of ``dim`` — the encoder stage of multimodal
    retrieval (CLIP-style image/audio towers in a real deployment).

    CONTENT-DERIVED for stdlib-decodable payloads: images embed as an
    L2-normalized grayscale thumbnail (nearest-neighbor downsample to
    ``dim`` cells — identical pixels embed identically regardless of
    container, near-identical images land at high cosine); PCM audio
    embeds as L2-normalized log-spaced FFT band energies (timbre/pitch
    profile — same waveform ⇒ same vector).  Codec-requiring payloads
    fall back to the deterministic sha-512 pseudo-embedding (or raise
    under ``strict=True``, where the real model forward pass belongs).
    Output plugs directly into operators/similarity.py (brute-force /
    LSH / IVF top-k) and semantic_dedup — the same 100 TB path as text
    embeddings: encode at scan, never shuffle payload bytes.
    """
    if dim > 64:
        raise ValueError(
            "fake encoder supports dim <= 64 (sha512 digest is 64 bytes)"
        )
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        def image_vec(arr):
            gray = (
                arr[..., :3].mean(axis=2)
                if arr.shape[2] >= 3
                else arr[..., 0].astype("float64")
            )
            h, w = gray.shape
            side = max(1, int(math.isqrt(dim)))
            cols = (dim + side - 1) // side
            # Block MEAN pooling (not nearest sampling): every source
            # pixel contributes, so a one-pixel edit moves its cell by
            # 1/|block| instead of potentially flipping it outright.
            ye = np.arange(side + 1) * h // side
            xe = np.arange(cols + 1) * w // cols

            def block_mean(y0, y1, x0, x1):
                # Zero-size blocks (image smaller than the grid) fall
                # back to the nearest single row/column; edges stay
                # un-clipped otherwise so pixel row/col 0 contributes
                # to the first cell (every source pixel counts).
                if y1 <= y0:
                    y0 = min(y0, h - 1)
                    y1 = y0 + 1
                if x1 <= x0:
                    x0 = min(x0, w - 1)
                    x1 = x0 + 1
                return gray[y0:y1, x0:x1].mean()

            v = np.array(
                [
                    block_mean(ye[r - 1], ye[r], xe[c - 1], xe[c])
                    for r in range(1, side + 1)
                    for c in range(1, cols + 1)
                ]
            )[:dim]
            v = np.pad(v, (0, dim - len(v))) - v.mean()
            n = np.linalg.norm(v)
            return (v / n if n else v).astype("float32").tolist()

        def audio_vec(samples, rate):
            x = samples.astype("float64").mean(axis=1)  # downmix
            if len(x) < 2:
                return None
            mag = np.abs(np.fft.rfft(x))
            # log-spaced band edges over the positive spectrum
            edges = np.unique(
                np.geomspace(1, len(mag) - 1, dim + 1).astype(int)
            )
            v = np.zeros(dim)
            for j in range(min(dim, len(edges) - 1)):
                v[j] = mag[edges[j] : edges[j + 1] + 1].mean()
            v = np.log1p(v)
            n = np.linalg.norm(v)
            return (v / n if n else v).astype("float32").tolist()

        def enc(b):
            if b is None:
                return None
            img = decode_pixels(b)
            if img is not None:
                return image_vec(img[1])
            aud = decode_audio_samples(b)
            if aud is not None:
                vec = audio_vec(aud[0], aud[1])
                if vec is not None:
                    return vec
            if strict:
                fmt = parse_media_header(b)["format"]
                if fmt in DECODABLE_FORMATS:
                    return None  # corrupt bytes of a REAL format: data
                raise NotImplementedError(
                    f"no pure-Python decoder for {fmt or 'unknown'!r}; "
                    "plug a real encoder into embed_media()"
                )
            d = hashlib.sha512(bytes(b)).digest()
            return [(d[i] - 128) / 128.0 for i in range(dim)]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": pdf["payload"].map(enc),
                }
            )

    return df.mapInPandas(run, schema=out_schema)
