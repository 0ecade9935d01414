"""Decoder robustness: corrupt bytes are data, not errors.

Every pure-Python media decoder must return None (or a Nones dict) on
arbitrary junk, truncations, and bit-flipped valid payloads — never
raise.  At 100 TB ingest scale a crashing decoder poisons whole tasks;
the strict-mode gate is for MISSING capability, not for bad bytes.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ic_spark.operators.jpeg_codec import decode_jpeg
from ic_spark.operators.multimodal import (
    decode_audio_samples,
    decode_pixels,
    parse_media_header,
)

# Magic prefixes steer random tails into every parser's deep path.
_PREFIXES = [
    b"",
    b"\x89PNG\r\n\x1a\n",
    b"GIF89a",
    b"GIF87a",
    b"\xff\xd8",
    b"BM",
    b"P6\n",
    b"P5 ",
    b"RIFF1234WAVE",
    b"RIFF\x10\x00\x00\x00AVI ",
    b"fLaC",
    b"OggS\x00\x02" + b"\x00" * 20 + b"\x01\x01vorbis",
    (100).to_bytes(4, "big") + b"ftyp",
]


def _never_raises(payload: bytes) -> None:
    from ic_spark.operators.multimodal import _avi_mjpeg_frames, _gif_frames

    assert decode_pixels(payload) is None or decode_pixels(payload)[1] is not None
    decode_audio_samples(payload)
    decode_jpeg(payload)
    _avi_mjpeg_frames(payload)
    _gif_frames(payload)
    out = parse_media_header(payload)
    assert set(out) == {"format", "width", "height", "duration_ms"}


@settings(max_examples=120, deadline=None)
@given(
    prefix=st.sampled_from(_PREFIXES),
    tail=st.binary(min_size=0, max_size=400),
)
def test_decoders_never_raise_on_junk(prefix, tail):
    _never_raises(prefix + tail)


def _valid_payloads():
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from flacref import encode_flac
    from jpegref import encode_jpeg, encode_progressive_jpeg
    from vorbisref import encode_vorbis
    import numpy as np

    from test_operators import (
        REAL_PNG_1x1,
        _animated_gif_bytes,
        _avi_bytes,
        _bmp_bytes,
        _gif_bytes,
        _mp4_bytes,
        _png_bytes,
        _wav_bytes,
    )

    px = [[(9, 8, 7), (6, 5, 4)], [(3, 2, 1), (100, 150, 200)]]
    g = (np.arange(64, dtype=np.uint8) * 3 % 256).reshape(8, 8)
    return [
        REAL_PNG_1x1,
        _png_bytes(px),
        _bmp_bytes(px),
        b"P6\n2 2\n255\n" + bytes(range(12)),
        _gif_bytes([[0, 1], [1, 0]], [(1, 2, 3), (4, 5, 6)]),
        _wav_bytes(1),
        _mp4_bytes(),
        encode_jpeg(g),
        encode_progressive_jpeg(g),
        encode_progressive_jpeg(g, successive=False, restart=2),
        _avi_bytes([encode_jpeg(g)] * 2),
        encode_flac([[int(i) for i in g.reshape(-1)]]),
        encode_vorbis(
            [np.sin(np.arange(600) / 3.0) * 0.4], rate=8000, block_size=256
        ),
        _animated_gif_bytes(
            [[[0, 1], [1, 0]], [[1, 1], [0, 0]]],
            [(1, 2, 3), (4, 5, 6)],
            [5, 5],
        ),
    ]


def test_decoders_survive_bit_flips():
    """Flipping any single byte of a valid payload either still decodes
    or returns None — never raises (seeded sweep over positions)."""
    rng = random.Random(5)
    for payload in _valid_payloads():
        positions = rng.sample(range(len(payload)), min(60, len(payload)))
        for pos in positions:
            mutated = bytearray(payload)
            mutated[pos] ^= 0xFF
            _never_raises(bytes(mutated))


def test_decoders_survive_truncation():
    for payload in _valid_payloads():
        for cut in range(0, len(payload), max(1, len(payload) // 40)):
            _never_raises(payload[:cut])


# --------------------------- r10 review-sweep regression tests


def test_parse_media_header_clamps_schema_overflow(spark):
    """A corrupt PNG IHDR declaring width 2^32-1 must surface as NULL
    width, not crash the mapInPandas task at pd.array(dtype='Int32')
    (r10 review find, reproduced pre-fix)."""
    from ic_spark.operators.multimodal import (
        extract_features,
        parse_media_header,
    )

    bad_png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + (0xFFFFFFFF).to_bytes(4, "big") + (10).to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )
    m = parse_media_header(bad_png)
    assert m == {
        "format": "png", "width": None, "height": 10, "duration_ms": None
    }
    df = spark.createDataFrame(
        [(1, "image", None, bytearray(bad_png), None, None, None)],
        "media_id long, kind string, mime string, payload binary,"
        " width int, height int, duration_ms long",
    )
    row = extract_features(df).collect()[0]  # must not crash the task
    assert row.format == "png" and row.width is None and row.height == 10


def test_jpeg_four_component_frame_rejected():
    """4-component (Adobe CMYK/YCCK) planes must raise (decode_jpeg ->
    None), not be silently color-converted as YCbCr with the K plane
    dropped (r10 review find)."""
    import numpy as np
    import pytest

    from ic_spark.operators.jpeg_codec import _planes_to_array

    comps = [{"id": i, "hs": 1, "vs": 1} for i in range(1, 5)]
    frame = {"h": 8, "w": 8, "comps": comps}
    planes = {i: np.zeros((8, 8)) for i in range(1, 5)}
    with pytest.raises(ValueError, match="component count 4"):
        _planes_to_array(frame, planes, 1, 1)
    # 1- and 3-component paths still work
    assert _planes_to_array(
        {"h": 8, "w": 8, "comps": comps[:1]}, planes, 1, 1
    ).shape == (8, 8, 1)
    assert _planes_to_array(
        {"h": 8, "w": 8, "comps": comps[:3]}, planes, 1, 1
    ).shape == (8, 8, 3)


def test_progressive_dimension_bomb_fails_fast():
    """A SOF2 declaring 65535x65535 with a tiny scan must be rejected
    BEFORE allocating ~GB coefficient arrays (r10 review find: the
    MemoryError escaped decode_jpeg's except clause)."""
    import time

    from ic_spark.operators.jpeg_codec import _decode_progressive

    frame = {
        "h": 65535, "w": 65535,
        "comps": [{"id": 1, "hs": 1, "vs": 1, "tq": 0}],
    }
    scans = [([frame["comps"][0]], (0, 0, 0, 0), [b"\x00\x00"], {}, {}, 0)]
    t0 = time.perf_counter()
    assert _decode_progressive(frame, scans, {0: [1] * 64}) is None
    assert time.perf_counter() - t0 < 1.0  # fail-fast, no allocation


def test_gif_screen_bomb_returns_none_fast():
    """A ~30-byte GIF declaring a 65535x65535 logical screen must
    decode to None without allocating the ~12.9 GB canvas."""
    import time

    from ic_spark.operators.multimodal import _gif_frames

    b = (
        b"GIF89a" + (65535).to_bytes(2, "little")
        + (65535).to_bytes(2, "little") + b"\x00\x00\x00" + b"\x3b"
    )
    t0 = time.perf_counter()
    assert _gif_frames(b) is None
    assert time.perf_counter() - t0 < 1.0


def test_avi_deep_list_nesting_no_recursion_error():
    """~3000 nested LIST chunks (12 bytes each) must not blow Python's
    recursion limit — the walker is iterative now (r10 review find)."""
    from ic_spark.operators.multimodal import _avi_mjpeg_frames

    body = b""
    for _ in range(3000):
        body = b"LIST" + (4 + len(body)).to_bytes(4, "little") + b"strl" + body
    avi = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"AVI " + body
    assert _avi_mjpeg_frames(avi) is None  # no frames — and no crash


def test_vorbis_multiplexed_stream_locks_onto_vorbis_serial():
    """In a multiplexed Ogg the video BOS page comes first; the decoder
    must lock onto the \\x01vorbis stream's serial, not the first
    page's (r10 review find: Theora+Vorbis files decoded to None)."""
    import numpy as np
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from vorbisref import encode_vorbis, ogg_page

    from ic_spark.operators.vorbis_codec import decode_vorbis

    x = [float(np.sin(i / 7)) * 0.5 for i in range(256)]
    plain = encode_vorbis([x], rate=8000)
    ref = decode_vorbis(plain)
    assert ref is not None
    # prepend a foreign BOS page (different serial, theora-ish packet)
    foreign = ogg_page([b"\x80theora-like-bos"], serial=999, seq=0,
                       granule=0, bos=True)
    got = decode_vorbis(foreign + plain)
    assert got is not None
    assert np.allclose(got[0], ref[0])
