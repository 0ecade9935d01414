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
