"""Ogg-Vorbis decoder pins (ic_spark/operators/vorbis_codec.py).

Validation strategy: the decoder is pinned against tests/vorbisref.py,
an INDEPENDENT encoder written separately from the Vorbis I spec
(different bitpacking code, hand-provable codeword tables, its own Ogg
CRC).  The lapped reconstruction is additionally pinned BIT-EXACT
against a direct-cosine IMDCT+overlap-add computed in the test —
independent of the decoder's cached-matrix path — so a conformance
error anywhere in the Ogg/codebook/floor/residue/window chain cannot
hide behind quantization tolerance.  Spec algorithms with paper-
derivable answers (codeword assignment, float32 unpack, the closed-
form floor dB table) are pinned directly.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from ic_spark.operators.vorbis_codec import (
    _assign_codewords,
    _decode_vorbis,
    _float32_unpack,
    _ilog,
    _lookup1_values,
    _INVERSE_DB,
    decode_vorbis,
)
from vorbisref import encode_vorbis


def _snr(ref, got):
    n = min(len(ref), len(got))
    err = got[:n] - ref[:n]
    return 10 * np.log10(np.mean(ref[:n] ** 2) / max(np.mean(err**2), 1e-30))


def _tone(n=6000, f1=440.0, f2=1000.0, rate=8000):
    t = np.arange(n)
    return 0.5 * np.sin(2 * math.pi * f1 * t / rate) + 0.2 * np.sin(
        2 * math.pi * f2 * t / rate
    )


# ------------------------------------------------------ spec primitives


def test_ilog_spec_values():
    assert [_ilog(x) for x in (0, 1, 2, 3, 4, 7, -1)] == [0, 1, 2, 2, 3, 3, 0]


def test_float32_unpack_paper_cases():
    # mantissa * 2^(exp-788), sign in the top bit
    assert _float32_unpack((788 << 21) | 1) == 1.0
    assert _float32_unpack((789 << 21) | 3) == 6.0
    assert _float32_unpack(0x80000000 | (788 << 21) | 128) == -128.0
    assert _float32_unpack((787 << 21) | 1) == 0.5


def test_lookup1_values():
    assert _lookup1_values(256, 2) == 16
    assert _lookup1_values(225, 2) == 15
    assert _lookup1_values(257, 2) == 16
    assert _lookup1_values(27, 3) == 3


def test_inverse_db_table_closed_form_endpoints():
    # Published table endpoints (Vorbis I spec, floor1_inverse_dB_table)
    assert abs(_INVERSE_DB[0] - 1.0649863e-07) / 1.0649863e-07 < 1e-5
    assert _INVERSE_DB[255] == 1.0
    assert abs(_INVERSE_DB[1] - 1.1341951e-07) / 1.1341951e-07 < 1e-5


def test_codeword_assignment_paper_case():
    """lengths [1,2,3,3]: lowest-available assignment gives the
    textbook codes 0, 10, 110, 111."""
    dec = _assign_codewords([1, 2, 3, 3])
    assert dec == {(1, 0b0): 0, (2, 0b10): 1, (3, 0b110): 2, (3, 0b111): 3}


def test_codeword_assignment_uniform_is_sequential():
    dec = _assign_codewords([4] * 16)
    assert dec == {(4, i): i for i in range(16)}


def test_codeword_assignment_entry_order_not_length_order():
    """Vorbis assigns in ENTRY order (unlike DEFLATE's canonical sort):
    entry 0 len 3 takes 000, entry 1 len 1 must then take 1 (the 0
    subtree is blocked), entries 2,3 fill the rest."""
    dec = _assign_codewords([3, 1, 2, 3])
    assert dec == {(3, 0b000): 0, (1, 0b1): 1, (2, 0b01): 2, (3, 0b001): 3}


def test_codeword_assignment_rejects_bad_trees():
    with pytest.raises(ValueError):
        _assign_codewords([1, 1, 1])  # overspecified
    with pytest.raises(ValueError):
        _assign_codewords([2, 2, 2])  # underspecified
    # single used entry is the spec's special case, not an error
    assert _assign_codewords([0, 3, 0]) == {(3, 0): 1}


# ------------------------------------------------- round-trip vs vorbisref


def test_roundtrip_mono_blocksizes():
    x = _tone()
    for bs in (256, 512, 2048):
        got = decode_vorbis(encode_vorbis([x], rate=8000, block_size=bs))
        assert got is not None
        pcm, rate, ch = got
        assert rate == 8000 and ch == 1 and pcm.shape == (len(x), 1)
        assert _snr(x, pcm[:, 0]) > 24, f"bs={bs}"


def test_roundtrip_block_switching():
    """Mixed long/short frames exercise the window-flag slope placement
    and the center-aligned lap; any misalignment collapses SNR to ~0."""
    x = _tone()
    pat = lambda k: (k % 3 != 1)  # noqa: E731
    got = decode_vorbis(
        encode_vorbis(
            [x], rate=8000, block_size=2048, short_size=256, long_pattern=pat
        )
    )
    assert got is not None
    pcm, _, _ = got
    assert pcm.shape == (len(x), 1)
    assert _snr(x, pcm[:, 0]) > 24


def test_roundtrip_stereo_and_coupling():
    t = np.arange(6000)
    left = 0.5 * np.sin(2 * math.pi * 440 * t / 8000)
    right = 0.3 * np.sin(2 * math.pi * 660 * t / 8000)
    plain = decode_vorbis(encode_vorbis([left, right], rate=8000))
    coupled = decode_vorbis(
        encode_vorbis([left, right], rate=8000, coupling=True)
    )
    for got in (plain, coupled):
        assert got is not None
        pcm, rate, ch = got
        assert ch == 2 and pcm.shape == (6000, 2)
        assert _snr(left, pcm[:, 0]) > 24
        assert _snr(right, pcm[:, 1]) > 24


def test_residue_types_0_1_2_decode_identically():
    """The three residue layouts code the SAME quantized spectra, so
    all must reconstruct identical PCM: type 2 (channel-interleaved),
    type 1 (per-channel contiguous), type 0 (strided within each
    partition).  Stereo exercises the per-vector classword interleave
    of types 0/1."""
    t = np.arange(6000)
    left = 0.5 * np.sin(2 * math.pi * 440 * t / 8000)
    right = 0.3 * np.sin(2 * math.pi * 660 * t / 8000)
    outs = []
    for rt in (0, 1, 2):
        got = decode_vorbis(
            encode_vorbis([left, right], rate=8000, residue_type=rt)
        )
        assert got is not None, f"residue type {rt}"
        pcm, _, ch = got
        assert ch == 2 and pcm.shape == (6000, 2)
        assert _snr(left, pcm[:, 0]) > 24
        outs.append(pcm)
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[1], outs[2])
    # per-channel do-not-decode inside the type-1 classword interleave
    got = decode_vorbis(
        encode_vorbis(
            [left, right], rate=8000, residue_type=1, silent_channels={1}
        )
    )
    assert got is not None
    assert np.abs(got[0][:, 1]).max() == 0.0
    assert _snr(left, got[0][:, 0]) > 24


def test_silent_channel_and_coupling_propagate():
    """An unused floor renders the channel silent; with coupling the
    spec's nonzero-vector propagate rule still residue-decodes it so
    the partner channel survives."""
    t = np.arange(4000)
    left = 0.5 * np.sin(2 * math.pi * 440 * t / 8000)
    right = np.zeros(4000)
    for coupling in (False, True):
        got = decode_vorbis(
            encode_vorbis(
                [left, right],
                rate=8000,
                coupling=coupling,
                silent_channels={1},
            )
        )
        assert got is not None
        pcm, _, _ = got
        assert np.abs(pcm[:, 1]).max() == 0.0
        assert _snr(left, pcm[:, 0]) > 24


def test_floor_slope_curve():
    """A sloped two-point floor exercises render_line + the dB table
    (the encoder quantizes against a straight-line dB approximation,
    within one table step of the spec's integer line)."""
    x = _tone()
    got = decode_vorbis(
        encode_vorbis([x], rate=8000, block_size=512, floor_slope=(160, 210))
    )
    assert got is not None
    assert _snr(x, got[0][:, 0]) > 14


def test_paging_invariance():
    """Packet-to-page distribution (incl. lacing splits) must not
    affect output at all."""
    x = _tone(4000)
    a = decode_vorbis(encode_vorbis([x], rate=8000, packets_per_page=1))
    b = decode_vorbis(encode_vorbis([x], rate=8000, packets_per_page=50))
    assert a is not None and b is not None
    assert np.array_equal(a[0], b[0])


# ------------------------------------------------------- exactness pin


def test_lossless_exactness_vs_direct_reference():
    """With the stream's own quantization replicated here, the decoder
    must match a direct-cosine IMDCT + overlap-add reconstruction
    BIT-FOR-BIT (float64) — this pins Ogg parsing, codebook decode,
    floor curve, residue reassembly, window, and lap all at once."""
    from vorbisref import _floor_val, _fwd_mdct, _quantize, _win

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(2000) * 0.02).clip(-0.2, 0.2)
    floor_y = 235
    ogg = encode_vorbis([x], rate=8000, block_size=256, floor_y=floor_y)
    got = decode_vorbis(ogg)
    assert got is not None
    pcm = got[0]

    n, n2 = 256, 128
    f = _floor_val(floor_y)
    w = _win(n, n2, n2)
    pad = np.concatenate([np.zeros(n // 2), x, np.zeros(2 * n)])
    positions = [-(n // 2)]
    while positions[-1] + n // 2 < len(x):
        positions.append(positions[-1] + n // 2)
    j = np.arange(n)[:, None]
    k = np.arange(n2)[None, :]
    cos = np.cos(math.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
    ys = []
    for p in positions:
        seg = pad[p + n // 2 : p + n // 2 + n]
        spec = _quantize(_fwd_mdct(seg, w, n) / f, 118).astype(np.float64) * f
        ys.append((cos @ spec) * w)
    rec = np.concatenate(
        [ys[i - 1][n2:] + ys[i][:n2] for i in range(1, len(ys))]
    )[: len(x)]
    assert np.abs(pcm[: len(rec), 0] - rec).max() == 0.0


# ----------------------------------------------------- degrade behavior


def test_truncation_and_corruption_degrade():
    x = _tone()
    ogg = encode_vorbis([x], rate=8000, block_size=512, packets_per_page=3)
    full = decode_vorbis(ogg)[0]
    cut = decode_vorbis(ogg[:1000])
    assert cut is not None
    m = cut[0].shape[0]
    assert 0 < m < full.shape[0]
    assert np.array_equal(cut[0], full[:m])  # exact prefix
    bad = bytearray(ogg)
    bad[900] ^= 0x55  # mid audio page -> CRC fails -> stop there
    got = decode_vorbis(bytes(bad))
    assert got is not None and 0 < got[0].shape[0] < full.shape[0]


def test_header_corruption_and_garbage_return_none():
    x = _tone(2000)
    ogg = encode_vorbis([x], rate=8000)
    bad = bytearray(ogg)
    j = bad.find(b"OggS", 4)  # header page (comment+setup)
    bad[j + 40] ^= 0xFF
    assert decode_vorbis(bytes(bad)) is None
    rng = random.Random(1)
    for n in (0, 10, 500):
        assert decode_vorbis(bytes(rng.randrange(256) for _ in range(n))) is None


def test_fuzz_bitflips_never_crash():
    x = _tone(3000)
    ogg = encode_vorbis([x], rate=8000, block_size=512)
    rng = random.Random(7)
    for _ in range(40):
        b = bytearray(ogg)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        decode_vorbis(bytes(b))  # must not raise


def test_floor0_is_gated():
    """Streams declaring floor type 0 (obsolete LSP floor) return None
    rather than mis-decoding — a documented operating limit."""
    from vorbisref import _WBits, _codebook_classbook, _headers, ogg_page

    # hand-build a setup header whose first floor declares TYPE 0
    s = _WBits()
    s.write(0, 8)  # one codebook
    _codebook_classbook(s)
    s.write(0, 6)  # time count - 1
    s.write(0, 16)  # time transform 0
    s.write(0, 6)  # floor count - 1
    s.write(0, 16)  # floor TYPE 0 (LSP) — the gate under test
    setup = b"\x05vorbis" + s.to_bytes()
    hid, hcom, _ = _headers(1, 8000, 9, 9, 8, False, False)
    ogg = ogg_page([hid], 7, 0, 0, bos=True) + ogg_page([hcom, setup], 7, 1, 0)
    assert decode_vorbis(ogg) is None
    # and a corrupted setup magic is equally a clean None
    full = bytearray(encode_vorbis([_tone(2000)], rate=8000))
    mangled = full.replace(b"\x05vorbis", b"\x05vorbiz")
    assert decode_vorbis(bytes(mangled)) is None


# ------------------------------------------------ multimodal integration


def test_decode_audio_samples_routes_vorbis():
    from ic_spark.operators.multimodal import (
        decode_audio_samples,
        parse_media_header,
    )

    x = _tone(4000)
    ogg = encode_vorbis([x], rate=8000, block_size=512)
    got = decode_audio_samples(ogg)
    assert got is not None
    pcm, rate, ch = got
    assert rate == 8000 and ch == 1 and pcm.shape == (4000, 1)
    assert pcm.dtype.kind == "i"
    assert _snr(x * 32767.0, pcm[:, 0].astype(np.float64)) > 24
    hdr = parse_media_header(ogg)
    assert hdr == {
        "format": "vorbis",
        "width": None,
        "height": None,
        "duration_ms": 500,  # 4000 samples @ 8 kHz
    }


def test_extract_features_labels_vorbis(spark):
    from ic_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    x = _tone(3000)
    ogg = encode_vorbis([x], rate=8000, block_size=512)
    media = spark.createDataFrame(
        [(1, "audio", "audio/ogg", bytearray(ogg), None, None, None)],
        MEDIA_SCHEMA,
    )
    # strict=True must NOT raise: vorbis is a REAL decode path now
    row = extract_features(media, strict=True).collect()[0]
    assert row.feature.startswith("vorbis-8000hz-1ch-n3000-")
