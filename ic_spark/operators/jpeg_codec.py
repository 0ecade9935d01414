"""Baseline JPEG decoder — pure Python + numpy, from the public
ITU-T T.81 spec (no codec library).

Scope: baseline sequential DCT (SOF0/SOF1), 8-bit samples, grayscale
or YCbCr with any sampling factors (4:4:4 / 4:2:2 / 4:2:0 upsampled by
pixel replication), per-file Huffman/quantization tables, restart
intervals, 0xFF00 byte unstuffing.  Progressive / arithmetic /
hierarchical frames return None (the strict-mode gate upstream in
operators/multimodal.py reports them honestly).

Decode path per T.81 annexes: DHT canonical code reconstruction
(C.2), entropy decode with EXTEND sign recovery (F.2.2.1), zigzag
de-serialization + dequantization (F.2.1.5), separable 8x8 inverse
DCT (A.3.3) as two matrix products against the orthonormal basis, DC
prediction with restart-interval resets (F.2.1.3.1), then JFIF
YCbCr -> RGB (ITU-R BT.601 constants).

Validation strategy (tests/test_operators.py): the test suite carries
an INDEPENDENT encoder (textbook triple-loop forward DCT, its own
canonical table builder) and round-trips gradients, random RGB,
subsampled smooth images and restart intervals; the IDCT is pinned as
the exact inverse of that independent forward transform.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: P[x,u] = C(u)/2 * cos((2x+1) u pi / 16)
_P = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


def idct2(block):
    """2-D 8x8 inverse DCT (JPEG A.3.3) via the separable basis."""
    return _P @ block @ _P.T


class _Bits:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.i >= len(self.d):
                raise ValueError("jpeg: bitstream exhausted")
            byte = self.d[self.i]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.i += 1
        return v

    def align(self):
        if self.bit:
            self.bit = 0
            self.i += 1


def _build_huff(counts, symbols):
    """canonical Huffman: code -> symbol, keyed by (length, code)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits, table):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: bad huffman code")


def _extend(v, t):
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(b: bytes):
    """Decode a baseline JPEG to an (h, w, channels) uint8 array, or
    None for non-baseline frames and corrupt/truncated streams (bad
    bytes are data, not errors, in a 100 TB ingest)."""
    try:
        return _decode_jpeg(b)
    except (ValueError, IndexError, KeyError):
        return None


def _decode_jpeg(b: bytes):
    if b[:2] != b"\xff\xd8":
        return None
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = [
                        int.from_bytes(seg[j + 2 * z : j + 2 * z + 2], "big")
                        for z in range(64)
                    ]
                    j += 128
                else:
                    vals = list(seg[j : j + 64])
                    j += 64
                q = np.zeros(64)
                for z in range(64):
                    q[ZIGZAG[z]] = vals[z]
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = list(seg[j + 17 : j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(counts, symbols)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                o = 6 + 3 * c
                comps.append(
                    {
                        "id": seg[o],
                        "hs": seg[o + 1] >> 4,
                        "vs": seg[o + 1] & 15,
                        "tq": seg[o + 2],
                    }
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive & friends: out of scope
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            sel = {}
            for c in range(ns):
                sel[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
            # entropy data follows until next marker (skip stuffed FF00 / RSTn)
            j = i + 2 + seglen
            data = bytearray()
            while j < len(b):
                if b[j] == 0xFF and j + 1 < len(b):
                    nxt = b[j + 1]
                    if nxt == 0x00:
                        data.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart marker
                        data.append(0xFF)
                        data.append(nxt)
                        j += 2
                        continue
                    break
                data.append(b[j])
                j += 1
            return _decode_scan(frame, sel, bytes(data), qt, huff_dc, huff_ac, restart)
        i += 2 + seglen
    return None


def _decode_scan(frame, sel, data, qt, huff_dc, huff_ac, restart):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h <= 0 or w <= 0 or not comps:
        return None
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # Corruption fail-fast: every data unit consumes >= 2 entropy bits
    # (DC code + EOB), so a frame header whose MCU count cannot fit in
    # the scan data (e.g. a bit-flipped dimension field) is rejected
    # here instead of grinding through millions of doomed MCUs.
    units = sum(c["hs"] * c["vs"] for c in comps)
    if mcux * mcuy * units * 2 > len(data) * 8 + 64:
        return None
    planes = {}
    for c in comps:
        pw, ph = mcux * 8 * c["hs"], mcuy * 8 * c["vs"]
        planes[c["id"]] = np.zeros((ph, pw))
    pred = {c["id"]: 0 for c in comps}

    # split entropy data on restart markers if DRI is set
    segments = []
    if restart:
        cur = bytearray()
        j = 0
        while j < len(data):
            if data[j] == 0xFF and j + 1 < len(data) and 0xD0 <= data[j + 1] <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
            else:
                cur.append(data[j])
                j += 1
        segments.append(bytes(cur))
    else:
        segments = [data]

    seg_idx = 0
    bits = _Bits(segments[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_in_seg == restart:
                seg_idx += 1
                bits = _Bits(segments[seg_idx])
                mcu_in_seg = 0
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dct_t, act_t = sel[c["id"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coef = np.zeros(64)
                        t = _huff_decode(bits, huff_dc[dct_t])
                        diff = _extend(bits.read(t), t) if t else 0
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        kk = 1
                        while kk < 64:
                            rs = _huff_decode(bits, huff_ac[act_t])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("jpeg: AC overflow")
                            coef[kk] = _extend(bits.read(s), s)
                            kk += 1
                        block = np.zeros((8, 8))
                        for z in range(64):
                            block[ZIGZAG[z] // 8][ZIGZAG[z] % 8] = coef[z]
                        block *= qt[c["tq"]]
                        px = idct2(block) + 128
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_in_seg += 1

    # upsample to full size and color-convert
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        arr = out_planes[0][..., None]
    else:
        y, cb, cr = out_planes[0], out_planes[1] - 128, out_planes[2] - 128
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bb = y + 1.772 * cb
        arr = np.stack([r, g, bb], axis=2)
    return np.clip(arr.round(), 0, 255).astype(np.uint8)
