"""JPEG decoder — pure Python + numpy, from the public ITU-T T.81
spec (no codec library).

Scope: baseline sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2:
spectral selection, successive approximation, EOB runs — T.81 G.2),
8-bit samples, grayscale or YCbCr with any sampling factors (4:4:4 /
4:2:2 / 4:2:0 upsampled by pixel replication), per-file
Huffman/quantization tables (progressive scans snapshot the tables in
effect), restart intervals, 0xFF00 byte unstuffing with
restart-segment splitting AT the marker scan (where stuffing and real
RSTn markers are distinguishable).  Lossless / arithmetic /
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
    """Decode a baseline or progressive JPEG to an (h, w, channels)
    uint8 array, or None for unsupported frames (lossless/arithmetic/
    hierarchical) and corrupt/truncated streams (bad bytes are data,
    not errors, in a 100 TB ingest)."""
    try:
        return _decode_jpeg(b)
    except (ValueError, IndexError, KeyError, MemoryError):
        return None


def _scan_entropy_segments(b: bytes, start: int):
    """Unstuff entropy data from ``start``, splitting into restart
    segments AT THE MARKER SCAN — where 0xFF00 stuffing and real
    FFD0-D7 restart markers are still distinguishable.  (A post-hoc
    split of already-unstuffed bytes would misread an unstuffed 0xFF
    data byte followed by a data byte in 0xD0-0xD7 as a restart
    marker and desync the decoder mid-stream.)  Returns
    (segments, index_of_next_marker)."""
    segments = []
    cur = bytearray()
    j = start
    while j < len(b):
        if b[j] == 0xFF and j + 1 < len(b):
            nxt = b[j + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break
        cur.append(b[j])
        j += 1
    segments.append(bytes(cur))
    return segments, j


def _decode_jpeg(b: bytes):
    if b[:2] != b"\xff\xd8":
        return None
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    progressive = False
    restart = 0
    scans = []  # progressive scan list; decoded at EOI
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD9:  # EOI
            break
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # lossless / arithmetic / hierarchical: out of scope
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            sel = []
            for c in range(ns):
                sel.append((seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15))
            spec = (
                seg[1 + 2 * ns],
                seg[2 + 2 * ns],
                seg[3 + 2 * ns] >> 4,
                seg[3 + 2 * ns] & 15,
            )
            segments, j = _scan_entropy_segments(b, i + 2 + seglen)
            if not progressive:
                seldict = {cid: (dct, act) for cid, dct, act in sel}
                return _decode_scan(
                    frame, seldict, segments, qt, huff_dc, huff_ac, restart
                )
            # progressive: Huffman tables may be redefined between
            # scans — snapshot the tables in effect for THIS scan.
            scans.append(
                (sel, spec, segments, dict(huff_dc), dict(huff_ac), restart)
            )
            i = j
            continue
        i += 2 + seglen
    if progressive and frame is not None and scans:
        return _decode_progressive(frame, scans, qt)
    return None


def _decode_scan(frame, sel, segments, qt, huff_dc, huff_ac, restart):
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
    total = sum(len(s) for s in segments)
    if mcux * mcuy * units * 2 > total * 8 + 64:
        return None
    planes = {}
    for c in comps:
        pw, ph = mcux * 8 * c["hs"], mcuy * 8 * c["vs"]
        planes[c["id"]] = np.zeros((ph, pw))
    pred = {c["id"]: 0 for c in comps}

    seg_idx = 0
    bits = _Bits(segments[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_in_seg == restart:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("jpeg: missing restart segment")
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

    return _planes_to_array(frame, planes, hmax, vmax)


def _planes_to_array(frame, planes, hmax, vmax):
    """Upsample component planes to full size and color-convert."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
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
        if len(out_planes) != 3:
            # 4-component (Adobe CMYK/YCCK) frames would be silently
            # color-converted as if YCbCr, dropping the K plane and
            # emitting garbage RGB (r10 review find) — unsupported
            # variants must return None, not wrong pixels.
            raise ValueError(
                f"jpeg: unsupported component count {len(out_planes)}"
            )
        y, cb, cr = out_planes[0], out_planes[1] - 128, out_planes[2] - 128
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bb = y + 1.772 * cb
        arr = np.stack([r, g, bb], axis=2)
    return np.clip(arr.round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- progressive
#
# SOF2 progressive mode (ITU-T T.81 G.2): coefficients arrive over
# multiple scans — DC first + optional refinements, AC spectral bands
# per component with optional successive approximation, EOB runs
# spanning blocks.  Coefficients accumulate in per-component int
# arrays (zigzag order); dequant + IDCT run once at the end.


def _comp_geometry(frame):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    geo = {}
    for c in comps:
        cw = (w * c["hs"] + hmax - 1) // hmax
        ch = (h * c["vs"] + vmax - 1) // vmax
        geo[c["id"]] = {
            "bw_mcu": mcux * c["hs"],   # interleaved block grid
            "bh_mcu": mcuy * c["vs"],
            "bw": (cw + 7) // 8,        # non-interleaved block grid
            "bh": (ch + 7) // 8,
        }
    return hmax, vmax, mcux, mcuy, geo


def _refine_nonzero(bits, coef, k, p1):
    """Correction bit for an already-nonzero coefficient (T.81 G.2.2:
    one bit; if set and the p1 bit is clear, step away from zero)."""
    if bits.read(1) and (int(coef[k]) & p1) == 0:
        coef[k] += p1 if coef[k] > 0 else -p1


def _decode_progressive(frame, scans, qt):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h <= 0 or w <= 0 or not comps:
        return None
    hmax, vmax, mcux, mcuy, geo = _comp_geometry(frame)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        return None
    # Corruption fail-fast, progressive flavor.  Unlike baseline
    # (DC code + EOB >= 2 bits per unit), a legitimate progressive
    # stream can go as low as ~1 bit per unit: an optimized-Huffman
    # first DC scan spends one bit per unit and EOB-run AC scans cover
    # thousands of blocks in a few bits (r10 ADVICE find — the old
    # 2-bit floor decoded flat/solid images to None).  Every unit
    # still costs >= 1 bit in its first DC scan, so a 0.5-bit floor
    # keeps 2x slack while rejecting bit-flipped dimension fields.
    units = sum(c["hs"] * c["vs"] for c in comps)
    total = sum(
        sum(len(s) for s in segments) for _sel, _spec, segments, *_ in scans
    )
    if mcux * mcuy * units > total * 16 + 64:
        return None
    # The entropy floor alone cannot stop a deliberate bomb (a few MB
    # of EOB-run payload would license a 65535x65535 SOF2 -> ~34 GB of
    # coefficient arrays), so additionally gate the ACTUAL allocation:
    # the per-component int64 coefficient planes must fit a fixed cap
    # (256 MiB covers ~8Kx8K 4:4:4) before np.zeros runs (r10 review
    # find — the allocation-then-MemoryError escaped decode_jpeg's
    # except clause and crashed the executor).
    alloc = sum(
        geo[c["id"]]["bh_mcu"] * geo[c["id"]]["bw_mcu"] * 64 * 8
        for c in comps
    )
    if alloc > 256 << 20:
        return None
    by_id = {c["id"]: c for c in comps}
    coefs = {
        c["id"]: np.zeros(
            (geo[c["id"]]["bh_mcu"], geo[c["id"]]["bw_mcu"], 64), dtype=np.int64
        )
        for c in comps
    }
    seen_dc = set()
    for sel, spec, segments, huff_dc, huff_ac, restart in scans:
        ss, se, ah, al = spec
        if ss == 0:
            if se != 0 or not sel:
                return None  # DC scan must be exactly coefficient 0
            _progressive_dc_scan(
                frame, sel, segments, huff_dc, restart,
                mcux, mcuy, geo, by_id, coefs, ah, al,
            )
            seen_dc.update(cid for cid, _, _ in sel)
        else:
            if len(sel) != 1 or se > 63 or ss > se:
                return None  # AC scans are single-component (G.2)
            cid = sel[0][0]
            if cid not in by_id or cid not in seen_dc:
                return None  # AC before that component's DC (spec order)
            _progressive_ac_scan(
                sel[0], spec, segments, huff_ac, restart, geo[cid],
                coefs[cid],
            )

    # reconstruct: dequant + batched IDCT per component
    planes = {}
    for c in comps:
        g = geo[c["id"]]
        arr = coefs[c["id"]]  # (bh_mcu, bw_mcu, 64) zigzag ints
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]]
        nat = np.zeros(arr.shape[:2] + (8, 8))
        for z in range(64):
            nat[:, :, ZIGZAG[z] // 8, ZIGZAG[z] % 8] = arr[:, :, z]
        nat *= q  # broadcast dequant
        px = np.einsum("ij,xyjk,kl->xyil", _P, nat, _P.T) + 128
        plane = px.transpose(0, 2, 1, 3).reshape(g["bh_mcu"] * 8, g["bw_mcu"] * 8)
        planes[c["id"]] = plane
    return _planes_to_array(frame, planes, hmax, vmax)


def _progressive_dc_scan(
    frame, sel, segments, huff_dc, restart,
    mcux, mcuy, geo, by_id, coefs, ah, al,
):
    """DC scan: interleaved MCU order when multiple components are
    listed, the component's own block raster otherwise.  First pass
    (Ah=0) decodes predicted diffs of the point-transformed DC; a
    refinement pass (Ah>0) appends one bit per block."""
    tables = {cid: huff_dc.get(t) for cid, t, _ in sel}
    if ah == 0 and any(v is None for v in tables.values()):
        raise ValueError("jpeg: missing DC table")
    interleaved = len(sel) > 1
    p1 = 1 << al
    seg_idx = 0
    bits = _Bits(segments[0])
    pred = {cid: 0 for cid, _, _ in sel}
    count = 0

    def maybe_restart():
        nonlocal seg_idx, bits, pred, count
        if restart and count == restart:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("jpeg: missing restart segment")
            bits = _Bits(segments[seg_idx])
            pred = {cid: 0 for cid, _, _ in sel}
            count = 0

    def one_block(cid, byy, bxx):
        coef = coefs[cid][byy, bxx]
        if ah == 0:
            t = _huff_decode(bits, tables[cid])
            diff = _extend(bits.read(t), t) if t else 0
            pred[cid] += diff
            coef[0] = pred[cid] << al
        else:
            if bits.read(1):
                coef[0] = int(coef[0]) | p1

    if interleaved:
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for cid, _dct, _act in sel:
                    c = by_id[cid]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            one_block(cid, my * c["vs"] + by, mx * c["hs"] + bx)
                count += 1
    else:
        cid = sel[0][0]
        g = geo[cid]
        for byy in range(g["bh"]):
            for bxx in range(g["bw"]):
                maybe_restart()
                one_block(cid, byy, bxx)
                count += 1


def _progressive_ac_scan(sel_entry, spec, segments, huff_ac, restart, g, carr):
    """AC scan over one component's own block raster (T.81 G.2.2 /
    G.2.3): spectral band [Ss, Se], EOB runs spanning blocks, first
    pass (Ah=0) or successive-approximation refinement (Ah>0)."""
    cid, _dct, act = sel_entry
    ss, se, ah, al = spec
    table = huff_ac.get(act)
    if table is None:
        raise ValueError("jpeg: missing AC table")
    p1 = 1 << al
    seg_idx = 0
    bits = _Bits(segments[0])
    eobrun = 0
    count = 0
    for byy in range(g["bh"]):
        for bxx in range(g["bw"]):
            if restart and count == restart:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("jpeg: missing restart segment")
                bits = _Bits(segments[seg_idx])
                eobrun = 0
                count = 0
            coef = carr[byy, bxx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _huff_decode(bits, table)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += bits.read(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("jpeg: AC band overflow")
                        coef[k] = _extend(bits.read(s), s) << al
                        k += 1
            else:
                eobrun = _refine_ac_block(bits, table, coef, ss, se, p1, eobrun)
            count += 1


def _refine_ac_block(bits, table, coef, ss, se, p1, eobrun):
    """One block of an AC successive-approximation refinement scan —
    the T.81 G.2.3 bit-interleaving: newly-significant coefficients
    arrive as (run, 1) codes, already-significant ones take a
    correction bit whenever the decode position passes them."""
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, table)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.read(r)
                    break  # rest of band: correction bits only
            else:
                if s != 1:
                    raise ValueError("jpeg: bad refine magnitude")
                val = p1 if bits.read(1) else -p1
            # advance over r zero-history coefficients, emitting
            # correction bits on nonzero ones passed along the way
            while k <= se:
                if coef[k] != 0:
                    _refine_nonzero(bits, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                _refine_nonzero(bits, coef, k, p1)
            k += 1
        eobrun -= 1
    return eobrun
