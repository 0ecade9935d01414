"""Independent test-side Ogg-Vorbis encoder (Vorbis I, floor 1,
residue type 2) — written from the public Xiph Vorbis I specification
and RFC 3533, deliberately sharing no code with the engine decoder so
round-trip tests pin two implementations of the spec against each
other.

Design (fixed, simple, fully legal):
- codebook 0: residue classbook, dim 2, 4 entries, all 2-bit codes
  (a complete tree of equal lengths assigns sequential codewords —
  provable by hand, so the encoder does NOT reuse the decoder's
  assignment algorithm);
- codebook 1: coarse residue VQ, dim 2, lookup type 1, 16 levels,
  values 16*level - 128 (multiples of 16 in [-128, 112]), 256 entries,
  all 8-bit codes;
- codebook 2: fine residue VQ, same lattice with delta 1, min -8
  (integers [-8, 7]); coarse+fine covers integers [-136, 119];
- floor 1 with zero partitions: two raw points (0, 2^rangebits) at a
  per-frame flat level -> floor value = 10^((y-255)*7/256);
- residue type 2 (channel-interleaved), partition size 8, class 0 =
  all-zero partition (no books), class 1 = coarse+fine passes;
- mapping 0 with optional square-polar coupling; modes: one long mode,
  plus a short mode when two blocksizes are requested.

Frame geometry: frame k starts at p_k = p_{k-1} + 3n_{k-1}/4 - n_k/4
(p_0 = -n_0/2), hop = (n_{k-1}+n_k)/4, signal zero-padded; granule
positions are exact so the decoder reconstructs len(pcm) samples.
"""

from __future__ import annotations

import math

import numpy as np


class _WBits:
    """LSB-first bit writer (Vorbis bitpacking convention)."""

    def __init__(self):
        self.buf = bytearray()
        self.bit = 0

    def write(self, value: int, k: int) -> None:
        for i in range(k):
            if self.bit == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) % 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman codewords go to the stream MSb of the codeword
        first (tree-walk order)."""
        for d in range(length - 1, -1, -1):
            self.write((code >> d) & 1, 1)

    def to_bytes(self) -> bytes:
        return bytes(self.buf)


def _float32_pack(v: float) -> int:
    """Pack a value representable as +-mant * 2^(e-788), mant < 2^21."""
    sign = 0x80000000 if v < 0 else 0
    v = abs(v)
    if v == 0:
        return 788 << 21
    exp = 788
    while v != int(v):
        v *= 2
        exp -= 1
    v = int(v)
    while v >= (1 << 21):
        v >>= 1
        exp += 1
    return sign | (exp << 21) | v


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if crc & 0x80000000
                else (crc << 1) & 0xFFFFFFFF
            )
    return crc


def ogg_page(payload_packets, serial, seq, granule, bos=False, eos=False,
             cont=False) -> bytes:
    """One Ogg page holding the given (complete) packets."""
    lacing = []
    body = bytearray()
    for p in payload_packets:
        body += p
        n = len(p)
        while True:
            take = min(255, n)
            lacing.append(take)
            n -= take
            if take < 255:
                break
    htype = (1 if cont else 0) | (2 if bos else 0) | (4 if eos else 0)
    hdr = bytearray(b"OggS")
    hdr.append(0)
    hdr.append(htype)
    hdr += int(granule).to_bytes(8, "little", signed=True)
    hdr += serial.to_bytes(4, "little")
    hdr += seq.to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"  # crc placeholder
    hdr.append(len(lacing))
    hdr += bytes(lacing)
    page = bytes(hdr) + bytes(body)
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


# ------------------------------------------------------------- headers


def _codebook_classbook(w: _WBits) -> None:
    w.write(0x564342, 24)
    w.write(2, 16)  # dim
    w.write(4, 24)  # entries
    w.write(0, 1)  # not ordered
    w.write(0, 1)  # not sparse
    for _ in range(4):
        w.write(2 - 1, 5)  # all length 2
    w.write(0, 4)  # no lookup


def _codebook_lattice(w: _WBits, minimum: float, delta: float) -> None:
    w.write(0x564342, 24)
    w.write(2, 16)  # dim
    w.write(256, 24)  # entries (16 levels ^ 2)
    w.write(0, 1)
    w.write(0, 1)
    for _ in range(256):
        w.write(8 - 1, 5)  # all length 8
    w.write(1, 4)  # lookup type 1
    w.write(_float32_pack(minimum), 32)
    w.write(_float32_pack(delta), 32)
    w.write(4 - 1, 4)  # value_bits = 4
    w.write(0, 1)  # sequence_p
    for level in range(16):
        w.write(level, 4)


def _headers(channels, rate, bs0_log, bs1_log, rangebits, coupling,
             two_modes, residue_type=2):
    ident = _WBits()
    ident.write(0, 32)
    ident.write(channels, 8)
    ident.write(rate, 32)
    ident.write(0, 32)
    ident.write(0, 32)
    ident.write(0, 32)
    ident.write(bs0_log, 4)
    ident.write(bs1_log, 4)
    ident.write(1, 1)

    comment = _WBits()
    vendor = b"vorbisref"
    comment.write(len(vendor), 32)
    for byte in vendor:
        comment.write(byte, 8)
    comment.write(0, 32)  # no user comments
    comment.write(1, 1)

    s = _WBits()
    s.write(3 - 1, 8)  # codebook count
    _codebook_classbook(s)
    _codebook_lattice(s, -128.0, 16.0)  # coarse
    _codebook_lattice(s, -8.0, 1.0)  # fine
    s.write(0, 6)  # time count - 1
    s.write(0, 16)  # time transform 0
    s.write(0, 6)  # floor count - 1
    s.write(1, 16)  # floor type 1
    s.write(0, 5)  # partitions
    s.write(0, 2)  # multiplier - 1
    s.write(rangebits, 4)
    s.write(0, 6)  # residue count - 1
    s.write(residue_type, 16)
    s.write(0, 24)  # begin
    s.write(1 << 20, 24)  # end (clamped by the decoder to actual size)
    s.write(8 - 1, 24)  # partition size
    s.write(2 - 1, 6)  # classifications
    s.write(0, 8)  # classbook
    # class 0 cascade: 0 (no books)
    s.write(0, 3)
    s.write(0, 1)
    # class 1 cascade: passes 0 and 1
    s.write(3, 3)
    s.write(0, 1)
    s.write(1, 8)  # class 1 pass 0 -> coarse book
    s.write(2, 8)  # class 1 pass 1 -> fine book
    s.write(0, 6)  # mapping count - 1
    s.write(0, 16)  # mapping type 0
    s.write(0, 1)  # one submap
    if coupling and channels == 2:
        s.write(1, 1)
        s.write(0, 8)  # one step
        s.write(0, 1)  # magnitude = ch 0 (ilog(1) = 1 bit)
        s.write(1, 1)  # angle = ch 1
    else:
        s.write(0, 1)
    s.write(0, 2)  # reserved
    s.write(0, 8)  # time config (unused)
    s.write(0, 8)  # submap floor
    s.write(0, 8)  # submap residue
    if two_modes:
        s.write(1, 6)  # mode count - 1
        s.write(0, 1)  # mode 0: short
        s.write(0, 16)
        s.write(0, 16)
        s.write(0, 8)
        s.write(1, 1)  # mode 1: long
        s.write(0, 16)
        s.write(0, 16)
        s.write(0, 8)
    else:
        s.write(0, 6)
        s.write(1, 1)  # single long mode
        s.write(0, 16)
        s.write(0, 16)
        s.write(0, 8)
    s.write(1, 1)  # framing

    return (
        b"\x01vorbis" + ident.to_bytes(),
        b"\x03vorbis" + comment.to_bytes(),
        b"\x05vorbis" + s.to_bytes(),
    )


# --------------------------------------------------------------- frames


def _slope(ln):
    i = np.arange(ln)
    return np.sin(0.5 * math.pi * np.sin(0.5 * math.pi * (i + 0.5) / ln) ** 2)


def _win(n, lw, rw):
    w = np.zeros(n)
    ls = n // 4 - lw // 2
    w[ls : ls + lw] = _slope(lw)
    rs = 3 * n // 4 - rw // 2
    w[ls + lw : rs] = 1.0
    w[rs : rs + rw] = _slope(rw)[::-1]
    return w


def _fwd_mdct(seg, w, n):
    j = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    c = np.cos(math.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
    return (4.0 / n) * ((w * seg) @ c)


def _floor_val(y):
    return float(np.float32(10.0 ** ((y - 255) * 7.0 / 256.0)))


def _couple_forward(left: np.ndarray, right: np.ndarray):
    """Exact square-polar forward: per integer pair pick the branch of
    the spec's INVERSE map that reproduces (L, R)."""
    m = np.empty_like(left)
    a = np.empty_like(left)
    for i in range(len(left)):
        L, R = int(left[i]), int(right[i])
        if L > 0 and L - R > 0:
            m[i], a[i] = L, L - R
        elif R > 0 and L - R <= 0:
            m[i], a[i] = R, L - R
        elif L <= 0 and R - L > 0:
            m[i], a[i] = L, R - L
        else:
            m[i], a[i] = R, R - L
    return m, a


def _quantize(res: np.ndarray, lim: int = 118):
    # [-118, 118] splits into coarse*16 + fine with both in [-8, 7];
    # coupled streams use lim=59 so |angle| <= |L|+|R| stays codable.
    return np.clip(np.round(res), -lim, lim).astype(np.int64)


def _write_residue_body(w, coarse_vecs, fine_vecs, dnd, rtype):
    """Residue body for types 0/1/2 in the spec's classword-interleaved
    order across the submap's vectors.  Type 2 callers pass ONE
    channel-interleaved vector; types 0/1 pass per-channel vectors with
    per-channel do-not-decode flags.  Type 0 lays each VQ entry out
    STRIDED across the partition (positions off+k and off+k+step,
    step = psize/dim = 4); types 1/2 lay entries contiguously."""
    nvec = len(coarse_vecs)
    npart = len(coarse_vecs[0]) // 8
    classes = []
    for j in range(nvec):
        classes.append(
            [
                0
                if (
                    dnd[j]
                    or (
                        not coarse_vecs[j][p * 8 : p * 8 + 8].any()
                        and not fine_vecs[j][p * 8 : p * 8 + 8].any()
                    )
                )
                else 1
                for p in range(npart)
            ]
        )
    for p in (0, 1):
        pcount = 0
        while pcount < npart:
            if p == 0:
                for j in range(nvec):
                    if dnd[j]:
                        continue
                    c0 = classes[j][pcount]
                    c1 = classes[j][pcount + 1] if pcount + 1 < npart else 0
                    w.write_code(c0 * 2 + c1, 2)  # classbook, dim 2
            for _ in range(2):  # classwords per codeword
                if pcount >= npart:
                    break
                for j in range(nvec):
                    if dnd[j] or classes[j][pcount] != 1:
                        continue
                    vals = (coarse_vecs[j] if p == 0 else fine_vecs[j])[
                        pcount * 8 : pcount * 8 + 8
                    ]
                    levels = vals + 8  # both lattices: level = value + 8
                    if rtype == 0:
                        for kk in range(4):
                            entry = int(levels[kk]) + 16 * int(levels[kk + 4])
                            w.write_code(entry, 8)
                    else:
                        for kk in range(0, 8, 2):
                            entry = int(levels[kk]) + 16 * int(levels[kk + 1])
                            w.write_code(entry, 8)
                pcount += 1


def encode_vorbis(
    pcm,
    rate: int = 8000,
    block_size: int = 512,
    short_size: int | None = None,
    floor_y: int = 180,
    coupling: bool = False,
    long_pattern=None,
    packets_per_page: int = 5,
    floor_slope: tuple | None = None,
    silent_channels: set | None = None,
    residue_type: int = 2,
) -> bytes:
    """Encode float PCM (list of per-channel arrays, values in [-1,1])
    into a complete Ogg-Vorbis stream.

    ``short_size`` enables two modes; ``long_pattern`` is then a
    callable frame_index -> bool(long).  ``floor_slope=(y0, y1)``
    replaces the flat per-frame floor for floor-curve tests.
    ``silent_channels`` write an unused floor (decoder must zero them;
    with coupling the partner channel still revives residue decode).
    ``residue_type`` selects the coded layout: 2 (channel-interleaved,
    the common case), 1 (per-channel contiguous), 0 (per-channel
    strided partitions); coupling requires type 2.
    """
    if coupling and residue_type != 2:
        raise ValueError("this encoder couples only with residue type 2")
    chans = [np.asarray(c, dtype=np.float64) for c in pcm]
    channels = len(chans)
    nsamp = len(chans[0])
    two = short_size is not None
    n_long = block_size
    n_short = short_size if two else block_size
    bs0_log = int(math.log2(n_short))
    bs1_log = int(math.log2(n_long))
    rangebits = max(2, int(math.ceil(math.log2(max(n_long // 2, 4)))))
    silent = silent_channels or set()

    hid, hcom, hset = _headers(
        channels, rate, bs0_log, bs1_log, rangebits, coupling, two,
        residue_type=residue_type,
    )

    # frame plan
    sizes = []
    pos = []
    k = 0
    while True:
        if two:
            n = n_long if long_pattern(k) else n_short
        else:
            n = n_long
        if k == 0:
            p = -n // 2
        else:
            p = pos[-1] + 3 * sizes[-1] // 4 - n // 4
        sizes.append(n)
        pos.append(p)
        if p + n // 2 >= nsamp:
            break
        k += 1
    pad_front = sizes[0] // 2
    span = pos[-1] + sizes[-1]
    sig = np.zeros((channels, pad_front + span + n_long), dtype=np.float64)
    for c in range(channels):
        sig[c, pad_front : pad_front + nsamp] = chans[c]

    fy0, fy1 = floor_slope if floor_slope else (floor_y, floor_y)
    nframes = len(sizes)
    packets = []
    granules = []
    for k in range(nframes):
        n = sizes[k]
        long_f = n == n_long and two or not two
        lw = rw = n // 2
        if long_f and two:
            if k > 0 and sizes[k - 1] == n_short:
                lw = n_short // 2
            if k + 1 < nframes and sizes[k + 1] == n_short:
                rw = n_short // 2
        w_ana = _win(n, lw, rw)
        n2 = n // 2
        # per-channel spectra -> integer residues
        floor_curve = None
        if floor_slope:
            # independent expectation of the decoder's render_line for
            # a two-point floor is hard to share honestly; slope tests
            # quantize against a straight-line dB interpolation instead
            xs = np.arange(n2)
            ydb = fy0 + (fy1 - fy0) * xs / (1 << rangebits)
            floor_curve = np.float32(
                10.0 ** ((np.round(ydb) - 255) * 7.0 / 256.0)
            ).astype(np.float64)
        else:
            floor_curve = np.full(n2, _floor_val(fy0))
        res_int = []
        for c in range(channels):
            if c in silent:
                res_int.append(np.zeros(n2, dtype=np.int64))
                continue
            seg = sig[c, pad_front + pos[k] : pad_front + pos[k] + n]
            spec = _fwd_mdct(seg, w_ana, n)
            res_int.append(
                _quantize(spec / floor_curve, 59 if coupling else 118)
            )
        if coupling and channels == 2:
            m, a = _couple_forward(res_int[0], res_int[1])
            res_int = [m, a]
        wb = _WBits()
        wb.write(0, 1)  # audio packet
        if two:
            wb.write(1 if long_f else 0, 1)  # mode number (1 bit)
            if long_f:
                wb.write(
                    1 if (k == 0 or sizes[k - 1] == n_long) else 0, 1
                )
                wb.write(
                    1 if (k + 1 >= nframes or sizes[k + 1] == n_long) else 0,
                    1,
                )
        else:
            # single mode: ilog(0) = 0 mode bits, but the mode is
            # declared long (blockflag 1) so the window flags follow
            wb.write(1, 1)
            wb.write(1, 1)
        for c in range(channels):
            if c in silent:
                wb.write(0, 1)  # floor unused (channel renders silent)
                continue
            wb.write(1, 1)
            wb.write(fy0, 8)
            wb.write(fy1, 8)
        # floor((r+8)/16) keeps fine in [-8, 7] for every r in
        # [-136, 119] (round-half-to-even lets fine escape to 8)
        coarse_list, fine_list = [], []
        for c in range(channels):
            coarse = np.clip((res_int[c] + 8) // 16, -8, 7).astype(np.int64)
            fine_list.append(res_int[c] - coarse * 16)
            coarse_list.append(coarse)
        if residue_type == 2:
            flat_c = np.zeros(n2 * channels, dtype=np.int64)
            flat_f = np.zeros(n2 * channels, dtype=np.int64)
            for c in range(channels):
                flat_c[c::channels] = coarse_list[c]
                flat_f[c::channels] = fine_list[c]
            _write_residue_body(wb, [flat_c], [flat_f], [False], 2)
        else:
            dnd = [c in silent for c in range(channels)]
            _write_residue_body(
                wb, coarse_list, fine_list, dnd, residue_type
            )
        packets.append(wb.to_bytes())
        emitted = pos[k] + n // 2  # cumulative samples after this frame
        granules.append(min(max(emitted, 0), nsamp))
    granules[-1] = nsamp

    serial = 0x1C0FFEE
    pages = [ogg_page([hid], serial, 0, 0, bos=True)]
    pages.append(ogg_page([hcom, hset], serial, 1, 0))
    seq = 2
    i = 0
    while i < len(packets):
        group = packets[i : i + packets_per_page]
        last = i + len(group) - 1
        pages.append(
            ogg_page(
                group,
                serial,
                seq,
                granules[last],
                eos=(last == len(packets) - 1),
            )
        )
        seq += 1
        i += len(group)
    return b"".join(pages)
