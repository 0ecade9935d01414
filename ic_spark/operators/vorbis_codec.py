"""Pure-Python Ogg-Vorbis decoder (Vorbis I, floor type 1).

Implemented from the public Vorbis I specification (Xiph.Org) and
RFC 3533 (Ogg): page/packet reassembly with CRC verification,
LSB-first bit unpacking, in-stream codebook parsing with the spec's
lowest-available codeword assignment, floor type 1 curve synthesis
(integer render_line + the closed-form inverse-dB table), residue
types 0/1/2, square-polar channel decoupling, and the lapped
window/IMDCT reconstruction (window = sin(pi/2 * sin^2), which is
power-complementary, so lossless streams reconstruct exactly).

Vorbis is fully self-describing — every Huffman codebook and
floor/residue configuration arrives IN the stream, and the one fixed
table (the floor decibel curve) has a derivable closed form — so a
from-scratch implementation can be genuinely conformant without any
opaque normative table data.  This is the deliberate contrast with
MP3/AAC, which are gated (see README "operating limits"): their
normative Huffman tables and synthesis windows exist only as published
table data with no authoritative copy in this environment.

Reference parity note: nimtable/IC has no media surface at all — this
extends the engine's training-data ingest the same way flac_codec.py
does for lossless audio.

Error policy mirrors flac_codec.py: corrupt/truncated payloads are
data, not errors, at 100 TB — a bad header yields None, a bad audio
packet ends the stream at the last good frame, and an end-of-packet
condition mid-audio-decode zero-fills the remainder per the spec.

Floor type 0 (LSP; obsolete — no mainstream encoder emitted it after
Vorbis 1.0) is honestly gated: streams using it return None.
"""

from __future__ import annotations

import math

import numpy as np

# --------------------------------------------------------------- Ogg layer


def _ogg_crc_table() -> list:
    # CRC-32, poly 0x04C11DB7, MSB-first, init 0, no final xor (RFC 3533).
    tbl = []
    for byte in range(256):
        crc = byte << 24
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF
                if crc & 0x80000000
                else (crc << 1) & 0xFFFFFFFF
            )
        tbl.append(crc)
    return tbl


_OGG_CRC = _ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    tbl = _OGG_CRC
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ tbl[((crc >> 24) & 0xFF) ^ byte]
    return crc


def _ogg_packets(b: bytes):
    """Reassemble the FIRST logical stream's packets from an Ogg
    container → (packets, last_granule).  Verifies each page CRC;
    a bad page ends reassembly at the last good page (degrade, don't
    discard).  Packets spanning pages are stitched via the lacing
    continuation rule (a packet continues iff its last lacing value
    is 255; the next page must then set the continuation flag)."""
    packets: list = []
    cur = bytearray()
    open_packet = False
    serial = None
    granule = -1
    i = 0
    n = len(b)
    while i + 27 <= n:
        if b[i : i + 4] != b"OggS" or b[i + 4] != 0:
            break
        nsegs = b[i + 26]
        hdr_end = i + 27 + nsegs
        if hdr_end > n:
            break
        table = b[i + 27 : hdr_end]
        body_len = sum(table)
        page_end = hdr_end + body_len
        if page_end > n:
            break
        page_serial = int.from_bytes(b[i + 14 : i + 18], "little")
        if serial is None:
            # Lock onto the stream whose BOS packet is \x01vorbis, not
            # blindly the first page: in a standard multiplexed Ogg
            # (e.g. Theora+Vorbis) the video BOS page comes first, and
            # locking to it skipped every Vorbis page (r10 review
            # find; parse_media_header already resolves the serial
            # this way).
            if b[hdr_end : hdr_end + 7] != b"\x01vorbis":
                i = page_end
                continue
            serial = page_serial
        if page_serial != serial:
            i = page_end
            continue  # skip interleaved foreign streams
        crc_want = int.from_bytes(b[i + 22 : i + 26], "little")
        page = bytearray(b[i:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc_want:
            break  # corrupt page: keep everything before it
        header_type = b[i + 5]
        if open_packet != bool(header_type & 0x01):
            # continuation mismatch = lost page; drop the partial packet
            cur = bytearray()
            open_packet = False
            if header_type & 0x01:
                i = page_end
                continue
        off = hdr_end
        completed = False
        for s in table:
            cur += b[off : off + s]
            off += s
            if s < 255:
                packets.append(bytes(cur))
                cur = bytearray()
                completed = True
        open_packet = bool(table) and table[-1] == 255
        pg = int.from_bytes(b[i + 6 : i + 14], "little", signed=True)
        if completed and pg >= 0:
            granule = pg
        i = page_end
    return packets, granule


# ------------------------------------------------------------ bit unpacking


class _EOP(Exception):
    """End of packet — not an error during audio decode (spec 4.3)."""


class _VBits:
    """LSB-first bit reader (Vorbis bitpacking convention: fields fill
    each byte from the least significant bit upward)."""

    __slots__ = ("b", "pos", "n")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0
        self.n = len(b) * 8

    def read(self, k: int) -> int:
        pos = self.pos
        if pos + k > self.n:
            raise _EOP()
        byte0 = pos >> 3
        shift = pos & 7
        chunk = int.from_bytes(
            self.b[byte0 : byte0 + ((shift + k + 7) >> 3)], "little"
        )
        self.pos = pos + k
        return (chunk >> shift) & ((1 << k) - 1)

    def read1(self) -> int:
        pos = self.pos
        if pos >= self.n:
            raise _EOP()
        self.pos = pos + 1
        return (self.b[pos >> 3] >> (pos & 7)) & 1


def _ilog(x: int) -> int:
    """Spec ilog: bits needed for x ( ilog(0)=0, ilog(1)=1, ilog(7)=3 )."""
    return x.bit_length() if x > 0 else 0


def _float32_unpack(x: int) -> float:
    """Vorbis packed float: 21-bit mantissa, sign, 10-bit exponent
    biased by 788."""
    mant = x & 0x1FFFFF
    if x & 0x80000000:
        mant = -mant
    exp = (x & 0x7FE00000) >> 21
    return float(mant) * (2.0 ** (exp - 788))


def _lookup1_values(entries: int, dim: int) -> int:
    """Largest integer v with v**dim <= entries."""
    v = int(entries ** (1.0 / dim))
    while (v + 1) ** dim <= entries:
        v += 1
    while v > 0 and v**dim > entries:
        v -= 1
    return v


# ---------------------------------------------------------------- codebooks


def _assign_codewords(lengths: list) -> dict:
    """Vorbis I codeword assignment: each used entry receives the
    numerically smallest (bitwise-lexicographically first) codeword of
    its declared length that neither prefixes nor extends an already
    assigned codeword.  Free code space is tracked as disjoint free
    subtrees (prefix value, prefix length) kept in position order.

    Returns {(length, codeword): entry}.  Raises on over- or
    under-specified trees (the spec calls both errors), except the
    single-used-entry special case.
    """
    used = [(i, L) for i, L in enumerate(lengths) if L]
    dec: dict = {}
    if not used:
        raise ValueError("vorbis: codebook with no used entries")
    if len(used) == 1:
        i, L = used[0]
        dec[(L, 0)] = i
        return dec
    free: list = [(0, 0)]  # (prefix value, prefix length), position-sorted
    for i, L in used:
        slot = None
        for idx, (v, l) in enumerate(free):
            if l <= L:
                slot = idx
                break
        if slot is None:
            raise ValueError("vorbis: overspecified codebook")
        v, l = free.pop(slot)
        # descend to depth L taking the 0 branch; free each 1-sibling
        siblings = []
        for d in range(l + 1, L + 1):
            siblings.append(((v << (d - l)) | 1, d))
        code = v << (L - l)
        # siblings are positioned after `code`'s subtree start in
        # ascending order already (deeper sibling = closer); they must
        # be inserted keeping global position order
        for s in siblings:
            sv, sl = s
            key = sv << (33 - sl)
            lo = 0
            while lo < len(free) and (free[lo][0] << (33 - free[lo][1])) < key:
                lo += 1
            free.insert(lo, s)
        dec[(L, code)] = i
    if free:
        raise ValueError("vorbis: underspecified codebook")
    return dec


class _Codebook:
    __slots__ = (
        "dim",
        "entries",
        "dec",
        "lookup_type",
        "vectors",
    )

    def __init__(self, bits: _VBits):
        if bits.read(24) != 0x564342:  # 'BCV' sync
            raise ValueError("vorbis: bad codebook sync")
        self.dim = bits.read(16)
        self.entries = bits.read(24)
        lengths: list = [0] * self.entries
        if bits.read1():  # ordered
            cur_len = bits.read(5) + 1
            cur = 0
            while cur < self.entries:
                num = bits.read(_ilog(self.entries - cur))
                if cur + num > self.entries:
                    raise ValueError("vorbis: ordered codebook overrun")
                for j in range(cur, cur + num):
                    lengths[j] = cur_len
                cur += num
                cur_len += 1
        else:
            sparse = bits.read1()
            for j in range(self.entries):
                if sparse:
                    if bits.read1():
                        lengths[j] = bits.read(5) + 1
                else:
                    lengths[j] = bits.read(5) + 1
        self.dec = _assign_codewords(lengths)
        self.lookup_type = bits.read(4)
        self.vectors = None
        if self.lookup_type == 0:
            return
        if self.lookup_type not in (1, 2):
            raise ValueError("vorbis: reserved codebook lookup type")
        minimum = _float32_unpack(bits.read(32))
        delta = _float32_unpack(bits.read(32))
        value_bits = bits.read(4) + 1
        sequence_p = bits.read1()
        if self.lookup_type == 1:
            lookup_values = _lookup1_values(self.entries, self.dim)
        else:
            lookup_values = self.entries * self.dim
        mults = [bits.read(value_bits) for _ in range(lookup_values)]
        # Pre-expand every entry's VQ vector (entries*dim floats; audio
        # codebooks are small — trades setup for per-sample speed).
        vecs = np.empty((self.entries, self.dim), dtype=np.float64)
        for e in range(self.entries):
            last = 0.0
            if self.lookup_type == 1:
                idiv = 1
                for d in range(self.dim):
                    off = (e // idiv) % lookup_values
                    val = mults[off] * delta + minimum + last
                    vecs[e, d] = val
                    if sequence_p:
                        last = val
                    idiv *= lookup_values
            else:
                for d in range(self.dim):
                    val = mults[e * self.dim + d] * delta + minimum + last
                    vecs[e, d] = val
                    if sequence_p:
                        last = val
        self.vectors = vecs

    def decode_scalar(self, bits: _VBits) -> int:
        code = 0
        length = 0
        dec = self.dec
        while length < 33:
            code = (code << 1) | bits.read1()
            length += 1
            e = dec.get((length, code))
            if e is not None:
                return e
        raise ValueError("vorbis: invalid codeword")

    def decode_vq(self, bits: _VBits):
        if self.vectors is None:
            raise ValueError("vorbis: scalar codebook used in VQ context")
        return self.vectors[self.decode_scalar(bits)]


# ------------------------------------------------------------------ floor 1

# Closed form of the spec's floor1_inverse_dB_table: entry i is
# 10**((i-255)*7/256) — the published 256-entry table is exactly this,
# rounded to float32 (verified against its endpoint values in tests).
_INVERSE_DB = np.float32(
    [10.0 ** ((i - 255) * 7.0 / 256.0) for i in range(256)]
).astype(np.float64)

_FLOOR1_RANGES = (256, 128, 86, 64)


class _Floor1:
    __slots__ = (
        "partitions",
        "class_list",
        "class_dims",
        "class_subs",
        "class_master",
        "sub_books",
        "multiplier",
        "x_list",
    )

    def __init__(self, bits: _VBits, books: list):
        self.partitions = bits.read(5)
        self.class_list = [bits.read(4) for _ in range(self.partitions)]
        max_class = max(self.class_list) if self.class_list else -1
        self.class_dims = []
        self.class_subs = []
        self.class_master = []
        self.sub_books = []
        for _ in range(max_class + 1):
            dim = bits.read(3) + 1
            sub = bits.read(2)
            master = bits.read(8) if sub else -1
            if master >= len(books):
                raise ValueError("vorbis: floor1 masterbook out of range")
            sb = []
            for _ in range(1 << sub):
                v = bits.read(8) - 1
                if v >= len(books):
                    raise ValueError("vorbis: floor1 subbook out of range")
                sb.append(v)
            self.class_dims.append(dim)
            self.class_subs.append(sub)
            self.class_master.append(master)
            self.sub_books.append(sb)
        self.multiplier = bits.read(2) + 1
        rangebits = bits.read(4)
        xs = [0, 1 << rangebits]
        for p in range(self.partitions):
            for _ in range(self.class_dims[self.class_list[p]]):
                xs.append(bits.read(rangebits))
        if len(set(xs)) != len(xs):
            raise ValueError("vorbis: floor1 duplicate X values")
        self.x_list = xs

    def decode(self, bits: _VBits, books: list):
        """→ list of final_Y values (un-rendered) or None (unused)."""
        if not bits.read1():
            return None
        frange = _FLOOR1_RANGES[self.multiplier - 1]
        ybits = _ilog(frange - 1)
        y = [bits.read(ybits), bits.read(ybits)]
        for p in range(self.partitions):
            cls = self.class_list[p]
            cdim = self.class_dims[cls]
            cbits = self.class_subs[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_master[cls]].decode_scalar(bits)
            for _ in range(cdim):
                book = self.sub_books[cls][cval & csub]
                cval >>= cbits
                if book >= 0:
                    y.append(books[book].decode_scalar(bits))
                else:
                    y.append(0)
        return y

    def curve(self, y: list, n2: int) -> np.ndarray:
        """Amplitude synthesis (spec 7.2.3/7.2.4) → length-n2 floor."""
        frange = _FLOOR1_RANGES[self.multiplier - 1]
        xs = self.x_list
        count = len(xs)
        final = [0] * count
        step2 = [False] * count
        final[0], final[1] = y[0], y[1]
        step2[0] = step2[1] = True
        for i in range(2, count):
            lo = _low_neighbor(xs, i)
            hi = _high_neighbor(xs, i)
            pred = _render_point(xs[lo], final[lo], xs[hi], final[hi], xs[i])
            val = y[i] if i < len(y) else 0
            highroom = frange - pred
            lowroom = pred
            room = 2 * (highroom if highroom < lowroom else lowroom)
            if val:
                step2[lo] = step2[hi] = step2[i] = True
                if val >= room:
                    if highroom > lowroom:
                        final[i] = val - lowroom + pred
                    else:
                        final[i] = pred - val + highroom - 1
                else:
                    if val & 1:
                        final[i] = pred - ((val + 1) >> 1)
                    else:
                        final[i] = pred + (val >> 1)
            else:
                final[i] = pred
            final[i] = max(0, min(frange - 1, final[i]))
        # curve synthesis over sorted points
        order = sorted(range(count), key=lambda j: xs[j])
        vec = np.zeros(n2, dtype=np.int64)
        mult = self.multiplier
        hx = 0
        hy = final[order[0]] * mult
        lx, ly = 0, hy
        for j in order[1:]:
            if not step2[j]:
                continue
            hx = xs[j]
            hy = final[j] * mult
            _render_line(lx, ly, hx, hy, vec)
            lx, ly = hx, hy
        if hx < n2:
            _render_line(hx, hy, n2, hy, vec)
        np.clip(vec, 0, 255, out=vec)
        return _INVERSE_DB[vec]


def _low_neighbor(xs: list, i: int) -> int:
    best, bx = -1, -1
    for j in range(i):
        if bx < xs[j] < xs[i]:
            best, bx = j, xs[j]
    return best


def _high_neighbor(xs: list, i: int) -> int:
    best, bx = -1, 1 << 62
    for j in range(i):
        if xs[i] < xs[j] < bx:
            best, bx = j, xs[j]
    return best


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, v: np.ndarray) -> None:
    """Spec's exact integer line render (truncating-toward-zero base
    slope + error accumulator); writes indices [x0, x1) clipped to v."""
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    base = abs(dy) // adx * (1 if dy >= 0 else -1)
    sy = base + 1 if dy >= 0 else base - 1
    ady -= abs(base) * adx
    n = len(v)
    if x0 < n:
        v[x0] = y0
    err = 0
    y = y0
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


# ------------------------------------------------------------------ residue


class _Residue:
    __slots__ = (
        "rtype",
        "begin",
        "end",
        "psize",
        "classifications",
        "classbook",
        "books",
    )

    def __init__(self, rtype: int, bits: _VBits, books: list):
        if rtype not in (0, 1, 2):
            raise ValueError("vorbis: reserved residue type")
        self.rtype = rtype
        self.begin = bits.read(24)
        self.end = bits.read(24)
        self.psize = bits.read(24) + 1
        self.classifications = bits.read(6) + 1
        self.classbook = bits.read(8)
        if self.classbook >= len(books):
            raise ValueError("vorbis: residue classbook out of range")
        cascade = []
        for _ in range(self.classifications):
            low = bits.read(3)
            high = bits.read(5) if bits.read1() else 0
            cascade.append((high << 3) | low)
        self.books = []
        for c in range(self.classifications):
            row = []
            for p in range(8):
                if cascade[c] & (1 << p):
                    bk = bits.read(8)
                    if bk >= len(books) or books[bk].vectors is None:
                        raise ValueError("vorbis: residue book invalid")
                    row.append(bk)
                else:
                    row.append(-1)
            self.books.append(row)

    def decode(self, bits: _VBits, books: list, vecs: list, dnd: list):
        """Decode into the float vectors `vecs` (len n2 each) for the
        channels of one submap; `dnd` = per-vector do-not-decode."""
        if self.rtype == 2:
            if all(dnd):
                return
            n = len(vecs[0]) * len(vecs)
            inter = [np.zeros(n, dtype=np.float64)]
            self._decode_inner(bits, books, inter, [False])
            flat = inter[0]
            ch = len(vecs)
            for c in range(ch):
                vecs[c][:] = flat[c::ch]
            return
        self._decode_inner(bits, books, vecs, dnd)

    def _decode_inner(self, bits: _VBits, books: list, vecs: list, dnd: list):
        actual = len(vecs[0])
        begin = min(self.begin, actual)
        end = min(self.end, actual)
        if end <= begin:
            return
        psize = self.psize
        to_read = (end - begin) // psize
        if to_read == 0:
            return
        classbook = books[self.classbook]
        cw = classbook.dim
        if cw <= 0:
            # A dim-0 classbook makes the partition loop below consume
            # ZERO bits while never advancing pcount — a crafted stream
            # hung the executor forever instead of decoding to None
            # (r10 review find; decode_vorbis catches the raise).
            raise ValueError("vorbis: residue classbook with dimension 0")
        nclass = self.classifications
        classes = [[0] * (to_read + cw) for _ in vecs]
        for p in range(8):
            pcount = 0
            while pcount < to_read:
                if p == 0:
                    for j, v in enumerate(vecs):
                        if dnd[j]:
                            continue
                        temp = classbook.decode_scalar(bits)
                        for i in range(cw - 1, -1, -1):
                            classes[j][pcount + i] = temp % nclass
                            temp //= nclass
                for _ in range(cw):
                    if pcount >= to_read:
                        break
                    for j, v in enumerate(vecs):
                        if dnd[j]:
                            continue
                        bk = self.books[classes[j][pcount]][p]
                        if bk < 0:
                            continue
                        book = books[bk]
                        off = begin + pcount * psize
                        dim = book.dim
                        if self.rtype == 0:
                            step = psize // dim
                            for k in range(step):
                                vec = book.decode_vq(bits)
                                for d in range(dim):
                                    v[off + k + d * step] += vec[d]
                        else:
                            k = 0
                            while k < psize:
                                vec = book.decode_vq(bits)
                                v[off + k : off + k + dim] += vec
                                k += dim
                    pcount += 1


# --------------------------------------------------------- mapping / modes


class _Mapping:
    __slots__ = ("submaps", "coupling", "mux", "submap_floor", "submap_residue")

    def __init__(self, bits: _VBits, channels: int, nfloors: int, nres: int):
        self.submaps = (bits.read(4) + 1) if bits.read1() else 1
        self.coupling = []
        if bits.read1():
            steps = bits.read(8) + 1
            cbits = _ilog(channels - 1)
            for _ in range(steps):
                mag = bits.read(cbits)
                ang = bits.read(cbits)
                if mag == ang or mag >= channels or ang >= channels:
                    raise ValueError("vorbis: bad coupling step")
                self.coupling.append((mag, ang))
        if bits.read(2):
            raise ValueError("vorbis: mapping reserved bits set")
        if self.submaps > 1:
            self.mux = [bits.read(4) for _ in range(channels)]
            if any(m >= self.submaps for m in self.mux):
                raise ValueError("vorbis: mux out of range")
        else:
            self.mux = [0] * channels
        self.submap_floor = []
        self.submap_residue = []
        for _ in range(self.submaps):
            bits.read(8)  # unused time config
            fl = bits.read(8)
            rs = bits.read(8)
            if fl >= nfloors or rs >= nres:
                raise ValueError("vorbis: submap floor/residue out of range")
            self.submap_floor.append(fl)
            self.submap_residue.append(rs)


# ------------------------------------------------------- window & IMDCT

_IMDCT_CACHE: dict = {}
_SLOPE_CACHE: dict = {}


def _imdct_matrix(n: int) -> np.ndarray:
    m = _IMDCT_CACHE.get(n)
    if m is None:
        j = np.arange(n, dtype=np.float64)[:, None]
        k = np.arange(n // 2, dtype=np.float64)[None, :]
        m = np.cos(math.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
        if n > 4096:
            m = m.astype(np.float32)
        _IMDCT_CACHE[n] = m
    return m


def _slope(ln: int) -> np.ndarray:
    s = _SLOPE_CACHE.get(ln)
    if s is None:
        i = np.arange(ln, dtype=np.float64)
        s = np.sin(
            0.5 * math.pi * np.sin(0.5 * math.pi * (i + 0.5) / ln) ** 2
        )
        _SLOPE_CACHE[ln] = s
    return s


def _window(n: int, lw: int, rw: int) -> np.ndarray:
    key = ("w", n, lw, rw)
    w = _SLOPE_CACHE.get(key)
    if w is None:
        w = np.zeros(n, dtype=np.float64)
        ls = n // 4 - lw // 2
        w[ls : ls + lw] = _slope(lw)
        rs = 3 * n // 4 - rw // 2
        w[ls + lw : rs] = 1.0
        w[rs : rs + rw] = _slope(rw)[::-1]
        _SLOPE_CACHE[key] = w
    return w


# ------------------------------------------------------------- the decoder


def decode_vorbis(b: bytes):
    """Decode an Ogg-Vorbis stream → (samples, rate, channels) with
    samples a (frames, channels) float64 array in [-1, 1], or None."""
    try:
        return _decode_vorbis(bytes(b))
    except Exception:
        return None


def _decode_vorbis(b: bytes):
    packets, granule = _ogg_packets(b)
    if len(packets) < 3:
        return None
    ident, comment, setup = packets[0], packets[1], packets[2]
    if ident[:7] != b"\x01vorbis" or setup[:7] != b"\x05vorbis":
        return None
    if comment[:7] != b"\x03vorbis":
        return None
    bits = _VBits(ident[7:])
    if bits.read(32) != 0:
        return None  # unknown version
    channels = bits.read(8)
    rate = bits.read(32)
    bits.read(32)  # bitrate max
    bits.read(32)  # bitrate nominal
    bits.read(32)  # bitrate min
    bs0 = 1 << bits.read(4)
    bs1 = 1 << bits.read(4)
    if not (64 <= bs0 <= bs1 <= 8192) or channels < 1 or rate < 1:
        return None
    if not bits.read1():
        return None  # framing bit

    sb = _VBits(setup[7:])
    books = [_Codebook(sb) for _ in range(sb.read(8) + 1)]
    for _ in range(sb.read(6) + 1):  # time transforms (all placeholder)
        if sb.read(16) != 0:
            raise ValueError("vorbis: bad time transform")
    floors = []
    for _ in range(sb.read(6) + 1):
        ftype = sb.read(16)
        if ftype == 1:
            floors.append(_Floor1(sb, books))
        elif ftype == 0:
            # floor 0 (LSP) predates Vorbis 1.0 encoders; honestly gated
            raise ValueError("vorbis: floor type 0 unsupported")
        else:
            raise ValueError("vorbis: reserved floor type")
    residues = []
    for _ in range(sb.read(6) + 1):
        residues.append(_Residue(sb.read(16), sb, books))
    mappings = []
    for _ in range(sb.read(6) + 1):
        if sb.read(16) != 0:
            raise ValueError("vorbis: reserved mapping type")
        mappings.append(_Mapping(sb, channels, len(floors), len(residues)))
    modes = []
    for _ in range(sb.read(6) + 1):
        blockflag = sb.read1()
        if sb.read(16) != 0 or sb.read(16) != 0:
            raise ValueError("vorbis: reserved mode transform")
        mapping = sb.read(8)
        if mapping >= len(mappings):
            raise ValueError("vorbis: mode mapping out of range")
        modes.append((blockflag, mapping))
    if not sb.read1():
        raise ValueError("vorbis: setup framing bit unset")

    mode_bits = _ilog(len(modes) - 1)
    out: list = []
    prev_tail = None
    prev_n = 0
    for pk in packets[3:]:
        try:
            frame = _decode_audio_packet(
                pk,
                mode_bits,
                modes,
                mappings,
                floors,
                residues,
                books,
                channels,
                bs0,
                bs1,
            )
        except _EOP:
            break
        except (ValueError, IndexError, KeyError):
            break  # bad packet: end at the last good frame
        if frame is None:
            break
        y, n = frame  # y: (channels, n) windowed time samples
        if prev_tail is not None:
            m = prev_n // 4 + n // 4
            seg = np.zeros((channels, m), dtype=np.float64)
            pt = prev_tail[:, : min(prev_tail.shape[1], m)]
            seg[:, : pt.shape[1]] += pt
            off = prev_n // 4 - n // 4
            half = y[:, : n // 2]
            if off >= 0:
                seg[:, off : off + n // 2] += half
            else:
                seg += half[:, -off : -off + m]
            out.append(seg)
        prev_tail = y[:, n // 2 :]
        prev_n = n
    if not out:
        return None
    pcm = np.concatenate(out, axis=1)
    if 0 <= granule < pcm.shape[1]:
        pcm = pcm[:, :granule]
    return pcm.T.copy(), rate, channels


def _decode_audio_packet(
    pk, mode_bits, modes, mappings, floors, residues, books, channels, bs0, bs1
):
    bits = _VBits(pk)
    if bits.read1():
        return None  # not an audio packet
    blockflag, mapno = modes[bits.read(mode_bits)]
    n = bs1 if blockflag else bs0
    lw = rw = n // 2
    if blockflag:
        prev_flag = bits.read1()
        next_flag = bits.read1()
        if not prev_flag:
            lw = bs0 // 2
        if not next_flag:
            rw = bs0 // 2
    mapping = mappings[mapno]
    n2 = n // 2

    # ---- floors (an EOP here ends the packet; spec: not an error —
    # treat the rest of this frame as zero by re-raising to the caller
    # only when nothing was decoded)
    floor_y = []
    for ch in range(channels):
        fl = floors[mapping.submap_floor[mapping.mux[ch]]]
        floor_y.append(fl.decode(bits, books))
    no_residue = [y is None for y in floor_y]
    # nonzero vector propagate: coupled channels decode together
    for mag, ang in mapping.coupling:
        if not (no_residue[mag] and no_residue[ang]):
            no_residue[mag] = no_residue[ang] = False

    # ---- residues
    res_vec = [np.zeros(n2, dtype=np.float64) for _ in range(channels)]
    for sm in range(mapping.submaps):
        chs = [c for c in range(channels) if mapping.mux[c] == sm]
        if not chs:
            continue
        rs = residues[mapping.submap_residue[sm]]
        try:
            rs.decode(
                bits,
                books,
                [res_vec[c] for c in chs],
                [no_residue[c] for c in chs],
            )
        except _EOP:
            break  # remainder of the frame is zero (spec 4.3)

    # ---- inverse coupling (descending step order)
    for mag, ang in reversed(mapping.coupling):
        m = res_vec[mag]
        a = res_vec[ang]
        new_m = m.copy()
        new_a = a.copy()
        pos_m = m > 0
        pos_a = a > 0
        #   M>0, A>0: A' = M - A      M>0, A<=0: M' = M + A, A' = M
        #   M<=0,A>0: A' = M + A      M<=0,A<=0: M' = M - A, A' = M
        new_a[pos_m & pos_a] = (m - a)[pos_m & pos_a]
        sel = pos_m & ~pos_a
        new_m[sel] = (m + a)[sel]
        new_a[sel] = m[sel]
        sel = ~pos_m & pos_a
        new_a[sel] = (m + a)[sel]
        sel = ~pos_m & ~pos_a
        new_m[sel] = (m - a)[sel]
        new_a[sel] = m[sel]
        res_vec[mag] = new_m
        res_vec[ang] = new_a

    # ---- floor curve * residue, IMDCT, window
    imdct = _imdct_matrix(n)
    win = _window(n, lw, rw)
    y = np.zeros((channels, n), dtype=np.float64)
    for ch in range(channels):
        if floor_y[ch] is None:
            continue
        fl = floors[mapping.submap_floor[mapping.mux[ch]]]
        spectrum = fl.curve(floor_y[ch], n2) * res_vec[ch]
        y[ch] = (imdct @ spectrum) * win
    return y, n
