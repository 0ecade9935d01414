"""Test-only FLAC encoder — the INDEPENDENT half of the codec
validation (same discipline as jpegref.py): its own MSB-first bit
writer, spec CRC-8/CRC-16, Rice zigzag coding, fixed-predictor
residuals and stereo decorrelation, written from the xiph.org spec so
decoder bugs cannot hide behind shared code.  FLAC is lossless, so
every decode must reproduce the source samples EXACTLY."""

from __future__ import annotations


class _FBitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        value &= (1 << n) - 1 if n else 0
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_unary(self, q: int):
        self.bits += [0] * q + [1]

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_number(w: _FBitWriter, v: int):
    if v < 0x80:
        w.write(v, 8)
        return
    # minimal multi-byte form
    payload_bits = v.bit_length()
    for n in range(1, 7):
        if payload_bits <= 5 * n + (6 - n):
            break
    chunks = []
    for _ in range(n):
        chunks.append(v & 0x3F)
        v >>= 6
    lead = (0xFF << (7 - n)) & 0xFF | v
    w.write(lead, 8)
    for c in reversed(chunks):
        w.write(0x80 | c, 8)


def _rice_residual(w: _FBitWriter, resid: list[int], param: int,
                   partition_order: int = 0, block_size: int = 0,
                   pred_order: int = 0):
    """Rice-code residuals (method 0, 4-bit params), optionally split
    into 2^partition_order partitions all using ``param``."""
    w.write(0, 2)  # method 0
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        n = (block_size >> partition_order) - (pred_order if p == 0 else 0)
        w.write(param, 4)
        for r in resid[idx : idx + n]:
            # zigzag: nonneg -> 2r, neg -> -2r-1
            z = (r << 1) if r >= 0 else (((-r) << 1) - 1)
            w.write_unary(z >> param)
            if param:
                w.write(z & ((1 << param) - 1), param)
        idx += n


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    s = samples
    if order == 0:
        return list(s)
    if order == 1:
        return [s[i] - s[i - 1] for i in range(1, len(s))]
    if order == 2:
        return [s[i] - 2 * s[i - 1] + s[i - 2] for i in range(2, len(s))]
    if order == 3:
        return [
            s[i] - 3 * s[i - 1] + 3 * s[i - 2] - s[i - 3]
            for i in range(3, len(s))
        ]
    return [
        s[i] - 4 * s[i - 1] + 6 * s[i - 2] - 4 * s[i - 3] + s[i - 4]
        for i in range(4, len(s))
    ]


def _lpc_residual(samples: list[int], coefs: list[int], shift: int) -> list[int]:
    order = len(coefs)
    out = []
    for i in range(order, len(samples)):
        acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        out.append(samples[i] - (acc >> shift))
    return out


def _subframe(w: _FBitWriter, samples: list[int], bps: int, kind: str,
              order: int = 2, rice_param: int = 4, partition_order: int = 0,
              wasted: int = 0, lpc_coefs=None, lpc_shift: int = 0,
              lpc_precision: int = 12):
    w.write(0, 1)  # padding
    if kind == "constant":
        w.write(0, 6)
    elif kind == "verbatim":
        w.write(1, 6)
    elif kind == "lpc":
        w.write(32 | (len(lpc_coefs) - 1), 6)
    else:  # fixed
        w.write(8 + order, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
        samples = [s >> wasted for s in samples]
        eff = bps - wasted
    else:
        w.write(0, 1)
        eff = bps
    if kind == "constant":
        w.write(samples[0], eff)
    elif kind == "verbatim":
        for s in samples:
            w.write(s, eff)
    elif kind == "lpc":
        o = len(lpc_coefs)
        for s in samples[:o]:
            w.write(s, eff)
        w.write(lpc_precision - 1, 4)
        w.write(lpc_shift, 5)
        for c in lpc_coefs:
            w.write(c, lpc_precision)
        _rice_residual(
            w,
            _lpc_residual(samples, lpc_coefs, lpc_shift),
            rice_param,
            partition_order,
            len(samples),
            o,
        )
    else:
        for s in samples[:order]:
            w.write(s, eff)
        _rice_residual(
            w,
            _fixed_residual(samples, order),
            rice_param,
            partition_order,
            len(samples),
            order,
        )


def encode_flac(channels_samples, rate=8000, bps=16, block_size=64,
                subframe_kind="fixed", order=2, rice_param=4,
                partition_order=0, stereo_mode="independent", wasted=0,
                lpc_coefs=None, lpc_shift=0):
    """channels_samples: list of per-channel equal-length int lists.
    Emits STREAMINFO + fixed-blocksize frames; the last frame uses the
    8/16-bit explicit block-size codes when short."""
    nch = len(channels_samples)
    total = len(channels_samples[0])

    # STREAMINFO
    si = _FBitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unset
    body = si.to_bytes()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    pos = 0
    while pos < total:
        bs = min(block_size, total - pos)
        w = _FBitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        if bs == block_size and bs == 4096:
            bs_code = 12
        elif bs <= 256:
            bs_code = 6
        else:
            bs_code = 7
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "independent":
            w.write(nch - 1, 4)
        elif stereo_mode == "left_side":
            w.write(8, 4)
        elif stereo_mode == "right_side":
            w.write(9, 4)
        else:  # mid_side
            w.write(10, 4)
        w.write(0, 3)  # sample size: from STREAMINFO
        w.write(0, 1)
        _utf8_number(w, frame_no)
        if bs_code == 6:
            w.write(bs - 1, 8)
        elif bs_code == 7:
            w.write(bs - 1, 16)
        w.align()
        header = w.to_bytes()
        w.write(_crc8(header), 8)

        block = [c[pos : pos + bs] for c in channels_samples]
        if stereo_mode == "independent":
            for c in block:
                _subframe(w, c, bps, subframe_kind, order, rice_param,
                          partition_order, wasted,
                          lpc_coefs=lpc_coefs, lpc_shift=lpc_shift)
        elif stereo_mode == "left_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            _subframe(w, block[0], bps, subframe_kind, order, rice_param,
                      partition_order)
            _subframe(w, side, bps + 1, subframe_kind, order, rice_param,
                      partition_order)
        elif stereo_mode == "right_side":
            side = [l - r for l, r in zip(block[0], block[1])]
            _subframe(w, side, bps + 1, subframe_kind, order, rice_param,
                      partition_order)
            _subframe(w, block[1], bps, subframe_kind, order, rice_param,
                      partition_order)
        else:  # mid_side
            mid = [(l + r) >> 1 for l, r in zip(block[0], block[1])]
            side = [l - r for l, r in zip(block[0], block[1])]
            _subframe(w, mid, bps, subframe_kind, order, rice_param,
                      partition_order)
            _subframe(w, side, bps + 1, subframe_kind, order, rice_param,
                      partition_order)
        w.align()
        frame = w.to_bytes()
        w.write(_crc16(frame), 16)
        out += w.to_bytes()
        pos += bs
        frame_no += 1
    return bytes(out)
