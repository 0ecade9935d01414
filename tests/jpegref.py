"""Test-only baseline JPEG encoder — the INDEPENDENT half of the
codec validation: textbook triple-loop forward DCT (vs the decoder's
matrix IDCT), its own canonical Huffman table builder (each file
declares its tables, as the spec allows), 2x2 chroma averaging for
4:2:0.  Lives in tests so decoder bugs cannot hide behind shared
code."""
import math

import numpy as np

from ic_spark.operators.jpeg_codec import ZIGZAG


def fdct_ref(px):
    """Textbook forward DCT (triple loop) — independent of the
    decoder's matrix IDCT."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        px[x][y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            out[u][v] = s * cu * cv / 4.0
    return out


def _category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes_stuffed(self):
        # pad with 1s to byte boundary (spec), stuff 0x00 after 0xFF
        bits = self.bits + [1] * ((8 - len(self.bits) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _fixed_table(symbols):
    """All-same-length canonical table; returns (counts16, symbols,
    code_map)."""
    n = len(symbols)
    length = max(2, (n + 1).bit_length())  # leave the all-ones code free
    counts = [0] * 16
    counts[length - 1] = n
    code_map = {}
    code = 0
    for s in symbols:
        code_map[s] = (length, code)
        code += 1
    return counts, symbols, code_map


def encode_jpeg(arr, subsample=False, quant=None, restart=0):
    """arr: (h, w) gray or (h, w, 3) RGB uint8."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [("Y", arr, 1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            comps = [("Y", y, 2, 2), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
        else:
            comps = [("Y", y, 1, 1), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component padded planes (subsampled chroma averaged 2x2)
    planes = []
    for _name, p, hs, vs in comps:
        if hs != hmax or vs != vmax:
            ry, rx = vmax // vs, hmax // hs
            ph = (h + ry - 1) // ry
            pw = (w + rx - 1) // rx
            sub = np.zeros((ph, pw))
            for yy in range(ph):
                for xx in range(pw):
                    blockpx = p[yy * ry : yy * ry + ry, xx * rx : xx * rx + rx]
                    sub[yy, xx] = blockpx.mean()
            p = sub
        tw, th = mcux * 8 * hs, mcuy * 8 * vs
        pad = np.zeros((th, tw))
        ph0, pw0 = p.shape
        pad[:ph0, :pw0] = p
        pad[ph0:, :pw0] = p[-1:, :]
        pad[:, pw0:] = pad[:, pw0 - 1 : pw0]
        planes.append(pad)

    # first pass: collect (blocks, symbols)
    blocks_per_comp = []
    dc_syms, ac_syms = set(), set()
    preds = [0] * len(comps)
    all_units = []  # sequence of (comp_idx, coefzz)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_n, _p, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        px = planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128
                        coef = np.round(fdct_ref(px) / q).astype(int)
                        zz = [int(coef[ZIGZAG[z] // 8][ZIGZAG[z] % 8]) for z in range(64)]
                        all_units.append((ci, zz))

    # symbol collection with DC prediction & restart resets
    mcu_units = len(
        [1 for _n, _p, hs, vs in comps for _ in range(hs * vs)]
    )
    preds = [0] * len(comps)
    runs = []
    unit_i = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                preds = [0] * len(comps)
            for ci, (_n, _p, hs, vs) in enumerate(comps):
                for _ in range(hs * vs):
                    _ci, zz = all_units[unit_i]
                    unit_i += 1
                    diff = zz[0] - preds[ci]
                    preds[ci] = zz[0]
                    dc_syms.add(_category(diff))
                    k = 1
                    while k < 64:
                        r = 0
                        while k < 64 and zz[k] == 0:
                            r += 1
                            k += 1
                        if k == 64:
                            ac_syms.add(0x00)
                            break
                        while r > 15:
                            ac_syms.add(0xF0)
                            r -= 16
                        ac_syms.add((r << 4) | _category(zz[k]))
                        k += 1
            mcu_i += 1

    dc_counts, dc_symbols, dc_map = _fixed_table(sorted(dc_syms))
    ac_counts, ac_symbols, ac_map = _fixed_table(sorted(ac_syms))

    # entropy-encode
    def write_unit(wtr, zz, ci, preds):
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        t = _category(diff)
        ln, code = dc_map[t]
        wtr.write(code, ln)
        if t:
            v = diff if diff > 0 else diff + (1 << t) - 1
            wtr.write(v, t)
        k = 1
        while k < 64:
            r = 0
            while k < 64 and zz[k] == 0:
                r += 1
                k += 1
            if k == 64:
                ln, code = ac_map[0x00]
                wtr.write(code, ln)
                break
            while r > 15:
                ln, code = ac_map[0xF0]
                wtr.write(code, ln)
                r -= 16
            s = _category(zz[k])
            ln, code = ac_map[(r << 4) | s]
            wtr.write(code, ln)
            v = zz[k] if zz[k] > 0 else zz[k] + (1 << s) - 1
            wtr.write(v, s)
            k += 1

    preds = [0] * len(comps)
    chunks = []
    wtr = _BitWriter()
    unit_i = 0
    mcu_i = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                chunks.append(wtr.bytes_stuffed())
                chunks.append(bytes([0xFF, 0xD0 + (rst_n % 8)]))
                rst_n += 1
                wtr = _BitWriter()
                preds = [0] * len(comps)
            for ci, (_n, _p, hs, vs) in enumerate(comps):
                for _ in range(hs * vs):
                    _ci, zz = all_units[unit_i]
                    unit_i += 1
                    write_unit(wtr, zz, ci, preds)
            mcu_i += 1
    chunks.append(wtr.bytes_stuffed())
    entropy = b"".join(chunks)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    zzq = bytes(int(q[ZIGZAG[z] // 8][ZIGZAG[z] % 8]) for z in range(64))
    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + zzq)
    sof = b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for ci, (_n, _p, hs, vs) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(dc_counts) + bytes(dc_symbols))
    out += seg(0xC4, b"\x10" + bytes(ac_counts) + bytes(ac_symbols))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    return out


# ------------------------------------------------------ progressive ref
#
# Independent progressive (SOF2) encoder: spectral selection +
# successive approximation with EOB runs, per T.81 G.1/G.2 — the
# encoder-side mirror of the decoder's refinement algorithm, written
# from the spec so decoder bugs cannot hide behind shared code.


def _sig_shift(v, al):
    """Toward-zero point transform for AC (spec G.1.2.2)."""
    a = abs(v) >> al
    return -a if v < 0 else a


class _ProgWriter:
    """Bit writer + EOB-run state (count + buffered correction bits)."""

    def __init__(self, dc_map, ac_map):
        self.w = _BitWriter()
        self.dc_map = dc_map
        self.ac_map = ac_map
        self.eobrun = 0
        self.br = []  # correction bits buffered behind the pending EOB run

    def sym(self, table, s):
        ln, code = table[s]
        self.w.write(code, ln)

    def flush_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(self.ac_map, r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
        for b in self.br:
            self.w.write(b, 1)
        self.eobrun = 0
        self.br = []


def encode_progressive_jpeg(arr, subsample=False, quant=None, restart=0,
                            successive=True):
    """arr: (h, w) gray or (h, w, 3) RGB uint8 → SOF2 progressive JPEG.

    Scan script: DC-first (interleaved, Al=1 when ``successive``), AC
    first passes per component over bands [1,5] and [6,63], then DC +
    AC refinement passes down to Al=0.  ``successive=False`` emits
    spectral selection only (single Al=0 passes)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [("Y", arr, 1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            comps = [("Y", y, 2, 2), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
        else:
            comps = [("Y", y, 1, 1), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=np.float64)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # padded planes + coefficient blocks on the interleaved grid
    coefs = []  # per comp: [by][bx] -> zz list(64)
    geos = []   # per comp: (bw_mcu, bh_mcu, bw, bh)
    for _name, p, hs, vs in comps:
        if hs != hmax or vs != vmax:
            ry, rx = vmax // vs, hmax // hs
            ph = (h + ry - 1) // ry
            pw = (w + rx - 1) // rx
            sub = np.zeros((ph, pw))
            for yy in range(ph):
                for xx in range(pw):
                    blockpx = p[yy * ry : yy * ry + ry, xx * rx : xx * rx + rx]
                    sub[yy, xx] = blockpx.mean()
            p = sub
        tw, th = mcux * 8 * hs, mcuy * 8 * vs
        pad = np.zeros((th, tw))
        ph0, pw0 = p.shape
        pad[:ph0, :pw0] = p
        pad[ph0:, :pw0] = p[ph0 - 1 : ph0, :pw0]
        pad[:, pw0:] = pad[:, pw0 - 1 : pw0]
        grid = []
        for byy in range(mcuy * vs):
            row = []
            for bxx in range(mcux * hs):
                px = pad[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] - 128
                coef = np.round(fdct_ref(px) / q).astype(int)
                row.append(
                    [int(coef[ZIGZAG[z] // 8][ZIGZAG[z] % 8]) for z in range(64)]
                )
            grid.append(row)
        coefs.append(grid)
        geos.append(
            (
                mcux * hs,
                mcuy * vs,
                ((w * hs + hmax - 1) // hmax + 7) // 8,
                ((h * vs + vmax - 1) // vmax + 7) // 8,
            )
        )

    # scan script
    ncomp = len(comps)
    if successive:
        script = [("dc", list(range(ncomp)), 0, 0, 0, 1)]
        for ci in range(ncomp):
            script += [("ac", [ci], 1, 5, 0, 1), ("ac", [ci], 6, 63, 0, 1)]
        script.append(("dc", list(range(ncomp)), 0, 0, 1, 0))
        for ci in range(ncomp):
            script += [("ac", [ci], 1, 5, 1, 0), ("ac", [ci], 6, 63, 1, 0)]
    else:
        script = [("dc", list(range(ncomp)), 0, 0, 0, 0)]
        for ci in range(ncomp):
            script.append(("ac", [ci], 1, 63, 0, 0))

    # symbol collection needs a dry run; use fixed all-symbol tables
    # instead (valid, just not optimal): DC categories 0..11 and every
    # AC (run, size) the passes can emit.
    dc_counts, dc_symbols, dc_map = _fixed_table(list(range(12)))
    ac_syms = sorted({(r << 4) | s for r in range(16) for s in range(11)})
    ac_counts, ac_symbols, ac_map = _fixed_table(ac_syms)

    def encode_scan(kind, cis, ss, se, ah, al):
        wtr = _ProgWriter(dc_map, ac_map)
        chunks = []
        rst_n = 0
        count = [0]
        preds = {ci: 0 for ci in cis}

        def maybe_restart():
            nonlocal rst_n
            if restart and count[0] == restart:
                wtr.flush_eobrun()
                chunks.append(wtr.w.bytes_stuffed())
                chunks.append(bytes([0xFF, 0xD0 + (rst_n % 8)]))
                rst_n += 1
                wtr.w = _BitWriter()
                for ci in preds:
                    preds[ci] = 0
                count[0] = 0

        def dc_block(ci, zz):
            if ah == 0:
                temp = zz[0] >> al  # arithmetic shift (G.1.2.1)
                diff = temp - preds[ci]
                preds[ci] = temp
                t = _category(diff)
                wtr.sym(dc_map, t)
                if t:
                    v = diff if diff > 0 else diff + (1 << t) - 1
                    wtr.w.write(v, t)
            else:
                wtr.w.write((zz[0] >> al) & 1, 1)

        def ac_first_block(zz):
            t = [_sig_shift(zz[k], al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(t) if v]
            if not nz:
                wtr.eobrun += 1
                if wtr.eobrun == 0x7FFF:
                    wtr.flush_eobrun()
                return
            wtr.flush_eobrun()
            r = 0
            for i in range(nz[-1] + 1):
                v = t[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    wtr.sym(ac_map, 0xF0)
                    r -= 16
                s = _category(v)
                wtr.sym(ac_map, (r << 4) | s)
                wtr.w.write(v if v > 0 else v + (1 << s) - 1, s)
                r = 0
            if nz[-1] < se - ss:
                wtr.eobrun = 1

        def ac_refine_block(zz):
            absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
            eob = 0  # 1-based index past the last NEWLY significant coef
            for i, a in enumerate(absv):
                if a == 1:
                    eob = i + 1
            r = 0
            br = []
            for i, a in enumerate(absv):
                if a == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    wtr.flush_eobrun()
                    wtr.sym(ac_map, 0xF0)
                    r -= 16
                    for bit in br:
                        wtr.w.write(bit, 1)
                    br = []
                if a > 1:  # already significant: correction bit
                    br.append(a & 1)
                    continue
                wtr.flush_eobrun()
                wtr.sym(ac_map, (r << 4) | 1)
                wtr.w.write(1 if zz[ss + i] > 0 else 0, 1)
                for bit in br:
                    wtr.w.write(bit, 1)
                r = 0
                br = []
            if r > 0 or br:
                wtr.eobrun += 1
                wtr.br.extend(br)
                if wtr.eobrun == 0x7FFF:
                    wtr.flush_eobrun()

        if kind == "dc" and len(cis) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci in cis:
                        _n, _p, hs, vs = comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                dc_block(
                                    ci, coefs[ci][my * vs + by][mx * hs + bx]
                                )
                    count[0] += 1
        else:
            (ci,) = cis if kind != "dc" else (cis[0],)
            _bwm, _bhm, bw, bh = geos[ci]
            for byy in range(bh):
                for bxx in range(bw):
                    maybe_restart()
                    if kind == "dc":
                        dc_block(ci, coefs[ci][byy][bxx])
                    elif ah == 0:
                        ac_first_block(coefs[ci][byy][bxx])
                    else:
                        ac_refine_block(coefs[ci][byy][bxx])
                    count[0] += 1
        wtr.flush_eobrun()
        chunks.append(wtr.w.bytes_stuffed())
        return b"".join(chunks)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    zzq = bytes(int(q[ZIGZAG[z] // 8][ZIGZAG[z] % 8]) for z in range(64))
    out = b"\xff\xd8"
    out += seg(0xDB, b"\x00" + zzq)
    sof = b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci, (_n, _p, hs, vs) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, b"\x00" + bytes(dc_counts) + bytes(dc_symbols))
    out += seg(0xC4, b"\x10" + bytes(ac_counts) + bytes(ac_symbols))
    if restart:
        out += seg(0xDD, restart.to_bytes(2, "big"))
    for kind, cis, ss, se, ah, al in script:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00 if kind == "dc" else 0x10])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += encode_scan(kind, cis, ss, se, ah, al)
    out += b"\xff\xd9"
    return out
