"""Pure-Python baseline + progressive JPEG decode + synthesis (stdlib +
numpy only).

Baseline sequential JPEG (SOF0) is entropy coding (Huffman) + DCT — both
implementable without a codec library, the same move that made PDF
(FlateDecode), PNG (zlib) and GIF (LZW) real in this repo. The decoder
handles the self-describing format honestly: marker walk, 8-bit DQT, DHT
canonical Huffman table construction, SOF0 with sampling factors up to
4x4 at integer ratios (4:4:4, 4:2:2, 4:2:0, 4:1:1 — interleaved MCU
block order per spec A.2.3, replication upsampling) or single-component
grayscale, SOS, the entropy-coded segment with 0xFF00 byte unstuffing,
DC difference coding, AC run-length/EOB/ZRL, dequantize + dezigzag,
float IDCT, and JFIF YCbCr -> RGB. Progressive (SOF2) is decoded too —
spectral selection and successive approximation per spec G.2 (DC
first/refine, AC first with EOB runs, AC refinement with correction
bits), accumulating coefficients across scans and IDCTing once at EOI
(see `_Progressive`). Restart intervals (DRI/RSTm) are handled in both
paths: byte-align at each boundary, verify the cycling marker index,
reset DC predictors (and any progressive EOB run). SOF1 (extended
sequential — same Huffman path at 8-bit precision) and 16-bit DQT
entries (Pq=1) decode too. Fractional sampling ratios (hi not dividing
hmax — libjpeg declines these too), arithmetic coding (SOF9/SOF10),
hierarchical, and lossless return None (honest unsupported, not a
guess).

The writer emits correct baseline JPEGs with valid-by-construction
canonical Huffman tables (all DC categories at 4 bits, all AC symbols at
8 bits — legal DHT payloads; compression is not the point, correctness
is) and flat quantization tables (luma 16, chroma 24). Tables live in
the file per the format, so the decoder exercises the general DHT/DQT
path, not shared constants.

Determinism contract (for the closed-form gate oracle): every lossy
rounding is floor(x + 0.5) in float64 with a pinned expression order, so
for a CONSTANT-FILL image with 8-multiple dimensions the decoded pixel
has a closed form the SQL oracle can reproduce exactly:
    y    = floor(0.299 r + 0.587 g + 0.114 b + 0.5)   (cb, cr likewise)
    dcq  = floor(8 (y - 128) / Q + 0.5)               (Q = 16 luma / 24 chroma)
    y'   = clamp(floor(Q dcq / 8 + 128 + 0.5))
    rgb' = clamp(floor(inverse-JFIF(y', cb', cr') + 0.5))
(AC coefficients of a constant block quantize to zero. BOTH Q values are
multiples of 8, so Q dcq / 8 is an integer and the float IDCT lands a
~1e-13 neighborhood around it — round-half-up can never straddle a tie;
with Q=17 the reconstruction hits exact .5 values whose IDCT-vs-formula
FP difference flipped the rounding. The remaining doubles — the JFIF
color products — are the SAME expression with the SAME operands on both
engines, hence bit-identical before the floor.)
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

Q_LUMA = 16
Q_CHROMA = 24


def _dct_matrix() -> np.ndarray:
    d = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c = np.sqrt(0.125) if k == 0 else 0.5
            d[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16.0)
    return d


_D = _dct_matrix()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} per the canonical
    code assignment of the JPEG spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; raises ValueError at markers/EOF (decoder maps to None)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("eof")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("eof")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker mid-entropy-segment (restart markers
                    # are consumed explicitly via restart(), never here)
                    raise ValueError("marker")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")

    def restart(self) -> int:
        """Byte-align (discard pad bits) and consume a restart marker
        RSTm; returns m in 0..7. Raises if the marker is absent. An
        all-ones pad byte is written stuffed (FF 00) — skip such pairs
        during alignment."""
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 2 <= len(d) and d[p] == 0xFF and d[p + 1] == 0x00:
            p += 2
        if p + 2 > len(d) or d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos = p + 2
        return d[p + 1] - 0xD0


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Baseline (SOF0/SOF1) or progressive (SOF2) JPEG -> HxWx3 uint8
    RGB (grayscale replicated to 3 channels; subsampled chroma upsampled
    by replication; restart intervals and 16-bit quant tables honored).
    None for malformed input or honest-unsupported variants (fractional
    sampling ratios, arithmetic coding, hierarchical, lossless)."""
    try:
        if data[:2] != b"\xff\xd8":
            return None
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        sof = None
        dri = 0
        prog: Optional[_Progressive] = None
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack_from(">H", data, pos)
            seg = data[pos + 2 : pos + seglen]
            if marker == 0xDB:  # DQT (Pq=0: 8-bit entries, Pq=1: 16-bit)
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    if pq == 0:
                        qt[tq] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(
                            np.int64
                        )
                        i += 65
                    elif pq == 1:
                        qt[tq] = np.frombuffer(
                            seg, np.dtype(">u2"), 64, i + 1
                        ).astype(np.int64)
                        i += 129
                    else:
                        return None
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + n])
                    huff[(tc, th)] = _canonical_codes(bits, vals)
                    i += 17 + n
            elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended
                # sequential — identical Huffman decode path at 8-bit
                # precision (SOF1 only widens the allowed table count)
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = _parse_sof_comps(seg, nc)
                if comps is None:
                    return None
                sof = (w, h, comps)
            elif marker == 0xC2:  # SOF2 progressive
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = _parse_sof_comps(seg, nc)
                if comps is None:
                    return None
                sof = (w, h, comps)
                prog = _Progressive(w, h, comps)
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # lossless/differential/arithmetic frame types
            elif marker == 0xDD:  # DRI: restart every `dri` MCUs
                dri = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS
                if sof is None:
                    return None
                w, h, comps = sof
                if prog is not None:
                    pos = prog.decode_scan(data, pos, seg, huff, dri)
                    if pos is None:
                        return None
                    continue
                ns = seg[0]
                if ns != len(comps):
                    return None
                tables = []
                for c in range(ns):
                    _cid, t = seg[1 + 2 * c], seg[2 + 2 * c]
                    dc_t, ac_t = huff.get((0, t >> 4)), huff.get((1, t & 0x0F))
                    q = qt.get(comps[c][1])
                    if dc_t is None or ac_t is None or q is None:
                        return None
                    tables.append((dc_t, ac_t, q, comps[c][2], comps[c][3]))
                return _decode_scan(data, pos + seglen, w, h, tables, dri)
            elif marker == 0xD9:
                if prog is not None:
                    return prog.finish(qt)
                return None
            pos += seglen
        if prog is not None and prog.any_scan:
            return prog.finish(qt)  # EOI truncated but scans decoded
        return None
    except Exception:
        return None


def _parse_sof_comps(seg: bytes, nc: int):
    """Component specs from an SOF segment: [(cid, tq, hi, vi)]. Sampling
    factors 1..4 accepted (full spec range), but only INTEGER upsampling
    ratios: every hi must divide hmax and every vi divide vmax — the same
    line libjpeg draws ("fractional sampling not implemented"); fractional
    combos (e.g. 3x1 luma with 2x1 chroma) return None, honest unsupported."""
    comps = []
    for c in range(nc):  # components start after prec+h+w+nc = 6 bytes
        cid, sampling, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
        hi, vi = sampling >> 4, sampling & 0x0F
        if not (1 <= hi <= 4 and 1 <= vi <= 4):
            return None
        comps.append((cid, tq, hi, vi))
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if any(hmax % c[2] or vmax % c[3] for c in comps):
        return None
    return comps


def _decode_scan(data, pos, w, h, tables, dri=0) -> Optional[np.ndarray]:
    nc = len(tables)
    hmax = max(t[3] for t in tables)
    vmax = max(t[4] for t in tables)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component planes at NATIVE resolution; upsampled after the scan
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
        for (_dc, _ac, _q, hi, vi) in tables
    ]
    r = _BitReader(data, pos)
    pred = [0] * nc
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                # RSTm every `dri` MCUs: byte-align, check the cycling
                # marker index, reset DC predictors (spec E.1.4 / F.2.2.5)
                if r.restart() != ((mcu_i // dri - 1) & 7):
                    return None
                pred = [0] * nc
            mcu_i += 1
            for c, (dc_t, ac_t, q, hi, vi) in enumerate(tables):
                # interleaved MCU order: vi x hi blocks per component,
                # left-to-right then top-to-bottom (JPEG spec A.2.3)
                for byi in range(vi):
                    for bxi in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        size = r.read_symbol(dc_t)
                        pred[c] += _extend(r.read_bits(size), size)
                        zz[0] = pred[c]
                        k = 1
                        while k < 64:
                            rs = r.read_symbol(ac_t)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                return None
                            zz[k] = _extend(r.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.int64)
                        block[ZIGZAG] = zz * q[np.arange(64)]
                        f = block.reshape(8, 8).astype(np.float64)
                        px = _D.T @ f @ _D + 128.0
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        planes[c][y0 : y0 + 8, x0 : x0 + 8] = px
    hv = [(hi, vi) for (_dc, _ac, _q, hi, vi) in tables]
    return _planes_to_rgb(planes, hv, w, h)


def _planes_to_rgb(planes, hv, w, h) -> np.ndarray:
    """Shared tail of baseline and progressive decode: round, clamp,
    replication-upsample subsampled planes, JFIF color convert."""
    hmax = max(hi for hi, _vi in hv)
    vmax = max(vi for _hi, vi in hv)
    out = []
    for p, (hi, vi) in zip(planes, hv):
        p = np.clip(_round_half_up(p), 0, 255)
        if hi < hmax or vi < vmax:  # nearest (replication) upsampling
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = out[0].astype(np.uint8)
        return np.ascontiguousarray(np.stack([g, g, g], axis=-1))
    y, cb, cr = out
    # JFIF inverse, pinned expression order (the oracle mirrors it verbatim)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2): spectral selection + successive approximation
# ---------------------------------------------------------------------------

class _Progressive:
    """Coefficient accumulator for progressive scans (JPEG spec G.2 /
    the libjpeg-documented algorithms, reimplemented): DC first/refine,
    AC first with EOB runs, AC refinement with correction bits. Scans
    update a per-component zigzag-order coefficient store; `finish`
    dequantizes, IDCTs and color-converts once at EOI."""

    def __init__(self, w: int, h: int, comps):
        self.w, self.h, self.comps = w, h, comps
        self.hmax = max(c[2] for c in comps)
        self.vmax = max(c[3] for c in comps)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        # padded block grids (interleaved-DC superset of the ceil grids)
        self.coef = [
            np.zeros((self.mcuy * vi, self.mcux * hi, 64), dtype=np.int64)
            for (_cid, _tq, hi, vi) in comps
        ]
        self.any_scan = False

    def decode_scan(self, data: bytes, pos: int, seg: bytes, huff, dri: int = 0):
        """Decode ONE scan starting at the SOS segment `seg` (payload
        after the length); returns the offset of the next marker's 0xFF,
        or None on malformed/unsupported input."""
        ns = seg[0]
        sel = []  # (comp_index, dc_table, ac_table)
        for i in range(ns):
            cid, t = seg[1 + 2 * i], seg[2 + 2 * i]
            ci = next(
                (j for j, c in enumerate(self.comps) if c[0] == cid), None
            )
            if ci is None:
                return None
            sel.append((ci, huff.get((0, t >> 4)), huff.get((1, t & 0x0F))))
        ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
        ah, al = a >> 4, a & 0x0F
        r = _BitReader(data, pos + len(seg) + 2)
        self.any_scan = True
        if ss == 0:
            if se != 0:
                return None
            self._dc_scan(r, sel, ah, al, dri)
        else:
            if ns != 1 or se > 63 or ss > se:
                return None
            self._ac_scan(r, sel[0], ss, se, ah, al, dri)
        # advance to the next marker (skip pad bits / stuffed bytes)
        p = r.pos
        n = len(data)
        while p + 1 < n:
            if data[p] == 0xFF and data[p + 1] != 0x00:
                if 0xD0 <= data[p + 1] <= 0xD7:
                    return None  # stray restart outside the interval grid
                return p
            p += 1
        return None  # scan ran to EOF without a closing marker

    # -- DC ---------------------------------------------------------------

    def _dc_scan(self, r, sel, ah, al, dri=0):
        pred = [0] * len(sel)
        if len(sel) == 1:
            # non-interleaved single-component scan: raster over its grid
            # (the scan's MCU is a single block, so DRI counts blocks)
            ci, dc_t, _ac_t = sel[0]
            _cid, _tq, hi, vi = self.comps[ci]
            bw = (-(-self.w * hi // self.hmax) + 7) // 8
            bh = (-(-self.h * vi // self.vmax) + 7) // 8
            for i in range(bh * bw):
                if dri and i and i % dri == 0:
                    if r.restart() != ((i // dri - 1) & 7):
                        raise ValueError("restart marker out of sequence")
                    pred = [0] * len(sel)
                self._dc_block(
                    r, dc_t, self.coef[ci], i // bw, i % bw, ah, al, pred, 0
                )
            return
        mcu_i = 0
        for my in range(self.mcuy):  # interleaved: MCU order (spec A.2.3)
            for mx in range(self.mcux):
                if dri and mcu_i and mcu_i % dri == 0:
                    if r.restart() != ((mcu_i // dri - 1) & 7):
                        raise ValueError("restart marker out of sequence")
                    pred = [0] * len(sel)
                mcu_i += 1
                for si, (ci, dc_t, _ac_t) in enumerate(sel):
                    _cid, _tq, hi, vi = self.comps[ci]
                    for byi in range(vi):
                        for bxi in range(hi):
                            by, bx = my * vi + byi, mx * hi + bxi
                            self._dc_block(
                                r, dc_t, self.coef[ci], by, bx, ah, al,
                                pred, si,
                            )

    def _dc_block(self, r, dc_t, coef, by, bx, ah, al, pred, si):
        if ah == 0:  # first scan: diff-coded point-transformed DC
            if dc_t is None:
                raise ValueError("missing DC table")
            size = r.read_symbol(dc_t)
            pred[si] += _extend(r.read_bits(size), size)
            coef[by, bx, 0] = pred[si] << al
        else:  # refinement: one raw bit (two's-complement OR)
            if r.read_bit():
                coef[by, bx, 0] |= 1 << al

    # -- AC ---------------------------------------------------------------

    def _ac_scan(self, r, one, ss, se, ah, al, dri=0):
        ci, _dc_t, ac_t = one
        if ac_t is None:
            raise ValueError("missing AC table")
        _cid, _tq, hi, vi = self.comps[ci]
        bw = (-(-self.w * hi // self.hmax) + 7) // 8
        bh = (-(-self.h * vi // self.vmax) + 7) // 8
        eobrun = 0
        for i in range(bh * bw):
            if dri and i and i % dri == 0:
                # a restart also terminates any outstanding EOB run
                if r.restart() != ((i // dri - 1) & 7):
                    raise ValueError("restart marker out of sequence")
                eobrun = 0
            blk = self.coef[ci][i // bw, i % bw]
            if ah == 0:
                eobrun = self._ac_first(r, ac_t, blk, ss, se, al, eobrun)
            else:
                eobrun = self._ac_refine(r, ac_t, blk, ss, se, al, eobrun)

    @staticmethod
    def _ac_first(r, ac_t, blk, ss, se, al, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = r.read_symbol(ac_t)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:  # EOBn: run of (1<<run)+bits end-of-band blocks
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += r.read_bits(run)
                    return eobrun
                k += 16  # ZRL
            else:
                k += run
                if k > se:
                    raise ValueError("ac overflow")
                blk[k] = _extend(r.read_bits(size), size) << al
                k += 1
        return 0

    @staticmethod
    def _ac_refine(r, ac_t, blk, ss, se, al, eobrun):
        p1, m1 = 1 << al, -(1 << al)

        def correct(k):
            if r.read_bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = r.read_symbol(ac_t)
                run, size = rs >> 4, rs & 0x0F
                val = 0
                if size == 0:
                    if run != 15:
                        eobrun = 1 << run
                        if run:
                            eobrun += r.read_bits(run)
                        break  # refine the rest of this block below
                    # ZRL: skip 16 zero-history coeffs
                else:
                    if size != 1:
                        raise ValueError("bad refine size")
                    val = p1 if r.read_bit() else m1
                # advance past `run` zero-history coeffs, correcting
                # nonzero-history ones en route
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if val != 0 and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1
        return eobrun

    # -- finish -----------------------------------------------------------

    def finish(self, qt) -> Optional[np.ndarray]:
        if not self.any_scan:
            return None
        planes = []
        hv = []
        for (cid_tq_hi_vi, coef) in zip(self.comps, self.coef):
            _cid, tq, hi, vi = cid_tq_hi_vi
            q = qt.get(tq)
            if q is None:
                return None
            deq = coef * q[None, None, :]
            nat = np.zeros_like(deq)
            nat[:, :, ZIGZAG] = deq
            bh, bw = nat.shape[:2]
            f = nat.reshape(bh, bw, 8, 8).astype(np.float64)
            px = np.einsum("ij,abjk,kl->abil", _D.T, f, _D) + 128.0
            plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
            planes.append(plane)
            hv.append((hi, vi))
        return _planes_to_rgb(planes, hv, self.w, self.h)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

# valid-by-construction canonical tables: 12 DC categories at 4 bits,
# all 162 AC (run,size) symbols at 8 bits (162 < 255, all-ones not needed)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return {sym: (length, code) for (length, code), sym in _canonical_codes(bits, vals).items()}


_DC_ENC = _encode_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _encode_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _emit_coeff(wtr: _BitWriter, enc, run_size: int, v: int):
    size = run_size & 0x0F
    length, code = enc[run_size]
    wtr.write(code, length)
    if size:
        wtr.write(v if v >= 0 else v + (1 << size) - 1, size)


def synth_jpeg(
    width: int,
    height: int,
    fill_rgb: tuple[int, int, int],
    restart_interval: int = 0,
) -> bytes:
    """A correct baseline 4:4:4 JPEG: constant fill, dimensions multiples
    of 8 (asserted — keeps every block constant so the decode has the
    closed form in the module docstring). restart_interval > 0 emits a
    DRI segment and cycling RSTm markers every that-many MCUs (with the
    per-interval DC predictor reset the decoder must mirror).
    Deterministic bytes."""
    assert width % 8 == 0 and height % 8 == 0 and width and height
    r, g, b = (float(c) for c in fill_rgb)
    y = float(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5))
    cb = float(np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5))
    cr = float(np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5))
    dcs = [
        int(np.floor(8.0 * (y - 128.0) / Q_LUMA + 0.5)),
        int(np.floor(8.0 * (cb - 128.0) / Q_CHROMA + 0.5)),
        int(np.floor(8.0 * (cr - 128.0) / Q_CHROMA + 0.5)),
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    inv = np.zeros(64, dtype=np.uint8)
    inv[ZIGZAG] = np.arange(64)  # natural -> zigzag position
    for tq, q in ((0, Q_LUMA), (1, Q_CHROMA)):
        table = np.full(64, q, dtype=np.uint8)
        out += seg(0xDB, bytes([tq]) + table[inv].tobytes())
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc_th, bits, vals in (
        (0x00, _DC_BITS, _DC_VALS),
        (0x10, _AC_BITS, _AC_VALS),
        (0x01, _DC_BITS, _DC_VALS),
        (0x11, _AC_BITS, _AC_VALS),
    ):
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    wtr = _BitWriter()
    pred = [0, 0, 0]
    nmcu = (height // 8) * (width // 8)
    for mcu_i in range(nmcu):
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            wtr.flush()  # 1-pad to a byte boundary, then the raw marker
            wtr.out += bytes([0xFF, 0xD0 + ((mcu_i // restart_interval - 1) & 7)])
            pred = [0, 0, 0]
        for c in range(3):
            diff = dcs[c] - pred[c]
            pred[c] = dcs[c]
            _emit_coeff(wtr, _DC_ENC, _category(diff), diff)
            _emit_coeff(wtr, _AC_ENC, 0x00, 0)  # EOB: constant block
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# progressive writer AC table: adds the EOBn symbols (r<<4, r=0..14) the
# baseline table never needs; 176 symbols, all at 8 bits (legal DHT)
_ACP_VALS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ACP_BITS = [0, 0, 0, 0, 0, 0, 0, len(_ACP_VALS), 0, 0, 0, 0, 0, 0, 0, 0]
_ACP_ENC = _encode_codes(_ACP_BITS, _ACP_VALS)


def synth_progressive_jpeg(
    width: int, height: int, fill_rgb: tuple[int, int, int]
) -> bytes:
    """A correct PROGRESSIVE (SOF2) 4:4:4 JPEG with the same constant-fill
    closed form as synth_jpeg (same quant tables, DC exact after the
    refinement scan, AC all zero): five scans — interleaved DC first at
    Al=1, DC refinement delivering the low bit, then one AC scan per
    component whose blocks collapse into a single EOBn run (exercising
    the end-of-band run-length path end-to-end). Deterministic bytes."""
    assert width % 8 == 0 and height % 8 == 0 and width and height
    r, g, b = (float(c) for c in fill_rgb)
    y = float(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5))
    cb = float(np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5))
    cr = float(np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5))
    dcs = [
        int(np.floor(8.0 * (y - 128.0) / Q_LUMA + 0.5)),
        int(np.floor(8.0 * (cb - 128.0) / Q_CHROMA + 0.5)),
        int(np.floor(8.0 * (cr - 128.0) / Q_CHROMA + 0.5)),
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    inv = np.zeros(64, dtype=np.uint8)
    inv[ZIGZAG] = np.arange(64)
    for tq, q in ((0, Q_LUMA), (1, Q_CHROMA)):
        table = np.full(64, q, dtype=np.uint8)
        out += seg(0xDB, bytes([tq]) + table[inv].tobytes())
    out += seg(
        0xC2,  # SOF2
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc_th, bits, vals in (
        (0x00, _DC_BITS, _DC_VALS),
        (0x10, _ACP_BITS, _ACP_VALS),
        (0x01, _DC_BITS, _DC_VALS),
        (0x11, _ACP_BITS, _ACP_VALS),
    ):
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    nblocks = (width // 8) * (height // 8)

    # scan 1: DC first, interleaved, Ah=0 Al=1 (diff-coded dc >> 1)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x01]))
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for _i in range(nblocks):
        for c in range(3):
            v = dcs[c] >> 1
            diff = v - pred[c]
            pred[c] = v
            _emit_coeff(wtr, _DC_ENC, _category(diff), diff)
    wtr.flush()
    out += wtr.out

    # scan 2: DC refinement, Ah=1 Al=0 (one raw low bit per block)
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x10]))
    wtr = _BitWriter()
    for _i in range(nblocks):
        for c in range(3):
            wtr.write(dcs[c] & 1, 1)
    wtr.flush()
    out += wtr.out

    # scans 3-5: one AC scan per component, Ss=1 Se=63, all-zero blocks
    # collapsed into one EOBn run of exactly `nblocks` end-of-band blocks
    for cid, t in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += seg(0xDA, bytes([1, cid, t, 1, 63, 0x00]))
        wtr = _BitWriter()
        n = nblocks
        while n > 0:
            rr = min(14, n.bit_length() - 1)
            length, code = _ACP_ENC[rr << 4]
            wtr.write(code, length)
            if rr:
                wtr.write(n - (1 << rr), rr)
            n -= (1 << rr) + (n - (1 << rr)) if rr else 1
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_closed_form_pixel(fill_rgb: tuple[int, int, int]) -> tuple[int, int, int]:
    """The decoded RGB of a constant-fill synth_jpeg — the same arithmetic
    the SQL oracle states, for tests to cross-check decoder output."""
    r, g, b = (float(c) for c in fill_rgb)
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5)

    def rt(v: float, q: int) -> float:
        dcq = np.floor(8.0 * (v - 128.0) / q + 0.5)
        return min(255.0, max(0.0, np.floor(q * dcq / 8.0 + 128.0 + 0.5)))

    y2, cb2, cr2 = rt(y, Q_LUMA), rt(cb, Q_CHROMA), rt(cr, Q_CHROMA)
    r2 = np.floor(y2 + 1.402 * (cr2 - 128.0) + 0.5)
    g2 = np.floor(y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0) + 0.5)
    b2 = np.floor(y2 + 1.772 * (cb2 - 128.0) + 0.5)
    clamp = lambda v: int(min(255.0, max(0.0, v)))  # noqa: E731
    return clamp(r2), clamp(g2), clamp(b2)
