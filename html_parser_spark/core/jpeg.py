"""Pure-Python baseline JPEG decode + synthesis (stdlib + numpy only).

Baseline sequential JPEG (SOF0) is entropy coding (Huffman) + DCT — both
implementable without a codec library, the same move that made PDF
(FlateDecode), PNG (zlib) and GIF (LZW) real in this repo. The decoder
handles the self-describing format honestly: marker walk, 8-bit DQT, DHT
canonical Huffman table construction, SOF0 with sampling factors up to
2x2 (4:4:4, 4:2:2, and the dominant real-world 4:2:0 — interleaved MCU
block order per spec A.2.3, replication upsampling) or single-component
grayscale, SOS, the entropy-coded segment with 0xFF00 byte unstuffing,
DC difference coding, AC run-length/EOB/ZRL, dequantize + dezigzag,
float IDCT, and JFIF YCbCr -> RGB. Progressive (SOF2), sampling factors
beyond 2, 16-bit quant tables, arithmetic coding, and restart markers
return None (honest unsupported, not a guess).

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
                else:  # a real marker inside the scan (restart unsupported)
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


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Baseline JPEG -> HxWx3 uint8 RGB (grayscale replicated to 3
    channels; subsampled chroma upsampled by replication). None for
    malformed input or honest-unsupported variants (progressive, sampling
    factors beyond 2x2, 16-bit quant, restarts mid-scan)."""
    try:
        if data[:2] != b"\xff\xd8":
            return None
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
        sof = None
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack_from(">H", data, pos)
            seg = data[pos + 2 : pos + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    if pq != 0:
                        return None  # 16-bit tables unsupported
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + n])
                    huff[(tc, th)] = _canonical_codes(bits, vals)
                    i += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or nc not in (1, 3):
                    return None
                comps = []
                for c in range(nc):  # components start after prec+h+w+nc = 6 bytes
                    cid, sampling, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    hi, vi = sampling >> 4, sampling & 0x0F
                    if hi not in (1, 2) or vi not in (1, 2):
                        return None  # sampling factors beyond 2 unsupported
                    comps.append((cid, tq, hi, vi))
                sof = (w, h, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # non-baseline frame types
            elif marker == 0xDA:  # SOS
                if sof is None:
                    return None
                w, h, comps = sof
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
                return _decode_scan(data, pos + seglen, w, h, tables)
            elif marker == 0xD9:
                return None
            pos += seglen
        return None
    except Exception:
        return None


def _decode_scan(data, pos, w, h, tables) -> Optional[np.ndarray]:
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
    for my in range(mcuy):
        for mx in range(mcux):
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
    out = []
    for p, (_dc, _ac, _q, hi, vi) in zip(planes, tables):
        p = np.clip(_round_half_up(p), 0, 255)
        if hi < hmax or vi < vmax:  # nearest (replication) upsampling
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    if nc == 1:
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


def synth_jpeg(width: int, height: int, fill_rgb: tuple[int, int, int]) -> bytes:
    """A correct baseline 4:4:4 JPEG: constant fill, dimensions multiples
    of 8 (asserted — keeps every block constant so the decode has the
    closed form in the module docstring). Deterministic bytes."""
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
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for _my in range(height // 8):
        for _mx in range(width // 8):
            for c in range(3):
                diff = dcs[c] - pred[c]
                pred[c] = dcs[c]
                _emit_coeff(wtr, _DC_ENC, _category(diff), diff)
                _emit_coeff(wtr, _AC_ENC, 0x00, 0)  # EOB: constant block
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
