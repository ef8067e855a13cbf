"""Pure-Python baseline JPEG codec (core/jpeg.py): closed-form lossy round
trip for constant fills, the general AC/ZRL/extend entropy path against a
direct IDCT reference, grayscale, and malformed/unsupported inputs."""

from __future__ import annotations

import struct

import numpy as np

from html_parser_spark.core import jpeg as J


def test_constant_fill_matches_closed_form():
    """Every decoded pixel of a synth_jpeg equals the documented closed
    form (DC-only quantization, tie-free Q multiples of 8) — the property
    the SQL gate oracle states."""
    rng = np.random.RandomState(5)
    fills = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(60)]
    fills += [(v, 255 - v, (v * 7) % 256) for v in range(0, 256, 17)]
    for i, fill in enumerate(fills):
        w, h = 8 * (1 + i % 5), 8 * (1 + (i // 5) % 5)
        img = J.decode_jpeg(J.synth_jpeg(w, h, fill))
        assert img is not None and img.shape == (h, w, 3)
        want = J.jpeg_closed_form_pixel(fill)
        uniq = np.unique(img.reshape(-1, 3), axis=0)
        assert len(uniq) == 1 and tuple(uniq[0]) == want, (fill, want)
        # the lossy error stays small (quant steps 2 luma / 3 chroma)
        assert all(abs(a - b) <= 8 for a, b in zip(want, fill))


def _encode_blocks(w, h, blocks_per_comp, nc, qtabs, sof_marker=0xC0, qt16=False):
    """Hand-rolled baseline JPEG with ARBITRARY quantized coefficient
    blocks (zigzag order) — exercises AC run/size, ZRL, negatives, and
    the grayscale frame type, none of which synth_jpeg emits. sof_marker
    0xC1 emits extended sequential; qt16 writes Pq=1 16-bit DQT
    entries."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    inv = np.zeros(64, dtype=np.uint8)
    inv[J.ZIGZAG] = np.arange(64)
    for tq, q in enumerate(qtabs):
        if qt16:
            body = np.asarray(q, ">u2")[inv].tobytes()
            out += seg(0xDB, bytes([0x10 | tq]) + body)
        else:
            out += seg(0xDB, bytes([tq]) + np.asarray(q, np.uint8)[inv].tobytes())
    comps = b"".join(bytes([c + 1, 0x11, min(c, len(qtabs) - 1)]) for c in range(nc))
    out += seg(sof_marker, struct.pack(">BHHB", 8, h, w, nc) + comps)
    for tc_th, bits, vals in ((0x00, J._DC_BITS, J._DC_VALS), (0x10, J._AC_BITS, J._AC_VALS)):
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    sos = bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc)) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    wtr = J._BitWriter()
    pred = [0] * nc
    for bi in range((w // 8) * (h // 8)):
        for c in range(nc):
            zz = blocks_per_comp[c][bi]
            diff = int(zz[0]) - pred[c]
            pred[c] = int(zz[0])
            J._emit_coeff(wtr, J._DC_ENC, J._category(diff), diff)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and zz[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    J._emit_coeff(wtr, J._AC_ENC, 0x00, 0)
                    break
                while run >= 16:
                    J._emit_coeff(wtr, J._AC_ENC, 0xF0, 0)
                    run -= 16
                v = int(zz[k])
                J._emit_coeff(wtr, J._AC_ENC, (run << 4) | J._category(v), v)
                k += 1
    wtr.flush()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def _reference_decode(blocks_per_comp, w, h, nc, qtabs):
    planes = []
    for c in range(nc):
        q = np.asarray(qtabs[min(c, len(qtabs) - 1)], np.int64)
        plane = np.zeros((h, w))
        bx = w // 8
        for bi, zz in enumerate(blocks_per_comp[c]):
            blk = np.zeros(64, np.int64)
            blk[J.ZIGZAG] = np.asarray(zz) * q
            px = J._D.T @ blk.reshape(8, 8).astype(float) @ J._D + 128.0
            my, mx = bi // bx, bi % bx
            plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = px
        planes.append(np.clip(np.floor(plane + 0.5), 0, 255))
    if nc == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], -1)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.floor(np.stack([r, g, b], -1) + 0.5), 0, 255).astype(np.uint8)


def test_general_entropy_path_against_idct_reference():
    rng = np.random.RandomState(9)
    for trial in range(20):
        w, h = 8 * int(rng.randint(1, 4)), 8 * int(rng.randint(1, 4))
        nc = int(rng.choice([1, 3]))
        qtabs = [np.full(64, 16), np.full(64, 24)][: max(1, nc - 1)]
        blocks = []
        for _c in range(nc):
            bs = []
            for _ in range((w // 8) * (h // 8)):
                zz = np.zeros(64, np.int64)
                for _ in range(int(rng.randint(0, 8))):
                    zz[int(rng.randint(0, 64))] = int(rng.randint(-40, 41))
                bs.append(zz)
            blocks.append(bs)
        got = J.decode_jpeg(_encode_blocks(w, h, blocks, nc, qtabs))
        want = _reference_decode(blocks, w, h, nc, qtabs)
        assert got is not None and (got == want).all(), trial


def test_malformed_and_unsupported_return_none():
    good = J.synth_jpeg(16, 8, (10, 20, 30))
    assert J.decode_jpeg(good) is not None
    assert J.decode_jpeg(b"") is None
    assert J.decode_jpeg(b"\xff\xd8\xff\xe0") is None
    assert J.decode_jpeg(good[:-4]) is None  # truncated scan
    bad = bytearray(good)
    bad[2] = 0x00  # break marker sync
    assert J.decode_jpeg(bytes(bad)) is None
    # a BASELINE scan header (Ss=0, Se=63) is illegal under SOF2: the
    # progressive path rejects it rather than guessing
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert J.decode_jpeg(prog) is None
    # sampling factors beyond the spec's 1..4 range are rejected
    sub = bytearray(good)
    sof_at = sub.find(b"\xff\xc0")
    sub[sof_at + 11] = 0x55  # component 1 sampling 5x5
    assert J.decode_jpeg(bytes(sub)) is None
    # FRACTIONAL sampling ratios (3x1 luma over 2x1 chroma: 3 % 2 != 0)
    # are honestly unsupported, same line libjpeg draws
    frac = bytearray(good)
    frac[sof_at + 11] = 0x31
    frac[sof_at + 14] = 0x21
    assert J.decode_jpeg(bytes(frac)) is None


def test_420_subsampled_decode():
    """4:2:0 (Y 2x2, chroma 1x1): hand-encode an MCU-interleaved stream
    with distinct per-block DC values, decode, and check each 8x8 region's
    Y and the replication-upsampled chroma against the closed forms."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    w = h = 16  # one MCU: 4 Y blocks + 1 Cb + 1 Cr
    out = bytearray(b"\xff\xd8")
    inv = np.zeros(64, dtype=np.uint8)
    inv[J.ZIGZAG] = np.arange(64)
    out += seg(0xDB, bytes([0]) + np.full(64, 16, np.uint8)[inv].tobytes())
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3) + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    for tc_th, bits, vals in ((0x00, J._DC_BITS, J._DC_VALS), (0x10, J._AC_BITS, J._AC_VALS)):
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    wtr = J._BitWriter()
    # Y blocks (spec order: TL, TR, BL, BR) get DC quantized values 2,4,6,8;
    # Cb DC 0 (neutral), Cr DC 4 -> warm cast
    y_dcs = [2, 4, 6, 8]
    pred = 0
    for dc in y_dcs:
        diff = dc - pred
        pred = dc
        J._emit_coeff(wtr, J._DC_ENC, J._category(diff), diff)
        J._emit_coeff(wtr, J._AC_ENC, 0x00, 0)
    for dc in (0, 4):  # Cb then Cr (fresh DC predictors per component)
        J._emit_coeff(wtr, J._DC_ENC, J._category(dc), dc)
        J._emit_coeff(wtr, J._AC_ENC, 0x00, 0)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"

    img = J.decode_jpeg(bytes(out))
    assert img is not None and img.shape == (16, 16, 3)
    # per-block luma: 16*dc/8 + 128 = 2*dc + 128
    y_vals = {(0, 0): 132, (0, 8): 136, (8, 0): 140, (8, 8): 144}
    cb2, cr2 = 128.0, 136.0  # 16*4/8 + 128
    for (y0, x0), yv in y_vals.items():
        region = img[y0 : y0 + 8, x0 : x0 + 8]
        r2 = int(np.floor(yv + 1.402 * (cr2 - 128.0) + 0.5))
        g2 = int(np.floor(yv - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0) + 0.5))
        b2 = int(np.floor(yv + 1.772 * (cb2 - 128.0) + 0.5))
        uniq = np.unique(region.reshape(-1, 3), axis=0)
        assert len(uniq) == 1 and tuple(uniq[0]) == (r2, g2, b2), (y0, x0, uniq)


def test_411_subsampled_decode():
    """4:1:1 (Y 4x1, chroma 1x1): the full-range sampling factor 4 with
    horizontal-only replication upsampling. One MCU = 4 Y blocks in a row
    + 1 Cb + 1 Cr over a 32x8 image; per-block closed forms as in the
    4:2:0 test."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    w, h = 32, 8
    out = bytearray(b"\xff\xd8")
    inv = np.zeros(64, dtype=np.uint8)
    inv[J.ZIGZAG] = np.arange(64)
    out += seg(0xDB, bytes([0]) + np.full(64, 16, np.uint8)[inv].tobytes())
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3) + bytes([1, 0x41, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    for tc_th, bits, vals in ((0x00, J._DC_BITS, J._DC_VALS), (0x10, J._AC_BITS, J._AC_VALS)):
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    wtr = J._BitWriter()
    y_dcs = [2, 4, 6, 8]  # left-to-right Y blocks
    pred = 0
    for dc in y_dcs:
        diff = dc - pred
        pred = dc
        J._emit_coeff(wtr, J._DC_ENC, J._category(diff), diff)
        J._emit_coeff(wtr, J._AC_ENC, 0x00, 0)
    for dc in (0, 4):  # Cb neutral, Cr warm
        J._emit_coeff(wtr, J._DC_ENC, J._category(dc), dc)
        J._emit_coeff(wtr, J._AC_ENC, 0x00, 0)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"

    img = J.decode_jpeg(bytes(out))
    assert img is not None and img.shape == (8, 32, 3)
    cb2, cr2 = 128.0, 136.0
    for i, dc in enumerate(y_dcs):
        yv = 2 * dc + 128  # 16*dc/8 + 128
        region = img[:, 8 * i : 8 * i + 8]
        r2 = int(np.floor(yv + 1.402 * (cr2 - 128.0) + 0.5))
        g2 = int(np.floor(yv - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0) + 0.5))
        b2 = int(np.floor(yv + 1.772 * (cb2 - 128.0) + 0.5))
        uniq = np.unique(region.reshape(-1, 3), axis=0)
        assert len(uniq) == 1 and tuple(uniq[0]) == (r2, g2, b2), (i, uniq)


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------


def _flush_eobrun(wtr, enc, eobrun, corr):
    """Emit a pending EOBn run plus its buffered correction bits."""
    if eobrun > 0:
        rr = eobrun.bit_length() - 1
        assert rr <= 14
        length, code = enc[rr << 4]
        wtr.write(code, length)
        if rr:
            wtr.write(eobrun - (1 << rr), rr)
    for bit in corr:
        wtr.write(bit, 1)
    return 0, []


def _rst(wtr, idx):
    wtr.flush()
    wtr.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _ac_first_scan(wtr, enc, blocks, ss, se, al, dri=0):
    """AC first scan: encode the point transform v >> al (toward zero),
    with run/size symbols, ZRL, and EOBn runs across all-zero bands.
    dri > 0 inserts restart markers every dri blocks (flushing any
    pending EOB run first — a restart terminates it)."""
    eobrun = 0
    for i, zz in enumerate(blocks):
        if dri and i and i % dri == 0:
            eobrun, _ = _flush_eobrun(wtr, enc, eobrun, [])
            _rst(wtr, i // dri - 1)
        t = [int(v) >> al if v >= 0 else -((-int(v)) >> al) for v in zz]
        nz = [k for k in range(ss, se + 1) if t[k] != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun, _ = _flush_eobrun(wtr, enc, eobrun, [])
            continue
        eobrun, _ = _flush_eobrun(wtr, enc, eobrun, [])
        k = ss
        for pos in nz:
            run = pos - k
            while run >= 16:
                length, code = enc[0xF0]
                wtr.write(code, length)
                run -= 16
            v = t[pos]
            size = J._category(v)
            length, code = enc[(run << 4) | size]
            wtr.write(code, length)
            wtr.write(v if v >= 0 else v + (1 << size) - 1, size)
            k = pos + 1
        if nz[-1] < se:
            eobrun += 1
    _flush_eobrun(wtr, enc, eobrun, [])


def _ac_refine_scan(wtr, enc, blocks, ss, se, dri=0):
    """AC refinement Ah=1 -> Al=0, following libjpeg's
    encode_mcu_AC_refine exactly: the ZRL check runs at EVERY nonzero
    coefficient so correction bits stay segmented per emitted symbol;
    trailing runs and correction bits ride with the EOB run."""
    eobrun = 0
    corr = []
    for i, zz in enumerate(blocks):
        if dri and i and i % dri == 0:
            eobrun, corr = _flush_eobrun(wtr, enc, eobrun, corr)
            _rst(wtr, i // dri - 1)
        t = [int(v) >> 1 if v >= 0 else -((-int(v)) >> 1) for v in zz]
        kend = max(
            [k for k in range(ss, se + 1) if t[k] == 0 and zz[k] != 0],
            default=ss - 1,
        )
        run = 0
        pend = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15 and k <= kend:
                eobrun, corr = _flush_eobrun(wtr, enc, eobrun, corr)
                length, code = enc[0xF0]
                wtr.write(code, length)
                run -= 16
                for bit in pend:
                    wtr.write(bit, 1)
                pend = []
            if t[k] != 0:  # history nonzero: one correction bit
                pend.append(abs(v) & 1)
                continue
            # newly significant (|v| == 1)
            eobrun, corr = _flush_eobrun(wtr, enc, eobrun, corr)
            length, code = enc[(run << 4) | 1]
            wtr.write(code, length)
            wtr.write(1 if v > 0 else 0, 1)
            for bit in pend:
                wtr.write(bit, 1)
            pend = []
            run = 0
        if run > 0 or pend:
            eobrun += 1
            corr += pend
            if eobrun == 0x7FFF:
                eobrun, corr = _flush_eobrun(wtr, enc, eobrun, corr)
    _flush_eobrun(wtr, enc, eobrun, corr)


def _encode_progressive(
    w, h, blocks_per_comp, nc, qtabs, bands=((1, 5), (6, 63)), dri=0
):
    """Hand-rolled SOF2 stream with ARBITRARY final coefficient blocks:
    interleaved DC first (Al=1) + DC refinement, then per-component AC
    band scans (first at Al=1, refinement to Al=0) — every progressive
    decode path (EOBn, ZRL-with-correction-bits, newly-significant
    placement, band splits) in one stream."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    inv = np.zeros(64, dtype=np.uint8)
    inv[J.ZIGZAG] = np.arange(64)
    for tq, q in enumerate(qtabs):
        out += seg(0xDB, bytes([tq]) + np.asarray(q, np.uint8)[inv].tobytes())
    comps = b"".join(bytes([c + 1, 0x11, min(c, len(qtabs) - 1)]) for c in range(nc))
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, nc) + comps)
    for tc_th, bits, vals in (
        (0x00, J._DC_BITS, J._DC_VALS),
        (0x10, J._ACP_BITS, J._ACP_VALS),
    ):
        out += seg(0xC4, bytes([tc_th] + bits + vals))
    nblocks = (w // 8) * (h // 8)
    if dri:
        out += seg(0xDD, struct.pack(">H", dri))

    sos = bytes([nc]) + b"".join(bytes([c + 1, 0x00]) for c in range(nc))
    out += seg(0xDA, sos + bytes([0, 0, 0x01]))  # DC first, Al=1
    wtr = J._BitWriter()
    pred = [0] * nc
    for bi in range(nblocks):
        if dri and bi and bi % dri == 0:
            _rst(wtr, bi // dri - 1)
            pred = [0] * nc
        for c in range(nc):
            v = int(blocks_per_comp[c][bi][0])
            t = v >> 1  # DC point transform is ARITHMETIC shift (G.1.2.1)
            diff = t - pred[c]
            pred[c] = t
            J._emit_coeff(wtr, J._DC_ENC, J._category(diff), diff)
    wtr.flush()
    out += wtr.out
    out += seg(0xDA, sos + bytes([0, 0, 0x10]))  # DC refine: one raw bit
    wtr = J._BitWriter()
    for bi in range(nblocks):
        if dri and bi and bi % dri == 0:
            _rst(wtr, bi // dri - 1)
        for c in range(nc):
            wtr.write(abs(int(blocks_per_comp[c][bi][0])) & 1, 1)
    wtr.flush()
    out += wtr.out
    for c in range(nc):
        for ss, se in bands:
            out += seg(0xDA, bytes([1, c + 1, 0x10, ss, se, 0x01]))
            wtr = J._BitWriter()
            _ac_first_scan(wtr, J._ACP_ENC, blocks_per_comp[c], ss, se, 1, dri)
            wtr.flush()
            out += wtr.out
        for ss, se in bands:
            out += seg(0xDA, bytes([1, c + 1, 0x10, ss, se, 0x10]))
            wtr = J._BitWriter()
            _ac_refine_scan(wtr, J._ACP_ENC, blocks_per_comp[c], ss, se, dri)
            wtr.flush()
            out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_constant_fill_matches_baseline():
    """synth_progressive_jpeg decodes to EXACTLY the baseline synth_jpeg
    output (same quant tables; DC exact after the refinement scan, AC all
    zero via the EOBn path) — the property the gate oracle states."""
    rng = np.random.RandomState(23)
    for _ in range(40):
        w, h = 8 * int(rng.randint(1, 7)), 8 * int(rng.randint(1, 7))
        fill = tuple(int(x) for x in rng.randint(0, 256, 3))
        a = J.decode_jpeg(J.synth_jpeg(w, h, fill))
        b = J.decode_jpeg(J.synth_progressive_jpeg(w, h, fill))
        assert a is not None and b is not None and (a == b).all(), (w, h, fill)


def test_progressive_general_against_idct_reference():
    """Arbitrary coefficient blocks through the full five-plus-scan
    progressive pipeline (spectral bands + successive approximation)
    reconstruct exactly what the direct IDCT reference computes."""
    rng = np.random.RandomState(11)
    for trial in range(30):
        w, h = 8 * int(rng.randint(1, 4)), 8 * int(rng.randint(1, 4))
        nc = int(rng.choice([1, 3]))
        qtabs = [np.full(64, 16), np.full(64, 24)][: max(1, nc - 1)]
        blocks = []
        for _c in range(nc):
            bs = []
            for _ in range((w // 8) * (h // 8)):
                zz = np.zeros(64, np.int64)
                for _ in range(int(rng.randint(0, 10))):
                    zz[int(rng.randint(0, 64))] = int(rng.randint(-40, 41))
                # |v|==1 coefficients exercise newly-significant refinement
                for _ in range(int(rng.randint(0, 6))):
                    zz[int(rng.randint(1, 64))] = int(rng.choice([-1, 1]))
                bs.append(zz)
            blocks.append(bs)
        got = J.decode_jpeg(_encode_progressive(w, h, blocks, nc, qtabs))
        want = _reference_decode(blocks, w, h, nc, qtabs)
        assert got is not None and (got == want).all(), trial


def test_progressive_malformed_returns_none():
    good = J.synth_progressive_jpeg(16, 16, (44, 120, 210))
    full = J.decode_jpeg(good)
    assert full is not None
    # Truncation must never raise. A cut mid-scan yields None; a cut at a
    # scan boundary yields the partial image accumulated so far — that IS
    # progressive JPEG's contract (render what has arrived). Cuts before
    # the first complete scan are always None.
    first_scan_end = good.index(b"\xff\xda", 4)  # second SOS marker
    for cut in range(2, len(good), 13):
        got = J.decode_jpeg(good[:cut])
        if cut <= first_scan_end:
            assert got is None, cut
        else:
            assert got is None or got.shape == full.shape, cut
    # a declared restart interval with NO restart markers in the scan
    # data is malformed (the decoder expects RSTm at each boundary)
    dri = good[:2] + b"\xff\xdd\x00\x04\x00\x02" + good[2:]
    assert J.decode_jpeg(dri) is None
    # arithmetic-coded progressive (SOF10) is honestly unsupported
    assert J.decode_jpeg(good.replace(b"\xff\xc2", b"\xff\xca", 1)) is None


def test_restart_interval_baseline():
    """DRI/RSTm in baseline scans: byte-align at each boundary, cycling
    marker index, DC predictor reset — decode equals the no-restart
    stream; a wrong marker index is malformed."""
    plain = J.decode_jpeg(J.synth_jpeg(32, 24, (200, 40, 90)))
    for interval in (1, 2, 5, 7, 11, 12):
        data = J.synth_jpeg(32, 24, (200, 40, 90), restart_interval=interval)
        got = J.decode_jpeg(data)
        assert got is not None and (got == plain).all(), interval
    # corrupt the first restart marker's index -> out-of-sequence -> None
    data = bytearray(J.synth_jpeg(32, 24, (200, 40, 90), restart_interval=2))
    at = data.find(b"\xff\xd0", 2)
    assert at > 0
    data[at + 1] = 0xD5
    assert J.decode_jpeg(bytes(data)) is None


def test_restart_interval_progressive():
    """Restarts inside EVERY progressive scan type (DC first/refine, AC
    first, AC refine): predictor and EOB-run reset at each boundary, and
    the reconstruction still matches the direct IDCT reference."""
    rng = np.random.RandomState(31)
    for trial, dri in enumerate((1, 3, 5)):
        w, h = 24, 16
        nc = 3
        qtabs = [np.full(64, 16), np.full(64, 24)]
        blocks = []
        for _c in range(nc):
            bs = []
            for _ in range((w // 8) * (h // 8)):
                zz = np.zeros(64, np.int64)
                for _ in range(int(rng.randint(2, 10))):
                    zz[int(rng.randint(0, 64))] = int(rng.randint(-40, 41))
                for _ in range(int(rng.randint(0, 6))):
                    zz[int(rng.randint(1, 64))] = int(rng.choice([-1, 1]))
                bs.append(zz)
            blocks.append(bs)
        data = _encode_progressive(w, h, blocks, nc, qtabs, dri=dri)
        got = J.decode_jpeg(data)
        want = _reference_decode(blocks, w, h, nc, qtabs)
        assert got is not None and (got == want).all(), (trial, dri)


def test_sof1_and_16bit_quant_tables():
    """Extended sequential (SOF1) decodes through the same Huffman path,
    and Pq=1 DQT entries (values above 255) dequantize correctly."""
    rng = np.random.RandomState(41)
    qtabs = [np.full(64, 300), np.full(64, 420)]  # need 16-bit entries
    for trial in range(6):
        w, h = 8 * int(rng.randint(1, 4)), 8 * int(rng.randint(1, 4))
        nc = int(rng.choice([1, 3]))
        qt = qtabs[: max(1, nc - 1)]
        blocks = []
        for _c in range(nc):
            bs = []
            for _ in range((w // 8) * (h // 8)):
                zz = np.zeros(64, np.int64)
                for _ in range(int(rng.randint(0, 6))):
                    zz[int(rng.randint(0, 64))] = int(rng.randint(-3, 4))
                bs.append(zz)
            blocks.append(bs)
        data = _encode_blocks(w, h, blocks, nc, qt, sof_marker=0xC1, qt16=True)
        got = J.decode_jpeg(data)
        want = _reference_decode(blocks, w, h, nc, qt)
        assert got is not None and (got == want).all(), trial
    # Pq beyond 1 is still rejected
    bad = bytearray(_encode_blocks(8, 8, [[np.zeros(64, np.int64)]], 1,
                                   [np.full(64, 16)]))
    at = bad.find(b"\xff\xdb") + 4
    bad[at] = 0x20  # Pq=2
    assert J.decode_jpeg(bytes(bad)) is None
