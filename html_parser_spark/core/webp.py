"""WebP RIFF container: deterministic synthesis + a header-only walk.

Real web corpora are full of WebP (it long ago displaced PNG/JPEG for
thumbnails), so an image-metadata pass at 100 TB must read WebP headers —
and ONLY headers: every field this module reports (variant, dimensions,
feature flags, container length) lives in the first few dozen bytes, so
the walk is a bounded range-read per object, never a payload decode.

Format facts used (all from the public container spec, RFC 9649):
  * RIFF layout: 'RIFF' + u32le(file_size - 8) + 'WEBP' + chunks; each
    chunk is fourcc + u32le(payload size) + payload, odd payloads padded
    with one byte NOT counted in the size field.
  * Simple lossy ('VP8 ', note the trailing space): payload starts with
    the 3-byte little-endian frame tag (bit 0 = frame type, 0 for key
    frames), then the key-frame start code 9D 01 2A, then two u16le
    values whose low 14 bits are width and height (high 2 bits are the
    upscale hint).
  * Simple lossless ('VP8L'): payload byte 0 is the 0x2F signature, then
    a little-endian bit stream: 14 bits (width-1), 14 bits (height-1),
    1 bit alpha_is_used, 3 bits version (must be 0).
  * Extended ('VP8X'): 10-byte payload — a flags byte (from MSB:
    2 reserved, ICC, alpha, EXIF, XMP, animation, reserved), 3 reserved
    bytes, then u24le(canvas_width - 1) and u24le(canvas_height - 1).
    Feature chunks the flags promise follow; the walk reports the flags
    and the first 'VP8 ' frame's dimensions when one is present.

The decode path for VP8/VP8L coefficient data is a genuine codec seam
(arithmetic/entropy coding, like MP3 audio payloads — see
operators/multimodal.py); header metadata is the full contract here.
"""

from __future__ import annotations

import struct
from typing import Optional

_VP8X_ICC = 1 << 5
_VP8X_ALPHA = 1 << 4
_VP8X_EXIF = 1 << 3
_VP8X_XMP = 1 << 2
_VP8X_ANIM = 1 << 1


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _vp8_payload(width: int, height: int, filler: int) -> bytes:
    # key frame (bit 0 = 0), version 0, show_frame, partition size left 0 —
    # a header walk never reads past the dimension words
    tag = (1 << 4).to_bytes(3, "little")
    body = tag + b"\x9d\x01\x2a" + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
    return body + bytes((7 * i + 3) % 256 for i in range(filler))


def _vp8l_payload(width: int, height: int, alpha: int, filler: int) -> bytes:
    bits = (width - 1) | ((height - 1) << 14) | ((alpha & 1) << 28)
    body = b"\x2f" + struct.pack("<I", bits)
    return body + bytes((5 * i + 11) % 256 for i in range(filler))


def synth_webp(
    variant: str,
    width: int,
    height: int,
    *,
    alpha: int = 0,
    anim: int = 0,
    exif: int = 0,
    icc: int = 0,
    xmp: int = 0,
    filler: int = 0,
    frames=None,
    loop_count: int = 0,
) -> bytes:
    """A spec-correct WebP file of the given variant ('vp8' | 'vp8l' |
    'vp8x'). Dimensions must fit 14 bits (1..16384); `filler` appends that
    many deterministic junk bytes to the frame payload so container sizes
    vary (the walk must trust the length fields, not a fixed layout).
    'vp8x' wraps a VP8X feature chunk around a lossy frame; flag chunks
    the feature bits advertise (ICCP/EXIF/XMP/ANIM payloads) are not
    materialized — the header contract is flags + canvas + frame dims."""
    if variant == "vp8":
        chunks = _chunk(b"VP8 ", _vp8_payload(width, height, filler))
    elif variant == "vp8l":
        chunks = _chunk(b"VP8L", _vp8l_payload(width, height, alpha, filler))
    elif variant == "vp8x":
        flags = (
            (_VP8X_ICC if icc else 0)
            | (_VP8X_ALPHA if alpha else 0)
            | (_VP8X_EXIF if exif else 0)
            | (_VP8X_XMP if xmp else 0)
            | (_VP8X_ANIM if anim else 0)
        )
        vp8x = bytes([flags, 0, 0, 0]) + (width - 1).to_bytes(3, "little") + (
            height - 1
        ).to_bytes(3, "little")
        chunks = _chunk(b"VP8X", vp8x)
        if frames is not None:
            # animated form: ANIM (bg color + loop count) then one ANMF per
            # frame, each wrapping a lossy frame chunk. `frames` is a list
            # of dicts {x, y, w, h, duration_ms, blend, dispose}; x/y must
            # be even (the container stores them halved).
            chunks += _chunk(b"ANIM", struct.pack("<IH", 0, loop_count))
            for fr in frames:
                hdr = (
                    (fr["x"] // 2).to_bytes(3, "little")
                    + (fr["y"] // 2).to_bytes(3, "little")
                    + (fr["w"] - 1).to_bytes(3, "little")
                    + (fr["h"] - 1).to_bytes(3, "little")
                    + int(fr["duration_ms"]).to_bytes(3, "little")
                    + bytes([(fr.get("blend", 0) << 1) | fr.get("dispose", 0)])
                )
                chunks += _chunk(
                    b"ANMF",
                    hdr + _chunk(b"VP8 ", _vp8_payload(fr["w"], fr["h"], filler)),
                )
        else:
            chunks += _chunk(b"VP8 ", _vp8_payload(width, height, filler))
    else:
        raise ValueError(f"unknown webp variant {variant!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def webp_info(data: bytes) -> Optional[dict]:
    """Header-only walk -> {variant, width, height, has_alpha, has_anim,
    has_exif, has_icc, has_xmp, riff_bytes} or None when the bytes are not
    a parseable WebP. Degrades, never raises: truncated chunks, bad start
    codes, and unknown leading fourccs all return None. riff_bytes is the
    container's own accounting (size field + 8), which a range-reader
    trusts instead of the blob length."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    (riff_size,) = struct.unpack_from("<I", data, 4)
    out = {
        "variant": None, "width": None, "height": None,
        "has_alpha": 0, "has_anim": 0, "has_exif": 0,
        "has_icc": 0, "has_xmp": 0, "riff_bytes": riff_size + 8,
    }
    pos = 12

    def read_chunk(p):
        if p + 8 > len(data):
            return None
        fourcc = data[p : p + 4]
        (size,) = struct.unpack_from("<I", data, p + 4)
        if p + 8 + size > len(data):
            return None
        return fourcc, data[p + 8 : p + 8 + size], p + 8 + size + (size % 2)

    first = read_chunk(pos)
    if first is None:
        return None
    fourcc, payload, nxt = first

    def vp8_dims(payload):
        # frame tag (3) + start code (3) + two u16le dimension words
        if len(payload) < 10 or payload[0] & 1:
            return None
        if payload[3:6] != b"\x9d\x01\x2a":
            return None
        w16, h16 = struct.unpack_from("<HH", payload, 6)
        return (w16 & 0x3FFF, h16 & 0x3FFF)

    if fourcc == b"VP8 ":
        dims = vp8_dims(payload)
        if dims is None:
            return None
        out["variant"], (out["width"], out["height"]) = "vp8", dims
    elif fourcc == b"VP8L":
        if len(payload) < 5 or payload[0] != 0x2F:
            return None
        (bits,) = struct.unpack_from("<I", payload, 1)
        if (bits >> 29) & 0x7:  # version must be 0
            return None
        out["variant"] = "vp8l"
        out["width"] = (bits & 0x3FFF) + 1
        out["height"] = ((bits >> 14) & 0x3FFF) + 1
        out["has_alpha"] = (bits >> 28) & 1
    elif fourcc == b"VP8X":
        if len(payload) != 10:
            return None
        flags = payload[0]
        out["variant"] = "vp8x"
        out["has_icc"] = 1 if flags & _VP8X_ICC else 0
        out["has_alpha"] = 1 if flags & _VP8X_ALPHA else 0
        out["has_exif"] = 1 if flags & _VP8X_EXIF else 0
        out["has_xmp"] = 1 if flags & _VP8X_XMP else 0
        out["has_anim"] = 1 if flags & _VP8X_ANIM else 0
        # canvas from the VP8X fields; walk on for the first lossy frame
        out["width"] = int.from_bytes(payload[4:7], "little") + 1
        out["height"] = int.from_bytes(payload[7:10], "little") + 1
        while (c := read_chunk(nxt)) is not None:
            fc, pl, nxt = c
            if fc == b"VP8 ":
                break
    else:
        return None
    return out


def webp_frames(data: bytes) -> Optional[dict]:
    """Animation walk -> {loop_count, frames: [{x, y, w, h, duration_ms,
    blend, dispose}]} for an animated (VP8X + ANIM + ANMF*) WebP, or None
    when the bytes are not one (non-WebP, non-extended, animation flag
    clear, or no ANIM chunk). Reads ONLY the 16-byte ANMF headers — frame
    payloads are skipped via the chunk length fields, so the walk is a
    handful of range-reads regardless of payload size. Degrades, never
    raises: a truncated ANMF ends the walk with the frames seen so far."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    pos = 12

    def read_chunk(p):
        if p + 8 > len(data):
            return None
        fourcc = data[p : p + 4]
        (size,) = struct.unpack_from("<I", data, p + 4)
        if p + 8 + size > len(data):
            return None
        return fourcc, data[p + 8 : p + 8 + size], p + 8 + size + (size % 2)

    first = read_chunk(pos)
    if first is None or first[0] != b"VP8X" or len(first[1]) != 10:
        return None
    if not first[1][0] & _VP8X_ANIM:
        return None
    nxt = first[2]
    out = None
    while (c := read_chunk(nxt)) is not None:
        fourcc, payload, nxt = c
        if fourcc == b"ANIM" and len(payload) >= 6 and out is None:
            (loop_count,) = struct.unpack_from("<H", payload, 4)
            out = {"loop_count": loop_count, "frames": []}
        elif fourcc == b"ANMF" and len(payload) >= 16 and out is not None:
            out["frames"].append(
                {
                    "x": 2 * int.from_bytes(payload[0:3], "little"),
                    "y": 2 * int.from_bytes(payload[3:6], "little"),
                    "w": int.from_bytes(payload[6:9], "little") + 1,
                    "h": int.from_bytes(payload[9:12], "little") + 1,
                    "duration_ms": int.from_bytes(payload[12:15], "little"),
                    "blend": (payload[15] >> 1) & 1,
                    "dispose": payload[15] & 1,
                }
            )
    return out
