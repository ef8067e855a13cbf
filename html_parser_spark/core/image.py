"""Minimal pure-Python image decode + synthesis (stdlib + numpy only).

The multimodal branch treats media as opaque binary columns; this module
makes the DECODE step real for the uncompressed formats a pure-Python
kernel can honestly handle — 24-bit uncompressed BMP (BITMAPINFOHEADER,
bottom-up or top-down) — built from the public BMP file-format layout.
Compressed codecs (JPEG/PNG/...) genuinely require codec libraries that
are not in this container; `sniff_format` routes them to an explicit
'codec_unavailable' outcome instead of a fake decode.

A matching writer (`synth_bmp`) emits correct deterministic BMPs so
fixtures and the gate query exercise the decoder end-to-end, and
`resize_nearest` provides the standard thumbnail step as pure arithmetic.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np


def sniff_format(data: bytes) -> str:
    """'bmp' | 'jpeg' | 'png' | 'gif' | 'unknown' from magic bytes."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def decode_bmp(data: bytes) -> Optional[np.ndarray]:
    """24-bit uncompressed BMP -> HxWx3 uint8 RGB array (row 0 = top).
    Returns None for anything malformed/unsupported (never raises)."""
    try:
        if data[:2] != b"BM" or len(data) < 54:
            return None
        pixel_off = struct.unpack_from("<I", data, 10)[0]
        header_size = struct.unpack_from("<I", data, 14)[0]
        if header_size < 40:  # BITMAPCOREHEADER etc. unsupported
            return None
        width, height = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
        if planes != 1 or bpp != 24 or compression != 0 or width <= 0:
            return None
        bottom_up = height > 0
        height = abs(height)
        if not height or width > 1 << 20 or height > 1 << 20:
            return None
        stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
        need = pixel_off + stride * height
        if len(data) < need:
            return None
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * height, offset=pixel_off
        ).reshape(height, stride)[:, : width * 3]
        img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
        if bottom_up:
            img = img[::-1]
        return np.ascontiguousarray(img)
    except Exception:
        return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the thumbnail step), pure index arithmetic:
    source index = floor(i * src / dst) — deterministic across platforms."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def synth_bmp(
    width: int, height: int, fill_rgb: tuple[int, int, int], corner_white: bool = True
) -> bytes:
    """A correct bottom-up 24-bit BMP: constant fill color, optionally one
    white pixel at (0, 0) top-left (so decoders that flip rows or swap
    channels fail the tests loudly). Deterministic bytes."""
    stride = (width * 3 + 3) & ~3
    img = np.zeros((height, width, 3), dtype=np.uint8)
    img[:, :] = fill_rgb
    if corner_white and width and height:
        img[0, 0] = (255, 255, 255)
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = img[::-1, :, ::-1].reshape(height, width * 3)  # RGB->BGR, bottom-up
    pixels = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels
