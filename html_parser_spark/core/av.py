"""Minimal pure-Python audio/video decode + synthesis (stdlib + numpy).

Same policy as core/image.py: the decode step is REAL for the uncompressed
formats a pure-Python kernel can honestly handle —

  audio:  WAV / RIFF PCM (16-bit LE): fmt-chunk walk, sample-rate /
          channels / sample-count, integer absolute-energy sum
  video:  YUV4MPEG2 (.y4m): header parse, frame indexing by fixed 4:2:0
          frame size, FRAME-SAMPLING by plain offset arithmetic (every
          k-th frame without touching the others — the property that
          matters at scale), per-frame luma sums

Compressed codecs (MP3/AAC/H.264/...) require codec libraries absent from
this container and are routed to explicit 'codec_unavailable' outcomes by
the operators. Writers emit correct deterministic bytes for fixtures and
the gate oracles.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> Optional[dict]:
    """RIFF/WAVE PCM16 -> {rate, channels, n_samples, sum_abs}; None for
    malformed/unsupported input (never raises). sum_abs is the integer sum
    of |sample| over all channels — the oracle-able energy feature."""
    try:
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        pcm = None
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body = data[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                pcm = body
            pos += 8 + size + (size & 1)  # chunks pad to even
        if fmt is None or pcm is None or len(fmt) < 16:
            return None
        audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
        bits = struct.unpack_from("<H", fmt, 14)[0]
        if audio_fmt != 1 or bits != 16 or not channels:
            return None  # only uncompressed PCM16
        samples = np.frombuffer(pcm, dtype="<i2", count=len(pcm) // 2)
        return {
            "rate": int(rate),
            "channels": int(channels),
            "n_samples": len(samples) // channels,
            "sum_abs": int(np.abs(samples.astype(np.int64)).sum()),
        }
    except Exception:
        return None


def synth_wav(
    n_samples: int, rate: int, amplitude: int, channels: int = 1
) -> bytes:
    """A correct PCM16 WAV: a +A/-A square wave (period 2) per channel —
    sum_abs has the closed form amplitude * n_samples * channels."""
    samples = np.empty(n_samples * channels, dtype="<i2")
    wave = np.where(np.arange(n_samples) % 2 == 0, amplitude, -amplitude)
    for c in range(channels):
        samples[c::channels] = wave
    pcm = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    return out


# ---------------------------------------------------------------------------
# YUV4MPEG2 (y4m) — uncompressed video, 4:2:0
# ---------------------------------------------------------------------------


def _y4m_header(data: bytes) -> Optional[tuple[int, int, int]]:
    """(width, height, header_end) from the YUV4MPEG2 stream header."""
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    for tok in data[9:nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
    if not w or not h or w % 2 or h % 2:
        return None
    return w, h, nl + 1


def y4m_info(data: bytes) -> Optional[dict]:
    """{width, height, n_frames} by offset arithmetic (no frame decode)."""
    hd = _y4m_header(data)
    if hd is None:
        return None
    w, h, pos = hd
    frame_bytes = 6 + w * h * 3 // 2  # b'FRAME\n' + Y + U + V (4:2:0)
    n = (len(data) - pos) // frame_bytes
    return {"width": w, "height": h, "n_frames": n}


def y4m_sample_frames(data: bytes, every: int = 1) -> Optional[list[dict]]:
    """Frame-sample a y4m stream: decode ONLY every `every`-th frame (pure
    offset seek — untouched frames cost nothing), returning per-sampled-
    frame {frame, sum_y} (integer luma-plane sum). None if malformed."""
    hd = _y4m_header(data)
    if hd is None or every < 1:
        return None
    w, h, pos = hd
    ysz = w * h
    frame_bytes = 6 + ysz * 3 // 2
    out = []
    idx = 0
    while pos + frame_bytes <= len(data):
        if idx % every == 0:
            if data[pos : pos + 6] != b"FRAME\n":
                return None
            y = np.frombuffer(data, dtype=np.uint8, count=ysz, offset=pos + 6)
            out.append({"frame": idx, "sum_y": int(y.astype(np.int64).sum())})
        pos += frame_bytes
        idx += 1
    return out


def synth_y4m(width: int, height: int, lumas: list[int]) -> bytes:
    """A correct YUV4MPEG2 stream: one constant-luma frame per entry (U=V=
    128) — sampled-frame sum_y has the closed form luma * width * height."""
    out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420\n" % (width, height))
    csz = (width // 2) * (height // 2)
    for luma in lumas:
        out += b"FRAME\n"
        out += bytes([luma]) * (width * height)
        out += b"\x80" * (2 * csz)
    return bytes(out)
