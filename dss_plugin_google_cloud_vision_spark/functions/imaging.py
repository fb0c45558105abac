# -*- coding: utf-8 -*-
"""Minimal deterministic image codecs (PNG + binary PPM), stdlib + numpy.

The multimodal seam (`operators.multimodal`) needs a REAL decode path for
image payloads, and this environment ships no imaging library (no PIL) —
so this module implements the two formats the synthetic pipeline uses from
their public specifications:

- **PNG** (RFC 2083): 8-bit greyscale/RGB/RGBA, non-interlaced; full
  chunk walk with CRC verification, zlib inflate, and all five scanline
  filters (None/Sub/Up/Average/Paeth) reconstructed exactly per spec.
- **PPM** (netpbm P6): binary 8-bit RGB.

This plays the role of the reference's PIL usage
(reference: python-lib/document_utils.py:98-129 — ``Image.open`` on blob
streams); a production deployment swaps these for PIL/libvips behind the
same functions. Everything here is a pure function of the input bytes.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 6: 4}


class ImageDecodeError(ValueError):
    """Malformed or unsupported image payload."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Supports bit depth 8, color types 0/2/6, no interlace — the subset the
    synthetic pipeline produces; anything else raises ImageDecodeError."""
    if not data.startswith(PNG_SIGNATURE):
        raise ImageDecodeError("not a PNG payload (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = channels = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ImageDecodeError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ImageDecodeError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ImageDecodeError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _COLOR_TYPE_CHANNELS:
                raise ImageDecodeError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ImageDecodeError("unsupported PNG compression/filter/interlace")
            channels = _COLOR_TYPE_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or not seen_end or not idat:
        raise ImageDecodeError("PNG missing IHDR/IDAT/IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ImageDecodeError("PNG scanline data has wrong length")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        offset = y * (stride + 1)
        ftype = raw[offset]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=offset + 1).astype(
            np.int32
        )
        if ftype == 0:
            recon = cur
        elif ftype == 2:  # Up
            recon = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub — left dependency, per-pixel along x
            recon = cur.copy()
            for x in range(channels, stride):
                recon[x] = (recon[x] + recon[x - channels]) & 0xFF
        elif ftype == 3:  # Average
            recon = cur.copy()
            for x in range(stride):
                left = recon[x - channels] if x >= channels else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = cur.copy()
            for x in range(stride):
                left = int(recon[x - channels]) if x >= channels else 0
                up = int(prev[x])
                ul = int(prev[x - channels]) if x >= channels else 0
                recon[x] = (recon[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ImageDecodeError(f"unknown PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, channels in {1,3,4}) → PNG bytes (filter 0, one IDAT).
    Deterministic for a given input and zlib build."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ImageDecodeError(f"unsupported channel count {channels}")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 9))
        + chunk(b"IEND", b"")
    )


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) bytes → uint8 array (h, w, 3)."""
    if not data.startswith(b"P6"):
        raise ImageDecodeError("not a binary PPM payload")
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            end = data.find(b"\n", pos)
            if end < 0:
                raise ImageDecodeError("truncated PPM header")
            pos = end + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ImageDecodeError("truncated PPM header")
        fields.append(data[start:pos])
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ImageDecodeError(f"unsupported PPM maxval {maxval}")
    pos += 1  # single whitespace after maxval
    expected = width * height * 3
    body = data[pos : pos + expected]
    if len(body) != expected:
        raise ImageDecodeError("truncated PPM pixel data")
    return np.frombuffer(body, dtype=np.uint8).reshape(height, width, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    arr = np.asarray(pixels, dtype=np.uint8)
    height, width, channels = arr.shape
    if channels != 3:
        raise ImageDecodeError("PPM requires 3 channels")
    return b"P6\n%d %d\n255\n" % (width, height) + arr.tobytes()


def decode_image(data: bytes) -> Tuple[np.ndarray, str]:
    """Sniff + decode a supported image payload → (pixels, codec)."""
    if data.startswith(PNG_SIGNATURE):
        return decode_png(data), "png"
    if data.startswith(b"P6"):
        return decode_ppm(data), "ppm"
    raise ImageDecodeError("unsupported image codec (not PNG or binary PPM)")
