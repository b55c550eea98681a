"""Minimal pure-Python PNG codec — the real-bytes quicklook sink.

The reference's publish step writes a PNG quicklook per scene
(publish.py:84-88 via Pillow's Image.merge). This container has no
Pillow, so this module implements the subset the quicklook sink needs
from the public PNG spec with stdlib ``zlib`` + ``struct`` only:
8-bit grayscale and RGB, one IDAT, scanline filter 0.

Like the TIFF codec (sources/tiff.py) this is deliberately NOT a
general PNG library — interlacing, palettes, 16-bit and filters 1-4
raise, documenting the Pillow seam. The point is that the quicklook
pipeline produces and re-reads REAL PNG files end-to-end."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(kind: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(kind + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + kind + payload + \
        struct.pack(">I", crc)


def write_png(array: np.ndarray) -> bytes:
    """Encode uint8 grayscale (H, W) or RGB (H, W, 3) as PNG."""
    if array.dtype != np.uint8:
        raise ValueError("write_png takes uint8 arrays")
    if array.ndim == 2:
        color_type, channels = 0, 1
    elif array.ndim == 3 and array.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("expected (H, W) grayscale or (H, W, 3) RGB")
    height, width = array.shape[:2]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    flat = array.reshape(height, width * channels)
    raw = b"".join(b"\x00" + flat[r].tobytes() for r in range(height))
    return (_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def read_png(data: bytes) -> np.ndarray:
    """Decode a PNG written by :func:`write_png` (8-bit gray/RGB,
    filter 0, no interlace). Returns (H, W) or (H, W, 3) uint8."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        kind = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(kind + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {kind!r}: CRC mismatch")
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    width, height, depth, color_type, _, _, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            "16-bit/interlaced PNG: the Pillow seam handles these")
    channels = {0: 1, 2: 3}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")
    raw = zlib.decompress(idat)
    stride = width * channels
    rows = []
    for r in range(height):
        line = raw[r * (stride + 1):(r + 1) * (stride + 1)]
        if line[0] != 0:
            raise NotImplementedError(
                f"PNG scanline filter {line[0]}: writer emits filter 0")
        rows.append(np.frombuffer(line[1:], dtype=np.uint8))
    arr = np.stack(rows).reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr
