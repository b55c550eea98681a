"""Minimal pure-Python (Geo)TIFF codec — real raster bytes without GDAL.

The reference reads/writes rasters through rasterio/GDAL
(index_generator.py:120-124, publish.py:248-270); this container has
neither, so the pipeline's raster seams previously ran deterministic
simulators. This module closes that gap for the BASELINE TIFF layout:
single-band, uncompressed, strip-organized TIFF 6.0 with the two
GeoTIFF georeferencing tags (ModelPixelScale / ModelTiepoint),
implemented from the public TIFF 6.0 / GeoTIFF specs with struct +
numpy only.

Deliberately NOT a general TIFF library: no compression (COG deflate
belongs to the real GDAL seam), no tiling, no planar-separate pages.
Multi-band rasters ARE supported in the chunky (pixel-interleaved,
PlanarConfiguration=1) layout — the (height, width, bands) shape the
reference's RGB quicklooks and SR stacks use (publish.py:77-88). The
point is that the Spark plumbing — executor-side file writes from
``applyInPandas``, ``binaryFile`` scans, windowed pixel aggregation —
runs against REAL raster bytes end-to-end, so swapping in rasterio on
a production cluster changes one decode call, not the dataflow.

Layout written (little-endian):

    [8-byte header][strip data ...][out-of-line tag values][IFD]

The reader accepts both byte orders, any strip split, and the
uint8/uint16/int16/int32/float32/float64 sample formats the writer
emits; anything compressed raises (that's the documented seam).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_MAGIC = 42
_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 3, 4, 12
_TYPE_SIZES = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8}

# (SampleFormat, BitsPerSample) <-> numpy dtype
_FORMATS: dict[tuple[int, int], str] = {
    (1, 8): "uint8", (1, 16): "uint16", (1, 32): "uint32",
    (2, 8): "int8", (2, 16): "int16", (2, 32): "int32",
    (3, 32): "float32", (3, 64): "float64",
}
_DTYPE_TO_FORMAT = {v: k for k, v in _FORMATS.items()}

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_PLANAR_CONFIG = 284         # 1 = chunky (pixel-interleaved)
_TAG_SAMPLE_FORMAT = 339
_TAG_MODEL_PIXEL_SCALE = 33550   # GeoTIFF: (sx, sy, sz) doubles
_TAG_MODEL_TIEPOINT = 33922      # GeoTIFF: (i, j, k, x, y, z) doubles


@dataclass
class TiffImage:
    array: np.ndarray          # (height, width) or (height, width, bands)
    pixel_scale: tuple[float, float, float] | None = None
    tiepoint: tuple[float, ...] | None = None

    @property
    def width(self) -> int:
        return self.array.shape[1]

    @property
    def height(self) -> int:
        return self.array.shape[0]

    @property
    def bands(self) -> int:
        return 1 if self.array.ndim == 2 else self.array.shape[2]


def write_tiff(array: np.ndarray,
               pixel_scale: tuple[float, float, float] | None = None,
               tiepoint: tuple[float, ...] | None = None,
               rows_per_strip: int | None = None) -> bytes:
    """Encode a 2-D (height, width) or 3-D (height, width, bands) numpy
    array as an uncompressed chunky-layout TIFF (little-endian),
    optionally georeferenced."""
    if array.ndim not in (2, 3):
        raise ValueError(
            "write_tiff takes (height, width) or (height, width, bands)")
    dtype = np.dtype(array.dtype).name
    if dtype not in _DTYPE_TO_FORMAT:
        raise ValueError(f"unsupported dtype {dtype}")
    fmt, bits = _DTYPE_TO_FORMAT[dtype]
    height, width = array.shape[:2]
    n_bands = 1 if array.ndim == 2 else array.shape[2]
    rows_per_strip = rows_per_strip or height
    arr = np.ascontiguousarray(array.astype(f"<{array.dtype.str[1:]}"))

    strips = [arr[r:r + rows_per_strip].tobytes()
              for r in range(0, height, rows_per_strip)]
    data_start = 8
    strip_offsets, off = [], data_start
    for s in strips:
        strip_offsets.append(off)
        off += len(s)

    # out-of-line value area (arrays that don't fit the 4-byte field)
    extra = b""

    def defer(values: list[int | float], typ: int) -> int:
        nonlocal extra
        pos = off + len(extra)
        ch = {"H": _TYPE_SHORT, "I": _TYPE_LONG, "d": _TYPE_DOUBLE}
        code = next(k for k, v in ch.items() if v == typ)
        extra_bytes = struct.pack(f"<{len(values)}{code}", *values)
        extra += extra_bytes
        return pos

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value

    def entry(tag: int, typ: int, values: list[int | float]) -> None:
        n = len(values)
        if _TYPE_SIZES[typ] * n <= 4:
            code = {_TYPE_SHORT: "H", _TYPE_LONG: "I"}[typ]
            raw = struct.pack(f"<{n}{code}", *values).ljust(4, b"\0")
            value = struct.unpack("<I", raw)[0]
        else:
            value = defer(values, typ)
        entries.append((tag, typ, n, value))

    entry(_TAG_WIDTH, _TYPE_LONG, [width])
    entry(_TAG_LENGTH, _TYPE_LONG, [height])
    entry(_TAG_BITS, _TYPE_SHORT, [bits] * n_bands)
    entry(_TAG_COMPRESSION, _TYPE_SHORT, [1])
    entry(_TAG_PHOTOMETRIC, _TYPE_SHORT, [1])
    entry(_TAG_STRIP_OFFSETS, _TYPE_LONG, strip_offsets)
    entry(_TAG_SAMPLES_PER_PIXEL, _TYPE_SHORT, [n_bands])
    entry(_TAG_ROWS_PER_STRIP, _TYPE_LONG, [rows_per_strip])
    entry(_TAG_STRIP_BYTES, _TYPE_LONG, [len(s) for s in strips])
    entry(_TAG_PLANAR_CONFIG, _TYPE_SHORT, [1])
    entry(_TAG_SAMPLE_FORMAT, _TYPE_SHORT, [fmt] * n_bands)
    if pixel_scale is not None:
        entry(_TAG_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, list(pixel_scale))
    if tiepoint is not None:
        entry(_TAG_MODEL_TIEPOINT, _TYPE_DOUBLE, list(tiepoint))

    entries.sort()  # spec: IFD entries ascending by tag
    ifd_offset = off + len(extra)
    ifd = struct.pack("<H", len(entries))
    for tag, typ, n, value in entries:
        ifd += struct.pack("<HHII", tag, typ, n, value)
    ifd += struct.pack("<I", 0)

    header = struct.pack("<2sHI", b"II", _MAGIC, ifd_offset)
    return header + b"".join(strips) + extra + ifd


def read_tiff(data: bytes) -> TiffImage:
    """Decode a single-band uncompressed TIFF (either byte order)."""
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_offset = struct.unpack_from(f"{e}HI", data, 2)
    if magic != _MAGIC:
        raise ValueError("not a TIFF: bad magic")

    (n_entries,) = struct.unpack_from(f"{e}H", data, ifd_offset)
    tags: dict[int, list[int | float]] = {}
    for i in range(n_entries):
        tag, typ, count, _ = struct.unpack_from(
            f"{e}HHII", data, ifd_offset + 2 + 12 * i)
        if typ not in _TYPE_SIZES:
            continue  # RATIONAL etc. — not produced by this writer
        size = _TYPE_SIZES[typ] * count
        field_off = ifd_offset + 2 + 12 * i + 8
        if size <= 4:
            raw = data[field_off:field_off + size]
        else:
            (pos,) = struct.unpack_from(f"{e}I", data, field_off)
            raw = data[pos:pos + size]
        code = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
        tags[tag] = list(struct.unpack(f"{e}{count}{code}", raw))

    if tags.get(_TAG_COMPRESSION, [1])[0] != 1:
        raise NotImplementedError(
            "compressed TIFF: the rasterio/GDAL seam handles these")
    n_bands = int(tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0])
    if n_bands > 1 and tags.get(_TAG_PLANAR_CONFIG, [1])[0] != 1:
        raise NotImplementedError(
            "planar-separate TIFF: only the chunky (pixel-interleaved) "
            "layout is decoded; GDAL handles planar pages")

    width = int(tags[_TAG_WIDTH][0])
    height = int(tags[_TAG_LENGTH][0])
    bits_list = tags.get(_TAG_BITS, [8])
    fmt_list = tags.get(_TAG_SAMPLE_FORMAT, [1])
    if len(set(bits_list)) > 1 or len(set(fmt_list)) > 1:
        raise NotImplementedError("mixed per-band sample formats")
    bits, fmt = int(bits_list[0]), int(fmt_list[0])
    dtype = _FORMATS.get((fmt, bits))
    if dtype is None:
        raise NotImplementedError(f"sample format {fmt}/{bits}")
    raw = b"".join(
        data[off:off + n] for off, n in
        zip(tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_BYTES]))
    arr = np.frombuffer(raw, dtype=np.dtype(dtype).newbyteorder(e))
    shape = (height, width) if n_bands == 1 else (height, width, n_bands)
    arr = arr.reshape(shape).astype(dtype)
    scale = tags.get(_TAG_MODEL_PIXEL_SCALE)
    tie = tags.get(_TAG_MODEL_TIEPOINT)
    return TiffImage(
        array=arr,
        pixel_scale=tuple(scale) if scale else None,
        tiepoint=tuple(tie) if tie else None,
    )
