"""Unit tests for the pure-Python TIFF codec (sources/tiff.py) — the
no-GDAL raster seam. Round-trip exactness across dtypes and strip
splits is what lets s20_tiff_raster_scan share s06's analytic oracle."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bdc_collection_builder_spark.sources.tiff import (
    TiffImage,
    read_tiff,
    write_tiff,
)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "int32",
                                   "float32", "float64"])
@pytest.mark.parametrize("rows_per_strip", [None, 1, 3, 7])
def test_roundtrip_exact(dtype, rows_per_strip):
    rng = np.random.default_rng(7)
    if dtype.startswith("float"):
        a = rng.normal(size=(11, 5)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=(11, 5)).astype(dtype)
    img = read_tiff(write_tiff(a, rows_per_strip=rows_per_strip))
    assert img.array.dtype == a.dtype
    assert np.array_equal(img.array, a)
    assert (img.width, img.height) == (5, 11)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "float32"])
@pytest.mark.parametrize("n_bands", [2, 3, 4])
@pytest.mark.parametrize("rows_per_strip", [None, 2])
def test_roundtrip_multiband(dtype, n_bands, rows_per_strip):
    """Multi-band chunky layout across band-count x dtype x strip split
    (VERDICT-r2 task 5: the reference emits 3-band int16/float32
    stacks, publish.py:77-88)."""
    rng = np.random.default_rng(13)
    shape = (9, 6, n_bands)
    if dtype.startswith("float"):
        a = rng.normal(size=shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=shape).astype(dtype)
    img = read_tiff(write_tiff(a, rows_per_strip=rows_per_strip))
    assert img.array.dtype == a.dtype
    assert np.array_equal(img.array, a)
    assert (img.width, img.height, img.bands) == (6, 9, n_bands)


def test_multiband_geotiff_tags():
    a = np.zeros((4, 4, 3), dtype="int16")
    img = read_tiff(write_tiff(a, pixel_scale=(10.0, 10.0, 0.0)))
    assert img.bands == 3 and img.pixel_scale == (10.0, 10.0, 0.0)


def test_rejects_planar_separate():
    """PlanarConfiguration=2 is the documented GDAL seam."""
    a = np.zeros((2, 2, 3), dtype="uint8")
    raw = bytearray(write_tiff(a))
    (ifd_offset,) = struct.unpack_from("<I", raw, 4)
    (n,) = struct.unpack_from("<H", raw, ifd_offset)
    for i in range(n):
        base = ifd_offset + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", raw, base)
        if tag == 284:
            struct.pack_into("<I", raw, base + 8, 2)
    with pytest.raises(NotImplementedError, match="planar"):
        read_tiff(bytes(raw))


def test_geotiff_tags_roundtrip():
    a = np.zeros((4, 4), dtype="int16")
    img = read_tiff(write_tiff(
        a, pixel_scale=(10.0, 10.0, 0.0),
        tiepoint=(0.0, 0.0, 0.0, -46.0, -13.0, 0.0)))
    assert img.pixel_scale == (10.0, 10.0, 0.0)
    assert img.tiepoint == (0.0, 0.0, 0.0, -46.0, -13.0, 0.0)


def test_geotiff_tags_absent_is_none():
    img = read_tiff(write_tiff(np.zeros((2, 2), dtype="uint8")))
    assert img.pixel_scale is None and img.tiepoint is None


def test_big_endian_read():
    """The reader accepts MM files (written here by byte-swapping a
    little-endian one field-by-field through the public layout)."""
    a = np.arange(12, dtype="uint16").reshape(3, 4)
    little = bytearray(write_tiff(a))
    # Build the MM equivalent manually: header + strip (swapped) + IFD
    # (swapped entry-by-entry). Simpler: write a fresh MM file.
    strip = a.astype(">u2").tobytes()
    entries = [
        (256, 4, 1, 4), (257, 4, 1, 3), (258, 3, 1, 16 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, 1 << 16),
        (273, 4, 1, 8), (277, 3, 1, 1 << 16), (278, 4, 1, 3),
        (279, 4, 1, len(strip)), (339, 3, 1, 1 << 16),
    ]
    ifd_offset = 8 + len(strip)
    ifd = struct.pack(">H", len(entries))
    for tag, typ, n, value in entries:
        ifd += struct.pack(">HHII", tag, typ, n, value)
    ifd += struct.pack(">I", 0)
    mm = struct.pack(">2sHI", b"MM", 42, ifd_offset) + strip + ifd
    img = read_tiff(mm)
    assert np.array_equal(img.array, a)
    assert little[:2] == b"II"  # and the LE twin still reads
    assert np.array_equal(read_tiff(bytes(little)).array, a)


def test_rejects_compressed_and_garbage():
    a = np.zeros((2, 2), dtype="uint8")
    raw = bytearray(write_tiff(a))
    # flip the Compression tag value to 5 (LZW): entries are sorted by
    # tag, find tag 259 in the IFD and overwrite its value field
    (ifd_offset,) = struct.unpack_from("<I", raw, 4)
    (n,) = struct.unpack_from("<H", raw, ifd_offset)
    for i in range(n):
        base = ifd_offset + 2 + 12 * i
        (tag,) = struct.unpack_from("<H", raw, base)
        if tag == 259:
            struct.pack_into("<I", raw, base + 8, 5)
    with pytest.raises(NotImplementedError):
        read_tiff(bytes(raw))
    with pytest.raises(ValueError):
        read_tiff(b"PK\x03\x04 not a tiff")


def test_nodata_sentinel_survives_int16():
    a = np.full((3, 3), -9999, dtype="int16")
    img = read_tiff(write_tiff(a))
    assert (img.array == -9999).all()


def test_dataclass_dims():
    img = TiffImage(array=np.zeros((7, 9), dtype="uint8"))
    assert img.height == 7 and img.width == 9


def test_zip_corruption_detected():
    """The S21 validation path actually catches bit flips: a corrupted
    deflate stream fails the CRC pass the stage runs."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("B04_10m.jp2", b"payload-bytes" * 64)
    raw = bytearray(buf.getvalue())
    # flip a byte inside the compressed stream (past the local header)
    raw[60] ^= 0xFF
    with zipfile.ZipFile(io.BytesIO(bytes(raw))) as zf:
        try:
            bad = zf.testzip()
        except Exception:
            bad = "B04_10m.jp2"
        assert bad is not None


def test_decode_features_tiff_codec(spark):
    """decode_image_features(codec='tiff') runs a REAL decode: the
    feature is the normalized block-mean downsample of the actual
    raster, deterministic and payload-derived."""
    import pandas as pd

    from bdc_collection_builder_spark.extensions.multimodal import (
        decode_image_features,
    )

    rows = []
    rng = np.random.default_rng(3)
    for i in range(6):
        arr = rng.integers(0, 1000, size=(16, 16)).astype("int16")
        rows.append({"media_id": i, "kind": "image",
                     "payload": write_tiff(arr)})
    media = spark.createDataFrame(pd.DataFrame(rows))
    feats = decode_image_features(media, codec="tiff", feature_dim=4)
    got = {r.media_id: r.feature for r in feats.collect()}
    assert len(got) == 6
    for i, f in got.items():
        assert len(f) == 4
        assert abs(sum(x * x for x in f) - 1.0) < 1e-5  # unit norm
    again = {r.media_id: r.feature for r in
             decode_image_features(media, codec="tiff",
                                   feature_dim=4).collect()}
    assert got == again


def test_decode_features_tiny_raster_no_nan(spark):
    """Rasters smaller than the block grid (side = floor(sqrt(dim)))
    must not emit NaN features: the grid is clamped to the image shape
    (ADVICE-r2: empty slice mean() poisoned the norm)."""
    import math

    import pandas as pd

    from bdc_collection_builder_spark.extensions.multimodal import (
        decode_image_features,
    )

    rows = [{"media_id": i, "kind": "image",
             "payload": write_tiff(np.full((i + 1, 1), 7, dtype="uint16"))}
            for i in range(3)]  # 1x1, 2x1, 3x1 — all smaller than side=3
    media = spark.createDataFrame(pd.DataFrame(rows))
    feats = decode_image_features(media, codec="tiff", feature_dim=9)
    for r in feats.collect():
        assert all(math.isfinite(x) for x in r.feature), r
        assert any(x != 0 for x in r.feature)


def test_png_roundtrip_and_errors():
    from bdc_collection_builder_spark.sources.png import read_png, write_png

    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(13, 7)).astype("uint8")
    assert np.array_equal(read_png(write_png(g)), g)
    rgb = rng.integers(0, 256, size=(5, 9, 3)).astype("uint8")
    assert np.array_equal(read_png(write_png(rgb)), rgb)
    with pytest.raises(ValueError):
        read_png(b"GIF89a not a png")
    with pytest.raises(ValueError):
        write_png(g.astype("uint16"))
    # CRC corruption is detected
    raw = bytearray(write_png(g))
    raw[20] ^= 0xFF  # inside IHDR payload
    with pytest.raises(ValueError, match="CRC"):
        read_png(bytes(raw))


# -- property-based multi-band round-trip (hypothesis) -----------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _rasters(draw):
    dtype = draw(st.sampled_from(
        ["uint8", "uint16", "int16", "int32", "float32", "float64"]))
    h = draw(st.integers(min_value=1, max_value=10))
    w = draw(st.integers(min_value=1, max_value=10))
    bands = draw(st.integers(min_value=1, max_value=4))
    shape = (h, w) if bands == 1 else (h, w, bands)
    n = h * w * bands
    if dtype.startswith("float"):
        flat = draw(st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            min_size=n, max_size=n))
    else:
        info = np.iinfo(dtype)
        flat = draw(st.lists(
            st.integers(min_value=int(info.min), max_value=int(info.max)),
            min_size=n, max_size=n))
    rps = draw(st.one_of(st.none(),
                         st.integers(min_value=1, max_value=h)))
    return np.array(flat, dtype=dtype).reshape(shape), rps


@settings(max_examples=40, deadline=None)
@given(_rasters())
def test_tiff_roundtrip_property(raster):
    """Any band-count x dtype x strip split survives bit-exactly."""
    arr, rows_per_strip = raster
    img = read_tiff(write_tiff(arr, rows_per_strip=rows_per_strip))
    assert img.array.dtype == arr.dtype
    assert np.array_equal(img.array, arr)
    assert img.bands == (1 if arr.ndim == 2 else arr.shape[2])
