"""Unit tests for the pure-Python HDF4-SD codec (sources/hdf4.py) —
the no-GDAL container seam behind s07's real-bytes subdataset scan."""

from __future__ import annotations

import numpy as np
import pytest

from bdc_collection_builder_spark.sources.hdf4 import (
    Hdf4File,
    read_hdf4,
    write_hdf4,
)


@pytest.mark.parametrize("dtype", ["uint8", "int16", "uint16", "int32",
                                   "float32", "float64"])
def test_roundtrip_exact(dtype):
    rng = np.random.default_rng(5)
    if dtype.startswith("float"):
        a = rng.normal(size=(7, 5)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=(7, 5)).astype(dtype)
    back = read_hdf4(write_hdf4({"band": a}))
    assert set(back.datasets) == {"band"}
    assert back.datasets["band"].dtype == a.dtype
    assert np.array_equal(back.datasets["band"], a)


def test_multiple_subdatasets_and_metadata():
    grids = {
        "sur_refl_b01": np.arange(12, dtype="int16").reshape(3, 4),
        "sur_refl_b02": np.arange(12, 24, dtype="int16").reshape(3, 4),
        "QA": np.ones((3, 4), dtype="uint16"),
    }
    back = read_hdf4(write_hdf4(grids, metadata="cloudcover=12.5"))
    assert list(back.datasets) == list(grids)  # DD order preserved
    for name, arr in grids.items():
        assert np.array_equal(back.datasets[name], arr), name
    assert back.metadata == "cloudcover=12.5"


def test_nodata_sentinel_survives():
    a = np.full((4, 4), -9999, dtype="int16")
    back = read_hdf4(write_hdf4({"b": a}))
    assert (back.datasets["b"] == -9999).all()


def test_rejects_garbage_and_bad_shapes():
    with pytest.raises(ValueError, match="magic"):
        read_hdf4(b"\x89HDF not actually hdf4")
    with pytest.raises(ValueError, match="2-D"):
        write_hdf4({"x": np.zeros(3, dtype="uint8")})
    with pytest.raises(ValueError, match="dtype"):
        write_hdf4({"x": np.zeros((2, 2), dtype="complex64")})


def test_empty_file_roundtrip():
    back = read_hdf4(write_hdf4({}, metadata="nothing=true"))
    assert back == Hdf4File(datasets={}, metadata="nothing=true")


# -- property-based round-trips (hypothesis) ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _sds_arrays(draw):
    dtype = draw(st.sampled_from(
        ["uint8", "int16", "uint16", "int32", "float32", "float64"]))
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    if dtype.startswith("float"):
        flat = draw(st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            min_size=h * w, max_size=h * w))
        return np.array(flat, dtype=dtype).reshape(h, w)
    info = np.iinfo(dtype)
    flat = draw(st.lists(
        st.integers(min_value=int(info.min), max_value=int(info.max)),
        min_size=h * w, max_size=h * w))
    return np.array(flat, dtype=dtype).reshape(h, w)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcdefgh_0123456789", min_size=1, max_size=12),
    _sds_arrays(), min_size=1, max_size=4),
    st.text(alphabet=st.characters(codec="ascii",
                                   exclude_characters="\0"),
            max_size=64))
def test_hdf4_roundtrip_property(datasets, metadata):
    """Any mix of named 2-D SDS arrays + metadata survives the codec
    bit-exactly, in DD order."""
    back = read_hdf4(write_hdf4(datasets, metadata=metadata))
    assert list(back.datasets) == list(datasets)
    for name, arr in datasets.items():
        assert back.datasets[name].dtype == arr.dtype, name
        assert np.array_equal(back.datasets[name], arr), name
    assert back.metadata == metadata
