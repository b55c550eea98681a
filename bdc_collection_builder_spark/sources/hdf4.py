"""Minimal pure-Python HDF4 scientific-dataset codec — real container
bytes without pyhdf/GDAL.

The reference opens MODIS-style HDF4 files through
``osgeo.gdal.Open`` and iterates subdatasets (hdf.py:38-108); this
container has no GDAL, so the S7 seam previously ran a deterministic
simulator. This module closes that gap for a BASELINE subset of the
public HDF 4.2 specification (NCSA "HDF Specification and Developer's
Guide", public): big-endian, uncompressed, contiguous scientific
datasets described by classic DD lists:

- ``DFTAG_FD``  (101): file description — carries the metadata text
  blob (the seam's stand-in for MODIS CoreMetadata, where e.g. cloud
  cover lives);
- ``DFTAG_DIL`` (104): data identifier label — names a subdataset by
  annotating its NDG (tag, ref);
- ``DFTAG_NT``  (106): number type (version, type, bit width, class);
- ``DFTAG_SDD`` (701): dimension record — rank, dims, NT references;
- ``DFTAG_SD``  (702): the raw array bytes;
- ``DFTAG_NDG`` (720): numeric data group tying SDD + SD together.

Deliberately NOT a general HDF4 library: no Vgroup/Vdata trees, no
chunking/compression, no external elements — those belong to the real
pyhdf/GDAL seam, which drops into the same ``read_hdf4`` call. The
point is that the Spark plumbing (executor-side writes, ``binaryFile``
scans, Arrow-batched decode) runs against genuine HDF4 bytes.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"\x0e\x03\x13\x01"

_TAG_FD = 101    # file description (metadata text)
_TAG_DIL = 104   # data identifier label (names an object by tag/ref)
_TAG_NT = 106    # number type
_TAG_SDD = 701   # scientific data dimension record
_TAG_SD = 702    # scientific data (raw array)
_TAG_NDG = 720   # numeric data group

# DFNT codes <-> numpy dtypes (big-endian on disk, like HDF4 itself)
_DFNT: dict[str, tuple[int, int]] = {      # dtype -> (code, bit width)
    "uint8": (21, 8), "int8": (20, 8),
    "uint16": (23, 16), "int16": (22, 16),
    "uint32": (25, 32), "int32": (24, 32),
    "float32": (5, 32), "float64": (6, 64),
}
_DFNT_TO_DTYPE = {code: dt for dt, (code, _) in _DFNT.items()}


@dataclass
class Hdf4File:
    datasets: dict[str, np.ndarray] = field(default_factory=dict)
    metadata: str = ""


def write_hdf4(datasets: dict[str, np.ndarray], metadata: str = "") -> bytes:
    """Encode named 2-D arrays as an HDF4 file (one NDG-grouped SDS
    each, DIL-labeled) plus a file-description metadata blob."""
    elements: list[tuple[int, int, bytes]] = []   # (tag, ref, payload)
    ref = 0

    if metadata:
        ref += 1
        elements.append((_TAG_FD, ref, metadata.encode()))

    for name, arr in datasets.items():
        if arr.ndim != 2:
            raise ValueError(f"{name}: HDF4 SDS writer takes 2-D arrays")
        dtype = np.dtype(arr.dtype).name
        if dtype not in _DFNT:
            raise ValueError(f"{name}: unsupported dtype {dtype}")
        code, width = _DFNT[dtype]
        nt_ref = ref = ref + 1
        # NT: version 1, type code, bit width, class 0 (motorola/IEEE)
        elements.append((_TAG_NT, nt_ref, struct.pack(">4B", 1, code,
                                                      width, 0)))
        sdd_ref = ref = ref + 1
        # SDD: rank, dims, (tag,ref) of data NT, (tag,ref) per dim scale
        sdd = struct.pack(">h", 2) + struct.pack(">2i", *arr.shape)
        sdd += struct.pack(">HH", _TAG_NT, nt_ref)
        sdd += struct.pack(">HH", _TAG_NT, nt_ref) * 2
        elements.append((_TAG_SDD, sdd_ref, sdd))
        sd_ref = ref = ref + 1
        elements.append((_TAG_SD, sd_ref,
                         arr.astype(f">{arr.dtype.str[1:]}").tobytes()))
        ndg_ref = ref = ref + 1
        ndg = struct.pack(">HH", _TAG_SDD, sdd_ref)
        ndg += struct.pack(">HH", _TAG_SD, sd_ref)
        elements.append((_TAG_NDG, ndg_ref, ndg))
        label_ref = ref = ref + 1
        # DIL: (object tag, object ref) then the label text
        elements.append((_TAG_DIL, label_ref,
                         struct.pack(">HH", _TAG_NDG, ndg_ref)
                         + name.encode()))

    # single DD block directly after the magic
    ndd = len(elements)
    dd_block_size = 2 + 4 + 12 * ndd
    data_start = len(_MAGIC) + dd_block_size
    offsets, off = [], data_start
    for _, _, payload in elements:
        offsets.append(off)
        off += len(payload)

    out = bytearray(_MAGIC)
    out += struct.pack(">hi", ndd, 0)          # ndd, no next DD block
    for (tag, r, payload), pos in zip(elements, offsets):
        out += struct.pack(">HHii", tag, r, pos, len(payload))
    for _, _, payload in elements:
        out += payload
    return bytes(out)


def read_hdf4(data: bytes) -> Hdf4File:
    """Decode the subset written by :func:`write_hdf4` (and any classic
    uncompressed contiguous SD layout using the same tags)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an HDF4 file: bad magic")

    # walk the DD block chain
    dds: dict[tuple[int, int], tuple[int, int]] = {}   # (tag,ref)->(off,len)
    block_off = 4
    while block_off:
        ndd, nxt = struct.unpack_from(">hi", data, block_off)
        for i in range(ndd):
            tag, ref, off, length = struct.unpack_from(
                ">HHii", data, block_off + 6 + 12 * i)
            if tag:  # tag 0 = empty slot
                dds[(tag, ref)] = (off, length)
        block_off = nxt

    def payload(tag: int, ref: int) -> bytes:
        off, length = dds[(tag, ref)]
        return data[off:off + length]

    # labels: NDG (tag, ref) -> name
    labels: dict[tuple[int, int], str] = {}
    for (tag, ref), (off, length) in dds.items():
        if tag == _TAG_DIL:
            raw = data[off:off + length]
            obj_tag, obj_ref = struct.unpack_from(">HH", raw, 0)
            labels[(obj_tag, obj_ref)] = raw[4:].split(b"\0")[0].decode()

    out = Hdf4File()
    for (tag, ref), (off, length) in sorted(dds.items(), key=lambda kv: kv[1]):
        if tag == _TAG_FD:
            out.metadata = data[off:off + length].decode()
        if tag != _TAG_NDG:
            continue
        members = struct.unpack(f">{length // 2}H", data[off:off + length])
        pairs = list(zip(members[::2], members[1::2]))
        sdd_ref = next(r for t, r in pairs if t == _TAG_SDD)
        sd_ref = next(r for t, r in pairs if t == _TAG_SD)
        sdd = payload(_TAG_SDD, sdd_ref)
        (rank,) = struct.unpack_from(">h", sdd, 0)
        dims = struct.unpack_from(f">{rank}i", sdd, 2)
        nt_tag, nt_ref = struct.unpack_from(">HH", sdd, 2 + 4 * rank)
        _, code, width, _ = struct.unpack(">4B", payload(nt_tag, nt_ref))
        dtype = _DFNT_TO_DTYPE.get(code)
        if dtype is None:
            raise NotImplementedError(f"DFNT number type {code}")
        arr = np.frombuffer(payload(_TAG_SD, sd_ref),
                            dtype=np.dtype(dtype).newbyteorder(">"))
        name = labels.get((_TAG_NDG, ref), f"SDS_{ref}")
        out.datasets[name] = arr.reshape(dims).astype(dtype)
    return out
