"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched pandas UDFs over ``mapInPandas``.

The Spark-side design is real and tested: schemas, partition-parallel
batch iteration, and the UDF signatures match what a decode/resize/
frame-sample pipeline needs at 100 TB (binary payloads never leave the
executor; only derived features shuffle). The *codec* itself is stubbed
deterministically because image/audio libraries are not in this
container — `decode_image_features(..., codec="stub")` documents the
seam where Pillow/libav plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "mean_byte double, feature array<float>"
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append((i, kind, bytearray(payload), f"application/x-{kind}",
                     64 + i % 32 if kind != "audio" else None,
                     64 + i % 16 if kind != "audio" else None,
                     1000 * (i % 30) if kind != "image" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_features(media: DataFrame, codec: str = "stub",
                          feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract over binary payloads.

    ``mapInPandas`` keeps whole Arrow batches in the worker: payload
    bytes stay executor-local and only the fixed-size feature vector
    comes back — the shape a real CLIP/embedding extraction stage has.
    With ``codec='stub'`` features are a deterministic byte-histogram
    projection; a real codec (Pillow/torchvision) drops into `_decode`.
    """
    if codec == "tiff":
        # REAL image decode (pure-Python TIFF codec, sources/tiff.py):
        # the payload is parsed as an actual raster and the feature is
        # its flattened block-mean downsample — the genuine decode →
        # fixed-dim-embedding shape. Pillow/torchvision drop into the
        # same branch for other containers.
        from bdc_collection_builder_spark.sources.tiff import read_tiff

        def _decode(payload: bytes) -> np.ndarray:
            img = read_tiff(bytes(payload))
            a = img.array.astype(np.float32)
            side = max(1, int(feature_dim ** 0.5))
            h_step = max(1, a.shape[0] // side)
            w_step = max(1, a.shape[1] // side)
            # clamp the block grid to the raster: for images smaller
            # than `side` the naive range walks past the edge and the
            # empty slice's mean() is NaN, poisoning the whole feature
            blocks = [
                float(a[y:y + h_step, x:x + w_step].mean())
                for y in range(0, min(h_step * side, a.shape[0]), h_step)
                for x in range(0, min(w_step * side, a.shape[1]), w_step)
            ]
            feat = np.zeros(feature_dim, np.float32)
            feat[:len(blocks)] = blocks[:feature_dim]
            norm = np.linalg.norm(feat)
            return (feat / norm if norm else feat).astype(np.float32)
    elif codec != "stub":
        raise NotImplementedError(
            f"codec {codec!r}: only 'stub' (byte histogram) and 'tiff' "
            "(pure-Python raster decode) run in this environment; "
            "Pillow/torchvision plug into the same seam")
    else:
        def _decode(payload: bytes) -> np.ndarray:
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            # byte-histogram projection → fixed-dim feature (deterministic)
            hist = np.bincount(arr.astype(np.int64) % feature_dim,
                               weights=arr, minlength=feature_dim)
            norm = np.linalg.norm(hist)
            return (hist / norm if norm else hist).astype(np.float32)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            features = [
                _decode(p) if p is not None else np.zeros(feature_dim, np.float32)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                # checksum over the payload's hex form, not raw bytes:
                # engines without BLOB hashing (the DuckDB oracle) can
                # then recompute it; a real codec would hash raw bytes.
                "sha256": [hashlib.sha256(bytes(p).hex().encode()).hexdigest()
                           if p is not None else None
                           for p in pdf["payload"]],
                "mean_byte": [
                    float(np.frombuffer(p, dtype=np.uint8).mean())
                    if p else None for p in pdf["payload"]],
                "feature": [f.tolist() for f in features],
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video row into the frame
    timestamps a decoder would extract — pure Catalyst (sequence +
    explode), so the expensive decode fan-out is a narrow operation
    partitioned by media_id."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
            F.lit(every_ms))).alias("frame_ts_ms"),
    )


AUDIO_RMS_SCHEMA = "media_id long, frame_idx int, rms double"


def audio_rms_frames(media, frame_len: int = 64):
    """Per-frame RMS energy over int16-LE PCM payloads — the
    feature-extraction stage an audio curation pipeline runs before
    silence trimming / loudness filtering. Arrow-batched
    ``mapInPandas``: payload bytes stay executor-local, each batch is
    decoded with one ``np.frombuffer`` (zero-copy) and reduced with a
    vectorized reshape/sum — only (media_id, frame_idx, rms) rows
    shuffle. A trailing partial frame is dropped (fixed-length frames
    only), matching the oracle.

    Determinism: squares accumulate in int64 (exact), /frame_len is a
    power-of-two double division (exact), sqrt is IEEE
    correctly-rounded — so the doubles match any engine evaluating
    the same formula bit-for-bit."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, rms = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                x = np.frombuffer(bytes(payload), dtype="<i2") \
                      .astype(np.int64)
                n = (len(x) // frame_len) * frame_len
                if n == 0:
                    continue
                fr = x[:n].reshape(-1, frame_len)
                sumsq = (fr * fr).sum(axis=1)
                vals = np.sqrt(sumsq / float(frame_len))
                ids.extend([mid] * len(vals))
                frames.extend(range(len(vals)))
                rms.extend(vals.tolist())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(frames, dtype="int32"),
                "rms": pd.Series(rms, dtype="float64"),
            })

    return media.select("media_id", "payload").mapInPandas(
        run, AUDIO_RMS_SCHEMA)


AUDIO_ENERGY_SCHEMA = "media_id long, frame_idx int, energy long"


def audio_frame_energy(media, frame_len: int = 64):
    """Per-frame sum-of-squares energy over int16-LE PCM payloads —
    the ALL-INTEGER sibling of :func:`audio_rms_frames` (energy =
    rms² · frame_len without the sqrt), for downstream predicates
    that only threshold (silence trim, clipping detection): exact
    int64 end-to-end, zero float risk across engines. Same
    Arrow-batched mapInPandas plumbing — payload bytes never shuffle,
    only (media_id, frame_idx, energy) rows do; trailing partial
    frames are dropped."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, en = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                x = np.frombuffer(bytes(payload), dtype="<i2") \
                      .astype(np.int64)
                n = (len(x) // frame_len) * frame_len
                if n == 0:
                    continue
                fr = x[:n].reshape(-1, frame_len)
                sumsq = (fr * fr).sum(axis=1)
                ids.extend([mid] * len(sumsq))
                frames.extend(range(len(sumsq)))
                en.extend(int(v) for v in sumsq)
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(frames, dtype="int32"),
                "energy": pd.Series(en, dtype="int64"),
            })

    return media.select("media_id", "payload").mapInPandas(
        run, AUDIO_ENERGY_SCHEMA)
