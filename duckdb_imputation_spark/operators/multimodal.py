"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row.  Decode libraries (PIL/torchvision/ffmpeg) are NOT in this
container, so the actual byte→pixel step is stubbed: with
``fake=True`` a deterministic md5-derived stand-in is produced (so the
Spark-side plumbing — schema, batching, partitioning — is fully real and
testable); with ``fake=False`` a clearly-marked NotImplementedError
surfaces at execution time.

At 100 TB: binary payloads dominate IO — these stages are narrow (no
shuffle); ``repartition`` upstream only to bound per-task memory
(``batch_rows`` trades Arrow batch size vs peak memory).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media_meta",
    "decode_images",
    "image_features",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str, fmt: str = "unknown") -> DataFrame:
    """Cheap metadata (no decode): byte length + digest + declared format.
    Pure Column expressions."""
    b = F.col(binary_col)
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(b).cast("long").alias("n_bytes"),
            F.sha2(b, 256).alias("sha"),
        ),
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-decode: pixels derived from the md5 stream of
    the payload — stable across runs/engines, no image library needed."""
    need = h * w
    out = np.empty(need, dtype=np.uint8)
    digest = hashlib.md5(payload or b"").digest()
    buf = bytearray()
    counter = 0
    while len(buf) < need:
        buf += hashlib.md5(digest + counter.to_bytes(4, "little")).digest()
        counter += 1
    out[:] = np.frombuffer(bytes(buf[:need]), dtype=np.uint8)
    return out.reshape(h, w)


_DECODE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("pixels", ArrayType(IntegerType())),
    ]
)


def decode_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    height: int = 8,
    width: int = 8,
    fake: bool = True,
) -> DataFrame:
    """binary → (id, width, height, mean_pixel, pixels) via mapInPandas.

    ``fake=True`` uses the deterministic md5 pseudo-decoder; real decode
    is stubbed (no PIL/opencv in this environment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv, which are not "
                    "available in this container; pass fake=True for the "
                    "deterministic stand-in"
                )
            out = {
                "id": pdf[id_col].astype("int64"),
                "width": width,
                "height": height,
                "mean_pixel": [],
                "pixels": [],
            }
            for payload in pdf[binary_col]:
                px = _fake_pixels(bytes(payload) if payload is not None else b"", height, width)
                out["mean_pixel"].append(float(px.mean()))
                out["pixels"].append([int(x) for x in px.ravel()])
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(run, schema=_DECODE_SCHEMA)


_FEAT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """binary → unit-norm feature vector (md5-derived stand-in for a real
    vision encoder; identical plumbing: Arrow batches in, vectors out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a vision model; "
                    "pass fake=True for the deterministic stand-in"
                )
            feats = []
            for payload in pdf[binary_col]:
                px = _fake_pixels(
                    bytes(payload) if payload is not None else b"", 1, dim
                ).astype(np.float64)
                n = np.linalg.norm(px)
                feats.append(list(px.ravel() / n if n else px.ravel()))
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "feature": feats})

    return df.select(id_col, binary_col).mapInPandas(run, schema=_FEAT_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n: int = 10,
    max_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """binary video → one row per sampled frame.  The fake decoder slices
    the payload deterministically; a real one would ffmpeg-demux."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real video demux requires ffmpeg; pass fake=True"
                )
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                for fi in range(max_frames):
                    start = fi * every_n
                    if start >= max(len(data), 1):
                        break
                    ids.append(int(rid))
                    idxs.append(fi)
                    frames.append(data[start : start + every_n])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(run, schema=_FRAME_SCHEMA)
