"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row.

Decode coverage is honest about the environment: formats decodable with
numpy + the stdlib are decoded FOR REAL — netpbm images (P5/PGM, P6/PPM:
header parse + ``np.frombuffer`` + nearest-neighbor resize), WAV
audio (stdlib ``wave`` + ``np.frombuffer``), tiny-image features
(decode → g×g downsample → L2 normalize) and the netpbm-concat video
container (back-to-back netpbm frames; real per-frame demux by header
length).  Formats that require
external codecs (JPEG/PNG via PIL/opencv, video via ffmpeg — not in this
container) are stubbed: with ``fake=True`` a deterministic md5-derived
stand-in is produced (so the Spark-side plumbing — schema, batching,
partitioning — is fully real and testable); with ``fake=False`` a
clearly-marked NotImplementedError surfaces unless the payload is a
format the real decoder handles.

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
    "decode_audio_wav",
    "image_features",
    "sample_video_frames",
    "decode_netpbm_bytes",
    "demux_netpbm_frames",
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


def decode_netpbm_bytes(payload: bytes) -> np.ndarray | None:
    """REAL image decode for binary netpbm: P5 (PGM, grayscale) and P6
    (PPM, RGB — averaged to grayscale).  Header parse + np.frombuffer;
    returns an (h, w) uint8 array, or None if not netpbm."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    rgb = payload[:2] == b"P6"
    # header: magic, width, height, maxval — whitespace separated,
    # '#' comments allowed until the maxval terminator
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        ch = payload[i : i + 1]
        if ch == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    n = w * h * (3 if rgb else 1)
    raw = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    if rgb:
        img = raw.reshape(h, w, 3).astype(np.uint16)
        img = ((img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3).astype(np.uint8)
    else:
        img = raw.reshape(h, w)
    if maxval != 255 and maxval > 0:
        img = (img.astype(np.float64) * 255.0 / maxval).astype(np.uint8)
    return img


def demux_netpbm_frames(payload: bytes) -> list[bytes]:
    """REAL frame demux for the netpbm-concat container: back-to-back
    P5/P6 frames (the MJPEG idea with a codec this environment CAN
    parse).  Walks the payload frame by frame — header parse gives each
    frame's exact byte length — and returns the per-frame payload
    slices.  Returns [] if the payload is not netpbm-concat."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload) and payload[pos : pos + 2] in (b"P5", b"P6"):
        rgb = payload[pos : pos + 2] == b"P6"
        fields: list[int] = []
        i = pos + 2
        while len(fields) < 3 and i < len(payload):
            ch = payload[i : i + 1]
            if ch == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
            elif ch.isspace():
                i += 1
            else:
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                fields.append(int(payload[i:j]))
                i = j
        i += 1  # single whitespace after maxval
        if len(fields) < 3:
            break
        w, h, _ = fields
        end = i + w * h * (3 if rgb else 1)
        if end > len(payload):
            break
        frames.append(payload[pos:end])
        pos = end
    return frames


def _nn_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize by index sampling — no image library."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[np.ix_(ys, xs)]


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

    ``fake=True`` uses the deterministic md5 pseudo-decoder for every
    payload.  ``fake=False`` REALLY decodes netpbm (P5/P6) payloads —
    header parse + frombuffer + nearest-neighbor resize, numpy only —
    and raises NotImplementedError for formats that need external codecs
    (JPEG/PNG: PIL/opencv are not in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": pdf[id_col].astype("int64"),
                "width": width,
                "height": height,
                "mean_pixel": [],
                "pixels": [],
            }
            for payload in pdf[binary_col]:
                data = bytes(payload) if payload is not None else b""
                if fake:
                    px = _fake_pixels(data, height, width)
                else:
                    img = decode_netpbm_bytes(data)
                    if img is None:
                        raise NotImplementedError(
                            "real decode supports netpbm (P5/P6) only in "
                            "this container — JPEG/PNG need PIL/opencv; "
                            "pass fake=True for the deterministic stand-in"
                        )
                    px = _nn_resize(img, height, width)
                out["mean_pixel"].append(float(px.mean()))
                out["pixels"].append([int(x) for x in px.ravel()])
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(run, schema=_DECODE_SCHEMA)


_WAV_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)


def decode_audio_wav(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """REAL audio decode for WAV payloads (stdlib ``wave`` +
    ``np.frombuffer`` — no external codec): per-clip sample rate,
    channel count, length, RMS and peak amplitude (normalized to
    [-1, 1]).  Arrow-batched, narrow, no shuffle."""
    import io
    import wave

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "sample_rate", "n_channels", "n_samples", "rms", "peak")}
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                with wave.open(io.BytesIO(data)) as wf:
                    sw = wf.getsampwidth()
                    frames = wf.readframes(wf.getnframes())
                dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
                if dtype is None:
                    raise NotImplementedError(f"unsupported WAV sample width {sw}")
                x = np.frombuffer(frames, dtype=dtype).astype(np.float64)
                if sw == 1:
                    x = (x - 128.0) / 128.0
                else:
                    x = x / float(2 ** (8 * sw - 1))
                out["id"].append(int(rid))
                with wave.open(io.BytesIO(data)) as wf:
                    out["sample_rate"].append(wf.getframerate())
                    out["n_channels"].append(wf.getnchannels())
                out["n_samples"].append(int(len(x)))
                out["rms"].append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
                out["peak"].append(float(np.abs(x).max()) if len(x) else 0.0)
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(run, schema=_WAV_SCHEMA)


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
    """binary → unit-norm feature vector.

    ``fake=False`` extracts REAL features from netpbm payloads: decode
    (:func:`decode_netpbm_bytes`), nearest-neighbor downsample to a
    g×g intensity grid (g = sqrt(dim)), flatten, L2-normalize — the
    classic tiny-image descriptor, zero external codecs.  Non-netpbm
    payloads raise a clearly-marked NotImplementedError (a real vision
    encoder is not in this container).  ``fake=True`` keeps the
    md5-derived stand-in with identical plumbing: Arrow batches in,
    vectors out."""
    g = int(round(dim ** 0.5))
    if not fake and g * g != dim:
        raise ValueError(f"real features need a square dim, got {dim}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[binary_col]:
                data = bytes(payload) if payload is not None else b""
                if fake:
                    px = _fake_pixels(data, 1, dim).astype(np.float64)
                else:
                    img = decode_netpbm_bytes(data)
                    if img is None:
                        raise NotImplementedError(
                            "real feature extraction beyond netpbm requires "
                            "a vision model; pass fake=True for the "
                            "deterministic stand-in"
                        )
                    px = _nn_resize(img, g, g).astype(np.float64)
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
    """binary video → one row per sampled frame.

    ``fake=False`` REALLY demuxes the netpbm-concat container
    (:func:`demux_netpbm_frames`: back-to-back P5/P6 frames, each
    frame's length read from its own header) and emits every
    ``every_n``-th frame — ``frame_idx`` is the index IN THE CONTAINER
    (0, every_n, 2·every_n, …), each ``frame`` a standalone decodable
    netpbm payload.  Containers that need ffmpeg (mp4/webm/…) raise a
    clearly-marked NotImplementedError.  ``fake=True`` keeps the
    deterministic byte-slice stand-in with identical plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload) if payload is not None else b""
                if fake:
                    for fi in range(max_frames):
                        start = fi * every_n
                        if start >= max(len(data), 1):
                            break
                        ids.append(int(rid))
                        idxs.append(fi)
                        frames.append(data[start : start + every_n])
                    continue
                all_frames = demux_netpbm_frames(data)
                if not all_frames:
                    raise NotImplementedError(
                        "real demux beyond netpbm-concat requires ffmpeg; "
                        "pass fake=True for the byte-slice stand-in"
                    )
                for k in range(max_frames):
                    fi = k * every_n
                    if fi >= len(all_frames):
                        break
                    ids.append(int(rid))
                    idxs.append(fi)
                    frames.append(all_frames[fi])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(run, schema=_FRAME_SCHEMA)
