"""Multimodal binary-column plumbing — decode / feature-extract stages.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is a clearly-marked deterministic stub —
but the Spark-side plumbing is real and tested: schema, Arrow batching
via mapInPandas (iterator form, so one Python worker streams many
batches), and partition behavior are exactly what a real decoder would
use; swapping ``_stub_decode`` for a PIL call is a one-line change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
    ]
)


def _stub_decode(data: bytes) -> tuple[float, float]:
    """STUB: deterministic stand-in for image/audio decoding.

    A real deployment would decode the payload (PIL.Image.open /
    soundfile.read) and compute features; unavailable here, so features
    are derived from the raw bytes deterministically.
    """
    if not data:
        raise NotImplementedError("empty payload — no real decoder in this environment")
    n = len(data)
    mean = sum(data[:: max(1, n // 256)]) / len(data[:: max(1, n // 256)])
    var = sum((b - mean) ** 2 for b in data[:: max(1, n // 256)]) / len(
        data[:: max(1, n // 256)]
    )
    return float(mean), float(var ** 0.5)


def decode_binary_meta(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas decode stage: (url, <binary>) → typed metadata+features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "n_bytes": [], "content_hash": [],
                    "feat_mean": [], "feat_std": []}
            for url, raw in zip(pdf["url"], pdf[binary_col]):
                data = bytes(raw) if raw is not None else b""
                rows["url"].append(url)
                rows["n_bytes"].append(len(data))
                rows["content_hash"].append(hashlib.md5(data).hexdigest())
                try:
                    mean, std = _stub_decode(data)
                except NotImplementedError:
                    mean, std = None, None
                rows["feat_mean"].append(mean)
                rows["feat_std"].append(std)
            yield pd.DataFrame(rows)

    return df.select("url", binary_col).mapInPandas(gen, META_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def _stub_resize(data: bytes, w: int, h: int) -> bytes:
    """STUB: stand-in for PIL Image.resize — deterministic byte
    downsample to exactly w*h bytes (a real deployment decodes, resizes,
    re-encodes; unavailable here)."""
    if not data:
        raise NotImplementedError("empty payload — no real codec in this environment")
    step = max(1, len(data) // (w * h))
    out = data[::step][: w * h]
    return out + b"\x00" * (w * h - len(out))


def resize_images(df: DataFrame, binary_col: str = "html",
                  width: int = 32, height: int = 32) -> DataFrame:
    """mapInPandas resize stage: 1 row in → 1 row out, binary in AND out —
    the shape a real thumbnailer has (Arrow binary both directions)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "width": [], "height": [], "resized": []}
            for url, raw in zip(pdf["url"], pdf[binary_col]):
                data = bytes(raw) if raw is not None else b""
                try:
                    resized = _stub_resize(data, width, height)
                except NotImplementedError:
                    resized = None
                out["url"].append(url)
                out["width"].append(width)
                out["height"].append(height)
                out["resized"].append(resized)
            yield pd.DataFrame(out)

    return df.select("url", binary_col).mapInPandas(gen, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("frame_idx", LongType()),
        StructField("ts_sec", DoubleType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(df: DataFrame, binary_col: str = "html",
                  every_n: int = 8, fps: float = 25.0) -> DataFrame:
    """mapInPandas frame-sampling stage: 1 video row in → N frame rows out
    (the batch-SHAPE change is the point — a UDTF-like fan-out inside the
    Arrow batch, which is how ffmpeg-style samplers plug into Spark).

    STUB decoder: frame count/content derived deterministically from the
    payload bytes (1 fake frame per 512 bytes, keep every ``every_n``-th);
    a real deployment replaces the inner loop with an ffmpeg/PyAV read.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "frame_idx": [], "ts_sec": [],
                   "frame_bytes": [], "frame_hash": []}
            for url, raw in zip(pdf["url"], pdf[binary_col]):
                data = bytes(raw) if raw is not None else b""
                n_frames = len(data) // 512
                for i in range(0, n_frames, every_n):
                    chunk = data[i * 512:(i + 1) * 512]
                    out["url"].append(url)
                    out["frame_idx"].append(i)
                    out["ts_sec"].append(i / fps)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.select("url", binary_col).mapInPandas(gen, FRAME_SCHEMA)
