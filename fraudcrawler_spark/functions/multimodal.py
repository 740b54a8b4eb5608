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
