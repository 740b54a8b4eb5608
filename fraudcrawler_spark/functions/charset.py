"""Charset sniffing + mojibake repair — the ftfy-style decode stage every
web-scale text pipeline runs before tokenization.

Real crawl payloads arrive as bytes in a mix of UTF-8, windows-1252
(the de-facto "latin-1" of the web), and double-encoded mojibake
(UTF-8 bytes mis-decoded as cp1252 and re-encoded — the classic
``Ã¼`` for ``ü``). The kernel recovers (detected encoding, clean text)
from the BYTES alone:

1. try strict UTF-8; on failure → decode cp1252 (the HTML5 fallback);
2. if UTF-8 succeeds but the text carries mojibake lead bytes
   (``Ã``/``Â``/``â``/``€``-class sequences) AND re-encoding as cp1252
   then re-decoding as UTF-8 round-trips cleanly → repair (ftfy's core
   heuristic, minus its language model).

Known ambiguity, documented rather than hidden: genuine UTF-8 text that
both contains ``Ã``-class characters and happens to re-decode cleanly is
indistinguishable from mojibake without a language model — ftfy breaks
the tie with character-frequency scoring; this kernel repairs (the
choice that is right for web corpora, where double-encoding vastly
outnumbers intentional ``Ã`` sequences).

Per-row Python is inherent here (bytes→str codec work has no JVM
expression), so the kernel is Arrow-batched via mapInPandas like the
other multimodal decoders — and it runs once per document at ingest,
not in any join/agg hot path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_MOJIBAKE_MARKS = ("Ã", "Â", "â€", "€™", "Ã¢")


def sniff_and_decode(data: bytes) -> tuple[str, str]:
    """(detected encoding label, decoded/repaired text)."""
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        return "cp1252", data.decode("cp1252", errors="replace")
    if any(m in text for m in _MOJIBAKE_MARKS):
        try:
            fixed = text.encode("cp1252").decode("utf-8")
            return "mojibake", fixed
        except (UnicodeEncodeError, UnicodeDecodeError):
            pass
    return "utf8", text


CHARSET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("detected_enc", StringType()),
        StructField("text", StringType()),
    ]
)


def decode_text_bytes(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """(doc_id, <raw bytes>) → (doc_id, detected_enc, text). Only the id
    and the bytes are read — any charset metadata the table carries is
    deliberately ignored (crawl Content-Type headers lie ~5% of the
    time; W3C/i18n measurement), which is why production pipelines sniff."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "detected_enc": [], "text": []}
            for doc_id, raw in zip(pdf["doc_id"], pdf[binary_col]):
                enc, text = sniff_and_decode(bytes(raw))
                out["doc_id"].append(int(doc_id))
                out["detected_enc"].append(enc)
                out["text"].append(text)
            yield pd.DataFrame(out)

    return df.select("doc_id", binary_col).mapInPandas(gen, CHARSET_SCHEMA)


PAYLOAD_TEXT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("http_status", LongType()),
        StructField("detected_enc", StringType()),
        StructField("html", StringType()),
    ]
)


def decode_payload_text(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """URL-keyed twin of :func:`decode_text_bytes` for the WARC ingest
    path: (url, http_status, <payload bytes>) → (url, http_status,
    detected_enc, html). Same sniff-and-repair kernel, same Arrow
    batching; the key rides through the batch untouched so the stage
    composes inside the raw-bytes→clean-text→frontier DAG
    (registry.q_crawl_ingest_round) without a join back."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "http_status": [], "detected_enc": [],
                   "html": []}
            for url, status, raw in zip(
                pdf["url"], pdf["http_status"], pdf[binary_col]
            ):
                enc, text = sniff_and_decode(bytes(raw))
                out["url"].append(url)
                out["http_status"].append(int(status))
                out["detected_enc"].append(enc)
                out["html"].append(text)
            yield pd.DataFrame(out)

    return df.select("url", "http_status", binary_col).mapInPandas(
        gen, PAYLOAD_TEXT_SCHEMA
    )
