"""extract_listing — the fetch/extract kernel (Zyte analog).

Reference semantics (/root/reference/fraudcrawler/scraping/zyte.py:119-194,
orchestrator.py:207-235): per fetched page extract product name / price /
description / images (main first) / probability, null-safe at every level.
Quirk preserved: when the probability tag is absent the reference assigns
name..images sequentially and then ``float(None)`` raises, leaving
``probability`` unset and the row UNFLAGGED (orchestrator.py:211-235) —
so missing probability ⇒ fields present, probability null, filtered
unchanged. The probability FLAG fires only for present-and-<=threshold
values (zyte.py:100-117 reachable branch).

Implemented as a single Arrow-batched pandas UDF returning a struct —
one Python round-trip for all six outputs; the byte-identical
``extracted_text`` invariant (BASELINE.json input_hint) is checked
against the stored ``pages.text`` column in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from fraudcrawler_spark.datagen import extract_fields, extract_links, html_to_text

LISTING_SCHEMA = StructType(
    [
        StructField("product_name", StringType()),
        StructField("product_price", StringType()),
        StructField("product_description", StringType()),
        StructField("product_images", ArrayType(StringType())),
        StructField("probability", DoubleType()),
        StructField("extracted_text", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)


@pandas_udf(LISTING_SCHEMA)
def extract_listing(html: pd.Series) -> pd.DataFrame:
    """binary html → (product fields, probability, text, out-links)."""
    out = {k: [] for k in (
        "product_name", "product_price", "product_description",
        "product_images", "probability", "extracted_text", "links",
    )}
    for raw in html:
        if raw is None:
            for k in out:
                out[k].append(None)
            continue
        doc = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else str(raw)
        fields = extract_fields(doc)
        out["product_name"].append(fields["product_name"])
        out["product_price"].append(fields["product_price"])
        out["product_description"].append(fields["product_description"])
        out["product_images"].append(fields["product_images"])
        out["probability"].append(fields["probability"])
        out["extracted_text"].append(html_to_text(doc))
        out["links"].append(extract_links(doc))
    return pd.DataFrame(out)
