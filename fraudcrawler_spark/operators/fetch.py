"""Fetch + extract stage — J5/S3/X2-X6/F3 (SURVEY.md §2).

The reference fetches each url over HTTP (zyte.py:50-98); our engine's
"fetch" is a LEFT OUTER equi-join of the scheduled urls against the
``pages`` corpus (missing page == fetch failure: the reference catches the
exception and forwards the row unenriched and unflagged,
orchestrator.py:232-235 — left-outer + null extracts reproduces that).

Cost discipline at 100 TB:
- only ACTIVE (unflagged) rows join against pages — flagged rows bypass
  the join and the pandas kernel entirely (reference orchestrator.py:207),
- ``html:binary`` is projected only into this stage, nowhere else,
- extraction is ONE Arrow-batched struct-returning pandas UDF.

Probability flag (F3, zyte.py:100-117 + orchestrator.py:227-230):
flag iff probability IS NOT NULL AND probability <= threshold (strict
``>`` keeps). Missing probability leaves the row unflagged with fields
intact (see functions/extract.py docstring for the reference quirk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fraudcrawler_spark.config import PROBABILITY_THRESHOLD, STAGE_PROBABILITY
from fraudcrawler_spark.functions.extract import extract_listing

EXTRACT_COLS = [
    "product_name",
    "product_price",
    "product_description",
    "product_images",
    "probability",
    "extracted_text",
    "links",
]


def fetch_extract(
    items: DataFrame,
    pages: DataFrame,
    threshold: float = PROBABILITY_THRESHOLD,
    keep_links: bool = True,
    broadcast_urls: bool = True,
) -> DataFrame:
    """items(url, filtered, ...) → + extracted product fields + prob flag.

    Shuffle discipline: ``html:binary`` (the KB-scale payload) never
    crosses an exchange. The scheduled url-set — small relative to the
    pages table — is broadcast into a LEFT SEMI prune of pages, the
    extract kernel runs on the pruned pages IN PLACE (same partitions as
    the scan), and only the extracted columns join back to the items.
    With ``broadcast_urls=False`` (rounds too big to broadcast) the semi
    join shuffles url keys only; at warehouse scale, bucket both tables
    by crc32(url) for a storage-partitioned join instead.
    """
    active = items.where(~F.col("filtered"))
    # flagged rows never reach the fetcher (reference orchestrator.py:207)
    flagged = items.where(F.col("filtered")).withColumn(
        "fetch_status", F.lit("skipped")
    )

    # no distinct() here: LEFT SEMI output is per PAGES row (≥1 match),
    # so duplicate keys cannot duplicate output — and unflagged rows are
    # unique by url anyway (dedup stage flags later dups). Skipping it
    # saves a full shuffle of the scheduled set every round.
    keys = active.select("url")
    if broadcast_urls:
        keys = F.broadcast(keys)
    hit_pages = pages.select("url", "html", "lang", "warc_ts").join(
        keys, "url", "left_semi"
    )
    extracted_pages = (
        hit_pages.withColumn("_x", extract_listing(F.col("html")))
        .drop("html")
        .select(
            "url", "lang", "warc_ts",
            *[F.col(f"_x.{c}").alias(c) for c in EXTRACT_COLS],
        )
        .withColumn("_page_hit", F.lit(True))
    )
    extracted = active.join(extracted_pages, "url", "left").withColumn(
        # retry-exhaustion failure surface (reference zyte.py:75-97,
        # settings.py:4-5: N retries then the row is forwarded unenriched,
        # orchestrator.py:232-235) — 'miss' is that terminal state, and is
        # distinguishable from a fetched page with no product markup
        "fetch_status",
        F.when(F.col("_page_hit").isNotNull(), F.lit("hit")).otherwise(
            F.lit("miss")
        ),
    ).drop("_page_hit")
    prob_flagged = F.col("probability").isNotNull() & (
        F.col("probability") <= F.lit(threshold)
    )
    extracted = extracted.withColumn(
        "filtered_at_stage",
        F.when(prob_flagged, F.lit(STAGE_PROBABILITY)).otherwise(
            F.col("filtered_at_stage")
        ),
    ).withColumn("filtered", F.col("filtered") | prob_flagged)

    out = extracted.unionByName(flagged, allowMissingColumns=True)
    if not keep_links:
        out = out.drop("links")
    return out
