"""Structured Streaming variant of the ingest path (SURVEY.md §2.9).

The chosen production architecture is iterated batch rounds (stage
barriers = Iceberg-style commits, matching the reference's sentinel
barriers, orchestrator.py:525-626) — but the same operators compose as a
continuous pipeline for capture-as-it-arrives deployments:

  pages file stream → canonical_url → watermark(warc_ts)
      → dropDuplicatesWithinWatermark(url)          (J3 streaming analog)
      → extract kernel + probability flag           (S3/X2-X6/F3)
      → parquet sink (exactly-once via checkpoint)

plus two aggregation streams:
  - tumbling-window per-host page counts (metrics table analog), and
  - a custom stateful per-host rate tracker via applyInPandasWithState
    (the schedule_cell state analog: running totals + last-seen ts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from fraudcrawler_spark.config import PROBABILITY_THRESHOLD, STAGE_PROBABILITY
from fraudcrawler_spark.functions.extract import extract_listing
from fraudcrawler_spark.functions.urls import canonical_host_expr

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based page stream (new parquet files = newly captured pages)."""
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def ingest_query(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    threshold: float = PROBABILITY_THRESHOLD,
):
    """Dedup + extract + flag stream → parquet sink; exactly-once via the
    checkpoint (late duplicates beyond the watermark are the batch
    engine's cross-round Bloom store's job — see frontier/seen.py)."""
    pages = stream_pages(spark, input_dir)
    deduped = (
        pages.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    extracted = (
        deduped.withColumn("host", canonical_host_expr(F.col("url")))
        .withColumn("_x", extract_listing(F.col("html")))
        .select(
            "url", "host", "warc_ts", "lang",
            F.col("_x.product_name").alias("product_name"),
            F.col("_x.product_price").alias("product_price"),
            F.col("_x.probability").alias("probability"),
            F.col("_x.extracted_text").alias("extracted_text"),
        )
    )
    prob_flagged = F.col("probability").isNotNull() & (
        F.col("probability") <= F.lit(threshold)
    )
    out = extracted.withColumn("filtered", prob_flagged).withColumn(
        "filtered_at_stage",
        F.when(prob_flagged, F.lit(STAGE_PROBABILITY)).otherwise(
            F.lit(None).cast("string")
        ),
    )
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def host_window_counts(spark: SparkSession, input_dir: str,
                       window: str = "1 hour",
                       watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window per-host page counts (streaming metrics analog)."""
    pages = stream_pages(spark, input_dir)
    return (
        pages.withColumn("host", canonical_host_expr(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_pages",
        )
    )


_RATE_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("total_pages", LongType()),
        StructField("last_seen", TimestampType()),
    ]
)
_RATE_STATE = StructType([StructField("total", LongType())])


def _rate_fn(key, pdfs, state: GroupState):
    """Running per-host totals — the stateful scheduling-cell analog."""
    total = state.get[0] if state.exists else 0
    last = None
    for pdf in pdfs:
        total += len(pdf)
        m = pdf["warc_ts"].max()
        last = m if last is None or m > last else last
    state.update((total,))
    yield pd.DataFrame(
        {"host": [key[0]], "total_pages": [total], "last_seen": [last]}
    )


def host_rate_tracker(spark: SparkSession, input_dir: str) -> DataFrame:
    """applyInPandasWithState custom stateful operator: per-host running
    page totals surviving across micro-batches (GroupState)."""
    pages = stream_pages(spark, input_dir)
    return (
        pages.withColumn("host", canonical_host_expr(F.col("url")))
        .select("host", "warc_ts")
        .groupBy("host")
        .applyInPandasWithState(
            _rate_fn,
            outputStructType=_RATE_OUT,
            stateStructType=_RATE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def host_session_counts(spark: SparkSession, input_dir: str,
                        gap: str = "30 minutes",
                        watermark: str = "10 minutes") -> DataFrame:
    """Native session-window aggregation: per-host page counts over
    gap-based sessions (`F.session_window` — the streaming twin of the
    batch sessionizer conformance_events.q_sessionize; same 30-minute
    inactivity semantics, state expired by the watermark)."""
    pages = stream_pages(spark, input_dir)
    return (
        pages.withColumn("host", canonical_host_expr(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.session_window("warc_ts", gap).alias("w"), "host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "host",
            "n_pages",
        )
    )


# --------------------------------------------------------------------------
# stream-stream freshness join (sitemap lastmod × archived snapshot)
# --------------------------------------------------------------------------

SITEMAPS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("sitemap_xml", StringType()),
    ]
)


def fresh_join_query(
    spark: SparkSession,
    pages_dir: str,
    sitemaps_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 days",
    horizon_days: int = 365,
):
    """STREAM-STREAM event-time join: arriving sitemap entries (lastmod
    = their event time) against arriving archive snapshots (warc_ts) —
    the continuous form of the batch recrawl_schedule: as either side
    lands, matched (entry, snapshot) rows emit with the staleness gap.

    Both sides carry a watermark and the join condition bounds warc_ts
    to ±horizon around lastmod, so Spark can EXPIRE buffered state —
    the pair of requirements that makes an append-mode stream-stream
    inner join runnable indefinitely (unbounded state otherwise; see
    Structured Streaming's join-with-watermark contract). At production
    scale each side is url-keyed; state is hash-partitioned on the join
    key and bounded by horizon × arrival rate.
    """
    sm = (
        spark.readStream.schema(SITEMAPS_SCHEMA).parquet(sitemaps_dir)
    )
    from fraudcrawler_spark.sources.sitemap import parse_sitemaps

    ents = (
        parse_sitemaps(sm)
        .withColumn("lastmod_ts", F.to_timestamp("lastmod"))
        .where(F.col("lastmod_ts").isNotNull())
        .withWatermark("lastmod_ts", watermark)
    )
    pg = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
        .select("url", "warc_ts")
        .withWatermark("warc_ts", watermark)
    )
    j = ents.join(
        pg,
        (ents["loc"] == pg["url"])
        & (pg["warc_ts"] >= ents["lastmod_ts"] - F.expr(f"INTERVAL {horizon_days} DAYS"))
        & (pg["warc_ts"] <= ents["lastmod_ts"] + F.expr(f"INTERVAL {horizon_days} DAYS")),
        "inner",
    ).select(
        "host",
        "loc",
        "lastmod",
        F.to_date("warc_ts").cast("string").alias("snap_date"),
        F.datediff(F.to_date("lastmod_ts"), F.to_date("warc_ts"))
        .cast("long")
        .alias("days_stale"),
    )
    return (
        j.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
