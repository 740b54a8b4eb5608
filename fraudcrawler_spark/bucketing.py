"""Bucketed (storage-partitioned) tables for shuffle-free fetch joins.

At 100 TB the pages table is the single largest exchange risk: every
crawl round semi-joins the scheduled url-set against it. Rounds small
enough to broadcast avoid the exchange already (operators/fetch.py);
rounds above ``fetch_broadcast_max_urls`` fall back to a shuffle semi
join — and THAT shuffle is the one bucketing removes. A pages table
written with ``bucketBy(N, "url")`` + ``sortBy("url")`` is physically
pre-partitioned and pre-sorted on the join key, so the join planner
reads it exchange-free (and sort-free): only the (much smaller)
scheduled side shuffles, into N partitions that line up with the
buckets.

This is the Spark-native analog of the reference deployment note in
BENCH.md ("co-partitionable by bucketing both sides on crc32(url)") and
of Iceberg's ``bucket(N, url)`` partition transform — the catalog layer
(catalog.py) uses the same url-hash routing for the seen store.

Bucketing metadata lives in the session catalog (saveAsTable), which is
the one API Spark exposes for it — plain ``.parquet(path)`` writes
cannot carry bucket specs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...] = ("url",),
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table in the session
    catalog. ``n_buckets`` should match the cluster's target parallelism
    for the join stage (one task per bucket on the bucketed side)."""
    # the in-memory catalog dies with the session but the managed
    # LOCATION under spark.sql.warehouse.dir does not: a fresh session
    # that re-creates the table would hit LOCATION_ALREADY_EXISTS, so
    # drop both the (possibly unknown) table and any orphaned directory
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (spark.table, not
    a path read — path reads drop the bucket metadata)."""
    return spark.table(table)


def bucketed_pages(
    spark: SparkSession,
    pages: DataFrame,
    table: str = "pages_bucketed",
    n_buckets: int = 32,
) -> DataFrame:
    """One-time preparation of the pages table for exchange-free fetch
    joins: bucket + sort by url, return the catalog-backed DataFrame to
    pass as ``fetch_extract(..., pages=...)``."""
    write_bucketed(spark, pages, table, ("url",), n_buckets)
    return read_bucketed(spark, table)
