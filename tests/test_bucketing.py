"""Bucketed-pages fetch join: the 100-TB pages table must join
exchange-free once bucketed by url (the shuffle-fallback path's scale
story — broadcast rounds never shuffled pages to begin with)."""

import re

from pyspark.sql import functions as F

from fraudcrawler_spark.bucketing import bucketed_pages
from fraudcrawler_spark.operators.fetch import fetch_extract
from fraudcrawler_spark.pipeline import read_corpus


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_pages_join_no_exchange_on_pages_side(spark, corpus_dir):
    t = read_corpus(spark, corpus_dir)
    bp = bucketed_pages(spark, t["pages"], table="t_pages_bucketed", n_buckets=8)

    items = (
        t["pages"].select("url").limit(500)
        .withColumn("filtered", F.lit(False))
        .withColumn("filtered_at_stage", F.lit(None).cast("string"))
    )
    # the non-broadcast path — the one bucketing exists for
    f = fetch_extract(items, bp, broadcast_urls=False)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(spark, f)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # the scan itself carries the bucket spec
    assert "Bucketed: true" in p, p[:500]
    # pages side enters the semi join with NO Exchange above its scan:
    # every Exchange block in the plan is url-key-only (scheduled side) —
    # none carries html
    for block in re.split(r"\n\(\d+\) ", p):
        if block.split("\n")[0].strip().endswith("Exchange"):
            assert "html" not in block, block.split("\n")[0]
    # exactly one shuffle reaches the semi join (the items side); the
    # bucketed side contributes zero
    semi = p.split("LeftSemi")[0]
    assert len(re.findall(r"\(\d+\) Exchange", semi)) <= 1


def test_bucketed_results_equal_plain(spark, corpus_dir):
    t = read_corpus(spark, corpus_dir)
    bp = spark.table("t_pages_bucketed")
    items = (
        t["pages"].select("url").limit(200)
        .withColumn("filtered", F.lit(False))
        .withColumn("filtered_at_stage", F.lit(None).cast("string"))
    )
    a = sorted(map(tuple, fetch_extract(items, t["pages"]).collect()))
    b = sorted(map(tuple, fetch_extract(items, bp, broadcast_urls=False).collect()))
    assert a == b


def test_orphan_location_cleanup_qualified_and_file_uri(spark, tmp_path):
    """r3 advice (low): the orphan-directory cleanup must resolve the
    managed location correctly for file:// warehouse URIs and qualified
    db.tbl names (<db>.db/tbl, not db.tbl/), or a fresh session's
    saveAsTable dies with LOCATION_ALREADY_EXISTS."""
    import os

    from fraudcrawler_spark.bucketing import _managed_location, write_bucketed

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh_path = wh.removeprefix("file:")
    while wh_path.startswith("//"):
        wh_path = wh_path[1:]

    # unqualified: catalog-resolved location must be usable after a fake
    # orphan (simulates a prior session's leftover directory)
    df = spark.range(10).withColumnRenamed("id", "url")
    tbl = "orphan_probe"
    orphan = os.path.join(wh_path, tbl)
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("stale")
    write_bucketed(spark, df, tbl, ("url",), 2)
    assert spark.table(tbl).count() == 10
    # the resolved location is a real path (no 'file:'-prefix residue)
    loc = _managed_location(spark, tbl)
    assert loc and os.path.isdir(loc) and "file:" not in loc

    # qualified name: derived path must be <db>.db/<tbl>
    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    try:
        got = _managed_location(spark, "bdb.some_tbl")
        assert got is not None and got.endswith(os.path.join("bdb.db", "some_tbl"))
        write_bucketed(spark, df, "bdb.qtbl", ("url",), 2)
        assert spark.table("bdb.qtbl").count() == 10
        # second write over the same name must succeed (cleanup worked)
        write_bucketed(spark, df, "bdb.qtbl", ("url",), 2)
        assert spark.table("bdb.qtbl").count() == 10
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
