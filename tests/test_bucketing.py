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
