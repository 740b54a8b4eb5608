"""Structured Streaming ingest: dedup-within-watermark, exactly-once
resume across micro-batch runs, windowed metrics, stateful host tracker."""

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fraudcrawler_spark.datagen import generate_pages
from fraudcrawler_spark.streaming.ingest import (
    host_rate_tracker,
    host_window_counts,
    ingest_query,
)


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    d = {
        "in": str(base / "in"),
        "out": str(base / "out"),
        "ckpt": str(base / "ckpt"),
    }
    os.makedirs(d["in"])
    return d


def _write_batch(pages: pd.DataFrame, path: str) -> None:
    pages.to_parquet(path, index=False, coerce_timestamps="us",
                     allow_truncated_timestamps=True)


def test_ingest_dedup_and_resume(spark, stream_dirs):
    pages = generate_pages(300, n_hosts=10)
    batch1 = pages.iloc[:200]
    # batch2 overlaps batch1 by 50 urls — the stream must emit each url once
    batch2 = pages.iloc[150:300]

    _write_batch(batch1, os.path.join(stream_dirs["in"], "b1.parquet"))
    q = ingest_query(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    assert q.trigger(availableNow=True).start().awaitTermination(120)

    out1 = spark.read.parquet(stream_dirs["out"])
    assert out1.count() == 200
    assert out1.select("url").distinct().count() == 200

    _write_batch(batch2, os.path.join(stream_dirs["in"], "b2.parquet"))
    q = ingest_query(spark, stream_dirs["in"], stream_dirs["out"], stream_dirs["ckpt"])
    assert q.trigger(availableNow=True).start().awaitTermination(120)

    out2 = spark.read.parquet(stream_dirs["out"])
    # checkpoint resume: b1 not reprocessed; within-watermark dups dropped
    assert out2.select("url").distinct().count() == 300
    # extraction ran in-stream: flags + text present
    assert out2.where(F.col("filtered")).count() > 0
    sample = out2.where(F.col("extracted_text").isNotNull()).limit(5).collect()
    assert all(r["extracted_text"] for r in sample)


def test_host_window_counts(spark, stream_dirs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("winout"))
    ckpt = str(tmp_path_factory.mktemp("winckpt"))
    agg = host_window_counts(spark, stream_dirs["in"])
    assert (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
        is True
    )
    got = spark.read.parquet(out)
    # appended windows closed by the watermark; counts are per (window, host)
    assert got.columns == ["window_start", "host", "n_pages"]
    assert got.count() > 0
    assert got.groupBy("window_start", "host").count().where(F.col("count") > 1).count() == 0


def test_host_rate_tracker_state(spark, stream_dirs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rateout"))
    ckpt = str(tmp_path_factory.mktemp("rateckpt"))
    tracked = host_rate_tracker(spark, stream_dirs["in"])
    assert (
        tracked.writeStream.foreachBatch(
            lambda df, _id: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
        is True
    )
    got = spark.read.parquet(out).toPandas()
    assert set(got.columns) == {"host", "total_pages", "last_seen"}
    # totals equal the true per-host file counts (both input files, 350 rows)
    pages = pd.concat([
        pd.read_parquet(os.path.join(stream_dirs["in"], f))
        for f in sorted(os.listdir(stream_dirs["in"]))
    ])
    import re
    true_counts = (
        pages["url"].map(lambda u: re.sub(r"^https?://(www\.)?", "", u).split("/")[0])
        .value_counts()
    )
    # state accumulates across micro-batches: take the max total per host
    final = got.groupby("host")["total_pages"].max()
    for host, n in true_counts.items():
        assert final.get(host, 0) == n, host


def test_session_window_counts(spark, tmp_path_factory):
    from fraudcrawler_spark.streaming.ingest import host_session_counts

    base = tmp_path_factory.mktemp("sess_stream")
    ind, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    os.makedirs(ind)
    pages = generate_pages(400, n_hosts=5)
    _write_batch(pages, os.path.join(ind, "b1.parquet"))

    q = (
        host_session_counts(spark, ind)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    res = spark.read.parquet(out)
    rows = res.collect()
    assert rows, "watermark-closed sessions must be emitted"
    # session windows are genuine sessions: end > start, counts positive,
    # and per host the sessions do not overlap
    by_host = {}
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_pages"] > 0
        by_host.setdefault(r["host"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_host.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2, "sessions of one host must not overlap"
    # totals conserved: every emitted page is in exactly one session
    assert sum(r["n_pages"] for r in rows) <= 400
