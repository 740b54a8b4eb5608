"""Task-retry determinism probe: kill every task's FIRST attempt in a
hot-path Arrow kernel stage and prove the output is bit-identical to an
undisturbed control run.

Why this matters at 100 TB: on a 1000-executor cluster task retries are
routine (spot preemption, shuffle-fetch failures, OOM kills). The
engine's correctness story leans on every operator being a pure
function of its input partition — hash gates instead of rand(),
arithmetic fingerprints instead of monotonically-increasing ids — so a
re-executed task MUST reproduce its exact rows. This probe runs the
extract kernel (the one Python stage on the crawl hot path) plus the
hash-gated sampling/shuffle chain under `local[4,2]` (2 task attempts)
with an injected first-attempt crash per partition, and diffs against
the clean run.

Exit 0 = identical; nonzero = the retry changed rows (determinism bug)
or the job failed. Invoked by tests/test_round5.py as a subprocess
(the suite's shared session has maxFailures=1 — local-mode default —
so first-attempt crashes would fail the whole suite JVM).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _session(master: str) -> SparkSession:
    return (
        SparkSession.builder.master(master)
        .appName("fc_retry_probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _pipeline_rows(spark: SparkSession, corpus: str, crash_dir: str | None):
    """The probed plan: pages → extract kernel (mapInPandas hot path) →
    hash-gated sample → url-keyed shuffle aggregation. crash_dir=None
    is the control; otherwise every (stage, partition) first attempt
    raises after marking itself, so the retry takes the success path."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet"))
    schema = StructType([
        StructField("url", StringType()),
        StructField("n_bytes", LongType()),
        StructField("n_links", LongType()),
    ])

    def kernel(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if crash_dir is not None and ctx is not None:
            marker = os.path.join(
                crash_dir, f"p{ctx.stageId()}_{ctx.partitionId()}"
            )
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("1")
                raise RuntimeError(
                    "injected first-attempt crash "
                    f"(stage {ctx.stageId()} part {ctx.partitionId()})"
                )
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf["url"],
                "n_bytes": pdf["html"].map(len).astype("int64"),
                "n_links": pdf["html"].map(
                    lambda b: bytes(b).count(b"<a ")
                ).astype("int64"),
            })

    # repartition to 8 so EIGHT kernel tasks each take a first-attempt
    # crash (one parquet file would otherwise be a single task)
    feat = pages.select("url", "html").repartition(8).mapInPandas(
        kernel, schema
    )
    # hash gate (the repo's sampling idiom) + a shuffle on the host key:
    # both must land identical rows on retry
    gated = feat.where(
        F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long") % 10 < 7
    )
    agg = gated.groupBy(
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("bytes"),
        F.sum("n_links").alias("links"),
        F.xxhash64(F.concat_ws("#", F.sort_array(F.collect_list("url"))))
        .alias("urlset_hash"),
    )
    return sorted(tuple(r) for r in agg.collect())


def main() -> int:
    corpus = sys.argv[1]
    spark = _session("local[4,2]")  # 2 attempts per task
    try:
        control = _pipeline_rows(spark, corpus, None)
        crash_dir = tempfile.mkdtemp(prefix="fc_retry_")
        try:
            injected = _pipeline_rows(spark, corpus, crash_dir)
            n_crashes = len(os.listdir(crash_dir))
        finally:
            shutil.rmtree(crash_dir, ignore_errors=True)
        identical = control == injected
        print(json.dumps({
            "identical": identical,
            "rows": len(control),
            "first_attempt_crashes": n_crashes,
        }))
        return 0 if identical and n_crashes > 0 else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
