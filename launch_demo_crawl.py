"""Demo driver — the reference's launch_demo_pipeline analog
(/root/reference/fraudcrawler/launch_demo_pipeline.py:11-100), built for
``spark-submit --py-files`` (north_rule packaging requirement).

Usage:
    spark-submit --master local[8] --py-files fraudcrawler_spark.zip \
        launch_demo_crawl.py [corpus_dir] [state_dir] [max_rounds]

When corpus_dir is absent a small deterministic corpus is generated.
Runs the multi-round frontier crawl, prints per-round metrics and a
result sample — the spark-submit twin of the pytest/bench entry points.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fc_demo_corpus"
    state_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fc_demo_state"
    max_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # under spark-submit the session/master comes from the launcher
    spark = SparkSession.builder.appName("fraudcrawler_spark_demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from fraudcrawler_spark.config import CrawlConfig
    from fraudcrawler_spark.datagen import write_corpus
    from fraudcrawler_spark.frontier.crawl import run_crawl

    if not os.path.exists(os.path.join(corpus, "pages.parquet")):
        write_corpus(corpus, 5000)

    cfg = CrawlConfig(host_budget=16, max_depth=2)
    state = run_crawl(spark, corpus, state_root, cfg, max_rounds=max_rounds)
    last = state.read_manifest()["last_round"]

    print(f"== crawl finished at round {last} ==")
    metrics = state.read_all("metrics", last)
    if metrics is None:
        print("no rounds ran (empty frontier — no seeds matched the corpus)")
        return
    metrics.orderBy("round").select(
        "round", "n_frontier", "n_scheduled", "n_new", "n_blocked",
        "n_enqueued", F.round("urls_per_sec", 1).alias("urls_per_sec"),
    ).show(truncate=False)

    results = state.read_all("results", last)
    print(f"results: {results.count()} rows")
    results.where(~F.col("filtered")).select(
        "round", "url", "product_name", "product_price", "probability",
        "classifications",
    ).show(5, truncate=48)


if __name__ == "__main__":
    main()
