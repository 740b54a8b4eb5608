"""End-to-end training-corpus demo: crawl → export → governance →
training shards, against the deterministic synthetic corpus.

The companion to launch_demo_crawl.py (which demos the frontier): this
script walks the TRAINING-DATA side of the engine — the reason the
crawl exists. Run: ``python launch_demo_corpus.py [sf_dir]``.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from fraudcrawler_spark import registry
from fraudcrawler_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(
        "fc_demo_corpus", cores=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    q = registry.queries()

    print("== 0. ingest (WARC → clean text) ==")
    warc = q["warc_read"](spark, sf_dir)
    print(f"WARC response records, digest-verified: {warc.count()}")
    cs = q["charset_decode"](spark, sf_dir)
    cs.groupBy("detected_enc").count().orderBy("detected_enc").show()
    bp = q["boilerplate"](spark, sf_dir)
    bp.agg(F.round(F.avg("link_density"), 3).alias("avg_link_density")).show()
    delta = q["crawl_delta"](spark, sf_dir)
    delta.groupBy("status").count().orderBy("status").show()

    print("== 1. corpus governance ==")
    prep = q["corpus_prep"](spark, sf_dir)
    print(f"corpus_prep survivors: {prep.count()}")
    decon = q["decontaminate"](spark, sf_dir)
    print(f"decontamination-flagged: {decon.where('flagged').count()}")
    pii = q["pii_scrub"](spark, sf_dir)
    print(f"docs with PII scrubbed: {pii.where('has_pii').count()}")
    ppl = q["perplexity_score"](spark, sf_dir)
    ppl.orderBy(F.col("ppl").desc()).limit(3).show(truncate=False)

    print("== 2. dedup ==")
    clusters = q["dedup_clusters"](spark, sf_dir)
    print(
        "near-dup clusters (size>1):",
        clusters.where("cluster_size > 1 AND is_canonical").count(),
    )
    inc = q["dedup_incremental"](spark, sf_dir)
    print("incoming batch near-dups vs base corpus:", inc.where("is_dup").count())

    print("== 3. training mix ==")
    shards = q["corpus_to_shards"](spark, sf_dir)
    shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("docs"),
        F.max("seq_id").alias("contexts"),
    ).orderBy("shard").show(4)
    print(f"packed rows: {shards.count()}")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
