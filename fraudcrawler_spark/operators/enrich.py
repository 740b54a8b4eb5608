"""Search-term enrichment — U1/F5/A1/T1 (SURVEY.md §2).

Reference (/root/reference/fraudcrawler/scraping/enrich.py:259-303):
suggested ∪ related keywords → drop the original term → group by text
taking max(volume) → sort by volume desc (Python stable sort ⇒ ties keep
first-seen order) → take top n_terms.

Spark mapping: unionByName → filter → groupBy/max → orderBy with an
explicit first-seen tie-break column (min of an arrival index — the
stable-sort semantics made deterministic) → limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fraudcrawler_spark.config import Enrichment


def enrich_terms(
    suggested: DataFrame,
    related: DataFrame,
    search_term: str,
    n_terms: int,
) -> DataFrame:
    """Both inputs: (text: string, volume: int, arrival_idx: long).

    ``arrival_idx`` is the deterministic position in the concatenated
    suggested+related list (suggested first), standing in for Python's
    stable-sort tie preservation (enrich.py:299-301).
    """
    unioned = suggested.unionByName(related)
    deduped = (
        unioned.where(F.col("text") != F.lit(search_term))
        .groupBy("text")
        .agg(
            F.max("volume").alias("volume"),
            F.min("arrival_idx").alias("first_seen_idx"),
        )
    )
    return (
        deduped.orderBy(F.desc("volume"), F.asc("first_seen_idx"))
        .limit(n_terms)
        .select("text", "volume")
    )


# arrival offset that sorts every "related" keyword after every
# "suggested" one — the reference concatenates suggested + related
# before the stable-sort tie-break (enrich.py:292,299-301)
_RELATED_OFFSET = 1 << 40


def corpus_keywords(pages: DataFrame) -> DataFrame:
    """Title-term statistics over the corpus — the engine's stand-in for
    the DataForSEO keyword API (reference enrich.py:113-159,213-257):
    term = leading token of the page title; volume = page count."""
    term = F.split(F.split(F.col("text"), "\n").getItem(0), " ").getItem(0)
    pid = F.regexp_extract(F.col("url"), r"p(\d{6})", 1).cast("long")
    return (
        pages.select(term.alias("term"), pid.alias("pid"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("volume"), F.min("pid").alias("first_seen"))
    )


def derive_enriched_seeds(
    pages: DataFrame,
    seeds: DataFrame,
    enrichment: Enrichment,
) -> DataFrame:
    """Enriched seed rows for every initial seed (reference
    orchestrator.py:428-447 + enrich.py:259-303 semantics):

    suggested ∪ related candidate keywords (here: corpus title terms
    ``{term}-forte`` / ``{term}-plus``), original term excluded (F5),
    per-term max-volume agg (A1), volume-desc stable-order top-k (T1);
    each surviving keyword becomes a seed row with
    ``num_results = additional_urls_per_term`` queued after all initial
    seeds (priority = 100 + parent_priority*10 + rank).
    """
    kw = corpus_keywords(pages).withColumn(
        "base", F.split(F.col("term"), "-").getItem(0)
    )
    suggested = kw.where(F.col("term").endswith("-forte")).select(
        "base", F.col("term").alias("text"), "volume",
        F.col("first_seen").alias("arrival_idx"),
    )
    related = kw.where(F.col("term").endswith("-plus")).select(
        "base", F.col("term").alias("text"), "volume",
        (F.col("first_seen") + F.lit(_RELATED_OFFSET)).alias("arrival_idx"),
    )
    cand = suggested.unionByName(related)

    init = seeds.select(
        F.col("search_term"), F.col("priority").alias("parent_priority"),
        "language_code", "location_code",
    )
    joined = cand.join(
        F.broadcast(init), cand["base"] == init["search_term"], "inner"
    ).where(F.col("text") != F.col("search_term"))  # F5 self-exclusion

    agg = joined.groupBy("search_term", "parent_priority", "language_code",
                         "location_code", "text").agg(
        F.max("volume").alias("volume"),
        F.min("arrival_idx").alias("first_seen_idx"),
    )
    w = Window.partitionBy("search_term").orderBy(
        F.desc("volume"), F.asc("first_seen_idx"), F.asc("text")
    )
    return (
        agg.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= enrichment.additional_terms)
        .select(
            F.col("text").alias("search_term"),
            F.lit("enriched").alias("search_term_type"),
            F.lit(enrichment.additional_urls_per_term).alias("num_results"),
            "language_code",
            "location_code",
            (F.lit(100) + F.col("parent_priority") * 10 + F.col("_rank")).alias("priority"),
        )
    )
