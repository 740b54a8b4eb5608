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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
