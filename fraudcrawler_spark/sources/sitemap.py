"""Sitemap source — the second half of the per-host discovery surface a
production crawler consumes next to robots.txt (reference analog: the
SERP discovery stage seeds the frontier, serp.py; sitemaps are how hosts
VOLUNTEER urls — Common Crawl and every polite crawler merge both).

Parsing is all JVM expressions (regexp over the XML text — sitemap.org
files are flat enough that a full XML parser is overkill and would drag
the hot path into Python): one explode per <url> block, per-block field
extraction that tolerates missing <lastmod>/<priority> elements and
comments. Scale shape: sitemaps are per-host KB-scale documents; host is
the natural partition key and the only exchange is whatever the caller
joins downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_sitemaps(raw: DataFrame) -> DataFrame:
    """(host, sitemap_xml) → one row per <url> entry:
    (host, loc, lastmod, priority). Missing lastmod/priority → null."""
    blocks = raw.select(
        "host",
        F.explode(
            F.regexp_extract_all(
                F.col("sitemap_xml"), F.lit(r"(?s)<url>(.*?)</url>"), 1
            )
        ).alias("block"),
    )
    loc = F.trim(F.regexp_extract("block", r"<loc>([^<]*)</loc>", 1))
    lastmod = F.nullif(
        F.trim(F.regexp_extract("block", r"<lastmod>([^<]*)</lastmod>", 1)),
        F.lit(""),
    )
    prio = F.nullif(
        F.trim(F.regexp_extract("block", r"<priority>([^<]*)</priority>", 1)),
        F.lit(""),
    ).cast("double")
    return blocks.select(
        "host",
        loc.alias("loc"),
        lastmod.alias("lastmod"),
        prio.alias("priority"),
    ).where(F.col("loc") != "")
