"""Pure-Python simulator of the reference pipeline's semantics.

The reference package itself cannot be imported here (aiohttp/openai are
not installed), so this module re-implements its documented per-row
semantics — from /root/reference/fraudcrawler (see file:line cites) — as
a sequential oracle: single-worker FIFO order (deterministic, matching
the reference at n_*_wkrs=1), flag-not-drop, first-unflagged-wins dedup,
sequential field-extraction with the float(None) probability quirk, and
the md5-based deterministic classifier shared with the engine.

Golden traces produced here are what BASELINE.json's north_rule calls
"the reference's crawl ordering and URL-seen set".
"""

from __future__ import annotations

import os
import re

import pandas as pd

from fraudcrawler_spark.config import (
    DEFAULT_IF_MISSING,
    DEFAULT_IS_RELEVANT,
    DEFAULT_MARKETPLACE,
    PROBABILITY_THRESHOLD,
    STAGE_COUNTRY,
    STAGE_DEDUP_CURRENT,
    STAGE_DEDUP_PREVIOUS,
    STAGE_PROBABILITY,
    Prompt,
)
from fraudcrawler_spark.datagen import extract_fields, extract_links
from fraudcrawler_spark.functions.classify import classify_py
from fraudcrawler_spark.functions.urls import _ref_get_domain

_PID_RE = re.compile(r"p(\d{6})")


def _page_id(url: str) -> int:
    m = _PID_RE.search(url)
    return int(m.group(1)) if m else 1 << 40


def load_corpus(corpus_dir: str) -> dict[str, pd.DataFrame]:
    out = {}
    for name in ("pages", "seeds", "hosts", "excluded_hosts", "robots", "prompts"):
        p = os.path.join(corpus_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = pd.read_parquet(p)
    return out


def keep_url(url: str, country_code: str) -> bool:
    """Reference serp.py:150-158 — substring test, quirk and all."""
    return f".{country_code}" in url.lower() or ".com" in url.lower()


def simulate(
    corpus_dir: str,
    country_code: str = "ch",
    threshold: float = PROBABILITY_THRESHOLD,
    previously_collected: set[str] | None = None,
) -> dict:
    """Run the reference pipeline semantics sequentially over the corpus.

    Returns {"rows": [...], "visit_order": [...], "seen_set": set()}.
    """
    t = load_corpus(corpus_dir)
    pages = t["pages"].set_index("url", drop=False)
    seeds = t["seeds"].sort_values("priority")
    marketplaces = (
        list(t["hosts"].sort_values("host_idx").itertuples()) if "hosts" in t else []
    )
    excluded: set[str] = set()
    if "excluded_hosts" in t:
        for doms in t["excluded_hosts"]["domains"]:
            excluded.update(doms)
    prompts = [
        Prompt(
            name=r["name"],
            context=r["context"],
            system_prompt=r["system_prompt"],
            allowed_classes=tuple(r["allowed_classes"]),
            default_if_missing=int(r["default_if_missing"]),
        )
        for _, r in t["prompts"].iterrows()
    ] if "prompts" in t else []

    # discovery index: title leading term → page urls by page id
    title_term = (
        t["pages"]["text"].str.split("\n").str[0].str.split(" ").str[0]
    )
    by_term: dict[str, list[str]] = {}
    for url, term in zip(t["pages"]["url"], title_term):
        by_term.setdefault(term, []).append(url)
    for term in by_term:
        by_term[term].sort(key=_page_id)

    previous = set(previously_collected or ())
    current: set[str] = set()
    rows: list[dict] = []
    visit_order: list[str] = []

    for seed in seeds.itertuples():
        urls = by_term.get(seed.search_term, [])[: int(seed.num_results)]
        for url in urls:
            # SERP stage: country flag (serp.py:176-177) + marketplace (179-190)
            filtered = not keep_url(url, country_code)
            stage = STAGE_COUNTRY if filtered else None
            domain = _ref_get_domain(url)
            marketplace = DEFAULT_MARKETPLACE
            for mp in marketplaces:
                if domain.lower() in [d.lower() for d in mp.domains]:
                    marketplace = mp.name
                    break
            # excluded hard drop (serp.py:244-246)
            if domain in excluded:
                continue

            row = {
                "search_term": seed.search_term,
                "search_term_type": seed.search_term_type,
                "url": url,
                "marketplace_name": marketplace,
                "domain": domain,
                "product_name": None,
                "product_price": None,
                "product_description": None,
                "product_images": None,
                "probability": None,
                "classifications": {},
                "filtered": filtered,
                "filtered_at_stage": stage,
                "is_relevant": DEFAULT_IS_RELEVANT,
            }

            # URL collection / dedup (orchestrator.py:150-188)
            if not row["filtered"]:
                if url in current:
                    row["filtered"] = True
                    row["filtered_at_stage"] = STAGE_DEDUP_CURRENT
                elif url in previous:
                    row["filtered"] = True
                    row["filtered_at_stage"] = STAGE_DEDUP_PREVIOUS
                else:
                    current.add(url)
                    visit_order.append(url)

            # Zyte stage (orchestrator.py:190-236)
            if not row["filtered"]:
                if url in pages.index:
                    html = pages.loc[url, "html"]
                    doc = html.decode("utf-8")
                    fields = extract_fields(doc)
                    row["product_name"] = fields["product_name"]
                    row["product_price"] = fields["product_price"]
                    row["product_description"] = fields["product_description"]
                    row["product_images"] = fields["product_images"]
                    # float(None) quirk: probability missing ⇒ fields kept,
                    # probability stays None, row NOT flagged
                    # (orchestrator.py:211-235)
                    prob = fields["probability"]
                    if prob is not None:
                        row["probability"] = prob
                        if not prob > threshold:  # zyte.py:117, strict >
                            row["filtered"] = True
                            row["filtered_at_stage"] = STAGE_PROBABILITY
                # fetch failure: row passes through unenriched, unflagged
                # (orchestrator.py:232-235)

            # Processor stage (orchestrator.py:238-283)
            if not row["filtered"]:
                for p in prompts:
                    row["classifications"][p.name] = classify_py(
                        p, url, row["product_name"], row["product_description"]
                    )

            rows.append(row)

    return {"rows": rows, "visit_order": visit_order, "seen_set": current}
