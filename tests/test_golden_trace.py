"""Engine vs RECORDED golden traces (tests/golden/trace_2000.json).

The fixture was recorded once from the reference-semantics simulator and
committed — so the engine is checked against a frozen artifact, not
against code that could drift together with it (north_rule: "verified
via pytest against recorded reference traces")."""

import json
import os

import pytest
from pyspark.sql import functions as F

from fraudcrawler_spark.config import CrawlConfig
from fraudcrawler_spark.datagen import write_corpus
from fraudcrawler_spark.frontier.crawl import run_crawl
from fraudcrawler_spark.pipeline import run_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "trace_2000.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def golden_corpus(tmp_path_factory, golden):
    d = str(tmp_path_factory.mktemp("golden_corpus"))
    write_corpus(d, golden["corpus_pages"])
    return d


def test_pipeline_matches_recorded_trace(spark, golden_corpus, golden):
    eng = run_pipeline(spark, golden_corpus).toPandas()
    assert len(eng) == len(golden["rows"])
    eng_rows = {
        (r["search_term"], r["url"]): r
        for r in eng.to_dict("records")
    }
    for g in golden["rows"]:
        e = eng_rows[(g["search_term"], g["url"])]
        for k in ("marketplace_name", "domain", "product_name",
                  "product_price", "filtered", "filtered_at_stage",
                  "probability"):
            ev = e[k]
            if ev is not None and not isinstance(ev, (str, bool)):
                ev = float(ev) if g[k] is not None else ev
            assert (ev == g[k]) or (ev is None and g[k] is None) or (
                isinstance(ev, float) and ev != ev and g[k] is None
            ), (g["url"], k, ev, g[k])
        assert sorted(e["classifications"].items()) == [
            tuple(x) for x in g["classifications"]
        ]
    # seen set = unflagged rows ∪ probability-flagged (claimed pre-flag)
    claimed = {
        r["url"]
        for r in eng.to_dict("records")
        if not r["filtered"] or r["filtered_at_stage"] == "Zyte probability threshold"
    }
    assert claimed == set(golden["seen_set"])


def test_crawl_matches_recorded_trace(spark, golden_corpus, golden, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("golden_state"))
    cfg = CrawlConfig(host_budget=8, max_depth=2)
    state = run_crawl(spark, golden_corpus, root, cfg,
                      max_rounds=len(golden["crawl_rounds"]))
    for rnd, g in enumerate(golden["crawl_rounds"]):
        res = state.read("results", rnd).select(
            "url", "priority", "crawl_depth", "host"
        ).toPandas()
        eng_order = [
            r["url"]
            for r in sorted(
                res.to_dict("records"),
                key=lambda r: (r["priority"], r["crawl_depth"], r["host"], r["url"]),
            )
        ]
        assert eng_order == g["new"], f"round {rnd}"
    last = state.read_manifest()["last_round"]
    seen = {r[0] for r in state.read_all("seen", last).select("url").collect()}
    assert seen == set(golden["crawl_seen_set"])
