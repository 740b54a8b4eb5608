"""Frontier crawl: trace parity vs the golden simulator, politeness,
robots, checkpoint/resume exactness (north_rule)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fraudcrawler_spark.config import CrawlConfig
from fraudcrawler_spark.frontier.crawl import run_crawl
from fraudcrawler_spark.frontier.politeness import STAGE_ROBOTS
from tests.ref_sim import simulate_crawl

CFG = CrawlConfig(host_budget=8, max_depth=2)
ROUNDS = 4


@pytest.fixture(scope="module")
def crawl_state(spark, corpus_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl_state"))
    state = run_crawl(spark, corpus_dir, root, CFG, max_rounds=ROUNDS)
    return state


@pytest.fixture(scope="module")
def golden(corpus_dir):
    return simulate_crawl(corpus_dir, CFG, max_rounds=ROUNDS)


def _order_key(r):
    return (r["priority"], r["crawl_depth"], r["host"], r["url"])


def test_crawl_ordering_and_seen_parity(crawl_state, golden):
    """north_rule: crawl ordering + URL-seen membership match the golden
    trace (canonical order = (priority, crawl_depth, host, url))."""
    last = crawl_state.read_manifest()["last_round"]
    assert last == len(golden["rounds"]) - 1

    for rnd, g in enumerate(golden["rounds"]):
        res = crawl_state.read("results", rnd).select(
            "url", "priority", "crawl_depth", "host"
        ).toPandas()
        eng_order = [
            r["url"]
            for r in sorted(res.to_dict("records"), key=_order_key)
        ]
        # golden["rounds"][rnd]["new"] is already in canonical order
        assert eng_order == g["new"], f"round {rnd} ordering/membership"

    seen_eng = {
        r[0]
        for r in crawl_state.read_all("seen", last).select("url").collect()
    }
    assert seen_eng == golden["seen_set"]


def test_crawl_result_field_parity(crawl_state, golden):
    last = crawl_state.read_manifest()["last_round"]
    eng = crawl_state.read_all("results", last).toPandas()
    sim = pd.DataFrame(golden["results"])
    assert len(eng) == len(sim)
    eng_m = eng.set_index("url").sort_index()
    sim_m = sim.set_index("url").sort_index()
    assert list(eng_m.index) == list(sim_m.index)
    for col in ("product_name", "product_price", "product_description",
                "probability", "filtered", "filtered_at_stage", "round",
                "crawl_depth"):
        pd.testing.assert_series_equal(
            eng_m[col], sim_m[col], check_dtype=False, check_names=False,
            obj=col,
        )
    # classifications maps
    eng_cls = eng_m["classifications"].map(
        lambda m: tuple(sorted(m.items())) if m is not None else ()
    )
    sim_cls = sim_m["classifications"].map(lambda m: tuple(sorted(m.items())))
    assert (eng_cls == sim_cls).all()


def test_politeness_budget(crawl_state):
    last = crawl_state.read_manifest()["last_round"]
    hm = crawl_state.read_all("host_metrics", last).toPandas()
    assert (hm["n_scheduled"] <= CFG.host_budget).all()


def test_robots_respected(crawl_state, spark, corpus_dir):
    last = crawl_state.read_manifest()["last_round"]
    res = crawl_state.read_all("results", last)
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    disallowing = [
        r["host"] for r in robots.collect() if list(r["disallow_prefixes"])
    ]
    fetched_private = res.where(
        F.col("host").isin(disallowing) & F.col("url").contains("/private/")
    ).count()
    assert fetched_private == 0
    # and the blocks are recorded in lineage
    lin = crawl_state.read_all("lineage", last)
    assert lin.where(F.col("stage") == STAGE_ROBOTS).count() > 0


def test_resume_exactness(spark, corpus_dir, tmp_path_factory, crawl_state):
    """Kill after round 1, resume → identical seen set + results
    (north_rule: 'resumes exactly')."""
    root = str(tmp_path_factory.mktemp("crawl_resume"))
    run_crawl(spark, corpus_dir, root, CFG, max_rounds=2)
    state2 = run_crawl(spark, corpus_dir, root, CFG, max_rounds=ROUNDS)
    last = crawl_state.read_manifest()["last_round"]
    assert state2.read_manifest()["last_round"] == last

    a = crawl_state.read_all("results", last).toPandas()
    b = state2.read_all("results", last).toPandas()
    key = ["round", "url"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ("url", "round", "filtered", "filtered_at_stage",
                "product_name", "probability"):
        assert (a[col].fillna("∅") == b[col].fillna("∅")).all(), col

    seen_a = {r[0] for r in crawl_state.read_all("seen", last).select("url").collect()}
    seen_b = {r[0] for r in state2.read_all("seen", last).select("url").collect()}
    assert seen_a == seen_b


def test_crash_mid_round_resume(spark, corpus_dir, tmp_path_factory, crawl_state):
    """Crash AFTER some round-K tables landed but BEFORE the manifest
    commit → resume reruns round K, overwriting partials; final state is
    identical to the uninterrupted run (atomic-manifest guarantee)."""
    import shutil

    root = str(tmp_path_factory.mktemp("crawl_crash"))
    run_crawl(spark, corpus_dir, root, CFG, max_rounds=2)

    # simulate a crash during round 2: partial (corrupt) table data is on
    # disk for round 2 but the manifest still says last_round == 1
    import os
    partial = os.path.join(root, "results", "round=00002")
    os.makedirs(partial, exist_ok=True)
    with open(os.path.join(partial, "part-corrupt.parquet"), "w") as f:
        f.write("garbage — crashed mid-write")

    state2 = run_crawl(spark, corpus_dir, root, CFG, max_rounds=ROUNDS)
    last = crawl_state.read_manifest()["last_round"]
    assert state2.read_manifest()["last_round"] == last

    a = crawl_state.read_all("results", last).toPandas()
    b = state2.read_all("results", last).toPandas()
    a = a.sort_values(["round", "url"]).reset_index(drop=True)
    b = b.sort_values(["round", "url"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["url"] == b["url"]).all()
    assert (a["filtered"].astype(bool) == b["filtered"].astype(bool)).all()


def test_salting_bounds_skew(spark, corpus_dir):
    """Zipf-head hosts split across salt cells: the widest (host, salt)
    cell is ~1/s of the widest host (the straggler-killer property)."""
    import zlib

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").toPandas()
    hosts = pages["url"].str.extract(r"^https://([^/]+)")[0]
    by_host = hosts.value_counts()
    biggest = by_host.index[0]
    urls = pages.loc[hosts == biggest, "url"]
    s = 4
    cells = urls.map(lambda u: zlib.crc32(u.encode()) % s).value_counts()
    assert by_host.iloc[0] > 100  # the corpus really is skewed
    assert cells.max() <= by_host.iloc[0] / s * 1.5  # ~uniform split


def test_empty_seed_crawl(spark, tmp_path_factory):
    """No matching seeds → empty frontier → crawl terminates cleanly."""
    import os

    import pandas as pd

    from fraudcrawler_spark.datagen import write_corpus

    d = str(tmp_path_factory.mktemp("empty_corpus"))
    write_corpus(d, 300)
    # overwrite seeds with a term that matches nothing
    pd.DataFrame(
        [{"search_term": "nomatch", "search_term_type": "initial",
          "num_results": 5, "language_code": "de", "location_code": "ch",
          "priority": 0}]
    ).to_parquet(os.path.join(d, "seeds.parquet"), index=False)
    root = str(tmp_path_factory.mktemp("empty_state"))
    state = run_crawl(spark, d, root, CFG, max_rounds=3)
    assert state.read_manifest()["last_round"] == -1
    assert state.read("frontier", 0).count() == 0
