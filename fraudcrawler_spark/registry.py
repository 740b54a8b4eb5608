"""Query registry: name → (spark_callable, oracle_sql | None).

Consumed by __spark_entry__.py (the driver contract) and by the local
conformance tests, which replicate the driver's compare (row count +
schema + order-insensitive values) against DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fraudcrawler_spark import conformance as c
from fraudcrawler_spark import conformance_ml as m

QueryFn = Callable[[SparkSession, str], DataFrame]

# name → (query_fn, oracle_sql or None for rows-only checks)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # reference-operator conformance (SURVEY.md §2)
    "pricing_summary": (c.q_pricing_summary, c.SQL_PRICING),
    "country_flag": (c.q_country_flag, c.SQL_COUNTRY_FLAG),
    "canonical_host": (c.q_canonical_host, c.SQL_CANONICAL_HOST),
    "marketplace_join": (c.q_marketplace_join, c.SQL_MARKETPLACE),
    "excluded_anti_join": (c.q_excluded_anti_join, c.SQL_EXCLUDED_ANTI),
    "dedup_first_wins": (c.q_dedup_first_wins, c.SQL_DEDUP_FIRST),
    "dedup_prev_run": (c.q_dedup_prev_run, c.SQL_DEDUP_PREV),
    "keyword_topk": (c.q_keyword_topk, c.SQL_KEYWORD_TOPK),
    "topk_per_seed": (c.q_topk_per_seed, c.SQL_TOPK_PER_SEED),
    "classify": (c.q_classify, c.SQL_CLASSIFY),
    "probability_flag": (c.q_probability_flag, c.SQL_PROBABILITY),
    "fetch_left_outer": (c.q_fetch_left_outer, c.SQL_FETCH_LEFT),
    "set_except": (c.q_set_except, c.SQL_SET_EXCEPT),
    "union_dedup": (c.q_union_dedup, c.SQL_UNION_DEDUP),
    "frontier_order": (c.q_frontier_order, c.SQL_FRONTIER_ORDER),
    "politeness_cells": (c.q_politeness_cells, c.SQL_POLITENESS),
    "pipeline_composite": (c.q_pipeline_composite, c.SQL_PIPELINE_COMPOSITE),
    # training-data operators
    "dedup_exact": (m.q_dedup_exact, m.SQL_DEDUP_EXACT),
    "text_fingerprint": (m.q_text_fingerprint, m.SQL_TEXT_FINGERPRINT),
    "fingerprint_winnow": (m.q_fingerprint_winnow, m.SQL_FINGERPRINT_WINNOW),
    "dedup_ngram_jaccard": (m.q_dedup_ngram_jaccard, m.SQL_NGRAM_JACCARD),
    "dedup_minhash_lsh": (m.q_dedup_minhash_lsh, m.SQL_MINHASH_LSH),
    "dedup_simhash": (m.q_dedup_simhash, m.SQL_SIMHASH),
    "embedding_near_dup": (m.q_embedding_near_dup, m.SQL_EMB_NEAR_DUP),
    "ann_topk": (m.q_ann_topk, m.SQL_ANN_TOPK),
    "text_tokens": (m.q_text_tokens, m.SQL_TEXT_TOKENS),
    "text_tokens_bpe": (m.q_text_tokens_bpe, m.SQL_TEXT_TOKENS_BPE),
    "text_quality": (m.q_text_quality, m.SQL_TEXT_QUALITY),
    "text_langid": (m.q_text_langid, m.SQL_TEXT_LANGID),
    "multimodal_meta": (m.q_multimodal_meta, m.SQL_MULTIMODAL_META),
    "ann_lsh": (m.q_ann_lsh, m.SQL_ANN_LSH),
    "ann_ivf": (m.q_ann_ivf, m.SQL_ANN_IVF),
    "corpus_prep": (m.q_corpus_prep, m.SQL_CORPUS_PREP),
    "events_window_agg": (m.q_events_window_agg, m.SQL_EVENTS_WINDOW),
    "dim_code_lookup": (c.q_dim_code_lookup, c.SQL_DIM_CODE_LOOKUP),
    "host_restrict": (c.q_host_restrict, c.SQL_HOST_RESTRICT),
    "json_extract": (c.q_json_extract, c.SQL_JSON_EXTRACT),
    "scalar_funcs": (c.q_scalar_funcs, c.SQL_SCALAR_FUNCS),
    "distinct_urls": (c.q_distinct_urls, c.SQL_DISTINCT_URLS),
    "product_extract": (m.q_product_extract, m.SQL_PRODUCT_EXTRACT),
    "simhash_pairs": (m.q_simhash_pairs, m.SQL_SIMHASH_PAIRS),
    # banded candidate generation — same result set as the all-pairs twin
    # by pigeonhole, so it shares the oracle SQL; the PLAN is the scale one
    "simhash_pairs_banded": (m.q_simhash_pairs_banded, m.SQL_SIMHASH_PAIRS),
}


def queries() -> dict[str, QueryFn]:
    out = dict((k, v[0]) for k, v in REGISTRY.items())
    out.update(_ROWS_ONLY)
    return out


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


# --------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: crawl engine, pandas-UDF kernels)
# --------------------------------------------------------------------------

_CORPUS_CACHE: dict[int, str] = {}


def _crawl_corpus(n_pages: int = 2000) -> str:
    """Deterministic on-the-fly corpus for the crawl-engine demos."""
    import os
    import tempfile

    from fraudcrawler_spark.datagen import write_corpus

    if n_pages not in _CORPUS_CACHE:
        d = os.path.join(tempfile.gettempdir(), f"fc_conf_corpus_{n_pages}")
        if not os.path.exists(os.path.join(d, "pages.parquet")):
            write_corpus(d, n_pages)
        _CORPUS_CACHE[n_pages] = d
    return _CORPUS_CACHE[n_pages]


def _flatten_for_driver(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Driver-compare canonicalization: the harness sorts columns with
    pandas, which cannot hash dict/list cells — flatten the MapType
    ``classifications`` to scalar columns (same op the reference applies
    before its CSV sink, client.py:66-71) and drop any remaining
    array/map/binary columns."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType

    from fraudcrawler_spark.operators.sink import flatten_classifications
    from fraudcrawler_spark.pipeline import read_corpus

    if "classifications" in df.columns:
        prompts = read_corpus(spark, _crawl_corpus()).get("prompts")
        names = (
            [r["name"] for r in prompts.select("name").collect()]
            if prompts is not None
            else []
        )
        df = flatten_classifications(df, names)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
    ]
    return df.drop(*bad)


def q_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full M1 pipeline on the synthetic page corpus (extract kernel,
    flag-not-drop, dedup, classify) — validated against the reference
    trace simulator in tests; rows-only here."""
    from fraudcrawler_spark.pipeline import run_pipeline

    return _flatten_for_driver(
        spark, run_pipeline(spark, _crawl_corpus()).drop("product_images")
    )


def q_crawl_frontier_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One frontier round: politeness cells + Bloom seen probe + fetch —
    returns the round-0 results table."""
    import tempfile
    import shutil
    import os

    from fraudcrawler_spark.config import CrawlConfig
    from fraudcrawler_spark.frontier.crawl import run_crawl

    root = os.path.join(tempfile.gettempdir(), "fc_conf_round")
    shutil.rmtree(root, ignore_errors=True)
    state = run_crawl(
        spark, _crawl_corpus(), root, CrawlConfig(host_budget=8, max_depth=1),
        max_rounds=1,
    )
    return _flatten_for_driver(
        spark, state.read("results", 0).drop("links", "product_images")
    )


def q_crawl_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing over the html:binary column (stubbed
    decode kernel, real schema/batching) — rows-only."""
    from fraudcrawler_spark.functions.multimodal import decode_binary_meta

    pages = spark.read.parquet(f"{_crawl_corpus()}/pages.parquet")
    return decode_binary_meta(pages.select("url", "html"), "html")


def q_crawl_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plumbing over html:binary (UDTF-like 1→N
    fan-out inside the Arrow batch; deterministic stub decoder) —
    rows-only."""
    from fraudcrawler_spark.functions.multimodal import sample_frames

    pages = spark.read.parquet(f"{_crawl_corpus()}/pages.parquet")
    return sample_frames(pages.select("url", "html"), "html")


def q_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest (watermark dedup + in-stream extract)
    run with availableNow over the synthetic corpus, read back as a batch
    DataFrame — rows-only (streaming is not SQL-oracle-able)."""
    import os
    import shutil
    import tempfile

    from fraudcrawler_spark.streaming.ingest import ingest_query

    base = os.path.join(tempfile.gettempdir(), "fc_conf_stream")
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    os.makedirs(indir)
    src = os.path.join(_crawl_corpus(), "pages.parquet")
    shutil.copy(src, os.path.join(indir, "b1.parquet"))
    q = ingest_query(spark, indir, os.path.join(base, "out"),
                     os.path.join(base, "ckpt"))
    q.trigger(availableNow=True).start().awaitTermination(300)
    return spark.read.parquet(os.path.join(base, "out"))


_ROWS_ONLY: dict[str, QueryFn] = {
    "crawl_pipeline": q_crawl_pipeline,
    "crawl_frontier_round": q_crawl_frontier_round,
    "crawl_multimodal": q_crawl_multimodal,
    "crawl_frames": q_crawl_frames,
    "streaming_ingest": q_streaming_ingest,
}
