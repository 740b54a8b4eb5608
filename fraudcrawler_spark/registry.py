"""Query registry: name → (spark_callable, oracle_sql | None).

Consumed by __spark_entry__.py (the driver contract) and by the local
conformance tests, which replicate the driver's compare (row count +
schema + order-insensitive values) against DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraudcrawler_spark import conformance as c
from fraudcrawler_spark import conformance_corpus as cc
from fraudcrawler_spark import conformance_events as ce
from fraudcrawler_spark import conformance_graph as cg
from fraudcrawler_spark import conformance_mix as cx
from fraudcrawler_spark import conformance_tpch as ct
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
    # multi-table join-planning showcase (TPC-H Q8/Q15/Q4 shapes)
    "market_share": (ct.q_market_share, ct.SQL_MARKET_SHARE),
    "top_suppliers": (ct.q_top_suppliers, ct.SQL_TOP_SUPPLIERS),
    "order_priority": (ct.q_order_priority, ct.SQL_ORDER_PRIORITY),
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
    "text_tokens_bpe_real": (m.q_text_tokens_bpe_real, m.SQL_TEXT_TOKENS_BPE_REAL),
    "text_quality": (m.q_text_quality, m.SQL_TEXT_QUALITY),
    "text_langid": (m.q_text_langid, m.SQL_TEXT_LANGID),
    "langid_eval": (m.q_langid_eval, m.SQL_LANGID_EVAL),
    "lsh_eval": (m.q_lsh_eval, m.SQL_LSH_EVAL),
    "multimodal_meta": (m.q_multimodal_meta, m.SQL_MULTIMODAL_META),
    "ann_lsh": (m.q_ann_lsh, m.SQL_ANN_LSH),
    # multi-table amplified LSH (r3): b=4 tables × r=12 planes — the
    # tunable-recall production form; verify candidate-only
    "ann_lsh_multi": (m.q_ann_lsh_multi, m.SQL_ANN_LSH_MULTI),
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
    # 64-bit simhash (r3): 16-bit band keys with 65k values — the
    # asymptotically-correct near-dup fingerprint (16-bit banding only
    # divides the quadratic candidate mass by 16)
    "dedup_simhash64": (m.q_dedup_simhash64, m.SQL_SIMHASH64),
    "simhash64_pairs_banded": (m.q_simhash64_pairs_banded, m.SQL_SIMHASH64_PAIRS),
    # corpus-governance stage (r3): decontamination, PII scrub,
    # duplicate-passage dedup, per-source stats — conformance_corpus.py
    "decontaminate": (cc.q_decontaminate, cc.SQL_DECONTAMINATE),
    "pii_scrub": (cc.q_pii_scrub, cc.SQL_PII_SCRUB),
    "dedup_passage": (cc.q_dedup_passage, cc.SQL_DEDUP_PASSAGE),
    "corpus_stats": (cc.q_corpus_stats, cc.SQL_CORPUS_STATS),
    # analytic oracle: the twin CONSTRUCTS the expected normalized url
    "url_normalize": (cc.q_url_normalize, cc.SQL_URL_NORMALIZE),
    # eval harnesses (r4): injected-ground-truth confusion for the PII
    # scrub and the Gopher quality gate — langid_eval/lsh_eval family
    "pii_eval": (cc.q_pii_eval, cc.SQL_PII_EVAL),
    "quality_eval": (m.q_quality_eval, m.SQL_QUALITY_EVAL),
    # r4 corpus additions: intra-doc repetition scrub (MassiveText),
    # URL-heuristic pre-fetch gate (RefinedWeb/UT1), per-stage attrition
    "paragraph_dedup": (cc.q_paragraph_dedup, cc.SQL_PARAGRAPH_DEDUP),
    "filter_funnel": (cc.q_filter_funnel, cc._sql_filter_funnel()),
    # late r4: full C4 clean (line gates + GLOBAL keep-first line dedup +
    # doc drops — Raffel et al. 2020 §2.2)
    "c4_clean": (cc.q_c4_clean, cc.SQL_C4_CLEAN),
    "tfidf_keywords": (cc.q_tfidf_keywords, cc.SQL_TFIDF_KEYWORDS),
    "skew_report": (cc.q_skew_report, cc.SQL_SKEW_REPORT),
    # graph stage (r3): near-dup clusters (connected components, recursive-
    # CTE twin), PageRank frontier priority (unrolled twin), salted
    # skew-safe agg — conformance_graph.py
    "dedup_clusters": (cg.q_dedup_clusters, cg.SQL_DEDUP_CLUSTERS),
    "pagerank_priority": (cg.q_pagerank_priority, cg.SQL_PAGERANK),
    # late r5 — pulled into the rebuilt r5 driver window by the
    # end-of-round window rebuild (green CORRECTNESS_r05 row)
    "hits_centrality": (cg.q_hits_centrality, cg.SQL_HITS),
    "salted_agg": (cg.q_salted_agg, cg.SQL_SALTED_AGG),
    # composite: banded simhash64 pairs -> connected components ->
    # canonical election (fingerprint -> pairs -> clusters, one DAG)
    "neardup_resolution": (cg.q_neardup_resolution, cg._sql_neardup_resolution()),
    # CCNet-style LM quality filter + dedup-before-ingest (r3)
    "perplexity_score": (m.q_perplexity_score, m.SQL_PERPLEXITY),
    "dedup_incremental": (m.q_dedup_incremental, m.SQL_DEDUP_INCREMENTAL),
    "perplexity_bigram": (m.q_perplexity_bigram, m.SQL_PERPLEXITY_BIGRAM),
    "inverted_index": (m.q_inverted_index, m.SQL_INVERTED_INDEX),
    # event-stream batch ops (r3): sessionization + as-of join —
    # conformance_events.py; int8 quantization — conformance_ml.py
    "sessionize": (ce.q_sessionize, ce.SQL_SESSIONIZE),
    "asof_join": (ce.q_asof_join, ce.SQL_ASOF_JOIN),
    "event_funnel": (ce.q_event_funnel, ce.SQL_EVENT_FUNNEL),
    "cohort_retention": (ce.q_cohort_retention, ce.SQL_COHORT_RETENTION),
    "embedding_quantize": (m.q_embedding_quantize, m.SQL_EMBEDDING_QUANTIZE),
    # training-mix stage (r3): hash-deterministic sampling / splitting /
    # shard shuffle / sequence packing — conformance_mix.py
    "stratified_sample": (cx.q_stratified_sample, cx.SQL_STRATIFIED_SAMPLE),
    "split_assign": (cx.q_split_assign, cx.SQL_SPLIT_ASSIGN),
    "group_sample": (cx.q_group_sample, cx.SQL_GROUP_SAMPLE),
    "mixture_weights": (cx.q_mixture_weights, cx.SQL_MIXTURE_WEIGHTS),
    "dsir_reweight": (cx.q_dsir_reweight, cx.SQL_DSIR_REWEIGHT),
    "corpus_shuffle": (cx.q_corpus_shuffle, cx.SQL_CORPUS_SHUFFLE),
    "sequence_pack": (cx.q_sequence_pack, cx.SQL_SEQUENCE_PACK),
    # flagship composite: prepared corpus → train split → shards → packed
    # contexts, every stage reusing an individually-oracled operator
    "corpus_to_shards": (cx.q_corpus_to_shards, cx.SQL_CORPUS_TO_SHARDS),
    # r4: decontamination-detector eval (canary-injection confusion) and
    # SemDeDup-style clustered semantic dedup (cell-bounded pair mass)
    "decontaminate_eval": (cc.q_decontaminate_eval, cc.SQL_DECONTAMINATE_EVAL),
    "semdedup": (m.q_semdedup, m.SQL_SEMDEDUP),
}


def _full_registry() -> dict[str, QueryFn]:
    out = dict((k, v[0]) for k, v in REGISTRY.items())
    out.update(_ROWS_ONLY)
    return out


def queries() -> dict[str, QueryFn]:
    """Emit in DRIVER-WINDOW priority order (r3 verdict item 1): the
    driver's correctness gate checks only the FIRST 50 entries, so the
    entries that have never had a driver-green CORRECTNESS row — the two
    crawl flagships, the r3/r4 additions, the rows-only trio — come
    first, and already-green veterans rotate to the tail. _DRIVER_WINDOW
    (registry.py bottom) is the explicit list; names not in it follow in
    registry insertion order."""
    full = _full_registry()
    out: dict[str, QueryFn] = {}
    for k in _DRIVER_WINDOW:
        if k in full:
            out[k] = full[k]
    for k, v in full.items():
        if k not in out:
            out[k] = v
    return out


def oracle_sql() -> dict[str, str]:
    # the crawl oracles read the deterministic corpus parquet by absolute
    # path — materialize it up front so the SQL is runnable regardless of
    # whether the driver executes the Spark side first
    _crawl_corpus()
    sql = {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}
    return {k: sql[k] for k in queries() if k in sql}


# --------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: crawl engine, pandas-UDF kernels)
# --------------------------------------------------------------------------

_CORPUS_CACHE: dict[int, str] = {}


def _crawl_corpus(n_pages: int = 2000) -> str:
    """Deterministic on-the-fly corpus for the crawl-engine demos."""
    import os
    import tempfile

    from fraudcrawler_spark.datagen import corpus_is_current, write_corpus

    if n_pages not in _CORPUS_CACHE:
        d = os.path.join(tempfile.gettempdir(), f"fc_conf_corpus_{n_pages}")
        # the `_datagen_rev` marker (datagen.DATAGEN_REV) invalidates the
        # cache whenever any generator's output changes — stale fixture
        # content can no longer silently poison oracle comparisons
        if not corpus_is_current(d):
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
    """One frontier round: robots gate + Bloom seen probe + fetch + classify
    — returns the round-0 results table.

    host_budget is schedule-all here ON PURPOSE: the politeness salt is
    crc32(url), which DuckDB cannot compute, so a budget-constrained round
    would be oracle-opaque. Budgeted cell selection has its own exact
    oracle (``politeness_cells``); THIS entry value-checks the full round
    (discovery → frontier → robots → seen claim → fetch/extract → prob
    flag → classify) against SQL_CRAWL_ROUND. warc_ts is cast to epoch
    seconds so both engines hash the same scalar."""
    import tempfile
    import shutil
    import os

    from fraudcrawler_spark.config import CrawlConfig
    from fraudcrawler_spark.frontier.crawl import run_crawl

    root = os.path.join(tempfile.gettempdir(), "fc_conf_round")
    shutil.rmtree(root, ignore_errors=True)
    state = run_crawl(
        spark, _crawl_corpus(), root, CrawlConfig(host_budget=1000, max_depth=1),
        max_rounds=1,
    )
    return _flatten_for_driver(
        spark,
        state.read("results", 0)
        .drop("links", "product_images")
        .withColumn("warc_ts", F.col("warc_ts").cast("long")),
    )


def q_crawl_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode stage over the html:binary column (mapInPandas
    Arrow batches; BMP payloads take the real codec, opaque payloads the
    strided byte-feature fallback). The corpus html is pure-ASCII
    deterministic bytes, so md5/length/byte-stats are all DuckDB-
    expressible — full value oracle since r5 (VERDICT r4 item 2)."""
    from fraudcrawler_spark.functions.multimodal import decode_binary_meta

    pages = spark.read.parquet(f"{_crawl_corpus()}/pages.parquet")
    out = decode_binary_meta(pages.select("url", "html"), "html")
    return out.select(
        "url", "n_bytes", "content_hash",
        F.round("feat_mean", 4).alias("feat_mean"),
        F.round("feat_std", 4).alias("feat_std"),
    )


def q_crawl_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling over html:binary (UDTF-like 1→N fan-out
    inside the Arrow batch; deterministic 512-byte-chunk stand-in
    decoder — the REAL container path is `video_frames` over genuine
    AVI bytes). Chunk hashes/indices are DuckDB-expressible over the
    ASCII corpus — full value oracle since r5 (VERDICT r4 item 2)."""
    from fraudcrawler_spark.functions.multimodal import sample_frames

    pages = spark.read.parquet(f"{_crawl_corpus()}/pages.parquet")
    return sample_frames(pages.select("url", "html"), "html")


def q_streaming_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest (watermark dedup + in-stream extract)
    run with availableNow over the synthetic corpus, read back as a batch
    DataFrame. The input directory holds TWO copies of the pages batch so
    dropDuplicatesWithinWatermark genuinely collapses duplicates across
    micro-batches; with deterministic input the streamed table equals the
    batch extraction over distinct urls, so this STREAMING entry shares a
    batch DuckDB oracle the same way `streaming_warc` does (VERDICT r4
    item 2)."""
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
    shutil.copy(src, os.path.join(indir, "b2.parquet"))
    q = ingest_query(spark, indir, os.path.join(base, "out"),
                     os.path.join(base, "ckpt"))
    # availableNow is guaranteed to terminate; assert the drain finished
    # rather than reading a partially-written sink (ADVICE r4)
    assert q.trigger(availableNow=True).start().awaitTermination(300), (
        "streaming ingest drain did not finish within 300s"
    )
    out = spark.read.parquet(os.path.join(base, "out"))
    return out.withColumn("warc_ts", F.col("warc_ts").cast("long"))


# rows-only queries (non-SQL-expressible) — EMPTY since r5: the last trio
# gained full DuckDB value oracles (VERDICT r4 item 2). Kept as a hook so
# genuinely un-oracle-able future entries have a documented home.
_ROWS_ONLY: dict[str, QueryFn] = {}


# --------------------------------------------------------------------------
# DuckDB twins for the crawl-engine entries (VERDICT r2 item 3): the corpus
# HTML is regex-regular and deterministic (datagen.py, seed 42), so the full
# pipeline — discovery, country flag, marketplace/excluded joins, dedup,
# fetch/extract, probability flag, md5 classify — is ANSI-SQL-expressible
# over the exported parquet. These convert the two biggest rows-only
# entries into hard value-checked oracles.
# --------------------------------------------------------------------------

def _corpus_sql_dir(n_pages: int = 2000) -> str:
    import os
    import tempfile

    return os.path.join(tempfile.gettempdir(), f"fc_conf_corpus_{n_pages}")


def _sql_classify_case(context: str, allowed: tuple[int, ...]) -> str:
    """CASE expr: the md5-digit classifier over the byte-exact user prompt
    (incl. the literal backslash-n typo) with allowed-class validation."""
    prompt = (
        f"'Context: {context}'"
        " || chr(10) || chr(10) || 'Product Details: ' || product_name"
        " || chr(10) || product_description || chr(92) || 'n' || chr(10)"
        " || 'Relevance:'"
    )
    digit = f"(('0x' || substr(md5({prompt}), 1, 8))::UBIGINT % 10)"
    allowed_list = ", ".join(str(a) for a in allowed)
    return (
        "CASE WHEN filtered THEN NULL\n"
        "       WHEN product_name IS NULL OR product_description IS NULL THEN -1\n"
        f"       WHEN {digit} IN ({allowed_list}) THEN {digit}::INT\n"
        "       ELSE -1 END"
    )


_SQL_EXTRACT_FIELDS = """
    NULLIF(regexp_extract(doc, '<title>([^<]*)</title>', 1), '') AS product_name,
    NULLIF(regexp_extract(doc, '<span class="price">([^<]*)</span>', 1), '') AS product_price,
    NULLIF(regexp_extract(doc, '<p class="description">([^<]*)</p>', 1), '') AS product_description,
    CASE WHEN contains(doc, '<meta name="product:probability"')
         THEN TRY_CAST(regexp_extract(doc,
           '<meta name="product:probability" content="([^"]*)"', 1) AS DOUBLE)
    END AS probability
"""

_SQL_CANON_DOMAIN = r"""
  SELECT *, CASE WHEN h = '' THEN url ELSE h END AS domain
  FROM (SELECT *,
          regexp_replace(lower(regexp_extract(url,
            '^(?:https?://)?(?:[^/@:?#]*@)?([^/@:?#]+)', 1)), '^www\.', '') AS h
        FROM {src})
"""

_D = _corpus_sql_dir()

SQL_CRAWL_PIPELINE = rf"""
WITH pages AS (SELECT * FROM read_parquet('{_D}/pages.parquet')),
seeds AS (SELECT * FROM read_parquet('{_D}/seeds.parquet')),
hosts AS (SELECT * FROM read_parquet('{_D}/hosts.parquet')),
excluded AS (SELECT * FROM read_parquet('{_D}/excluded_hosts.parquet')),
matched AS (
  SELECT p.url, s.search_term, s.search_term_type, s.num_results, s.priority
  FROM (SELECT url, split_part(split_part(text, chr(10), 1), ' ', 1) AS tt
        FROM pages) p
  JOIN seeds s ON p.tt = s.search_term
),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY search_term
      ORDER BY regexp_extract(url, 'p(\d{{6}})', 1)::INT
    ) AS serp_rank
    FROM matched
  ) WHERE serp_rank <= num_results
),
cflag AS (
  SELECT *,
    NOT (contains(lower(url), '.ch') OR contains(lower(url), '.com')) AS filtered,
    CASE WHEN NOT (contains(lower(url), '.ch') OR contains(lower(url), '.com'))
         THEN 'country code filtering' END AS stage0
  FROM topk
),
dom AS ({_SQL_CANON_DOMAIN.format(src="cflag")}),
mp_dim AS (
  SELECT lower(d) AS dom_key, arg_min(name, host_idx) AS mp_name
  FROM (SELECT name, host_idx, unnest(domains) AS d FROM hosts)
  GROUP BY 1
),
disc AS (
  SELECT f.*, COALESCE(m.mp_name, 'Google') AS marketplace_name
  FROM dom f LEFT JOIN mp_dim m ON lower(f.domain) = m.dom_key
  WHERE f.domain NOT IN (SELECT DISTINCT unnest(domains) FROM excluded)
),
ded AS (
  SELECT *,
    (NOT filtered AND ROW_NUMBER() OVER (
       PARTITION BY url ORDER BY filtered::INT, priority, serp_rank) > 1) AS cur_dup
  FROM disc
),
d3 AS (
  SELECT * EXCLUDE (filtered, stage0, cur_dup),
    (filtered OR cur_dup) AS filtered,
    CASE WHEN cur_dup THEN 'URL collection (current run deduplication)'
         ELSE stage0 END AS stage1
  FROM ded
),
fetched AS (
  SELECT d.*, decode(p.html) AS doc
  FROM d3 d LEFT JOIN pages p ON d.url = p.url AND NOT d.filtered
),
ext AS (
  SELECT *, {_SQL_EXTRACT_FIELDS}
  FROM fetched
),
pf AS (
  SELECT * EXCLUDE (filtered, stage1),
    (filtered OR (NOT filtered AND probability IS NOT NULL AND probability <= 0.1)) AS filtered,
    CASE WHEN NOT filtered AND probability IS NOT NULL AND probability <= 0.1
         THEN 'Zyte probability threshold' ELSE stage1 END AS filtered_at_stage
  FROM ext
)
SELECT search_term, search_term_type, url, marketplace_name, domain,
  product_name, product_price, product_description, probability,
  filtered, filtered_at_stage,
  -1 AS is_relevant,
  {_sql_classify_case("Is this product relevant to pharmaceutical fraud monitoring?", (0, 1))} AS classification_relevance,
  {_sql_classify_case("How serious is the offer?", (0, 1, 2))} AS classification_seriousness
FROM pf
"""

SQL_CRAWL_ROUND = rf"""
WITH pages AS (SELECT * FROM read_parquet('{_D}/pages.parquet')),
seeds AS (SELECT * FROM read_parquet('{_D}/seeds.parquet')),
excluded AS (SELECT * FROM read_parquet('{_D}/excluded_hosts.parquet')),
robots AS (SELECT * FROM read_parquet('{_D}/robots.parquet')),
matched AS (
  SELECT p.url, s.search_term, s.num_results
  FROM (SELECT url, split_part(split_part(text, chr(10), 1), ' ', 1) AS tt
        FROM pages) p
  JOIN seeds s ON p.tt = s.search_term
),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY search_term
      ORDER BY regexp_extract(url, 'p(\d{{6}})', 1)::INT
    ) AS serp_rank
    FROM matched
  ) WHERE serp_rank <= num_results
),
unflagged AS (
  SELECT * FROM topk
  WHERE contains(lower(url), '.ch') OR contains(lower(url), '.com')
),
dom AS ({_SQL_CANON_DOMAIN.format(src="unflagged")}),
frontier0 AS (
  SELECT DISTINCT url, domain AS host
  FROM dom
  WHERE domain NOT IN (SELECT DISTINCT unnest(domains) FROM excluded)
),
sched AS (
  -- host_budget is schedule-all in this entry (see q_crawl_frontier_round
  -- docstring), so scheduling reduces to the robots gate: blocked urls
  -- are claimed into the seen store but produce no result row
  SELECT f.url, f.host
  FROM frontier0 f LEFT JOIN robots r ON f.host = r.host
  WHERE NOT COALESCE(
    len(list_filter(COALESCE(r.disallow_prefixes, []),
        p -> starts_with(regexp_replace(f.url, '^https?://[^/]+', ''), p))) > 0,
    FALSE)
),
fetched AS (
  SELECT s.url, s.host, p.lang, epoch(p.warc_ts)::BIGINT AS warc_ts,
         decode(p.html) AS doc,
         CASE WHEN p.url IS NOT NULL THEN 'hit' ELSE 'miss' END AS fetch_status
  FROM sched s LEFT JOIN pages p ON s.url = p.url
),
ext AS (
  SELECT *, {_SQL_EXTRACT_FIELDS},
    list_aggregate(list_filter(list_transform(
      string_split(regexp_replace(doc, '<[^>]+>', chr(10), 'g'), chr(10)),
      x -> trim(x)), x -> x <> ''), 'string_agg', chr(10)) AS extracted_text
  FROM fetched
),
pf AS (
  SELECT *,
    (probability IS NOT NULL AND probability <= 0.1) AS filtered,
    CASE WHEN probability IS NOT NULL AND probability <= 0.1
         THEN 'Zyte probability threshold' END AS filtered_at_stage
  FROM ext
)
SELECT url, host, 0 AS priority, 0 AS crawl_depth,
  filtered, filtered_at_stage, lang, warc_ts,
  product_name, product_price, product_description, probability,
  extracted_text, fetch_status,
  {_sql_classify_case("Is this product relevant to pharmaceutical fraud monitoring?", (0, 1))} AS classification_relevance,
  {_sql_classify_case("How serious is the offer?", (0, 1, 2))} AS classification_seriousness,
  -1 AS is_relevant, 0 AS round
FROM pf
"""

def q_anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation over the crawl corpus: every <a> tag's
    (href, text) pair, href canonicalized with the engine's
    canonical_url_expr, aggregated per TARGET url — in-link count,
    distinct referring pages, and a deterministic representative anchor
    text. The link-graph labeling signal (anchor text is how the web
    describes a page it links to — the classic ranking/labeling input).

    Plan: regexp_extract_all twice + zip_with (arrays stay aligned
    in-row), one explode, one hash agg on the target key. The SQL twin
    canonicalizes analytically ('https://' + strip scheme/www — exact
    for the corpus href shapes; the full parser contract is pinned
    separately by `url_normalize`).
    """
    import os

    from fraudcrawler_spark.functions.urls import (
        canonical_host_expr,
        canonical_url_expr,
    )

    pages = spark.read.parquet(os.path.join(_crawl_corpus(), "pages.parquet"))
    s = F.col("html").cast("string")
    hrefs = F.regexp_extract_all(s, F.lit(r'<a href="([^"]*)"[^>]*>'), 1)
    texts = F.regexp_extract_all(s, F.lit(r'<a href="[^"]*"[^>]*>([^<]*)</a>'), 1)
    pairs = F.zip_with(
        hrefs, texts, lambda h, t: F.struct(h.alias("href"), t.alias("txt"))
    )
    e = pages.select(
        F.col("url").alias("src_url"), F.explode(pairs).alias("z")
    ).select(
        "src_url",
        canonical_url_expr(F.col("z.href")).alias("target"),
        F.col("z.txt").alias("txt"),
    )
    return e.groupBy("target").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.count_distinct("src_url").cast("long").alias("n_src_pages"),
        F.min("txt").alias("top_anchor"),
    )


SQL_ANCHOR_TEXT = rf"""
WITH p AS (
  SELECT url AS src_url, decode(html) AS s
  FROM read_parquet('{_D}/pages.parquet')
),
z AS (
  SELECT src_url, unnest(list_zip(
    regexp_extract_all(s, '<a href="([^"]*)"[^>]*>', 1),
    regexp_extract_all(s, '<a href="[^"]*"[^>]*>([^<]*)</a>', 1))) AS u
  FROM p
),
e AS (
  SELECT src_url,
         'https://' || regexp_replace(u[1], '^(?:https?://)?(?:www\.)?', '')
           AS target,
         u[2] AS txt
  FROM z
)
SELECT target, COUNT(*) AS n_anchors,
       COUNT(DISTINCT src_url) AS n_src_pages,
       MIN(txt) AS top_anchor
FROM e GROUP BY target
"""

REGISTRY["anchor_text_agg"] = (q_anchor_text_agg, SQL_ANCHOR_TEXT)

# r4: URL-heuristic quality gate over the crawl corpus (SQL twin is built
# lazily — it embeds the corpus path)
from fraudcrawler_spark.conformance_corpus import (  # noqa: E402
    _sql_url_quality,
    q_url_quality,
)

REGISTRY["url_quality"] = (q_url_quality, _sql_url_quality())


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window streaming aggregation (F.session_window, 30-min
    gap) run with availableNow over the corpus pages and read back — a
    STREAMING entry with a full value oracle: with all data in one
    final batch, Spark's session assignment is deterministic (sessions
    = gap-partitioned runs per host; end = last event + gap), which the
    DuckDB twin reproduces with the batch lag/cumsum construction.
    Two empirically-pinned semantics: events exactly `gap` apart MERGE
    (a new session needs a strictly larger gap), and append mode emits
    only sessions closed by the final watermark (global max event time
    - 10 min) — each host's tail session stays in state. Timestamps are
    compared as epoch micros (the corpus parquet carries tz-aware
    timestamps that DuckDB renders with an offset)."""
    import os
    import shutil
    import tempfile

    from fraudcrawler_spark.streaming.ingest import host_session_counts

    base = os.path.join(tempfile.gettempdir(), "fc_conf_stream_sess")
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    os.makedirs(indir)
    shutil.copy(
        os.path.join(_crawl_corpus(), "pages.parquet"),
        os.path.join(indir, "b1.parquet"),
    )
    q = (
        host_session_counts(spark, indir)
        .writeStream.format("parquet")
        .option("path", os.path.join(base, "out"))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), (
        "streaming sessions drain did not finish within 300s"
    )
    out = spark.read.parquet(os.path.join(base, "out"))
    return out.select(
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "host",
        "n_pages",
    )


SQL_STREAMING_SESSIONS = rf"""
WITH p AS (SELECT url, warc_ts FROM read_parquet('{_D}/pages.parquet')),
d AS ({_SQL_CANON_DOMAIN.format(src="p")}),
g AS (
  SELECT domain AS host, warc_ts,
         CASE WHEN epoch_us(warc_ts)
                   - LAG(epoch_us(warc_ts)) OVER (PARTITION BY domain
                                                  ORDER BY warc_ts)
                   > 1800000000
                OR LAG(warc_ts) OVER (PARTITION BY domain ORDER BY warc_ts)
                   IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM d
),
s AS (
  SELECT *, SUM(ns) OVER (PARTITION BY host ORDER BY warc_ts
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
)
SELECT epoch_us(MIN(warc_ts)) AS start_us,
       epoch_us(MAX(warc_ts)) + 1800000000 AS end_us,
       host, COUNT(*) AS n_pages
FROM s GROUP BY host, sess
-- append-mode emission: only sessions CLOSED by the final watermark
-- (global max event time - 10 min) are in the sink; the per-host tail
-- session is withheld in state when the query stops
HAVING epoch_us(MAX(warc_ts)) + 1800000000
       <= (SELECT epoch_us(MAX(warc_ts)) - 600000000 FROM p)
"""

REGISTRY["streaming_sessions"] = (q_streaming_sessions, SQL_STREAMING_SESSIONS)

REGISTRY["crawl_pipeline"] = (q_crawl_pipeline, SQL_CRAWL_PIPELINE)
REGISTRY["crawl_frontier_round"] = (q_crawl_frontier_round, SQL_CRAWL_ROUND)


# --------------------------------------------------------------------------
# r5: full DuckDB value oracles for the last three rows-only entries
# (VERDICT r4 item 2). The corpus html is pure-ASCII deterministic bytes
# (datagen.gen_pages), so decode(html) in DuckDB yields a VARCHAR whose
# UTF-8 bytes ARE the payload bytes: md5(decode(html)) == hashlib.md5(raw)
# and unicode(substr(...)) recovers individual byte values.
# --------------------------------------------------------------------------

# _byte_features (multimodal.py:50): strided sample data[::max(1, n//256)]
# → population mean/std. Sample index i contributes while i*step < n, so
# the series bound only needs to exceed max sample length (≤ 512).
SQL_CRAWL_MULTIMODAL = rf"""
WITH p AS (
  SELECT url, decode(html) AS s, octet_length(html) AS n
  FROM read_parquet('{_D}/pages.parquet')
),
st AS (SELECT url, s, n, greatest(1, n // 256) AS step FROM p),
b AS (
  SELECT st.url,
         unicode(substr(st.s, 1 + i.i * st.step, 1))::DOUBLE AS v
  FROM st JOIN generate_series(0, 600) AS i(i) ON i.i * st.step < st.n
),
g AS (SELECT url, AVG(v) AS m, AVG(v * v) AS m2 FROM b GROUP BY url)
SELECT p.url, p.n AS n_bytes, md5(p.s) AS content_hash,
  ROUND(g.m, 4) AS feat_mean,
  ROUND(sqrt(g.m2 - g.m * g.m), 4) AS feat_std
FROM p LEFT JOIN g USING (url)
"""

# sample_frames (multimodal.py:381): n_frames = n // 512, keep every 8th
# frame index; chunk i is bytes [i*512, (i+1)*512) — always full 512 bytes
# because i < n // 512.
SQL_CRAWL_FRAMES = rf"""
WITH p AS (
  SELECT url, decode(html) AS s, octet_length(html) AS n
  FROM read_parquet('{_D}/pages.parquet')
)
SELECT p.url,
  i.i::BIGINT AS frame_idx,
  i.i::DOUBLE / 25.0 AS ts_sec,
  512::BIGINT AS frame_bytes,
  md5(substr(p.s, 1 + i.i * 512, 512)) AS frame_hash
FROM p JOIN generate_series(0, 4095) AS i(i)
  ON i.i < p.n // 512 AND i.i % 8 = 0
"""

# streaming_ingest shares a BATCH oracle (the stream drains two identical
# copies of the pages batch; dropDuplicatesWithinWatermark collapses them
# back to one row per url with identical extracted values).
SQL_STREAMING_INGEST = rf"""
WITH pages AS (SELECT * FROM read_parquet('{_D}/pages.parquet')),
fetched AS (
  SELECT url, epoch(warc_ts)::BIGINT AS warc_ts, lang, decode(html) AS doc
  FROM pages
),
dom AS ({_SQL_CANON_DOMAIN.format(src="fetched")}),
ext AS (
  SELECT url, domain AS host, warc_ts, lang, {_SQL_EXTRACT_FIELDS},
    list_aggregate(list_filter(list_transform(
      string_split(regexp_replace(doc, '<[^>]+>', chr(10), 'g'), chr(10)),
      x -> trim(x)), x -> x <> ''), 'string_agg', chr(10)) AS extracted_text
  FROM dom
)
SELECT url, host, warc_ts, lang, product_name, product_price, probability,
  extracted_text,
  (probability IS NOT NULL AND probability <= 0.1) AS filtered,
  CASE WHEN probability IS NOT NULL AND probability <= 0.1
       THEN 'Zyte probability threshold' END AS filtered_at_stage
FROM ext
"""

REGISTRY["crawl_multimodal"] = (q_crawl_multimodal, SQL_CRAWL_MULTIMODAL)
REGISTRY["crawl_frames"] = (q_crawl_frames, SQL_CRAWL_FRAMES)
REGISTRY["streaming_ingest"] = (q_streaming_ingest, SQL_STREAMING_INGEST)


# --------------------------------------------------------------------------
# r5: raw-bytes→clean-text→frontier composite (VERDICT r4 item 4). The r4
# ingest operators existed only as standalone entries; this is the end-to-
# end ingest prefix of a frontier round as ONE DAG, the Spark analog of
# the reference's fetch→extract stage (zyte.py:50-98 →
# orchestrator.py:190-236) run over genuine archive bytes:
#
#   WARC bytes (sources/warc.py, binaryFile + Arrow record parser)
#     → charset sniff/repair (functions/charset.py — the only Python
#       stages are the two genuine codec kernels; everything after is
#       JVM whole-stage codegen)
#     → boilerplate block split + link-density (Kohlschütter-style)
#     → C4-style paragraph gates (len%3 punct stand-in + ≥5 words)
#     → out-link extraction → canonical_url → seen anti-join (archived
#       200s stand in for the Bloom/cuckoo SeenStore probe at test
#       scale; at 10^10 urls this exact anti-join IS the seen store's
#       partitioned probe, hash-partitioned on target) → robots gate
#     → per-page next-frontier contribution counts.
#
# Scale shape: records parse file-per-task (the Common-Crawl layout);
# the html string crosses ZERO exchanges (paragraph/link features are
# computed in the same stage that decodes); only (url, target) pairs and
# 32-byte hashes shuffle; robots is a broadcast dim.
# --------------------------------------------------------------------------

def q_crawl_ingest_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ingest round from raw archive bytes: per archived page, the
    decoded/cleaned-content features plus how many robots-allowed,
    not-yet-fetched urls the page contributes to the next frontier.

    The seen branch re-reads the archive (two scans here); a production
    round persists the parsed records table first (exactly what
    frontier/crawl.py's checkpointed rounds do) so the bytes are parsed
    once — the conformance entry keeps the single-DAG form so the whole
    path is one oracle-checked plan."""
    import os

    from fraudcrawler_spark.functions.charset import decode_payload_text
    from fraudcrawler_spark.functions.urls import (
        canonical_host_expr,
        canonical_url_expr,
    )
    from fraudcrawler_spark.sources.warc import read_warc

    corpus = _crawl_corpus()
    recs = read_warc(spark, os.path.join(corpus, "warc")).where(
        F.col("warc_type") == "response"
    )
    dec = decode_payload_text(
        recs.select(F.col("target_uri").alias("url"), "http_status", "payload")
    )

    html = F.col("html")
    blocks = dec.select(
        "url", "http_status", "detected_enc",
        F.regexp_extract_all(html, F.lit(r"<p[^>]*>(.*?)</p>"), 1).alias("paras"),
        F.regexp_extract_all(html, F.lit(r"<a [^>]*>(.*?)</a>"), 1).alias("links"),
        F.regexp_extract_all(html, F.lit(r'<a href="([^"]*)"'), 1).alias("hrefs"),
    )

    def chars(arr):
        return F.aggregate(
            F.transform(arr, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )

    kept = F.filter(
        F.col("paras"),
        lambda x: (F.length(x) % 3 != 2) & (F.size(F.split(x, " ")) >= 5),
    )
    feat = blocks.select(
        "url",
        canonical_host_expr(F.col("url")).alias("host"),
        "http_status", "detected_enc",
        F.size("paras").cast("long").alias("n_blocks"),
        chars(F.col("paras")).cast("long").alias("main_chars"),
        chars(F.col("links")).cast("long").alias("link_chars"),
        F.round(
            chars(F.col("links"))
            / (chars(F.col("paras")) + chars(F.col("links"))),
            4,
        ).alias("link_density"),
        kept.alias("kept"),
        F.size("hrefs").cast("long").alias("n_outlinks"),
        "hrefs",
    ).select(
        "url", "host", "http_status", "detected_enc",
        "n_blocks", "main_chars", "link_chars", "link_density",
        F.size("kept").cast("long").alias("n_kept"),
        (F.size("kept") >= 3).alias("content_kept"),
        F.when(F.size("kept") >= 3,
               F.md5(F.array_join("kept", "\n"))).alias("clean_hash"),
        "n_outlinks",
        "hrefs",
    )

    targets = (
        feat.select("url", F.explode("hrefs").alias("href"))
        .select("url", canonical_url_expr(F.col("href")).alias("target"))
        .distinct()
    )
    # seen = successfully archived pages (200s); 403s are re-queue
    # candidates. At 10^10 urls this anti-join is the partitioned
    # SeenStore probe (frontier/seen.py) — same key, same shape.
    seen = recs.where(F.col("http_status") == 200).select(
        F.col("target_uri").alias("target")
    )
    robots = spark.read.parquet(os.path.join(corpus, "robots.parquet"))
    tpath = F.regexp_replace(F.col("target"), r"^https?://[^/]+", "")
    frontier = (
        targets.join(seen, "target", "left_anti")
        .withColumn("thost", canonical_host_expr(F.col("target")))
        .join(F.broadcast(robots), F.col("thost") == robots["host"], "left")
        .where(
            ~F.exists(
                F.coalesce("disallow_prefixes", F.array().cast("array<string>")),
                lambda p: tpath.startswith(p),
            )
        )
        .groupBy("url")
        .agg(F.count("*").alias("n_frontier"))
    )

    return (
        feat.drop("hrefs")
        .join(frontier, "url", "left")
        .withColumn(
            "n_frontier", F.coalesce("n_frontier", F.lit(0)).cast("long")
        )
    )


SQL_CRAWL_INGEST_ROUND = rf"""
WITH rec AS (
  SELECT url,
    CAST(CASE WHEN url LIKE '%/private/%' THEN 403 ELSE 200 END
         AS BIGINT) AS http_status,
    decode(html) AS doc
  FROM read_parquet('{_D}/pages.parquet')
),
b AS (
  SELECT url, http_status,
    regexp_extract_all(doc, '<p[^>]*>(.*?)</p>', 1) AS paras,
    regexp_extract_all(doc, '<a [^>]*>(.*?)</a>', 1) AS links,
    regexp_extract_all(doc, '<a href="([^"]*)"', 1) AS hrefs
  FROM rec
),
feat AS (
  SELECT url,
    regexp_replace(lower(regexp_extract(url,
      '^(?:https?://)?(?:[^/@:?#]*@)?([^/@:?#]+)', 1)), '^www\.', '') AS host,
    http_status,
    'utf8' AS detected_enc,
    CAST(len(paras) AS BIGINT) AS n_blocks,
    CAST(coalesce(list_sum(list_transform(paras, x -> length(x))), 0)
         AS BIGINT) AS main_chars,
    CAST(coalesce(list_sum(list_transform(links, x -> length(x))), 0)
         AS BIGINT) AS link_chars,
    list_filter(paras, x -> length(x) % 3 <> 2
                        AND len(string_split(x, ' ')) >= 5) AS kept,
    CAST(len(hrefs) AS BIGINT) AS n_outlinks,
    hrefs
  FROM b
),
tgt AS (
  SELECT DISTINCT url,
    'https://' || regexp_replace(lower(regexp_extract(href,
       '^(?:https?://)?(?:[^/@:?#]*@)?([^/@:?#]+)', 1)), '^www\.', '')
     || regexp_replace(regexp_replace(href,
       '^(?:https?://)?(?:[^/@:?#]*@)?[^/@:?#]+', ''), '#.*$', '') AS target
  FROM (SELECT url, unnest(hrefs) AS href FROM b)
),
frontier AS (
  SELECT t.url, COUNT(*) AS n_frontier
  FROM tgt t
  LEFT JOIN read_parquet('{_D}/robots.parquet') r
    ON regexp_replace(lower(regexp_extract(t.target,
         '^(?:https?://)?(?:[^/@:?#]*@)?([^/@:?#]+)', 1)), '^www\.', '')
       = r.host
  WHERE t.target NOT IN (SELECT url FROM rec WHERE http_status = 200)
    AND NOT COALESCE(
      len(list_filter(COALESCE(r.disallow_prefixes, []),
          p -> starts_with(
            regexp_replace(t.target, '^https?://[^/]+', ''), p))) > 0,
      FALSE)
  GROUP BY t.url
)
SELECT f.url, f.host, f.http_status, f.detected_enc,
  f.n_blocks, f.main_chars, f.link_chars,
  ROUND(f.link_chars / (f.main_chars + f.link_chars), 4) AS link_density,
  CAST(len(f.kept) AS BIGINT) AS n_kept,
  len(f.kept) >= 3 AS content_kept,
  CASE WHEN len(f.kept) >= 3
       THEN md5(array_to_string(f.kept, chr(10))) END AS clean_hash,
  f.n_outlinks,
  CAST(COALESCE(fr.n_frontier, 0) AS BIGINT) AS n_frontier
FROM feat f LEFT JOIN frontier fr USING (url)
"""

REGISTRY["crawl_ingest_round"] = (q_crawl_ingest_round, SQL_CRAWL_INGEST_ROUND)


# --------------------------------------------------------------------------
# r5: robots.txt PARSER conformance entry. The politeness stage's
# robots_from_txt kernel (frontier/politeness.py:40 — simplified RFC 9309
# grouping, all JVM expressions) previously had unit tests but no DuckDB
# oracle row. The corpus now carries raw robots_txt text per host
# (datagen.generate_robots_txt): comments, decoy agent groups, mixed-case
# fields, stacked user-agent lines, named-group-beats-star — and the
# parse, for THIS engine's agent, must recover exactly the structured
# robots dim the crawl consumes (pinned separately in test_round5).
# --------------------------------------------------------------------------

def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw robots.txt → structured politeness rules for agent
    'fraudcrawler' (named groups preferred, '*' fallback), flattened for
    the driver compare: sorted-joined disallow prefixes + delay ms."""
    from fraudcrawler_spark.frontier.politeness import robots_from_txt

    raw = spark.read.parquet(f"{_crawl_corpus()}/robots_txt.parquet")
    dim = robots_from_txt(raw, user_agent="fraudcrawler")
    return dim.select(
        "host",
        F.size("disallow_prefixes").cast("long").alias("n_disallow"),
        F.array_join(F.array_sort("disallow_prefixes"), "|").alias("disallows"),
        "crawl_delay_ms",
    )


SQL_ROBOTS_PARSE = rf"""
WITH raw AS (
  SELECT DISTINCT host, robots_txt, md5(robots_txt) AS doc
  FROM read_parquet('{_D}/robots_txt.parquet')
),
lines0 AS (
  SELECT host, doc, i - 1 AS pos,
         trim(regexp_replace(ls[i], '#.*$', '')) AS line
  FROM (SELECT host, doc, string_split_regex(robots_txt, '\r?\n') AS ls
        FROM raw),
       UNNEST(generate_series(1, len(ls))) AS u(i)
),
lines AS (
  SELECT host, doc, pos,
    lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS key,
    trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS val
  FROM lines0 WHERE line <> ''
),
flags AS (
  SELECT *, CASE WHEN key = 'user-agent' AND COALESCE(
      LAG(key) OVER (PARTITION BY host, doc ORDER BY pos), '')
      <> 'user-agent' THEN 1 ELSE 0 END AS ng
  FROM lines
),
grp AS (
  SELECT *, SUM(ng) OVER (PARTITION BY host, doc ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM flags
),
per_group AS (
  SELECT host, doc, g,
    array_agg(DISTINCT lower(val)) FILTER (key = 'user-agent') AS agents,
    array_agg(val) FILTER (key = 'disallow' AND val <> '') AS disallows,
    MIN(CASE WHEN key = 'crawl-delay'
             THEN CAST(CAST(val AS DOUBLE) * 1000 AS BIGINT) END) AS delay_ms
  FROM grp GROUP BY host, doc, g
),
matched AS (
  SELECT *,
    COALESCE(list_contains(agents, 'fraudcrawler'), FALSE) AS m_named,
    COALESCE(list_contains(agents, '*'), FALSE) AS m_star,
    MAX(COALESCE(list_contains(agents, 'fraudcrawler'), FALSE)::INT)
      OVER (PARTITION BY host) > 0 AS has_named
  FROM per_group
)
SELECT host,
  CAST(COALESCE(len(list_distinct(flatten(list(COALESCE(disallows, []))))),
                0) AS BIGINT) AS n_disallow,
  COALESCE(array_to_string(list_sort(list_distinct(
      flatten(list(COALESCE(disallows, []))))), '|'), '') AS disallows,
  MIN(delay_ms) AS crawl_delay_ms
FROM matched
WHERE (has_named AND m_named) OR (NOT has_named AND m_star)
GROUP BY host
"""

REGISTRY["robots_parse"] = (q_robots_parse, SQL_ROBOTS_PARSE)


# --------------------------------------------------------------------------
# r5: sitemap discovery — parse raw per-host sitemap.xml (sources/
# sitemap.py, all-JVM regexp over the XML) and mark which listed urls the
# crawl has NOT archived yet (the frontier candidates sitemaps exist to
# volunteer). The anti-join side is the archived url set — at 10^10 urls
# that is the SeenStore probe; here it is exact, keyed on url.
# --------------------------------------------------------------------------

def q_sitemap_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap entries with archive status: (host, loc, lastmod,
    priority, archived) — `archived=false` rows are the urls sitemap
    discovery adds to the next frontier."""
    from fraudcrawler_spark.sources.sitemap import parse_sitemaps

    corpus = _crawl_corpus()
    raw = spark.read.parquet(f"{corpus}/sitemaps.parquet")
    pages = spark.read.parquet(f"{corpus}/pages.parquet").select("url")
    ents = parse_sitemaps(raw)
    return (
        ents.join(
            pages.withColumn("archived", F.lit(True)),
            ents["loc"] == pages["url"],
            "left",
        )
        .select(
            "host", "loc", "lastmod", "priority",
            F.coalesce("archived", F.lit(False)).alias("archived"),
        )
    )


SQL_SITEMAP_DISCOVER = rf"""
WITH raw AS (SELECT host, sitemap_xml
             FROM read_parquet('{_D}/sitemaps.parquet')),
blocks AS (
  SELECT host, unnest(regexp_extract_all(sitemap_xml,
      '(?s)<url>(.*?)</url>', 1)) AS block
  FROM raw
),
ents AS (
  SELECT host,
    trim(regexp_extract(block, '<loc>([^<]*)</loc>', 1)) AS loc,
    NULLIF(trim(regexp_extract(block, '<lastmod>([^<]*)</lastmod>', 1)),
           '') AS lastmod,
    TRY_CAST(NULLIF(trim(regexp_extract(block,
        '<priority>([^<]*)</priority>', 1)), '') AS DOUBLE) AS priority
  FROM blocks
)
SELECT e.host, e.loc, e.lastmod, e.priority,
  (p.url IS NOT NULL) AS archived
FROM ents e
LEFT JOIN read_parquet('{_D}/pages.parquet') p ON e.loc = p.url
WHERE e.loc <> ''
"""

REGISTRY["sitemap_discover"] = (q_sitemap_discover, SQL_SITEMAP_DISCOVER)


# --------------------------------------------------------------------------
# r5: CDX index emission — the Common-Crawl-style capture index every
# archive pipeline publishes next to its WARC files (SURT key, 14-digit
# timestamp, original url, payload digest, length). Pure JVM expressions
# over the parsed record table; the oracle regenerates every field
# analytically from the pages table the archive was written from (same
# trick as SQL_WARC_READ — the Spark side reads ONLY the bytes).
# --------------------------------------------------------------------------

def q_warc_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX(ish) index rows from the WARC archive bytes: SURT-sorted key
    (reversed host labels + path), yyyymmddhhmmss timestamp, url,
    status, sha256 payload digest, record payload length."""
    import os

    from fraudcrawler_spark.sources.warc import read_warc

    recs = read_warc(spark, os.path.join(_crawl_corpus(), "warc")).where(
        F.col("warc_type") == "response"
    )
    host = F.regexp_extract("target_uri", r"^https?://([^/]+)", 1)
    path = F.regexp_replace("target_uri", r"^https?://[^/]+", "")
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
    )
    ts = F.regexp_replace("warc_date", r"[^0-9]", "")
    return recs.select(
        surt.alias("surt_key"),
        ts.alias("ts"),
        F.col("target_uri").alias("original"),
        "http_status",
        F.col("payload_sha256").alias("digest"),
        F.col("content_length").alias("length"),
    )


SQL_WARC_CDX = rf"""
SELECT
  array_to_string(list_reverse(string_split(
      regexp_extract(url, '^https?://([^/]+)', 1), '.')), ',')
    || ')' || regexp_replace(url, '^https?://[^/]+', '') AS surt_key,
  strftime(warc_ts, '%Y%m%d%H%M%S') AS ts,
  url AS original,
  CAST(CASE WHEN url LIKE '%/private/%' THEN 403 ELSE 200 END
       AS BIGINT) AS http_status,
  sha256(decode(html)) AS digest,
  CAST(octet_length(html) AS BIGINT) AS length
FROM read_parquet('{_D}/pages.parquet')
"""

REGISTRY["warc_cdx"] = (q_warc_cdx, SQL_WARC_CDX)


# --------------------------------------------------------------------------
# r5 crawl-network operators (conformance_net.py): redirect-chain
# resolution by pointer doubling, URL-template trap detection, magic-byte
# MIME sniffing, and latency-adaptive politeness
# --------------------------------------------------------------------------
from fraudcrawler_spark import conformance_net as cn  # noqa: E402

REGISTRY["redirect_resolve"] = (
    cn.q_redirect_resolve, cn._sql_redirect_resolve()
)
REGISTRY["trap_detect"] = (cn.q_trap_detect, cn._sql_trap_detect())
REGISTRY["mime_sniff"] = (cn.q_mime_sniff, cn._sql_mime_sniff())
REGISTRY["host_latency_adapt"] = (
    cn.q_host_latency_adapt, cn._sql_host_latency_adapt(SQL_ROBOTS_PARSE)
)

# late-r5 crawl-operations trio (conformance_net.py): freshness-driven
# recrawl planning from sitemap lastmod, the per-host crawl-health
# report, and the skew-aware crawler shard planner. Registered AFTER the
# Registered late in r5; the end-of-round window rebuild pulled them
# into the r5 driver window (green CORRECTNESS_r05 rows), so the
# new-entries-next-window rule is already satisfied for these.
REGISTRY["recrawl_schedule"] = (
    cn.q_recrawl_schedule, cn._sql_recrawl_schedule()
)
REGISTRY["host_health"] = (cn.q_host_health, cn._sql_host_health())
REGISTRY["worker_assign"] = (cn.q_worker_assign, cn._sql_worker_assign())
REGISTRY["change_rate"] = (cn.q_change_rate, cn.SQL_CHANGE_RATE)
REGISTRY["domain_composition"] = (
    cn.q_domain_composition, cn._sql_domain_composition()
)
REGISTRY["crawl_depth"] = (cg.q_crawl_depth, cg._sql_crawl_depth())
REGISTRY["opic_priority"] = (cg.q_opic_priority, cg._sql_opic_priority())
REGISTRY["bm25_topk"] = (m.q_bm25_topk, m.SQL_BM25_TOPK)
REGISTRY["shipping_priority"] = (
    ct.q_shipping_priority, ct.SQL_SHIPPING_PRIORITY
)
REGISTRY["small_qty_revenue"] = (
    ct.q_small_qty_revenue, ct.SQL_SMALL_QTY_REVENUE
)
REGISTRY["cms_hot_shingles"] = (
    m.q_cms_hot_shingles, m._sql_cms_hot_shingles()
)


# --------------------------------------------------------------------------
# REAL image decode/resize (r3 verdict item 5): the corpus images table
# holds genuine 24-bit BMP files whose pixels are arithmetically defined
# (datagen.generate_images), so the pure-Python BMP codec's output is
# checkable by an ANALYTIC DuckDB twin that regenerates the pixel grid from
# the table's (width, height) metadata — metadata the Spark kernels never
# read (width/height/pixels all come from the bytes).
# --------------------------------------------------------------------------

def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BMP decode: width/height/pixel-stats recovered from the bytes
    alone (functions/bmp.py, mapInPandas Arrow batches)."""
    import os

    from fraudcrawler_spark.functions.multimodal import decode_image_meta

    imgs = spark.read.parquet(os.path.join(_crawl_corpus(), "images.parquet"))
    out = decode_image_meta(imgs.select("img_id", "img"))
    return out.select(
        "img_id", "width", "height", "n_bytes",
        F.round("px_mean", 4).alias("px_mean"),
        F.round("px_std", 4).alias("px_std"),
    )


# pixel formula (datagen.generate_images): channels of pixel (x, y), image k
_SQL_PX_GRID = """
  SELECT i.img_id, i.width, i.height, x.x AS x, y.y AS y
  FROM i
  JOIN generate_series(0, 31) AS x(x) ON x.x < i.width
  JOIN generate_series(0, 23) AS y(y) ON y.y < i.height
"""

SQL_IMAGE_DECODE = rf"""
WITH i AS (SELECT img_id, width, height
           FROM read_parquet('{_D}/images.parquet')),
px AS ({_SQL_PX_GRID}),
v AS (
  SELECT img_id, unnest([
    (7 * x + 13 * y + img_id) % 256,
    (3 * x + 5 * y + 2 * img_id) % 256,
    (11 * x + y + 3 * img_id) % 256]) AS v
  FROM px
),
s AS (SELECT img_id, AVG(v::DOUBLE) AS m, AVG((v * v)::DOUBLE) AS m2
      FROM v GROUP BY img_id)
SELECT i.img_id, i.width, i.height,
  -- 54-byte header + rows padded to 4 bytes, bottom-up
  54 + ((i.width * 3 + 3) // 4) * 4 * i.height AS n_bytes,
  ROUND(s.m, 4) AS px_mean,
  ROUND(sqrt(s.m2 - s.m * s.m), 4) AS px_std
FROM i JOIN s USING (img_id)
"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real thumbnail round-trip: decode BMP → nearest-neighbor resize to
    8×8 → re-encode BMP → decode AGAIN and report the resized pixel
    stats. The twin computes the same stats from the floor index map
    src = (dst * src_dim) // 8 — one formula both engines share."""
    import os

    from fraudcrawler_spark.functions.multimodal import (
        decode_image_meta,
        resize_image_bmp,
    )

    imgs = spark.read.parquet(os.path.join(_crawl_corpus(), "images.parquet"))
    resized = resize_image_bmp(imgs.select("img_id", "img"), out_w=8, out_h=8)
    out = decode_image_meta(resized)
    return out.select(
        "img_id", "width", "height", "n_bytes",
        F.round("px_mean", 4).alias("px_mean"),
        F.round("px_std", 4).alias("px_std"),
    )


SQL_IMAGE_RESIZE = rf"""
WITH i AS (SELECT img_id, width, height
           FROM read_parquet('{_D}/images.parquet')),
px AS (
  SELECT i.img_id,
         (x.x * i.width) // 8 AS sx,
         (y.y * i.height) // 8 AS sy
  FROM i
  JOIN generate_series(0, 7) AS x(x) ON TRUE
  JOIN generate_series(0, 7) AS y(y) ON TRUE
),
v AS (
  SELECT img_id, unnest([
    (7 * sx + 13 * sy + img_id) % 256,
    (3 * sx + 5 * sy + 2 * img_id) % 256,
    (11 * sx + sy + 3 * img_id) % 256]) AS v
  FROM px
),
s AS (SELECT img_id, AVG(v::DOUBLE) AS m, AVG((v * v)::DOUBLE) AS m2
      FROM v GROUP BY img_id)
SELECT img_id, 8 AS width, 8 AS height,
  54 + ((8 * 3 + 3) // 4) * 4 * 8 AS n_bytes,
  ROUND(m, 4) AS px_mean,
  ROUND(sqrt(m2 - m * m), 4) AS px_std
FROM s
"""

REGISTRY["image_decode"] = (q_image_decode, SQL_IMAGE_DECODE)
REGISTRY["image_resize"] = (q_image_resize, SQL_IMAGE_RESIZE)


# --------------------------------------------------------------------------
# REAL audio decode/resample: the corpus audio table holds genuine mono
# PCM16 WAV files (functions/wav.py encoder) whose sample stream is
# arithmetically defined (datagen.generate_audio: sample i of clip k is
# ((31·i + 17·k)·73) % 4001 − 2000 at 8 kHz), so the RIFF parser's output
# is checkable by an ANALYTIC DuckDB twin that regenerates the stream from
# the table's n_samples column — metadata the Spark kernels never read
# (rate/count/samples all come from the bytes).
# --------------------------------------------------------------------------

def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode: sample rate / count / duration / amplitude stats
    recovered from the bytes alone (functions/wav.py, mapInPandas Arrow
    batches)."""
    import os

    from fraudcrawler_spark.functions.multimodal import decode_audio_meta

    clips = spark.read.parquet(os.path.join(_crawl_corpus(), "audio.parquet"))
    out = decode_audio_meta(clips.select("clip_id", "wav"))
    return out.select(
        "clip_id", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("amp_mean", 4).alias("amp_mean"),
        F.round("amp_rms", 4).alias("amp_rms"),
    )


SQL_AUDIO_DECODE = rf"""
WITH a AS (SELECT clip_id, n_samples
           FROM read_parquet('{_D}/audio.parquet')),
s AS (
  SELECT a.clip_id, ((31 * i.i + 17 * a.clip_id) * 73) % 4001 - 2000 AS v
  FROM a JOIN generate_series(0, 4000) AS i(i) ON i.i < a.n_samples
),
g AS (SELECT clip_id, COUNT(*) AS n,
             AVG(v::DOUBLE) AS m, AVG((v * v)::DOUBLE) AS m2
      FROM s GROUP BY clip_id)
SELECT clip_id, 8000 AS sample_rate, n AS n_samples,
  ROUND(n::DOUBLE / 8000, 6) AS duration_s,
  ROUND(m, 4) AS amp_mean,
  ROUND(sqrt(m2), 4) AS amp_rms
FROM g
"""


def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real resample round-trip: decode WAV → decimate by 4 (keep sample
    indices 0, 4, 8, …) → re-encode at 2 kHz → decode AGAIN and report
    the resampled stats. The twin regenerates samples at the decimated
    indices — one index map both engines share."""
    import os

    from fraudcrawler_spark.functions.multimodal import (
        decode_audio_meta,
        resample_audio_wav,
    )

    clips = spark.read.parquet(os.path.join(_crawl_corpus(), "audio.parquet"))
    resampled = resample_audio_wav(clips.select("clip_id", "wav"), factor=4)
    out = decode_audio_meta(resampled)
    return out.select(
        "clip_id", "sample_rate", "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("amp_mean", 4).alias("amp_mean"),
        F.round("amp_rms", 4).alias("amp_rms"),
    )


SQL_AUDIO_RESAMPLE = rf"""
WITH a AS (SELECT clip_id, n_samples
           FROM read_parquet('{_D}/audio.parquet')),
s AS (
  SELECT a.clip_id,
         ((31 * (i.i * 4) + 17 * a.clip_id) * 73) % 4001 - 2000 AS v
  FROM a JOIN generate_series(0, 1000) AS i(i) ON i.i * 4 < a.n_samples
),
g AS (SELECT clip_id, COUNT(*) AS n,
             AVG(v::DOUBLE) AS m, AVG((v * v)::DOUBLE) AS m2
      FROM s GROUP BY clip_id)
SELECT clip_id, 2000 AS sample_rate, n AS n_samples,
  ROUND(n::DOUBLE / 2000, 6) AS duration_s,
  ROUND(m, 4) AS amp_mean,
  ROUND(sqrt(m2), 4) AS amp_rms
FROM g
"""

REGISTRY["audio_decode"] = (q_audio_decode, SQL_AUDIO_DECODE)
REGISTRY["audio_resample"] = (q_audio_resample, SQL_AUDIO_RESAMPLE)


# --------------------------------------------------------------------------
# REAL video decode/frame-sample: the corpus videos table holds genuine
# uncompressed 24-bit DIB AVI files (functions/avi.py encoder) whose
# pixels are arithmetically defined (datagen.generate_videos), so the
# RIFF/DIB parser's output is checkable by an ANALYTIC DuckDB twin that
# regenerates the pixel grid from the (width, height, n_frames) metadata
# — metadata the Spark kernels never read (dims/fps/frames all come from
# the bytes). Completes the multimodal triad: no stand-ins left.
# --------------------------------------------------------------------------

def q_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real AVI decode: dims / frame count / fps / whole-clip pixel stats
    recovered from the bytes alone (functions/avi.py, mapInPandas Arrow
    batches)."""
    import os

    from fraudcrawler_spark.functions.multimodal import decode_video_meta

    vids = spark.read.parquet(os.path.join(_crawl_corpus(), "videos.parquet"))
    out = decode_video_meta(vids.select("video_id", "avi"))
    return out.select(
        "video_id", "width", "height", "n_frames",
        F.round("fps", 2).alias("fps"),
        F.round("px_mean", 4).alias("px_mean"),
        F.round("px_std", 4).alias("px_std"),
    )


# pixel formula (datagen.generate_videos): channels of pixel (x, y) in
# frame t of video k
_SQL_VIDEO_VALS = """
  SELECT video_id, t, unnest([
    (7 * x + 13 * y + 5 * t + video_id) % 256,
    (3 * x + 5 * y + 11 * t + 2 * video_id) % 256,
    (11 * x + y + 7 * t + 3 * video_id) % 256]) AS val
  FROM px
"""

SQL_VIDEO_DECODE = rf"""
WITH v AS (SELECT video_id, width, height, n_frames
           FROM read_parquet('{_D}/videos.parquet')),
px AS (
  SELECT v.video_id, v.width, v.height, v.n_frames, t.t, x.x, y.y
  FROM v
  JOIN generate_series(0, 7) AS t(t) ON t.t < v.n_frames
  JOIN generate_series(0, 15) AS x(x) ON x.x < v.width
  JOIN generate_series(0, 11) AS y(y) ON y.y < v.height
),
c AS ({_SQL_VIDEO_VALS}),
s AS (SELECT video_id, AVG(val::DOUBLE) AS m, AVG((val * val)::DOUBLE) AS m2
      FROM c GROUP BY video_id)
SELECT v.video_id, v.width, v.height, v.n_frames,
  CAST(10.0 AS DOUBLE) AS fps,
  ROUND(s.m, 4) AS px_mean,
  ROUND(sqrt(s.m2 - s.m * s.m), 4) AS px_std
FROM v JOIN s USING (video_id)
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real frame sampling: decode AVI → keep frames 0, 2, 4, … → one row
    per sampled frame with its pixel stats (the 1→N Arrow fan-out a
    production PyAV sampler would use). The twin regenerates pixels at
    the sampled frame indices — one index map both engines share."""
    import os

    from fraudcrawler_spark.functions.multimodal import sample_frames_avi

    vids = spark.read.parquet(os.path.join(_crawl_corpus(), "videos.parquet"))
    out = sample_frames_avi(vids.select("video_id", "avi"), every=2)
    return out.select(
        "video_id", "frame_idx",
        F.round("px_mean", 4).alias("px_mean"),
        F.round("px_std", 4).alias("px_std"),
    )


SQL_VIDEO_FRAMES = rf"""
WITH v AS (SELECT video_id, width, height, n_frames
           FROM read_parquet('{_D}/videos.parquet')),
px AS (
  SELECT v.video_id, t.t, x.x, y.y
  FROM v
  JOIN generate_series(0, 7) AS t(t) ON t.t < v.n_frames AND t.t % 2 = 0
  JOIN generate_series(0, 15) AS x(x) ON x.x < v.width
  JOIN generate_series(0, 11) AS y(y) ON y.y < v.height
),
c AS ({_SQL_VIDEO_VALS}),
s AS (SELECT video_id, t, AVG(val::DOUBLE) AS m, AVG((val * val)::DOUBLE) AS m2
      FROM c GROUP BY video_id, t)
SELECT video_id, CAST(t AS BIGINT) AS frame_idx,
  ROUND(m, 4) AS px_mean,
  ROUND(sqrt(m2 - m * m), 4) AS px_std
FROM s
"""

REGISTRY["video_decode"] = (q_video_decode, SQL_VIDEO_DECODE)
REGISTRY["video_frames"] = (q_video_frames, SQL_VIDEO_FRAMES)


# --------------------------------------------------------------------------
# WARC source (sources/warc.py): the corpus pages archived as genuine
# gzip-member-per-record WARC/1.0 files, read back with binaryFile +
# mapInPandas. Every header the reader recovers FROM THE BYTES (record
# id, date, HTTP status, payload digest) is deterministic arithmetic over
# the pages table, so DuckDB regenerates the expected records without
# ever touching the archive.
# --------------------------------------------------------------------------

def q_warc_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest audit: every response record's id/uri/date/status/
    length/sha256 digest parsed from the archive bytes alone, digest
    re-verified against the record's own header."""
    import os

    from fraudcrawler_spark.sources.warc import read_warc

    recs = read_warc(spark, os.path.join(_crawl_corpus(), "warc"))
    return recs.where(F.col("warc_type") == "response").select(
        "record_id", "target_uri", "warc_date", "http_status",
        "content_length", "payload_sha256", "digest_ok",
    )


SQL_WARC_READ = rf"""
SELECT
  'urn:uuid:' || substr(m, 1, 8) || '-' || substr(m, 9, 4) || '-' ||
    substr(m, 13, 4) || '-' || substr(m, 17, 4) || '-' ||
    substr(m, 21, 12) AS record_id,
  url AS target_uri,
  strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
  CAST(CASE WHEN url LIKE '%/private/%' THEN 403 ELSE 200 END
       AS BIGINT) AS http_status,
  CAST(octet_length(html) AS BIGINT) AS content_length,
  sha256(decode(html)) AS payload_sha256,
  TRUE AS digest_ok
FROM (SELECT *, md5(url) AS m FROM read_parquet('{_D}/pages.parquet'))
"""


def q_warc_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl audit computed from the WARC archive alone —
    record counts, archived payload bytes, non-200 counts. The shape of
    the first report a 100 TB Common-Crawl ingest produces (group key =
    host parsed from WARC-Target-URI; one exchange)."""
    import os

    from fraudcrawler_spark.sources.warc import read_warc

    recs = read_warc(spark, os.path.join(_crawl_corpus(), "warc"))
    return (
        recs.where(F.col("warc_type") == "response")
        .select(
            F.regexp_extract("target_uri", r"^https?://([^/]+)", 1).alias("host"),
            "content_length",
            (F.col("http_status") != 200).cast("long").alias("err"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("content_length").alias("total_bytes"),
            F.sum("err").alias("n_errors"),
        )
    )


SQL_WARC_HOSTS = rf"""
SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
  CAST(COUNT(*) AS BIGINT) AS n_records,
  CAST(SUM(octet_length(html)) AS BIGINT) AS total_bytes,
  CAST(SUM(CASE WHEN url LIKE '%/private/%' THEN 1 ELSE 0 END)
       AS BIGINT) AS n_errors
FROM read_parquet('{_D}/pages.parquet')
GROUP BY 1
"""

REGISTRY["warc_read"] = (q_warc_read, SQL_WARC_READ)
REGISTRY["warc_hosts"] = (q_warc_hosts, SQL_WARC_HOSTS)


# --------------------------------------------------------------------------
# Charset sniffing + mojibake repair (functions/charset.py): the corpus
# raw_pages table stores each doc's bytes as UTF-8, windows-1252, or
# double-encoded mojibake; the Spark kernel recovers (encoding, clean
# text) from the BYTES alone, while the DuckDB twin reads ONLY the
# ground-truth metadata columns the kernel never touches.
# --------------------------------------------------------------------------

def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-style decode stage: sniff utf-8 / cp1252 / mojibake and emit
    repaired text, per document."""
    import os

    from fraudcrawler_spark.functions.charset import decode_text_bytes

    raw = spark.read.parquet(os.path.join(_crawl_corpus(), "raw_pages.parquet"))
    return decode_text_bytes(raw.select("doc_id", "data"))


SQL_CHARSET_DECODE = rf"""
SELECT doc_id,
  enc AS detected_enc,
  text_src AS text
FROM read_parquet('{_D}/raw_pages.parquet')
"""

REGISTRY["charset_decode"] = (q_charset_decode, SQL_CHARSET_DECODE)


# --------------------------------------------------------------------------
# Driver-window priority (r3 verdict item 1). The driver's correctness gate
# runs only the first 50 queries() entries, so this list pins who occupies
# the window: every entry that has never had a driver-green CORRECTNESS row
# (flagship composites first), then a few headline veterans in the slots
# that remain; everything else follows in registry order. New operators MUST
# be added here (near the top) until they earn a green row.
# --------------------------------------------------------------------------
# R6 REBUILD (VERDICT r5 item 3): lead with cms_hot_shingles — the one
# red CORRECTNESS_r05 row (values verified equal; dtype surface fixed
# this round, pinned by tests/test_round6.py) — then refresh the 13
# r1-r3-green veterans whose last driver check had been aging since the
# r5 rotation (each re-verified this round with a driver-surface
# toPandas-vs-.df() dtype+value compare at sf0.001 AND sf0.01: all
# equal), then the 29 entries whose first driver row was r5 (second
# green), then 7 shape-diverse multi-green veterans. Rotated out: 13
# double-green (r1-r4 AND r5) veterans — dedup_first_wins,
# dedup_prev_run, dedup_exact, dedup_simhash, embedding_near_dup,
# ann_topk, text_quality, text_langid, text_tokens_bpe_real,
# canonical_host, keyword_topk, set_except, market_share — all carried
# by the suite replay every round.
_DRIVER_WINDOW: list[str] = [
    "cms_hot_shingles",
    # 13 veteran refreshes (last driver row r1-r3)
    "country_flag",
    "marketplace_join",
    "excluded_anti_join",
    "topk_per_seed",
    "probability_flag",
    "union_dedup",
    "top_suppliers",
    "order_priority",
    "text_fingerprint",
    "fingerprint_winnow",
    "dedup_ngram_jaccard",
    "text_tokens",
    "text_tokens_bpe",
    # 29 first-checked-in-r5 entries (second green row)
    "bm25_topk",
    "crawl_depth",
    "domain_composition",
    "opic_priority",
    "shipping_priority",
    "small_qty_revenue",
    "streaming_fresh_join",
    "recrawl_schedule",
    "host_health",
    "worker_assign",
    "change_rate",
    "hits_centrality",
    "warc_hosts",
    "charset_decode",
    "boilerplate",
    "crawl_delta",
    "streaming_warc",
    "crawl_multimodal",
    "crawl_frames",
    "streaming_ingest",
    "crawl_ingest_round",
    "robots_parse",
    "sitemap_discover",
    "warc_cdx",
    "redirect_resolve",
    "trap_detect",
    "mime_sniff",
    "host_latency_adapt",
    "dsir_reweight",
    # 7 shape-diverse multi-green veterans
    "pricing_summary",
    "pipeline_composite",
    "dedup_minhash_lsh",
    "classify",
    "fetch_left_outer",
    "frontier_order",
    "politeness_cells",
]

# the driver correctness gate checks exactly the first 50 queries() —
# an oversized list silently pushes its own tail out of the window
assert len(_DRIVER_WINDOW) <= 50, (
    f"_DRIVER_WINDOW has {len(_DRIVER_WINDOW)} entries; trim veterans"
)

# r4: boilerplate removal — block-level link-density main-content
# extraction (Kohlschütter et al.), all-JVM regexp/array expressions
REGISTRY["boilerplate"] = (cc.q_boilerplate, cc._sql_boilerplate())

# r4: crawl snapshot delta — incremental-recrawl diff by content hash
# (hashes computed map-side; text never crosses the join exchange)
REGISTRY["crawl_delta"] = (cc.q_crawl_delta, cc.SQL_CRAWL_DELTA)


def q_streaming_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING WARC ingest with a full value oracle: tail a landing
    directory of arriving crawl segments (readStream binaryFile +
    the same Arrow record parser as batch, 2 files/micro-batch),
    availableNow through a parquet sink, read back. With deterministic
    input the streamed record table equals the batch read — so this
    STREAMING entry shares the batch `warc_read` oracle, the same way
    `streaming_sessions` is value-checked."""
    import os
    import shutil
    import tempfile

    from fraudcrawler_spark.sources.warc import read_warc_stream

    base = os.path.join(tempfile.gettempdir(), "fc_conf_stream_warc")
    shutil.rmtree(base, ignore_errors=True)
    indir = os.path.join(base, "in")
    os.makedirs(indir)
    src = os.path.join(_crawl_corpus(), "warc")
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), os.path.join(indir, f))

    recs = read_warc_stream(spark, indir, max_files_per_trigger=2)
    q = (
        recs.writeStream.format("parquet")
        .option("path", os.path.join(base, "out"))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates deterministically; assert the drain finished
    # instead of reading a partially-written sink on a contended host
    # (ADVICE r4)
    assert q.awaitTermination(120), (
        "streaming WARC drain did not finish within 120s"
    )
    out = spark.read.parquet(os.path.join(base, "out"))
    return out.where(F.col("warc_type") == "response").select(
        "record_id", "target_uri", "warc_date", "http_status",
        "content_length", "payload_sha256", "digest_ok",
    )


REGISTRY["streaming_warc"] = (q_streaming_warc, SQL_WARC_READ)


def q_streaming_fresh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM event-time join with a full value oracle: sitemap
    entries and archive snapshots arrive as two file streams; the
    watermarked ±365d interval join emits (entry, snapshot, staleness)
    rows (streaming/ingest.fresh_join_query — the continuous twin of
    the batch recrawl_schedule). With deterministic input the drained
    sink equals the batch join, so DuckDB value-checks a genuine
    stream-stream join the same way streaming_warc shares warc_read's
    oracle. Registered late r5; the end-of-round window rebuild pulled it into the r5 driver window (green CORRECTNESS_r05)."""
    import os
    import shutil
    import tempfile

    from fraudcrawler_spark.streaming.ingest import fresh_join_query

    base = os.path.join(tempfile.gettempdir(), "fc_conf_stream_fresh")
    shutil.rmtree(base, ignore_errors=True)
    pdir = os.path.join(base, "pages")
    sdir = os.path.join(base, "sitemaps")
    os.makedirs(pdir)
    os.makedirs(sdir)
    corpus = _crawl_corpus()
    shutil.copy(os.path.join(corpus, "pages.parquet"),
                os.path.join(pdir, "pages.parquet"))
    shutil.copy(os.path.join(corpus, "sitemaps.parquet"),
                os.path.join(sdir, "sitemaps.parquet"))

    q = (
        fresh_join_query(spark, pdir, sdir,
                         os.path.join(base, "out"),
                         os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), (
        "streaming fresh-join drain did not finish within 120s"
    )
    return spark.read.parquet(os.path.join(base, "out"))


def _sql_streaming_fresh_join() -> str:
    d = _corpus_sql_dir()
    return rf"""
WITH raw AS (SELECT host, sitemap_xml
             FROM read_parquet('{d}/sitemaps.parquet')),
blocks AS (
  SELECT host, unnest(regexp_extract_all(sitemap_xml,
      '(?s)<url>(.*?)</url>', 1)) AS block
  FROM raw
),
ents AS (
  SELECT host,
    trim(regexp_extract(block, '<loc>([^<]*)</loc>', 1)) AS loc,
    NULLIF(trim(regexp_extract(block, '<lastmod>([^<]*)</lastmod>', 1)),
           '') AS lastmod
  FROM blocks
  WHERE trim(regexp_extract(block, '<loc>([^<]*)</loc>', 1)) <> ''
),
te AS (
  SELECT host, loc, lastmod, TRY_CAST(lastmod AS TIMESTAMP) AS lastmod_ts
  FROM ents WHERE TRY_CAST(lastmod AS TIMESTAMP) IS NOT NULL
)
SELECT te.host, te.loc, te.lastmod,
  CAST(CAST(p.warc_ts AS DATE) AS VARCHAR) AS snap_date,
  CAST(date_diff('day', CAST(p.warc_ts AS DATE),
                 CAST(te.lastmod_ts AS DATE)) AS BIGINT) AS days_stale
FROM te
JOIN read_parquet('{d}/pages.parquet') p
  ON te.loc = p.url
 AND CAST(p.warc_ts AS TIMESTAMP) >= te.lastmod_ts - INTERVAL 365 DAY
 AND CAST(p.warc_ts AS TIMESTAMP) <= te.lastmod_ts + INTERVAL 365 DAY
"""


REGISTRY["streaming_fresh_join"] = (
    q_streaming_fresh_join, _sql_streaming_fresh_join()
)
