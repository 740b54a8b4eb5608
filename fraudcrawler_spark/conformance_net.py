"""Round-5 crawl-network operators: redirect-chain resolution, crawler-
trap detection, magic-byte MIME sniffing, and latency-adaptive
politeness.

Each query has a DuckDB twin (driver oracle). All four are declarative
DataFrame plans — zero Python UDFs — so per-row work stays in
whole-stage codegen and the only exchanges are hash joins/aggregations
on bounded keys (url for the redirect map, (host, template) for traps,
host for politeness).

Reference parity: the reference crawler follows redirects inside its
HTTP client (one url at a time, src/fraudcrawler/base/zyte.py) and has
no trap/MIME/adaptive-politeness stage; these are the distributed
generalizations a Common-Crawl-scale frontier needs (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# a crawler abandons a url after this many 3xx hops (browsers stop at
# ~20; politeness-conscious crawlers at 5-16). Cycles therefore resolve
# to 'too_many_redirects' instead of looping forever.
MAX_HOPS = 16


def _corpus() -> str:
    from fraudcrawler_spark.registry import _crawl_corpus

    return _crawl_corpus()


# --------------------------------------------------------------------------
# redirect_resolve — functional-graph pointer doubling
# --------------------------------------------------------------------------

def _absolutize(loc, src):
    """3xx Location headers may be host-relative; resolve against the
    source url's host (RFC 9110 §10.2.2)."""
    host = F.regexp_extract(src, r"^https?://([^/]+)", 1)
    return F.when(
        loc.startswith("/"), F.concat(F.lit("https://"), host, loc)
    ).otherwise(loc)


def resolve_redirect_map(red: DataFrame) -> DataFrame:
    """Resolve every redirect source to its final landing url via
    POINTER DOUBLING: each round composes the partial-resolution map
    with itself (cur → f(cur)), so a chain of length h settles in
    ceil(log2(h)) self-joins instead of h sequential lookups — 5 rounds
    cover MAX_HOPS=16 (2^5 = 32). At 10^10 urls each round is one hash
    join partitioned by url; the naive per-hop walk would be 16
    sequential shuffles of the full frontier.

    Input: (src_url, location, …). Output: (src_url, final_url, n_hops,
    status) with status 'ok' (landed on a non-redirect within MAX_HOPS)
    or 'too_many_redirects' (cycle or over-long chain; final_url/n_hops
    NULL — mid-cycle position is not meaningful). Also the engine's
    frontier preprocessor (frontier/crawl.py candidate stage)."""
    edges = red.select(
        F.col("src_url").alias("src"),
        _absolutize(F.col("location"), F.col("src_url")).alias("cur"),
    )
    srcs = edges.select(F.col("src").alias("s2"), F.lit(True).alias("hit"))
    m = edges.join(srcs, edges["cur"] == srcs["s2"], "left").select(
        "src",
        "cur",
        F.lit(1).cast("long").alias("hops"),
        F.col("hit").isNull().alias("done"),
    )
    rounds = max(1, (MAX_HOPS - 1).bit_length())  # 2^rounds >= MAX_HOPS
    for _ in range(rounds):
        # break lineage each round (same discipline as star_components):
        # without this the self-join doubles the WHOLE plan subtree per
        # round — 2^rounds - 1 joins in one DAG instead of `rounds`
        # materialized single-join stages. On a cluster this would be
        # reliable checkpoint()/a frontier table; local mode uses the
        # executor-local variant.
        m = m.localCheckpoint()
        if m.where(~F.col("done")).isEmpty():
            break  # every chain terminal — only cycles keep iterating
        t = m.select(
            F.col("src").alias("t_src"),
            F.col("cur").alias("t_cur"),
            F.col("hops").alias("t_hops"),
            F.col("done").alias("t_done"),
        )
        miss = F.col("t_src").isNull()
        m = (
            m.join(t, (m["cur"] == t["t_src"]) & (~m["done"]), "left")
            .select(
                "src",
                F.when(miss, F.col("cur")).otherwise(F.col("t_cur")).alias("cur"),
                F.when(miss, F.col("hops"))
                .otherwise(F.col("hops") + F.col("t_hops"))
                .alias("hops"),
                F.when(miss, F.col("done")).otherwise(F.col("t_done")).alias("done"),
            )
        )
    ok = F.col("done") & (F.col("hops") <= MAX_HOPS)
    return m.select(
        F.col("src").alias("src_url"),
        F.when(ok, F.col("cur")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("n_hops"),
        F.when(ok, F.lit("ok")).otherwise(F.lit("too_many_redirects")).alias("status"),
    )


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: resolve_redirect_map over the corpus redirects
    table (see that function for semantics and the scale argument)."""
    import os

    red = spark.read.parquet(os.path.join(_corpus(), "redirects.parquet"))
    return resolve_redirect_map(red)


def url_template_expr(url):
    """Collapse a url to its trap-mining template: strip scheme+host,
    query values → 'V', digit runs → 'N'. Shared by q_trap_detect and
    the engine's candidate gate so the two can never drift."""
    pathq = F.regexp_replace(url, r"^https?://[^/]+", "")
    return F.regexp_replace(
        F.regexp_replace(pathq, r"=[^&]*", "=V"), r"[0-9]+", "N"
    )


def _sql_redirect_resolve() -> str:
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
WITH RECURSIVE red AS (
  SELECT src_url,
    CASE WHEN location LIKE '/%'
         THEN 'https://' || regexp_extract(src_url, '^https?://([^/]+)', 1)
              || location
         ELSE location END AS nxt
  FROM read_parquet('{_corpus_sql_dir()}/redirects.parquet')
),
walk AS (
  SELECT src_url AS src, nxt AS cur, CAST(1 AS BIGINT) AS hops FROM red
  UNION ALL
  SELECT w.src, r.nxt, w.hops + 1
  FROM walk w JOIN red r ON w.cur = r.src_url
  WHERE w.hops < {MAX_HOPS}
),
last AS (
  SELECT src, arg_max(cur, hops) AS cur, max(hops) AS hops
  FROM walk GROUP BY src
)
SELECT l.src AS src_url,
  CASE WHEN t.src_url IS NULL THEN l.cur END AS final_url,
  CASE WHEN t.src_url IS NULL THEN l.hops END AS n_hops,
  CASE WHEN t.src_url IS NULL THEN 'ok'
       ELSE 'too_many_redirects' END AS status
FROM last l LEFT JOIN red t ON l.cur = t.src_url
"""


# --------------------------------------------------------------------------
# trap_detect — URL-template mining over the discovered-candidate stream
# --------------------------------------------------------------------------

def q_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap detection by URL-template aggregation: collapse each
    candidate's path+query to a template (query values → 'V', digit runs
    → 'N'), then per (host, template) count distinct urls. A template is
    a trap when it explodes (≥ 25 distinct urls) across ≥ 2 variable
    segments — calendar pages, session ids, faceted pagination — while a
    single-variable template (/pN: the host's real article space) never
    trips it. One hash aggregation on (host, template); url
    normalization is all-JVM regexp in whole-stage codegen."""
    import os

    cand = spark.read.parquet(
        os.path.join(_corpus(), "frontier_candidates.parquet")
    )
    template = url_template_expr(F.col("url"))
    d = cand.select(F.col("src_host").alias("host"), template.alias("template"), "url")
    agg = d.groupBy("host", "template").agg(
        F.countDistinct("url").alias("n_urls")
    )
    n_var = (
        F.length("template")
        - F.length(F.regexp_replace("template", r"[NV]", ""))
    ).cast("long")
    return agg.select(
        "host",
        "template",
        "n_urls",
        n_var.alias("n_var"),
        ((F.col("n_urls") >= 25) & (n_var >= 2)).alias("is_trap"),
    )


def _sql_trap_detect() -> str:
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
WITH d AS (
  SELECT src_host AS host, url,
    regexp_replace(
      regexp_replace(
        regexp_replace(url, '^https?://[^/]+', ''),
        '=[^&]*', '=V', 'g'),
      '[0-9]+', 'N', 'g') AS template
  FROM read_parquet('{_corpus_sql_dir()}/frontier_candidates.parquet')
),
agg AS (
  SELECT host, template, COUNT(DISTINCT url) AS n_urls
  FROM d GROUP BY host, template
)
SELECT host, template, n_urls,
  CAST(length(template) -
       length(regexp_replace(template, '[NV]', '', 'g')) AS BIGINT) AS n_var,
  (n_urls >= 25 AND
   length(template) - length(regexp_replace(template, '[NV]', '', 'g')) >= 2
  ) AS is_trap
FROM agg
"""


# --------------------------------------------------------------------------
# mime_sniff — magic-byte content-type detection vs the declared header
# --------------------------------------------------------------------------

def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sniff the real content type FROM THE BYTES (magic numbers: 'BM',
    'RIFF…WAVE', 'RIFF…AVI ', '<!doctype html'/'<html', printable-ascii
    fallback) and flag rows whose server-declared Content-Type lies —
    the real-web failure mode that poisons type-routed pipelines. The
    ground-truth `true_type` column is NEVER read here (the DuckDB twin
    reads ONLY that metadata — same analytic-oracle contract as the
    image/audio/video decode kernels). Map-only: zero exchanges; hex
    prefix tests are codegen'd JVM expressions."""
    import os

    media = spark.read.parquet(
        os.path.join(_corpus(), "media_headers.parquet")
    )
    hx = F.hex(F.substring(F.col("payload"), 1, 12))
    txt = F.col("payload").cast("string")
    low = F.lower(F.substring(txt, 1, 15))
    sniffed = (
        F.when(hx.startswith("424D"), "image/bmp")
        .when(
            hx.startswith("52494646") & (F.substring(hx, 17, 8) == F.lit("57415645")),
            "audio/x-wav",
        )
        .when(
            hx.startswith("52494646") & (F.substring(hx, 17, 8) == F.lit("41564920")),
            "video/x-msvideo",
        )
        .when(
            low.startswith("<!doctype html") | low.startswith("<html"),
            "text/html",
        )
        .when(txt.rlike(r"^[\t\n\r\x20-\x7e]*$"), "text/plain")
        .otherwise("application/octet-stream")
    )
    return media.select(
        "media_id",
        "declared_type",
        sniffed.alias("sniffed_type"),
        (sniffed != F.col("declared_type")).alias("mismatch"),
    )


def _sql_mime_sniff() -> str:
    # the oracle reads ONLY the true_type metadata column the Spark side
    # never touches: a correct sniffer must recover exactly true_type
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
SELECT media_id, declared_type,
  true_type AS sniffed_type,
  (true_type <> declared_type) AS mismatch
FROM read_parquet('{_corpus_sql_dir()}/media_headers.parquet')
"""


# --------------------------------------------------------------------------
# host_latency_adapt — observed-latency percentiles → politeness delays
# --------------------------------------------------------------------------

def host_latency_stats(
    log: DataFrame,
    factor: float = 4.0,
    floor_ms: float = 100.0,
    cap_ms: float = 10000.0,
) -> DataFrame:
    """Per-host fetch statistics the adaptive-politeness policy consumes:
    exact p50/p95 latency, 5xx error rate, adaptive_delay_ms =
    ceil(clip(factor·p95, floor, cap)), backoff = (5xx rate > 5%). One
    hash aggregation keyed by host. Shared by the q_host_latency_adapt
    conformance entry and the engine's `adaptive_politeness` hook
    (frontier/crawl.py) so the two can never drift."""
    adaptive = F.ceil(
        F.least(
            F.greatest(F.col("p95_ms") * factor, F.lit(floor_ms)),
            F.lit(cap_ms),
        )
    )
    return (
        log.groupBy("host")
        .agg(
            F.count("*").alias("n_fetches"),
            F.round(F.percentile("latency_ms", 0.5), 2).alias("p50_ms"),
            F.round(F.percentile("latency_ms", 0.95), 2).alias("p95_ms"),
            F.round(
                F.avg((F.col("status") >= 500).cast("double")), 4
            ).alias("err5xx_rate"),
        )
        .withColumn("adaptive_delay_ms", adaptive.cast("long"))
        .withColumn("backoff", F.col("err5xx_rate") > 0.05)
    )


def q_host_latency_adapt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-host politeness from the fetch log: exact p50/p95
    latency, 5xx error rate, and a recommended inter-request delay =
    max(robots crawl-delay, clip(4·p95, 100ms, 10s)) with a backoff flag
    when the 5xx rate exceeds 5% (the 'server is melting' signal real
    crawlers throttle on). One hash aggregation keyed by host + one
    broadcast join against the robots dim (host-level: always tiny
    relative to the fetch log)."""
    import os

    from fraudcrawler_spark.frontier.politeness import robots_from_txt

    log = spark.read.parquet(os.path.join(_corpus(), "fetch_log.parquet"))
    agg = host_latency_stats(log)
    robots = robots_from_txt(
        spark.read.parquet(os.path.join(_corpus(), "robots_txt.parquet")),
        user_agent="fraudcrawler",
    ).select("host", "crawl_delay_ms")
    return (
        agg.join(F.broadcast(robots), "host", "left")
        .select(
            "host",
            "n_fetches",
            "p50_ms",
            "p95_ms",
            "err5xx_rate",
            F.greatest(
                F.col("adaptive_delay_ms"),
                F.coalesce(F.col("crawl_delay_ms"), F.lit(0)),
            ).cast("long").alias("rec_delay_ms"),
            "backoff",
        )
    )


def _sql_host_latency_adapt(sql_robots_parse: str) -> str:
    """The robots side reuses the robots_parse oracle verbatim (host →
    crawl_delay_ms) so the two entries can never drift apart."""
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
WITH robots AS (
  SELECT host, crawl_delay_ms FROM ({sql_robots_parse})
),
agg AS (
  SELECT host,
    COUNT(*) AS n_fetches,
    round(quantile_cont(latency_ms, 0.5), 2) AS p50_ms,
    round(quantile_cont(latency_ms, 0.95), 2) AS p95_ms,
    round(avg(CASE WHEN status >= 500 THEN 1.0 ELSE 0.0 END), 4)
      AS err5xx_rate
  FROM read_parquet('{_corpus_sql_dir()}/fetch_log.parquet')
  GROUP BY host
)
SELECT a.host, a.n_fetches, a.p50_ms, a.p95_ms, a.err5xx_rate,
  CAST(greatest(
    ceil(least(greatest(a.p95_ms * 4, 100.0), 10000.0)),
    COALESCE(r.crawl_delay_ms, 0)) AS BIGINT) AS rec_delay_ms,
  (a.err5xx_rate > 0.05) AS backoff
FROM agg a LEFT JOIN robots r ON a.host = r.host
"""
