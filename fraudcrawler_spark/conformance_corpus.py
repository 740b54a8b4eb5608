"""Round-3 corpus-governance operators for the training-data pipeline:
benchmark decontamination, PII detection/scrubbing, duplicate-passage
dedup, and per-source corpus statistics.

Each query has a DuckDB ANSI-SQL twin (driver oracle). All operators are
expressed as declarative DataFrame plans — no Python UDFs anywhere in
this module — so every one survives 100 TB: per-row expressions stay in
whole-stage codegen, and the only shuffles are equi-joins / hash
aggregations on bounded keys.

The synthetic `documents` table is a 31-word vocabulary with 10-99
tokens per doc, so gram size k=3 is used at test scale to produce
statistically meaningful overlap (31^3 ≈ 30k possible grams vs ~25k gram
positions at sf0.01). Production would use k=8..13 (Brown et al. 2020
use 13-gram decontamination; Lee et al. 2021 "Deduplicating Training
Data" use 50-token substrings) — the PLAN (explode → distinct →
equi-join → aggregate) is identical, only the literal changes.

Reference parity: the reference crawler has no corpus-governance stage
(it stops at per-listing CSV export, src/fraudcrawler/base/client.py);
these operators are the SURVEY.md §6 "training-data pipeline" extension
mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fraudcrawler_spark.conformance_ml import _t

_GRAM_K = 3  # test-scale gram size; production 8-13 (same plan)


def _gram_array(toks, n):
    """Array of k=3 word grams from a materialized token-array column.

    `toks` must be a real column (not an inline split expression):
    Catalyst performs no CSE through higher-order-function lambdas, so an
    inline split would be re-evaluated once per element.
    """
    return F.when(
        n >= _GRAM_K,
        F.transform(
            F.sequence(F.lit(1), n - (_GRAM_K - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _tokenized_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    return docs.withColumn("n", F.size("toks"))


# --------------------------------------------------------------------------
# benchmark decontamination (gram overlap vs a held-out eval split)
# --------------------------------------------------------------------------


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs whose k-gram overlap
    with the eval split exceeds 5% (GPT-3 appendix C / PaLM-style).

    The eval split is `doc_id % 97 == 0` (deterministic stand-in for a
    benchmark table). Plan: distinct grams per doc (one shuffle), eval
    grams broadcast into the overlap join (eval sets are tiny vs the
    corpus — a few MB of grams for any real benchmark suite, so the
    broadcast holds at 100 TB of training docs), then one hash
    aggregation per doc. No all-pairs stage anywhere.
    """
    docs = _tokenized_docs(spark, sf_dir)
    grams = (
        docs.select("doc_id", F.explode(_gram_array(F.col("toks"), F.col("n"))).alias("g"))
        .distinct()
    )
    eval_g = (
        grams.filter(F.pmod("doc_id", F.lit(97)) == 0).select("g").distinct()
        .withColumn("hit", F.lit(1))
    )
    train_g = grams.filter(F.pmod("doc_id", F.lit(97)) != 0)
    joined = train_g.join(F.broadcast(eval_g), "g", "left")
    frac = F.round(F.sum("hit") / F.count(F.lit(1)), 4)
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
            F.coalesce(frac, F.lit(0.0)).alias("contamination_frac"),
            (F.coalesce(frac, F.lit(0.0)) > 0.05).alias("flagged"),
        )
    )


SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
SELECT
  tr.doc_id,
  COUNT(*) AS n_grams,
  CAST(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_contaminated,
  ROUND(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        / COUNT(*), 4) AS contamination_frac,
  ROUND(SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        / COUNT(*), 4) > 0.05 AS flagged
FROM tr LEFT JOIN ev USING (g)
GROUP BY tr.doc_id
"""


# --------------------------------------------------------------------------
# PII detection + scrubbing
# --------------------------------------------------------------------------

_RE_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_RE_PHONE = r"\b555-[0-9]{4}\b"
_RE_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _pii_text_expr():
    """Deterministic PII injection (the synthetic corpus contains none):
    every 7th doc gains an email, every 11th a phone, every 13th an IP —
    composable, so doc 0 carries all three. Mirrored byte-for-byte in
    the SQL twin."""
    did = F.col("doc_id")
    email = F.when(
        F.pmod(did, F.lit(7)) == 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.pmod(did, F.lit(11)) == 0,
        F.concat(F.lit(" call 555-"), F.lpad(F.pmod(did, F.lit(10000)).cast("string"), 4, "0"), F.lit(" today")),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.pmod(did, F.lit(13)) == 0,
        F.concat(F.lit(" from 192.168."), F.pmod(did, F.lit(256)).cast("string"), F.lit(".1")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone, ip)


_PII_TEXT_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' from 192.168.' || (doc_id % 256) || '.1' ELSE '' END"
)


def q_pii_scrub(spark, sf_dir):
    """PII detection + scrubbing: count emails / phone numbers / IPs per
    doc and mask them with typed placeholders. Pure per-row regex
    expressions (whole-stage codegen, zero shuffles) — the canonical
    pre-training scrub stage, trivially scale-free.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = docs.withColumn("pt", _pii_text_expr())
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("pt"), _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE, "<PHONE>",
        ),
        _RE_IP, "<IP>",
    )
    return t.select(
        "doc_id",
        F.regexp_count(F.col("pt"), F.lit(_RE_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("pt"), F.lit(_RE_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(F.col("pt"), F.lit(_RE_IP)).cast("long").alias("n_ips"),
        F.md5(scrubbed).alias("scrub_hash"),
        (
            F.regexp_count(F.col("pt"), F.lit(_RE_EMAIL))
            + F.regexp_count(F.col("pt"), F.lit(_RE_PHONE))
            + F.regexp_count(F.col("pt"), F.lit(_RE_IP))
            > 0
        ).alias("has_pii"),
    )


SQL_PII_SCRUB = f"""
WITH pii AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS pt FROM documents
)
SELECT
  doc_id,
  CAST(len(regexp_extract_all(pt, '{_RE_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(pt, '{_RE_PHONE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(pt, '{_RE_IP}')) AS BIGINT) AS n_ips,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(pt, '{_RE_EMAIL}', '<EMAIL>', 'g'),
        '{_RE_PHONE}', '<PHONE>', 'g'),
      '{_RE_IP}', '<IP>', 'g')
  ) AS scrub_hash,
  len(regexp_extract_all(pt, '{_RE_EMAIL}'))
    + len(regexp_extract_all(pt, '{_RE_PHONE}'))
    + len(regexp_extract_all(pt, '{_RE_IP}')) > 0 AS has_pii
FROM pii
"""


# --------------------------------------------------------------------------
# duplicate-passage dedup (Lee et al. 2021 exact-substring family)
# --------------------------------------------------------------------------


def q_dedup_passage(spark, sf_dir):
    """Duplicate-passage fraction: for every k-gram POSITION in a doc,
    is that passage present in any other doc? Docs above 50% duplicated
    passages are near-dup flagged.

    Plan: explode positions → hash-aggregate gram → distinct-doc count
    (one shuffle, map-side partial), join counts back on the gram key
    (equi-join — at 100 TB both sides partition by gram hash, AQE handles
    the Zipf head), final per-doc aggregation. This is the scalable
    shape of exact-substring dedup: never all-pairs, never a suffix
    array on one node.
    """
    docs = _tokenized_docs(spark, sf_dir)
    grams = docs.select(
        "doc_id", F.explode(_gram_array(F.col("toks"), F.col("n"))).alias("g")
    )
    df_per_g = grams.groupBy("g").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    joined = grams.join(df_per_g, "g")
    dup = (F.col("nd") > 1).cast("int")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(dup).cast("long").alias("n_dup_passages"),
        F.round(F.sum(dup) / F.count(F.lit(1)), 4).alias("dup_frac"),
        (F.round(F.sum(dup) / F.count(F.lit(1)), 4) > 0.5).alias("near_dup"),
    )


SQL_DEDUP_PASSAGE = """
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
df AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY g
)
SELECT
  grams.doc_id,
  COUNT(*) AS n_passages,
  CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_passages,
  ROUND(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
    AS dup_frac,
  ROUND(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
    > 0.5 AS near_dup
FROM grams JOIN df USING (g)
GROUP BY grams.doc_id
"""


# --------------------------------------------------------------------------
# per-source corpus statistics (C4-style corpus report)
# --------------------------------------------------------------------------


def q_corpus_stats(spark, sf_dir):
    """Per-(source, lang) corpus report: doc count, total whitespace
    tokens, mean chars, exact interpolated median and p90 chars. One
    hash aggregation with map-side partials — the classic corpus
    accounting query; `percentile` is Spark's exact linear-interpolation
    percentile, matching DuckDB's quantile_cont.
    """
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            "n_chars",
            F.size(F.split("text", " ")).alias("ntok"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 2).alias("p50_chars"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 2).alias("p90_chars"),
        )
    )


SQL_CORPUS_STATS = """
SELECT
  source,
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  ROUND(AVG(n_chars), 2) AS avg_chars,
  ROUND(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
  ROUND(quantile_cont(n_chars, 0.9), 2) AS p90_chars
FROM documents
GROUP BY source, lang
"""


# --------------------------------------------------------------------------
# URL normalization (tracking-param strip + param sort)
# --------------------------------------------------------------------------


def q_url_normalize(spark, sf_dir):
    """Full URL normalization for frontier dedup: scheme/www/fragment
    canonicalization + tracking-parameter removal (utm_*, gclid, ...) +
    query-parameter sorting, via functions.urls.normalize_url_expr (all
    JVM array ops, hot-path safe).

    The oracle is ANALYTIC, not a SQL re-implementation: raw urls are
    synthesized deterministically from doc_id (www + shuffled params +
    two tracking params), and the twin CONSTRUCTS the expected
    normalized form directly — so the test proves the normalizer's
    output contract, not just twin-consistency.
    """
    from fraudcrawler_spark.functions.urls import normalize_url_expr

    d = _t(spark, sf_dir, "documents").select("doc_id")
    ds = F.col("doc_id").cast("string")
    raw = F.concat(
        F.lit("https://www.shop"), F.pmod("doc_id", F.lit(20)).cast("string"),
        F.lit(".ch/p/"), ds,
        F.lit("?utm_source=x&b=2&a=1&gclid="), ds,
        F.when(F.pmod("doc_id", F.lit(3)) == 0, F.lit("&z=9")).otherwise(F.lit("")),
        F.lit("#frag"),
    )
    return d.select(
        "doc_id", raw.alias("raw_url"), normalize_url_expr(raw).alias("url_norm")
    )


SQL_URL_NORMALIZE = """
SELECT
  doc_id,
  'https://www.shop' || (doc_id % 20) || '.ch/p/' || doc_id
    || '?utm_source=x&b=2&a=1&gclid=' || doc_id
    || CASE WHEN doc_id % 3 = 0 THEN '&z=9' ELSE '' END
    || '#frag' AS raw_url,
  'https://shop' || (doc_id % 20) || '.ch/p/' || doc_id
    || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2&z=9' ELSE '?a=1&b=2' END
    AS url_norm
FROM documents
"""


# --------------------------------------------------------------------------
# TF-IDF keyword extraction
# --------------------------------------------------------------------------


def q_tfidf_keywords(spark, sf_dir):
    """Top-3 keywords per document by tf-idf (score = tf * ln(N/df),
    ties broken by term) — the classic document-labeling operator; at
    crawl scale this is what tags every page with its salient terms.

    Plan: term-frequency hash agg per (doc, term), document-frequency
    hash agg per term broadcast back (vocab-sized — falls back to a
    term-key equi-join past broadcast range), scalar N via a broadcast
    1-row cross join, then a per-doc top-k window (partitioned by
    doc_id — never global).
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    )
    tf = d.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n = tf.select("doc_id").distinct().agg(F.count(F.lit(1)).cast("double").alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "t")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "t",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 4).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", F.col("t").alias("term"), F.col("rank").cast("long").alias("rank"), "score")
    )


SQL_TFIDF_KEYWORDS = """
WITH tok AS (
  SELECT doc_id::BIGINT AS doc_id, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
df AS (SELECT t, COUNT(*)::DOUBLE AS df FROM tf GROUP BY t),
n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM tf),
scored AS (
  SELECT doc_id, t,
         ROUND(tf * ln((SELECT n FROM n) / df), 4) AS score
  FROM tf JOIN df USING (t)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, t) AS rank
  FROM scored
)
SELECT doc_id, t AS term, CAST(rank AS BIGINT) AS rank, score
FROM ranked WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# skew diagnostics (Zipf-head report)
# --------------------------------------------------------------------------


def q_skew_report(spark, sf_dir):
    """Join/partition-key skew diagnostic: the 10 heaviest source keys
    with their share and cumulative share of all docs — the report that
    decides WHERE salting (salted_agg, politeness salt_shards) and AQE
    skew-join thresholds are needed. TakeOrderedAndProject top-k over a
    key-count aggregation plus one bounded window over ≤10 rows.
    """
    docs = _t(spark, sf_dir, "documents")
    total = docs.count()
    top = (
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "source")
        .limit(10)
    )
    # non-foldable constant partition key (pmod(col,1) == 0) keeps the
    # bounded 10-row window off the unpartitioned-WindowExec path
    w = (
        Window.partitionBy(F.pmod(F.col("n_docs"), F.lit(1)))
        .orderBy(F.col("n_docs").desc(), "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.lit(total), 4).alias("share"),
        F.round(F.sum("n_docs").over(w) / F.lit(total), 4).alias("cum_share"),
    )


SQL_SKEW_REPORT = """
WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
t AS (SELECT * FROM c ORDER BY n_docs DESC, source LIMIT 10)
SELECT source, n_docs,
       ROUND(n_docs::DOUBLE / (SELECT COUNT(*) FROM documents), 4) AS share,
       ROUND(SUM(n_docs) OVER (ORDER BY n_docs DESC, source
                               ROWS UNBOUNDED PRECEDING)::DOUBLE
             / (SELECT COUNT(*) FROM documents), 4) AS cum_share
FROM t
"""


def q_pii_eval(spark, sf_dir):
    """PII-scrub evaluation harness (r3 verdict item 8, langid_eval
    pattern): the injected ground truth is exact by construction — doc d
    truly carries an email iff d % 7 == 0, a phone iff d % 11 == 0, an
    IP iff d % 13 == 0 (_pii_text_expr) — so the regex detector's
    per-type TP/FP/FN, precision and recall are measurable without
    labels. One pass over q_pii_scrub's counts, exploded to one row per
    PII type, then a single hash agg. FP > 0 would mean the regexes
    misfire on organic corpus text; recall < 1 would mean an injected
    pattern escapes — both are the numbers a scrub stage must report
    before it is trusted at 100 TB.
    """
    did = F.col("doc_id")
    det = q_pii_scrub(spark, sf_dir).select(
        "doc_id",
        (F.col("n_emails") > 0).alias("d_email"),
        (F.col("n_phones") > 0).alias("d_phone"),
        (F.col("n_ips") > 0).alias("d_ip"),
        (F.pmod(did, F.lit(7)) == 0).alias("t_email"),
        (F.pmod(did, F.lit(11)) == 0).alias("t_phone"),
        (F.pmod(did, F.lit(13)) == 0).alias("t_ip"),
    )
    z = det.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("email").alias("pii_type"),
                    F.col("d_email").alias("det"),
                    F.col("t_email").alias("tru"),
                ),
                F.struct(
                    F.lit("phone").alias("pii_type"),
                    F.col("d_phone").alias("det"),
                    F.col("t_phone").alias("tru"),
                ),
                F.struct(
                    F.lit("ip").alias("pii_type"),
                    F.col("d_ip").alias("det"),
                    F.col("t_ip").alias("tru"),
                ),
            )
        ).alias("z")
    ).select("z.*")
    tp = F.sum((F.col("tru") & F.col("det")).cast("int")).cast("long")
    fp = F.sum((~F.col("tru") & F.col("det")).cast("int")).cast("long")
    fn = F.sum((F.col("tru") & ~F.col("det")).cast("int")).cast("long")
    return z.groupBy("pii_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("tru").cast("int")).cast("long").alias("n_true"),
        F.sum(F.col("det").cast("int")).cast("long").alias("n_detected"),
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        F.round(
            tp / F.greatest(F.sum(F.col("det").cast("int")), F.lit(1)), 4
        ).alias("precision"),
        F.round(
            tp / F.greatest(F.sum(F.col("tru").cast("int")), F.lit(1)), 4
        ).alias("recall"),
    )


SQL_PII_EVAL = f"""
WITH pii AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS pt FROM documents
),
det AS (
  SELECT doc_id,
    len(regexp_extract_all(pt, '{_RE_EMAIL}')) > 0 AS d_email,
    len(regexp_extract_all(pt, '{_RE_PHONE}')) > 0 AS d_phone,
    len(regexp_extract_all(pt, '{_RE_IP}')) > 0 AS d_ip,
    doc_id % 7 = 0 AS t_email,
    doc_id % 11 = 0 AS t_phone,
    doc_id % 13 = 0 AS t_ip
  FROM pii
),
z AS (
  SELECT 'email' AS pii_type, d_email AS det, t_email AS tru FROM det
  UNION ALL
  SELECT 'phone' AS pii_type, d_phone AS det, t_phone AS tru FROM det
  UNION ALL
  SELECT 'ip' AS pii_type, d_ip AS det, t_ip AS tru FROM det
)
SELECT pii_type,
  COUNT(*) AS n_docs,
  CAST(SUM(tru::INT) AS BIGINT) AS n_true,
  CAST(SUM(det::INT) AS BIGINT) AS n_detected,
  CAST(SUM((tru AND det)::INT) AS BIGINT) AS tp,
  CAST(SUM((NOT tru AND det)::INT) AS BIGINT) AS fp,
  CAST(SUM((tru AND NOT det)::INT) AS BIGINT) AS fn,
  ROUND(SUM((tru AND det)::INT)::DOUBLE
        / GREATEST(SUM(det::INT), 1), 4) AS precision,
  ROUND(SUM((tru AND det)::INT)::DOUBLE
        / GREATEST(SUM(tru::INT), 1), 4) AS recall
FROM z GROUP BY pii_type
"""


# --------------------------------------------------------------------------
# r4 additions: intra-doc paragraph dedup, URL quality heuristics, and the
# filter-funnel attrition report
# --------------------------------------------------------------------------


def q_paragraph_dedup(spark, sf_dir):
    """Intra-document repeated-line removal (the MassiveText/RefinedWeb
    in-doc repetition scrub — distinct from cross-doc passage dedup):
    split on newline, keep the FIRST occurrence of every line in
    original order, rejoin. Runs over the deterministically-noised text
    (conformance_ml._noisy_text_expr) so repeated boilerplate actually
    exists. Spark's array_distinct preserves first-occurrence order
    (pinned by the oracle: the DuckDB twin constructs first-occurrence
    order explicitly with a min-position window). Pure per-row array
    expressions — zero shuffles, trivially 100 TB-safe.
    """
    from fraudcrawler_spark.conformance_ml import _noisy_text_expr

    d = _t(spark, sf_dir, "documents").withColumn("text", _noisy_text_expr())
    lines = F.split(F.col("text"), "\n")
    dedup = F.array_distinct(lines)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(dedup)).cast("long").alias("n_removed"),
        F.md5(F.array_join(dedup, "\n")).alias("clean_hash"),
        F.length(F.array_join(dedup, "\n")).cast("long").alias("clean_len"),
    )


from fraudcrawler_spark.conformance_ml import _NOISY_TEXT_SQL  # noqa: E402

SQL_PARAGRAPH_DEDUP = f"""
WITH noised AS (
  SELECT doc_id, {_NOISY_TEXT_SQL} AS text FROM documents
),
base AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM noised),
pos AS (
  SELECT doc_id, ls[i] AS line, i
  FROM base, UNNEST(generate_series(1, len(ls))) AS t(i)
),
firsts AS (
  SELECT doc_id, line, i,
         MIN(i) OVER (PARTITION BY doc_id, line) AS first_i
  FROM pos
),
clean AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS cleaned
  FROM firsts WHERE i = first_i GROUP BY doc_id
)
SELECT b.doc_id,
  CAST(len(b.ls) AS BIGINT) AS n_lines,
  CAST(len(b.ls) - (SELECT COUNT(*) FROM firsts f
                    WHERE f.doc_id = b.doc_id AND f.i = f.first_i) AS BIGINT)
    AS n_removed,
  md5(c.cleaned) AS clean_hash,
  CAST(length(c.cleaned) AS BIGINT) AS clean_len
FROM base b JOIN clean c USING (doc_id)
"""


_URL_SPAM_RE = "(?i)(casino|viagra|xxx|free-money|replica)"


def q_url_quality(spark, sf_dir):
    """URL-level quality heuristics (the RefinedWeb/UT1-blocklist family:
    filter BEFORE fetching or tokenizing — the cheapest quality gate a
    crawl pipeline has): per-url path depth, query-parameter count,
    digit fraction of the path, spam-word hit, and the resulting keep
    flag, over the crawl corpus pages table. (The digit-fraction cut is
    0.9 here — ID-only paths — because the synthetic corpus urls are
    /p<number> shaped; published pipelines use ~0.5 on organic urls.) Pure codegen regex/string
    expressions, zero exchanges, scan prunes to the url column alone.
    """
    import os

    from fraudcrawler_spark.registry import _crawl_corpus

    pages = spark.read.parquet(os.path.join(_crawl_corpus(), "pages.parquet"))
    # deterministic URL-noise injection (corpus urls are uniform /p<number>
    # — without this every signal is constant and the oracle proves
    # nothing): every 9th page id gains a tracking-param tail, every 23rd
    # a spam path segment, every 31st a deep digit-id path
    pid = F.regexp_extract(F.col("url"), r"p(\d{6})", 1).cast("int")
    noisy_url = F.concat(
        F.col("url"),
        F.when(F.pmod(pid, F.lit(31)) == 0,
               F.concat(F.lit("/9"), F.lpad(pid.cast("string"), 12, "0"),
                        F.lit("/x/y/z/w/v/u"))).otherwise(F.lit("")),
        F.when(F.pmod(pid, F.lit(23)) == 0,
               F.lit("/casino-bonus")).otherwise(F.lit("")),
        F.when(F.pmod(pid, F.lit(9)) == 0,
               F.lit("?utm=1&ref=2&a=3&b=4&c=5")).otherwise(F.lit("")),
    )
    pages = pages.select(F.col("url").alias("orig_url"),
                         noisy_url.alias("url"))
    path = F.regexp_replace(F.col("url"), r"^https?://[^/]*", "")
    path_only = F.regexp_replace(path, r"\?.*$", "")
    q = F.regexp_extract(F.col("url"), r"\?(.*)$", 1)
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))
    )
    n_digits = F.length(F.regexp_replace(path_only, r"[^0-9]", ""))
    digit_frac = F.round(
        n_digits / F.greatest(F.length(path_only), F.lit(1)), 4
    )
    depth = F.when(
        F.regexp_replace(path_only, "/+$", "") == "", F.lit(0)
    ).otherwise(
        F.size(F.split(F.regexp_replace(path_only, "/+$", ""), "/")) - 1
    )
    spam = F.regexp_count(F.col("url"), F.lit(_URL_SPAM_RE)) > 0
    keep = (
        (F.length(F.col("url")) <= 200)
        & (depth <= 6)
        & (n_params.cast("int") <= 4)
        & (digit_frac <= 0.9)
        & ~spam
    )
    return pages.select(
        F.col("orig_url").alias("url"),
        depth.cast("long").alias("path_depth"),
        n_params.cast("long").alias("n_params"),
        digit_frac.alias("digit_frac"),
        spam.alias("spam_hit"),
        keep.alias("keep"),
    )


def _sql_url_quality() -> str:
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
WITH p0 AS (SELECT url AS orig_url,
        CAST(regexp_extract(url, 'p(\d{{6}})', 1) AS INT) AS pid
      FROM read_parquet('{_corpus_sql_dir()}/pages.parquet')),
p AS (
  SELECT orig_url,
    orig_url
    || CASE WHEN pid % 31 = 0
            THEN '/9' || lpad(CAST(pid AS VARCHAR), 12, '0') || '/x/y/z/w/v/u'
            ELSE '' END
    || CASE WHEN pid % 23 = 0 THEN '/casino-bonus' ELSE '' END
    || CASE WHEN pid % 9 = 0 THEN '?utm=1&ref=2&a=3&b=4&c=5' ELSE '' END
      AS url
  FROM p0
),
parts AS (
  SELECT orig_url, url,
    regexp_replace(regexp_replace(url, '^https?://[^/]*', ''), '\?.*$', '')
      AS path_only,
    regexp_extract(url, '\?(.*)$', 1) AS q
  FROM p
),
m AS (
  SELECT orig_url, path_only,
    CASE WHEN q = '' THEN 0 ELSE len(string_split(q, '&')) END AS n_params,
    length(regexp_replace(path_only, '[^0-9]', '', 'g')) AS n_digits,
    CASE WHEN regexp_replace(path_only, '/+$', '') = '' THEN 0
         ELSE len(string_split(regexp_replace(path_only, '/+$', ''), '/')) - 1
    END AS path_depth,
    regexp_matches(url, '(?i)(casino|viagra|xxx|free-money|replica)') AS spam_hit
  FROM parts
)
SELECT orig_url AS url,
  CAST(path_depth AS BIGINT) AS path_depth,
  CAST(n_params AS BIGINT) AS n_params,
  ROUND(n_digits::DOUBLE / GREATEST(length(path_only), 1), 4) AS digit_frac,
  spam_hit,
  (length(url) <= 200 AND path_depth <= 6 AND n_params <= 4
   AND n_digits::DOUBLE / GREATEST(length(path_only), 1) <= 0.9
   AND NOT spam_hit) AS keep
FROM m
"""


def q_filter_funnel(spark, sf_dir):
    """Filter-funnel attrition report: the per-stage survivor counts a
    production corpus pipeline publishes with every run (what fraction
    did the length gate drop? the quality gate? the PII gate?). Stages
    chain: total → len_ok (≥200 chars) → quality_ok (Gopher gate) →
    pii_clean. ONE scan computes all flags (quality signals + PII
    regexes per row), one single-row aggregation, then a 4-row explode —
    no per-stage jobs, so the report costs one pass at any scale.
    """
    from fraudcrawler_spark.conformance_ml import q_text_quality

    qual = q_text_quality(spark, sf_dir).select(
        "doc_id", "n_chars_calc", "dup_line_frac", "symbol_word_ratio"
    )
    pii = q_pii_scrub(spark, sf_dir).select("doc_id", "has_pii")
    j = qual.join(pii, "doc_id")
    len_ok = F.col("n_chars_calc") >= 200
    quality_ok = len_ok & ~(
        (F.col("dup_line_frac") > 0.30) | (F.col("symbol_word_ratio") > 0.10)
    )
    pii_clean = quality_ok & ~F.col("has_pii")
    agg = j.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(len_ok.cast("int")).alias("s1"),
        F.sum(quality_ok.cast("int")).alias("s2"),
        F.sum(pii_clean.cast("int")).alias("s3"),
    )
    row = F.explode(
        F.array(
            F.struct(F.lit(0).alias("stage_idx"), F.lit("total").alias("stage"),
                     F.col("total").alias("n_docs"), F.col("total").alias("prev")),
            F.struct(F.lit(1).alias("stage_idx"), F.lit("len_ok").alias("stage"),
                     F.col("s1").alias("n_docs"), F.col("total").alias("prev")),
            F.struct(F.lit(2).alias("stage_idx"), F.lit("quality_ok").alias("stage"),
                     F.col("s2").alias("n_docs"), F.col("s1").alias("prev")),
            F.struct(F.lit(3).alias("stage_idx"), F.lit("pii_clean").alias("stage"),
                     F.col("s3").alias("n_docs"), F.col("s2").alias("prev")),
        )
    )
    return agg.select(row.alias("z"), F.col("total")).select(
        F.col("z.stage_idx").cast("int").alias("stage_idx"),
        F.col("z.stage").alias("stage"),
        F.col("z.n_docs").cast("long").alias("n_docs"),
        F.round(F.col("z.n_docs") / F.col("total"), 4).alias("frac_of_total"),
        F.round(F.col("z.n_docs") / F.greatest(F.col("z.prev"), F.lit(1)), 4)
        .alias("frac_of_prev"),
    )


def _sql_filter_funnel() -> str:
    from fraudcrawler_spark.conformance_ml import SQL_TEXT_QUALITY

    return f"""
WITH q AS ({SQL_TEXT_QUALITY}),
pii AS (
  SELECT doc_id,
    (len(regexp_extract_all({_PII_TEXT_SQL}, '{_RE_EMAIL}'))
     + len(regexp_extract_all({_PII_TEXT_SQL}, '{_RE_PHONE}'))
     + len(regexp_extract_all({_PII_TEXT_SQL}, '{_RE_IP}'))) > 0 AS has_pii
  FROM documents
),
j AS (
  SELECT q.doc_id, q.n_chars_calc, q.dup_line_frac, q.symbol_word_ratio,
         pii.has_pii
  FROM q JOIN pii USING (doc_id)
),
f AS (
  SELECT COUNT(*) AS total,
    SUM((n_chars_calc >= 200)::INT) AS s1,
    SUM((n_chars_calc >= 200
         AND NOT (dup_line_frac > 0.30 OR symbol_word_ratio > 0.10))::INT) AS s2,
    SUM((n_chars_calc >= 200
         AND NOT (dup_line_frac > 0.30 OR symbol_word_ratio > 0.10)
         AND NOT has_pii)::INT) AS s3
  FROM j
)
SELECT 0 AS stage_idx, 'total' AS stage, CAST(total AS BIGINT) AS n_docs,
       ROUND(total::DOUBLE / total, 4) AS frac_of_total,
       ROUND(total::DOUBLE / GREATEST(total, 1), 4) AS frac_of_prev
FROM f
UNION ALL
SELECT 1, 'len_ok', CAST(s1 AS BIGINT),
       ROUND(s1::DOUBLE / total, 4), ROUND(s1::DOUBLE / GREATEST(total, 1), 4)
FROM f
UNION ALL
SELECT 2, 'quality_ok', CAST(s2 AS BIGINT),
       ROUND(s2::DOUBLE / total, 4), ROUND(s2::DOUBLE / GREATEST(s1, 1), 4)
FROM f
UNION ALL
SELECT 3, 'pii_clean', CAST(s3 AS BIGINT),
       ROUND(s3::DOUBLE / total, 4), ROUND(s3::DOUBLE / GREATEST(s2, 1), 4)
FROM f
"""


# --------------------------------------------------------------------------
# r4: decontamination evaluation harness (completes the eval pattern:
# langid_eval / lsh_eval / pii_eval / quality_eval → decontaminate_eval)
# --------------------------------------------------------------------------

# 20 distinct tokens ⇒ 18 distinct trigrams; appended to every eval doc and
# to the injected-contamination train docs, so ground truth is exact by
# construction (as with _pii_text_expr's modular injections).
_DECON_CANARY = (
    "benchmark canary alpha bravo charlie delta echo foxtrot golf hotel "
    "india juliett kilo lima mike november oscar papa quebec romeo"
)
_DECON_INJECT_MOD = 17  # train docs with doc_id % 17 == 0 get the canary


def q_decontaminate_eval(spark, sf_dir):
    """Decontamination-detector evaluation (r3 verdict item 8 pattern):
    plant a verbatim 20-token canary passage in every eval doc
    (doc_id % 97 == 0) AND in a known subset of train docs
    (doc_id % 17 == 0), run the same k-gram-overlap detector as
    q_decontaminate over the injected corpus, and score it against the
    construction-exact truth. Docs shorter than ~350 tokens are pushed
    over the 5% overlap threshold by 18 canary trigrams, so at this
    corpus's 10-99 token range recall measures the detector end-to-end;
    FP counts organic train/eval trigram collisions that clear 5% on
    their own — the number a 100-TB decontamination pass must report
    before it deletes real data. Same plan as q_decontaminate (distinct
    grams, broadcast eval-gram join, one hash agg) plus a final
    single-row confusion rollup.
    """
    did = F.col("doc_id")
    is_eval = F.pmod(did, F.lit(97)) == 0
    inject = is_eval | (F.pmod(did, F.lit(_DECON_INJECT_MOD)) == 0)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            inject, F.concat(F.lower("text"), F.lit(" " + _DECON_CANARY))
        ).otherwise(F.lower("text")).alias("txt"),
    )
    toks = docs.select("doc_id", F.split("txt", " ").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    grams = toks.select(
        "doc_id", F.explode(_gram_array(F.col("toks"), F.col("n"))).alias("g")
    ).distinct()
    eval_g = (
        grams.filter(F.pmod("doc_id", F.lit(97)) == 0)
        .select("g").distinct().withColumn("hit", F.lit(1))
    )
    train_g = grams.filter(F.pmod("doc_id", F.lit(97)) != 0)
    frac = F.coalesce(F.sum("hit") / F.count(F.lit(1)), F.lit(0.0))
    per_doc = (
        train_g.join(F.broadcast(eval_g), "g", "left")
        .groupBy("doc_id")
        .agg(
            (frac > 0.05).alias("det"),
            (F.pmod(F.first("doc_id"), F.lit(_DECON_INJECT_MOD)) == 0).alias("tru"),
        )
    )
    tp = F.sum((F.col("tru") & F.col("det")).cast("int")).cast("long")
    fp = F.sum((~F.col("tru") & F.col("det")).cast("int")).cast("long")
    fn = F.sum((F.col("tru") & ~F.col("det")).cast("int")).cast("long")
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_train"),
        F.sum(F.col("tru").cast("int")).cast("long").alias("n_true"),
        F.sum(F.col("det").cast("int")).cast("long").alias("n_detected"),
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        F.round(tp / F.greatest(F.sum(F.col("det").cast("int")), F.lit(1)), 4).alias(
            "precision"
        ),
        F.round(tp / F.greatest(F.sum(F.col("tru").cast("int")), F.lit(1)), 4).alias(
            "recall"
        ),
    )


SQL_DECONTAMINATE_EVAL = f"""
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 OR doc_id % {_DECON_INJECT_MOD} = 0
              THEN lower(text) || ' {_DECON_CANARY}'
              ELSE lower(text) END AS txt
  FROM documents
),
toks AS (SELECT doc_id, string_split(txt, ' ') AS t FROM docs),
grams AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0),
per_doc AS (
  SELECT tr.doc_id,
         SUM(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
           / COUNT(*) > 0.05 AS det,
         tr.doc_id % {_DECON_INJECT_MOD} = 0 AS tru
  FROM tr LEFT JOIN ev USING (g)
  GROUP BY tr.doc_id
)
SELECT
  COUNT(*) AS n_train,
  CAST(SUM(tru::INT) AS BIGINT) AS n_true,
  CAST(SUM(det::INT) AS BIGINT) AS n_detected,
  CAST(SUM((tru AND det)::INT) AS BIGINT) AS tp,
  CAST(SUM((NOT tru AND det)::INT) AS BIGINT) AS fp,
  CAST(SUM((tru AND NOT det)::INT) AS BIGINT) AS fn,
  ROUND(SUM((tru AND det)::INT)::DOUBLE / GREATEST(SUM(det::INT), 1), 4)
    AS precision,
  ROUND(SUM((tru AND det)::INT)::DOUBLE / GREATEST(SUM(tru::INT), 1), 4)
    AS recall
FROM per_doc
"""


# --------------------------------------------------------------------------
# C4 cleaning (Raffel et al. 2020 §2.2, the TensorFlow-Datasets c4
# pipeline): line-level keeps (terminal punctuation + ≥5 words),
# CROSS-CORPUS exact line dedup keeping the first occurrence, then
# doc-level drops ("lorem ipsum", code brace, <3 surviving sentences).
# Distinct from q_paragraph_dedup (intra-doc) and q_text_quality (Gopher
# signals): the line dedup here is global — whether a doc keeps a line
# depends on every other doc in the corpus.
#
# The synthetic documents table is newline- and punctuation-free, so the
# text is deterministically "webified" first (same CASE in both engines):
# an 8-word boilerplate line prepended to every 7th doc (the cross-doc
# duplicate mass), a lorem-ipsum tail on every 13th, a code-brace tail on
# every 19th, then chunked into 8-word lines; terminal punctuation is
# assigned per line by length(line) % 3 (0→'.', 1→'!', 2→none) so ~1/3 of
# lines fail the punctuation rule.
#
# Scale: one shuffle keyed on the line text for the keep-first window
# (prod: hash the line to 128 bits first so the exchange carries 16-byte
# keys, and salt the empty/boilerplate hot keys), one per-doc hash agg
# for the rollup. Everything else is per-row codegen. 100 TB-safe.
# --------------------------------------------------------------------------

_C4_BOILER = "subscribe to our newsletter for daily updates now"
_C4_LOREM = " lorem ipsum dolor sit amet consectetur adipiscing elit"
_C4_BRACE = " config { javascript payload }"
_C4_CHUNK_RE = r"((\S+ ){7}\S+) "


def q_c4_clean(spark, sf_dir):
    """C4 cleaning over the documents table: per-doc line counts through
    each gate (punct/short filter → global first-occurrence line dedup →
    doc-level lorem/brace/min-sentence drops) plus the cleaned-text hash
    for surviving docs."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    boilered = F.when(
        F.pmod(F.col("doc_id"), F.lit(7)) == 0,
        F.concat(F.lit(_C4_BOILER + " "), F.col("text")),
    ).otherwise(F.col("text"))
    tailed = (
        F.when(F.pmod(F.col("doc_id"), F.lit(13)) == 0,
               F.concat(boilered, F.lit(_C4_LOREM)))
        .when(F.pmod(F.col("doc_id"), F.lit(19)) == 0,
              F.concat(boilered, F.lit(_C4_BRACE)))
        .otherwise(boilered)
    )
    w = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_replace(tailed, _C4_CHUNK_RE, "$1\n").alias("text"),
    )

    docs = w.select(
        "doc_id", "text",
        F.size(F.split(F.col("text"), "\n")).cast("long").alias("n_lines"),
        F.col("text").contains("lorem ipsum").alias("has_lorem"),
        F.col("text").contains("{").alias("has_brace"),
    )

    lines = w.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\n")).alias("pos", "line")
    )
    m = F.length("line") % 3
    n_words = F.size(F.split(F.col("line"), " "))
    kept = lines.where((m != 2) & (n_words >= 5)).select(
        "doc_id", "pos",
        F.when(m == 0, F.concat(F.col("line"), F.lit(".")))
         .otherwise(F.concat(F.col("line"), F.lit("!"))).alias("line"),
    )

    # global keep-first: one exchange keyed on the line text
    win = Window.partitionBy("line").orderBy("doc_id", "pos")
    surv = kept.withColumn("rn", F.row_number().over(win)).where(F.col("rn") == 1)

    passed = kept.groupBy("doc_id").agg(F.count("*").alias("n_passed"))
    rolled = surv.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("cleaned"),
    )

    out = (
        docs.join(passed, "doc_id", "left")
        .join(rolled, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_passed", F.lit(0)).cast("long").alias("n_passed"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (~F.col("has_lorem") & ~F.col("has_brace")
             & (F.coalesce("n_kept", F.lit(0)) >= 3)).alias("doc_kept"),
            "cleaned",
        )
    )
    return out.select(
        "doc_id", "n_lines", "n_passed", "n_kept", "doc_kept",
        F.when(F.col("doc_kept"), F.md5(F.col("cleaned"))).alias("clean_hash"),
        F.when(F.col("doc_kept"), F.length("cleaned"))
         .cast("long").alias("clean_len"),
    )


SQL_C4_CLEAN = rf"""
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN '{_C4_BOILER} ' || text
              ELSE text END AS t
  FROM documents
),
w AS (
  SELECT doc_id,
         regexp_replace(
           CASE WHEN doc_id % 13 = 0 THEN t || '{_C4_LOREM}'
                WHEN doc_id % 19 = 0 THEN t || '{_C4_BRACE}'
                ELSE t END,
           '((\S+ ){{7}}\S+) ', '\1' || chr(10), 'g') AS text
  FROM b
),
docs AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         contains(text, 'lorem ipsum') AS has_lorem,
         contains(text, '{{') AS has_brace
  FROM w
),
pos AS (
  SELECT doc_id, ls[i] AS line, i - 1 AS pos
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM w),
       UNNEST(generate_series(1, len(ls))) AS u(i)
),
kept AS (
  SELECT doc_id, pos,
         line || CASE WHEN length(line) % 3 = 0 THEN '.' ELSE '!' END AS line
  FROM pos
  WHERE length(line) % 3 <> 2 AND len(string_split(line, ' ')) >= 5
),
surv AS (
  SELECT doc_id, pos, line,
         ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM kept
),
passed AS (SELECT doc_id, COUNT(*) AS n_passed FROM kept GROUP BY doc_id),
rolled AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS cleaned
  FROM surv WHERE rn = 1 GROUP BY doc_id
)
SELECT d.doc_id, d.n_lines,
  CAST(COALESCE(p.n_passed, 0) AS BIGINT) AS n_passed,
  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
  (NOT d.has_lorem AND NOT d.has_brace AND COALESCE(r.n_kept, 0) >= 3)
    AS doc_kept,
  CASE WHEN NOT d.has_lorem AND NOT d.has_brace
            AND COALESCE(r.n_kept, 0) >= 3
       THEN md5(r.cleaned) END AS clean_hash,
  CAST(CASE WHEN NOT d.has_lorem AND NOT d.has_brace
                 AND COALESCE(r.n_kept, 0) >= 3
            THEN length(r.cleaned) END AS BIGINT) AS clean_len
FROM docs d
LEFT JOIN passed p USING (doc_id)
LEFT JOIN rolled r USING (doc_id)
"""


# --------------------------------------------------------------------------
# r4: boilerplate removal (jusText/trafilatura-lite). Main-content
# extraction by block-level link density: paragraph blocks are content,
# anchor text is navigation chrome; a block-level density score is the
# classic boilerplate separator (Kohlschütter et al., WSDM 2010). Whole
# operator is JVM regexp/array expressions — zero Python, single scan,
# no shuffle — so it rides whole-stage codegen at any corpus size.
# --------------------------------------------------------------------------

def q_boilerplate(spark, sf_dir):
    """Per-page main-content extraction from raw html: paragraph blocks
    vs anchor (navigation) text, char-level link density, and the md5 of
    the extracted main text (the dedup/tokenize input downstream)."""
    import os

    from fraudcrawler_spark.registry import _crawl_corpus

    pages = spark.read.parquet(os.path.join(_crawl_corpus(), "pages.parquet"))
    html = F.col("html").cast("string")

    def chars(arr):
        return F.aggregate(
            F.transform(arr, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
        )

    d = pages.select(
        "url",
        F.regexp_extract_all(html, F.lit(r"<p[^>]*>(.*?)</p>"), 1).alias("paras"),
        F.regexp_extract_all(html, F.lit(r"<a [^>]*>(.*?)</a>"), 1).alias("links"),
    )
    return d.select(
        "url",
        F.size("paras").cast("long").alias("n_blocks"),
        chars(F.col("paras")).cast("long").alias("main_chars"),
        chars(F.col("links")).cast("long").alias("link_chars"),
        F.round(
            chars(F.col("links"))
            / (chars(F.col("paras")) + chars(F.col("links"))),
            4,
        ).alias("link_density"),
        F.md5(F.array_join("paras", "\n")).alias("main_hash"),
    )


def _sql_boilerplate():
    from fraudcrawler_spark.registry import _corpus_sql_dir

    d = _corpus_sql_dir()
    return rf"""
WITH p AS (
  SELECT url,
    regexp_extract_all(decode(html), '<p[^>]*>(.*?)</p>', 1) AS paras,
    regexp_extract_all(decode(html), '<a [^>]*>(.*?)</a>', 1) AS links
  FROM read_parquet('{d}/pages.parquet'))
SELECT url,
  CAST(len(paras) AS BIGINT) AS n_blocks,
  CAST(coalesce(list_sum(list_transform(paras, x -> length(x))), 0)
       AS BIGINT) AS main_chars,
  CAST(coalesce(list_sum(list_transform(links, x -> length(x))), 0)
       AS BIGINT) AS link_chars,
  ROUND(link_chars / (main_chars + link_chars), 4) AS link_density,
  md5(array_to_string(paras, chr(10))) AS main_hash
FROM p
"""


# --------------------------------------------------------------------------
# r4: crawl snapshot delta — the incremental-recrawl diff every archive
# pipeline runs between crawl t0 and t1 (added / removed / changed /
# unchanged by content hash). Deterministic snapshot construction from
# the documents table (A drops doc_id%11==3; B drops doc_id%13==5 and
# revises doc_id%7==2) keeps every status class populated at any sf.
# Scale shape: md5 is computed MAP-SIDE and the text column is projected
# away BEFORE the full-outer sort-merge join, so only (id, source, 32-
# byte hash) ever crosses the exchange — at 100 TB the shuffle carries
# ~1% of the corpus bytes; the join key is the uniform doc id (no skew).
# --------------------------------------------------------------------------

def q_crawl_delta(spark, sf_dir):
    """Snapshot diff by content hash: full-outer join of two crawl
    snapshots on the document key; emits one row per url in either
    snapshot with its delta status."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    a = docs.where(F.pmod(F.col("doc_id"), F.lit(11)) != 3).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.md5("text").alias("h_old"),
    )
    revised = F.when(
        F.pmod(F.col("doc_id"), F.lit(7)) == 2,
        F.concat(F.col("text"), F.lit(" [rev2]")),
    ).otherwise(F.col("text"))
    b = docs.where(F.pmod(F.col("doc_id"), F.lit(13)) != 5).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.md5(revised).alias("h_new"),
    )
    j = a.join(b, ["doc_id", "source"], "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select("doc_id", "source", status.alias("status"))


SQL_CRAWL_DELTA = """
WITH a AS (
  SELECT doc_id, source, md5(text) AS h_old
  FROM documents WHERE doc_id % 11 != 3),
b AS (
  SELECT doc_id, source,
    md5(CASE WHEN doc_id % 7 = 2 THEN text || ' [rev2]' ELSE text END) AS h_new
  FROM documents WHERE doc_id % 13 != 5)
SELECT CAST(COALESCE(a.doc_id, b.doc_id) AS BIGINT) AS doc_id,
  COALESCE(a.source, b.source) AS source,
  CASE WHEN a.doc_id IS NULL THEN 'added'
       WHEN b.doc_id IS NULL THEN 'removed'
       WHEN h_old != h_new THEN 'changed'
       ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id AND a.source = b.source
"""
