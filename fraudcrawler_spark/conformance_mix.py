"""Training-mix construction operators: deterministic stratified
sampling, train/val/test split assignment, shard shuffling, and
sequence packing.

These are the last mile of a 100-TB webtext pipeline: after dedup /
quality / decontamination (conformance_ml.py, conformance_corpus.py)
the surviving corpus must be sampled to a target mixture, split,
shuffled into training shards, and packed into fixed-length contexts.

Everything here is HASH-based, not RNG-based: `rand()` sampling is
irreproducible across retries/partitionings (a re-run re-samples), while
`h(doc_id) % K` is a pure column expression — the same doc always lands
in the same sample/split/shard on any cluster size, any retry, any
engine. That determinism is also what makes the DuckDB twins exact: the
shared hash is the repo's established cross-engine idiom
(first-8-hex-chars of md5 as a 32-bit uniform integer).

Plans: per-row hash expressions (whole-stage codegen) plus, for
shuffle/packing, one window per shard — shards are the partition key,
so 100 TB parallelizes across the shard count with no global sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fraudcrawler_spark.conformance_ml import _t

_N_SHARDS = 16  # test-scale; production 2^16 shards, same plan
_CTX_TOKENS = 256  # test-scale context length (docs are 10-99 tokens)


def _h32(col):
    """Shared cross-engine 32-bit uniform hash (md5 hex prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


_H32_SQL = "(('0x' || substr(md5({x}), 1, 8))::UBIGINT)::BIGINT"


# --------------------------------------------------------------------------
# stratified sampling to a target language mixture
# --------------------------------------------------------------------------

_LANG_PCT = {"en": 800, "de": 500}  # per-mille keep rates; default 250


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample to a target language mixture:
    keep 80% of en, 50% of de, 25% of everything else, by hash gate
    `h('samp:'||doc_id) % 1000 < rate`. Pure per-row filter — no
    shuffle, no RNG, retry-stable, and the complement set (the rejected
    docs) is recoverable by flipping the inequality.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    gate = F.pmod(
        _h32(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), F.lit(1000)
    )
    rate = (
        F.when(F.col("lang") == "en", F.lit(_LANG_PCT["en"]))
        .when(F.col("lang") == "de", F.lit(_LANG_PCT["de"]))
        .otherwise(F.lit(250))
    )
    return docs.select(
        "doc_id", "lang", "source", rate.alias("keep_per_mille")
    ).where(gate < rate)


SQL_STRATIFIED_SAMPLE = f"""
WITH g AS (
  SELECT doc_id, lang, source,
         CASE WHEN lang = 'en' THEN 800
              WHEN lang = 'de' THEN 500
              ELSE 250 END AS keep_per_mille,
         {_H32_SQL.format(x="'samp:' || doc_id::VARCHAR")} % 1000 AS gate
  FROM documents
)
SELECT doc_id, lang, source, keep_per_mille
FROM g WHERE gate < keep_per_mille
"""


# --------------------------------------------------------------------------
# train/val/test split assignment
# --------------------------------------------------------------------------


def q_split_assign(spark, sf_dir):
    """Deterministic 90/5/5 train/val/test assignment by hash bucket.
    A doc's split never changes with corpus growth, resampling, or
    cluster size — the property leakage-safe eval requires (and rand()
    cannot give).
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    b = F.pmod(
        _h32(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), F.lit(100)
    )
    return docs.select(
        "doc_id",
        b.alias("bucket_pct"),
        F.when(b < 90, F.lit("train"))
        .when(b < 95, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


SQL_SPLIT_ASSIGN = f"""
WITH g AS (
  SELECT doc_id,
         {_H32_SQL.format(x="'split:' || doc_id::VARCHAR")} % 100 AS bucket_pct
  FROM documents
)
SELECT doc_id, bucket_pct,
       CASE WHEN bucket_pct < 90 THEN 'train'
            WHEN bucket_pct < 95 THEN 'val'
            ELSE 'test' END AS split
FROM g
"""


# --------------------------------------------------------------------------
# shard shuffle (deterministic pseudo-random training order)
# --------------------------------------------------------------------------


def _sharded(docs):
    h = _h32(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    return docs.withColumn("h", h).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(_N_SHARDS))
    )


def q_corpus_shuffle(spark, sf_dir):
    """Shuffle the corpus into N training shards with a deterministic
    pseudo-random within-shard order: shard = h % N, position =
    row_number over (shard, ORDER BY h, doc_id). The window partitions
    on shard — at 2^16 production shards each holds ~corpus/65536 docs,
    so no task ever sees a global sort; this is exactly the "global
    shuffle" a data loader needs, without ever materializing a global
    permutation.
    """
    docs = _sharded(_t(spark, sf_dir, "documents").select("doc_id"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return docs.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


SQL_CORPUS_SHUFFLE = f"""
WITH g AS (
  SELECT doc_id,
         {_H32_SQL.format(x="'shuf:' || doc_id::VARCHAR")} AS h
  FROM documents
)
SELECT doc_id, h % {_N_SHARDS} AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id)
            AS INTEGER) AS pos
FROM g
"""


# --------------------------------------------------------------------------
# sequence packing into fixed-length contexts
# --------------------------------------------------------------------------


def q_sequence_pack(spark, sf_dir):
    """Pack the shuffled shard order into fixed-length training contexts
    (context = 256 tokens at test scale): a running token cumsum per
    shard assigns each doc the context it STARTS in (seq_id =
    cum_before / CTX) and its offset within it — the boundary-agnostic
    contiguous layout (docs straddle context edges, as GPT-style
    pretraining packs them). One cumsum window per shard, same
    partitioning as the shuffle — the two stages share one exchange at
    execution time.
    """
    docs = _sharded(
        _t(spark, sf_dir, "documents").select(
            "doc_id", F.size(F.split("text", " ")).alias("ntok")
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("ntok").over(w) - F.col("ntok")).alias("cum_before")
    out = docs.select("doc_id", "shard", "ntok", cum_before)
    return out.select(
        "doc_id",
        "shard",
        F.col("ntok").cast("long").alias("ntok"),
        F.floor(F.col("cum_before") / _CTX_TOKENS).cast("long").alias("seq_id"),
        F.pmod(F.col("cum_before"), F.lit(_CTX_TOKENS)).cast("long").alias("seq_offset"),
    )


SQL_SEQUENCE_PACK = f"""
WITH g AS (
  SELECT doc_id, len(string_split(text, ' ')) AS ntok,
         {_H32_SQL.format(x="'shuf:' || doc_id::VARCHAR")} AS h
  FROM documents
),
c AS (
  SELECT doc_id, h % {_N_SHARDS} AS shard, ntok,
         SUM(ntok) OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING) - ntok AS cum_before
  FROM g
)
SELECT doc_id, shard, CAST(ntok AS BIGINT) AS ntok,
       CAST(FLOOR(cum_before / {_CTX_TOKENS}) AS BIGINT) AS seq_id,
       CAST(cum_before % {_CTX_TOKENS} AS BIGINT) AS seq_offset
FROM c
"""


# --------------------------------------------------------------------------
# flagship composite: prepared corpus → training shards
# --------------------------------------------------------------------------


def q_corpus_to_shards(spark, sf_dir):
    """The full corpus-to-training-data DAG in one plan: corpus_prep
    (exact dedup → quality+Gopher gates → language filter,
    conformance_ml.q_corpus_prep) → train-split selection (hash bucket
    < 90) → shard shuffle → sequence packing. What a 100-TB webtext
    job actually ships: every stage reuses the individually-oracled
    operator, and the whole chain costs the prep's shuffles plus ONE
    shard exchange (row_number and the token cumsum share the same
    window partitioning).
    """
    from fraudcrawler_spark.conformance_ml import q_corpus_prep

    kept = q_corpus_prep(spark, sf_dir).select("doc_id", "n_tokens")
    b = F.pmod(
        _h32(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), F.lit(100)
    )
    h = _h32(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string")))
    tr = (
        kept.withColumn("bucket", b)
        .where(F.col("bucket") < 90)
        .withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(_N_SHARDS)))
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_before = F.sum("n_tokens").over(wsum) - F.col("n_tokens")
    return tr.select(
        "doc_id",
        "shard",
        F.row_number().over(w).alias("pos"),
        F.col("n_tokens").alias("ntok"),
        F.floor(cum_before / _CTX_TOKENS).cast("long").alias("seq_id"),
        F.pmod(cum_before, F.lit(_CTX_TOKENS)).cast("long").alias("seq_offset"),
    )


def _sql_corpus_to_shards() -> str:
    from fraudcrawler_spark.conformance_ml import SQL_CORPUS_PREP

    return f"""
WITH prep AS (
  SELECT doc_id, n_tokens FROM ({SQL_CORPUS_PREP}) q
),
sp AS (
  SELECT doc_id, n_tokens,
         {_H32_SQL.format(x="'split:' || doc_id::VARCHAR")} % 100 AS bucket,
         {_H32_SQL.format(x="'shuf:' || doc_id::VARCHAR")} AS h
  FROM prep
),
tr AS (SELECT * FROM sp WHERE bucket < 90),
c AS (
  SELECT doc_id, h % {_N_SHARDS} AS shard, n_tokens, h,
         SUM(n_tokens) OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before,
         CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id)
              AS INTEGER) AS pos
  FROM tr
)
SELECT doc_id, shard, pos, CAST(n_tokens AS BIGINT) AS ntok,
       CAST(FLOOR(cum_before / {_CTX_TOKENS}) AS BIGINT) AS seq_id,
       CAST(cum_before % {_CTX_TOKENS} AS BIGINT) AS seq_offset
FROM c
"""


SQL_CORPUS_TO_SHARDS = _sql_corpus_to_shards()


# --------------------------------------------------------------------------
# per-group sample (k deterministic examples per stratum)
# --------------------------------------------------------------------------


def q_group_sample(spark, sf_dir):
    """k=3 deterministic sample docs per (source) stratum: rank by the
    shared hash within each group, keep the top 3 — the "show me a few
    examples from every slice" query every corpus UI needs, and the
    per-group analog of reservoir sampling with a retry-stable rank.
    One window per group key; never a global sort.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    h = _h32(F.concat(F.lit("gs:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


SQL_GROUP_SAMPLE = f"""
WITH g AS (
  SELECT doc_id, source,
         {_H32_SQL.format(x="'gs:' || doc_id::VARCHAR")} AS h
  FROM documents
),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM g
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# mixture rebalancing weights
# --------------------------------------------------------------------------

_TARGET_MIX = {"en": 0.5, "de": 0.3}  # target token share; rest split evenly


def q_mixture_weights(spark, sf_dir):
    """Mixture rebalancing: given a target token share per language
    (en 50%, de 30%, remainder split evenly across other langs),
    compute each language's current token share and the per-doc
    sampling weight (target/current, capped at 1 — upsampling is a
    repeat-factor decision left to the loader) that the stratified
    sampler would consume. One aggregation + broadcast arithmetic —
    the mixture-design step between corpus stats and sampling.
    """
    docs = _t(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).alias("ntok")
    )
    per = docs.groupBy("lang").agg(F.sum("ntok").cast("double").alias("toks"))
    tot = per.agg(
        F.sum("toks").alias("all_toks"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    other_share = (
        F.lit(1.0 - sum(_TARGET_MIX.values())) / (F.col("n_langs") - len(_TARGET_MIX))
    )
    target = (
        F.when(F.col("lang") == "en", F.lit(_TARGET_MIX["en"]))
        .when(F.col("lang") == "de", F.lit(_TARGET_MIX["de"]))
        .otherwise(other_share)
    )
    cur = F.col("toks") / F.col("all_toks")
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("toks").cast("long").alias("n_tokens"),
        F.round(cur, 4).alias("current_share"),
        F.round(target, 4).alias("target_share"),
        F.round(F.least(target / cur, F.lit(1.0)), 4).alias("sample_weight"),
    )


SQL_MIXTURE_WEIGHTS = """
WITH per AS (
  SELECT lang, SUM(len(string_split(text, ' ')))::DOUBLE AS toks
  FROM documents GROUP BY lang
),
tot AS (SELECT SUM(toks) AS all_toks, COUNT(*) AS n_langs FROM per)
SELECT lang,
       CAST(toks AS BIGINT) AS n_tokens,
       ROUND(toks / all_toks, 4) AS current_share,
       ROUND(CASE WHEN lang = 'en' THEN 0.5
                  WHEN lang = 'de' THEN 0.3
                  ELSE 0.2 / (n_langs - 2) END, 4) AS target_share,
       ROUND(LEAST((CASE WHEN lang = 'en' THEN 0.5
                         WHEN lang = 'de' THEN 0.3
                         ELSE 0.2 / (n_langs - 2) END) / (toks / all_toks),
                   1.0), 4) AS sample_weight
FROM per, tot
"""


# --------------------------------------------------------------------------
# DSIR importance reweighting (r5)
# --------------------------------------------------------------------------

_DSIR_TARGET = ("src0", "src1")  # the 'high-quality domain' sources


def q_dsir_reweight(spark, sf_dir):
    """DSIR-style importance reweighting (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): treat
    sources src0/src1 as the TARGET domain, the rest as the raw pool,
    fit add-one-smoothed unigram LMs to both sides, and score every doc
    by the summed log importance ratio of its token occurrences
    Σ log p_tgt(t) − log p_src(t). Docs with positive weight look more
    target-like than pool-like — the resampling keep set.

    Plan (same shape as the perplexity family): one token-keyed hash
    aggregation builds BOTH frequency tables in a single pass (no
    per-side scans), totals broadcast, frequencies broadcast back onto
    the exploded tokens (web-scale vocab beyond broadcast range falls
    back to a token-key equi-join — same result), one per-doc
    aggregation. No Python anywhere.
    """
    from pyspark.sql import functions as F

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.split(F.lower("text"), " ").alias("toks"),
    )
    tok = docs.select("doc_id", "source", F.explode("toks").alias("t"))
    is_tgt = F.col("source").isin(*_DSIR_TARGET)
    freq = tok.groupBy("t").agg(
        F.sum(F.when(is_tgt, 1).otherwise(0)).cast("double").alias("c_tgt"),
        F.sum(F.when(is_tgt, 0).otherwise(1)).cast("double").alias("c_src"),
    )
    tot = freq.agg(
        F.sum("c_tgt").alias("n_tgt"),
        F.sum("c_src").alias("n_src"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ratio = F.log(
        (F.col("c_tgt") + 1.0) / (F.col("n_tgt") + F.col("v"))
    ) - F.log((F.col("c_src") + 1.0) / (F.col("n_src") + F.col("v")))
    # + 0.0 normalizes IEEE -0.0 (a doc whose ratio-sum is ±1e-17 —
    # sf1.0 replicas hit this — rounds to -0.0 in one engine, +0.0 in
    # the other; -0.0 + 0.0 = +0.0 in both)
    w = F.round(F.sum(ratio), 4) + F.lit(0.0)
    return (
        tok.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            w.alias("weight"),
            (w > 0).alias("selected"),
        )
    )


SQL_DSIR_REWEIGHT = """
WITH tok AS (
  SELECT doc_id::BIGINT AS doc_id, source,
         source IN ('src0', 'src1') AS is_tgt,
         unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
freq AS (
  SELECT t,
    SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END)::DOUBLE AS c_tgt,
    SUM(CASE WHEN is_tgt THEN 0 ELSE 1 END)::DOUBLE AS c_src
  FROM tok GROUP BY t
),
tot AS (
  SELECT SUM(c_tgt) AS n_tgt, SUM(c_src) AS n_src,
         COUNT(*)::DOUBLE AS v
  FROM freq
)
SELECT doc_id, source, COUNT(*) AS n_tokens,
  ROUND(SUM(ln((c_tgt + 1.0) / (n_tgt + v))
            - ln((c_src + 1.0) / (n_src + v))), 4) + 0.0 AS weight,
  (ROUND(SUM(ln((c_tgt + 1.0) / (n_tgt + v))
             - ln((c_src + 1.0) / (n_src + v))), 4) + 0.0 > 0) AS selected
FROM tok JOIN freq USING (t), tot
GROUP BY doc_id, source
"""
