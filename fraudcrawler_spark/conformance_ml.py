"""Training-data operator conformance — dedup / similarity / text / multimodal.

Large-scale-pipeline operators over the ``documents`` and ``embeddings``
tables, each with a DuckDB oracle twin. Cross-engine determinism notes:
- shingle/minhash use md5 strings (lexicographic MIN is engine-neutral);
- simhash uses 16-bit md5-derived token hashes + per-bit vote sums
  (integer arithmetic only);
- cosine similarities are computed as double sums over exploded (pos,
  val) pairs and rounded to 4 decimals inside the query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraudcrawler_spark.session import local_df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# exact + fingerprint dedup
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content hash, first-doc-wins (hash-groupBy at scale:
    one shuffle on the fingerprint, no pairwise work)."""
    d = _t(spark, sf_dir, "documents")
    fp = F.md5(F.substring(F.col("text"), 1, 60))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        d.select(F.col("doc_id").cast("long").alias("doc_id"), fp.alias("fingerprint"))
        .withColumn("_rn", F.row_number().over(w))
        .select("doc_id", "fingerprint", (F.col("_rn") > 1).alias("is_dup"))
    )


SQL_DEDUP_EXACT = """
    SELECT doc_id::BIGINT AS doc_id, fingerprint, rn > 1 AS is_dup
    FROM (
      SELECT doc_id, md5(substr(text, 1, 60)) AS fingerprint,
             ROW_NUMBER() OVER (PARTITION BY md5(substr(text, 1, 60)) ORDER BY doc_id) AS rn
      FROM documents
    )
"""


def q_text_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
    )


SQL_TEXT_FINGERPRINT = """
    SELECT doc_id::BIGINT AS doc_id,
           md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
"""

# --------------------------------------------------------------------------
# shingle-based near-dup: n-gram Jaccard + MinHash LSH
# --------------------------------------------------------------------------

# Spark-side shingles: distinct word 3-grams of the first docs
def _shingles(spark, sf_dir, max_doc: int):
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < max_doc)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    d = d.select(F.col("doc_id").cast("long").alias("doc_id"), toks.alias("toks"))
    sh = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(" ", F.col("toks")[i], F.col("toks")[i + 1], F.col("toks")[i + 2]),
    )
    return (
        d.where(F.size("toks") >= 3)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


# DuckDB twin (1-based list indexing)
_SHINGLES_SQL = """
      SELECT DISTINCT doc_id::BIGINT AS doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents WHERE doc_id < {max_doc}
      ), UNNEST(range(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 3
"""


def ngram_jaccard_pairs(sh, threshold: float = 0.2, max_df: int | None = None):
    """Word-3-gram Jaccard near-dup pairs (shared-shingle join → count
    ratio). Scale path: the self-join is on the shingle key, so only docs
    sharing a shingle ever meet (no O(n²) cross join).

    max_df: document-frequency cap on join shingles. A shingle present in
    D docs contributes D·(D-1)/2 candidate pairs, so one hot shingle
    ("the quick brown" at web scale) makes the equi-join quadratic in that
    key. With max_df set, shingles whose doc-frequency exceeds it are
    dropped from CANDIDATE GENERATION and the common-count (standard
    stop-shingle practice — cf. SpotSigs, Theobald et al., SIGIR 2008);
    set sizes stay exact, so reported jaccard is a lower bound and pairs
    sharing only ultra-common shingles are the ones sacrificed. None = no
    cap = exact (the oracle configuration)."""
    sh = sh.cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    join_sh = sh
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        join_sh = sh.join(rare, "shingle", "left_semi")
    a = join_sh.select(F.col("doc_id").alias("a"), "shingle")
    b = join_sh.select(F.col("doc_id").alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .withColumn("jaccard", F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Oracle entry: exact configuration (max_df off — DuckDB twin has no
    cap; at 100-TB scale callers pass max_df to bound hot-shingle fan-out,
    see ngram_jaccard_pairs)."""
    return ngram_jaccard_pairs(_shingles(spark, sf_dir, 150), max_df=None)


SQL_NGRAM_JACCARD = f"""
    WITH sh AS ({_SHINGLES_SQL.format(max_doc=150)}),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS common
      FROM sh x JOIN sh y USING (shingle)
      WHERE x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id
    )
    SELECT a, b, ROUND(common / (sa.n + sb.n - common), 4) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE ROUND(common / (sa.n + sb.n - common), 4) >= 0.2
"""


def q_fingerprint_winnow(spark, sf_dir):
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS rolling-hash scheme): hash every word-3-gram, slide a
    w=4 window over the hash sequence, keep each window's minimum, emit
    the distinct selected hashes per doc. Guarantees any shared run ≥
    w+2 tokens yields a shared fingerprint — the rolling-hash dedup the
    whole-doc md5 (q_text_fingerprint) cannot give.

    Scale shape: per-doc partitioned window (never global), distinct =
    one hash shuffle on (doc_id, fp)."""
    sh = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sh = sh.select(F.col("doc_id").cast("long").alias("doc_id"), toks.alias("toks"))
    grams = sh.where(F.size("toks") >= 3).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 3),
                lambda i: F.concat_ws(
                    " ", F.col("toks")[i], F.col("toks")[i + 1], F.col("toks")[i + 2]
                ),
            )
        ).alias("pos", "gram"),
    )
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
    grams = grams.select("doc_id", "pos", h.alias("h"))
    w = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    )  # w=4 sliding window over the rolling hash sequence
    return (
        grams.withColumn("fp", F.min("h").over(w))
        .select("doc_id", "fp")
        .distinct()
    )


SQL_FINGERPRINT_WINNOW = """
    WITH grams AS (
      SELECT doc_id::BIGINT AS doc_id, i AS pos,
             (('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 8))::UBIGINT)::BIGINT AS h
      FROM (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        FROM documents WHERE doc_id < 150
      ), UNNEST(range(1, len(toks) - 1)) AS t(i)
      WHERE len(toks) >= 3
    )
    SELECT DISTINCT doc_id,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
    FROM grams
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs: per band the min md5(shingle#band) is
    the signature; docs bucket-join on (band, signature). Scale path: the
    pairwise work collapses to an equi-join on the band signature."""
    sh = _shingles(spark, sf_dir, 150)
    bands = spark.range(4).select(F.col("id").cast("int").alias("band"))
    sig = (
        sh.crossJoin(F.broadcast(bands))
        .select(
            "doc_id", "band",
            F.md5(F.concat(F.col("shingle"), F.lit("#"), F.col("band").cast("string"))).alias("h"),
        )
        .groupBy("doc_id", "band")
        .agg(F.min("h").alias("sig"))
    )
    a = sig.select(F.col("doc_id").alias("a"), "band", "sig")
    b = sig.select(F.col("doc_id").alias("b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


SQL_MINHASH_LSH = f"""
    WITH sh AS ({_SHINGLES_SQL.format(max_doc=150)}),
    sig AS (
      SELECT doc_id, band, MIN(md5(shingle || '#' || band::VARCHAR)) AS sig
      FROM sh, (SELECT UNNEST([0,1,2,3]) AS band)
      GROUP BY doc_id, band
    )
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM sig x JOIN sig y USING (band, sig)
    WHERE x.doc_id < y.doc_id
"""


def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash: md5-derived token hash, per-bit majority vote.
    Integer-only arithmetic ⇒ bit-exact across engines."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    simhash = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return agg.select("doc_id", simhash.cast("long").alias("simhash"))


_SIMHASH_VOTES_SQL = ", ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}" for j in range(16)
)
_SIMHASH_COMBINE_SQL = " + ".join(
    f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16)
)
SQL_SIMHASH = f"""
    WITH toks AS (
      SELECT doc_id::BIGINT AS doc_id,
             (('0x' || substr(md5(tok), 1, 4))::UBIGINT)::BIGINT AS h
      FROM (
        SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ), agg AS (
      SELECT doc_id, {_SIMHASH_VOTES_SQL} FROM toks GROUP BY doc_id
    )
    SELECT doc_id, ({_SIMHASH_COMBINE_SQL})::BIGINT AS simhash FROM agg
"""

def q_dedup_simhash64(spark, sf_dir):
    """64-bit SimHash as four independent 16-bit slices s0..s3, each
    voted from its own 4-hex-char slice of the token md5 (integer-only ⇒
    bit-exact across engines).

    WHY 64-bit (r3): banded candidate generation over a 16-bit simhash
    has only 2^4 = 16 values per 4-bit band, so bucket occupancy grows as
    n/16 and the candidate count stays quadratic/16 — measured at 5,000
    docs the all-pairs scan actually beats 16-bit banding. With 64 bits
    and 16-bit bands there are 65,536 values per band: buckets hold only
    genuinely-near duplicates and candidate volume is bounded by real
    collision mass, which is the asymptotic property the 100-TB path
    needs. Keeping the hash as four 16-bit slice columns (= the band
    keys) avoids signed-overflow gymnastics in both engines."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    md5 = F.md5(F.col("tok"))
    toks = toks.select(
        "doc_id",
        *[
            F.conv(F.substring(md5, 4 * k + 1, 4), 16, 10).cast("long").alias(f"h{k}")
            for k in range(4)
        ],
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col(f"h{k}"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{k}_{j}")
        for k in range(4)
        for j in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    slices = []
    for k in range(4):
        s = None
        for j in range(16):
            bit = F.when(F.col(f"v{k}_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            s = bit if s is None else s + bit
        slices.append(s.cast("long").alias(f"s{k}"))
    return agg.select("doc_id", *slices)


def _simhash64_sql(max_doc: int | None = None) -> str:
    where = f"WHERE doc_id < {max_doc}" if max_doc is not None else ""
    hs = ", ".join(
        f"(('0x' || substr(m, {4 * k + 1}, 4))::UBIGINT)::BIGINT AS h{k}"
        for k in range(4)
    )
    votes = ", ".join(
        f"SUM(CASE WHEN (h{k} >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{k}_{j}"
        for k in range(4) for j in range(16)
    )
    slices = ", ".join(
        "(" + " + ".join(
            f"CASE WHEN v{k}_{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16)
        ) + f")::BIGINT AS s{k}"
        for k in range(4)
    )
    return f"""
      SELECT doc_id, {slices} FROM (
        SELECT doc_id, {votes} FROM (
          SELECT doc_id::BIGINT AS doc_id, {hs} FROM (
            SELECT doc_id, md5(tok) AS m FROM (
              SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
              FROM documents {where}
            ) WHERE tok <> ''
          )
        ) GROUP BY doc_id
      )"""


SQL_SIMHASH64 = _simhash64_sql()


def simhash64_pairs_banded(sh, max_hamming: int = 3):
    """Banded candidates over the 64-bit simhash: each 16-bit slice IS a
    band key (65,536 values). Pigeonhole: hamming ≤ 3 < 4 bands ⇒ some
    slice exactly equal — lossless vs the all-pairs scan, candidate
    volume bounded by true collision mass."""
    bands = F.array(*[
        F.struct(F.lit(k).alias("band"), F.col(f"s{k}").alias("bkey"))
        for k in range(4)
    ])
    keyed = sh.select(
        "doc_id", "s0", "s1", "s2", "s3", F.explode(bands).alias("bk")
    ).select("doc_id", "s0", "s1", "s2", "s3",
             F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    a = keyed.select(
        F.col("doc_id").alias("a"), "band", "bkey",
        *[F.col(f"s{k}").alias(f"a{k}") for k in range(4)],
    )
    b = keyed.select(
        F.col("doc_id").alias("b"), "band", "bkey",
        *[F.col(f"s{k}").alias(f"b{k}") for k in range(4)],
    )
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", *[f"a{k}" for k in range(4)], *[f"b{k}" for k in range(4)])
        .distinct()
    )
    hamming = None
    for k in range(4):
        h = F.expr(f"bit_count(a{k} ^ b{k})")
        hamming = h if hamming is None else hamming + h
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def simhash64_pairs_allpairs(sh, max_hamming: int = 3):
    """All-pairs twin (oracle / crossover measurement only)."""
    a = sh.select(F.col("doc_id").alias("a"),
                  *[F.col(f"s{k}").alias(f"a{k}") for k in range(4)])
    b = sh.select(F.col("doc_id").alias("b"),
                  *[F.col(f"s{k}").alias(f"b{k}") for k in range(4)])
    hamming = None
    for k in range(4):
        h = F.expr(f"bit_count(a{k} ^ b{k})")
        hamming = h if hamming is None else hamming + h
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", hamming.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def q_simhash64_pairs_banded(spark, sf_dir, cap: int = 300):
    """PRIMARY 64-bit near-dup pairs (banded equi-join; oracle = the
    all-pairs SQL below, identical result by pigeonhole)."""
    sh = q_dedup_simhash64(spark, sf_dir).where(F.col("doc_id") < cap)
    return simhash64_pairs_banded(sh)


_S64_HAMMING_SQL = " + ".join(
    f"bit_count(xor(x.s{k}, y.s{k}))" for k in range(4)
)

SQL_SIMHASH64_PAIRS = f"""
    WITH sh AS ({_simhash64_sql(300)})
    SELECT x.doc_id AS a, y.doc_id AS b,
           ({_S64_HAMMING_SQL})::BIGINT AS hamming
    FROM sh x JOIN sh y ON x.doc_id < y.doc_id
    WHERE ({_S64_HAMMING_SQL}) <= 3
"""


# --------------------------------------------------------------------------
# embedding similarity: cosine near-dup + brute-force ANN top-k
# --------------------------------------------------------------------------

def _vec_pairs_cos(spark, sf_dir, a_max: int, b_min: int, b_max: int):
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    qa = ex.where(F.col("vec_id") < a_max).select(
        F.col("vec_id").alias("a"), "pos", F.col("val").alias("va")
    )
    qb = ex.where((F.col("vec_id") >= b_min) & (F.col("vec_id") < b_max)).select(
        F.col("vec_id").alias("b"), "pos", F.col("val").alias("vb")
    )
    dots = qa.join(qb, "pos").groupBy("a", "b").agg(
        F.sum(F.col("va") * F.col("vb")).alias("dot")
    )
    norms = ex.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm"))
    return (
        dots.join(norms.select(F.col("vec_id").alias("a"), F.col("norm").alias("na")), "a")
        .join(norms.select(F.col("vec_id").alias("b"), F.col("norm").alias("nb")), "b")
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4))
    )


_PAIR_COS_SQL = """
    WITH ex AS (
      SELECT vec_id::BIGINT AS vec_id, i AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS norm FROM ex GROUP BY vec_id),
    dots AS (
      SELECT x.vec_id AS a, y.vec_id AS b, SUM(x.val * y.val) AS dot
      FROM ex x JOIN ex y USING (pos)
      WHERE x.vec_id < {a_max} AND y.vec_id >= {b_min} AND y.vec_id < {b_max}
      GROUP BY x.vec_id, y.vec_id
    )
    SELECT a, b, ROUND(dot / (na.norm * nb.norm), 4) AS cos
    FROM dots
    JOIN norms na ON na.vec_id = a
    JOIN norms nb ON nb.vec_id = b
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs among the first 100 vectors."""
    pairs = _vec_pairs_cos(spark, sf_dir, 100, 0, 100).where(F.col("a") < F.col("b"))
    return pairs.where(F.col("cos") >= 0.2).select("a", "b", "cos")


SQL_EMB_NEAR_DUP = (
    "SELECT a, b, cos FROM ("
    + _PAIR_COS_SQL.format(a_max=100, b_min=0, b_max=100)
    + ") WHERE a < b AND cos >= 0.2"
)


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for 5 query vectors (baseline ANN)."""
    pairs = _vec_pairs_cos(spark, sf_dir, 5, 5, 300)
    w = Window.partitionBy("a").orderBy(F.desc("cos"), F.asc("b"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select(F.col("a").alias("query_id"), F.col("b").alias("neighbor_id"), "rank", "cos")
    )


SQL_ANN_TOPK = (
    "SELECT a AS query_id, b AS neighbor_id, rank, cos FROM ("
    "SELECT *, ROW_NUMBER() OVER (PARTITION BY a ORDER BY cos DESC, b ASC)::BIGINT AS rank FROM ("
    + _PAIR_COS_SQL.format(a_max=5, b_min=5, b_max=300)
    + ")) WHERE rank <= 5"
)

# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

def _tokens_expr():
    return F.filter(F.split(F.col("text"), "[^a-zA-Z0-9]+"), lambda x: x != "")


def q_text_tokens(spark, sf_dir):
    """Token counting (whitespace/non-alnum split)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(_tokens_expr()).cast("long").alias("n_tokens"),
    )


SQL_TEXT_TOKENS = """
    SELECT doc_id::BIGINT AS doc_id,
           len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x <> ''))::BIGINT AS n_tokens
    FROM documents
"""

def q_text_tokens_bpe(spark, sf_dir):
    """BPE-ish token counting: GPT-2-style pre-tokenizer classes reduced
    to the engine-portable core — letter runs, digit runs, punctuation
    runs (the `[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]+` subset of the GPT-2
    split regex; contraction alternates dropped for cross-engine regex
    parity). Whitespace never tokenizes. Complements q_text_tokens'
    whitespace count with the subword-budget estimate a training pipeline
    actually bills by."""
    d = _t(spark, sf_dir, "documents")
    # F.lit pattern, NOT F.expr — a SQL string literal would eat the \s
    pat = r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]+"
    toks = F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        # chars-per-token: the compression-ratio quality signal
        F.round(
            F.length("text") / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("chars_per_token"),
    )


SQL_TEXT_TOKENS_BPE = """
    SELECT doc_id::BIGINT AS doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]+', 0))::BIGINT AS n_bpe_tokens,
           ROUND(length(text) /
                 GREATEST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^\\sa-zA-Z0-9]+', 0)), 1), 4) AS chars_per_token
    FROM documents
"""

def q_text_tokens_bpe_real(spark, sf_dir):
    """Real BPE token counting (VERDICT r2 item 4): the committed merge
    table (functions/bpe.py, trained offline on the seed-42 corpus) is
    applied as an ordered chain of JVM ``replace`` expressions over the
    pipe-delimited letter runs — exact iterative-BPE semantics, zero
    Python, whole-stage codegen. Counts diverge from the regex proxy
    (``n_bpe_real >= n_bpe_tokens``) wherever a word splits into >1 unit;
    the proxy stays as the cheap estimator."""
    from fraudcrawler_spark.functions.bpe import bpe_count_expr

    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        bpe_count_expr(F.col("text")).alias("n_bpe_real"),
    )


def _sql_text_tokens_bpe_real() -> str:
    from fraudcrawler_spark.functions.bpe import bpe_merged_sql

    return f"""
    SELECT doc_id::BIGINT AS doc_id,
           -- every unit carries exactly 2 pipes; COALESCE: string_agg of
           -- an empty run list is NULL (no letter runs -> 0 units)
           (COALESCE(length(m) - length(replace(m, '|', '')), 0) // 2
            + n_others)::BIGINT AS n_bpe_real
    FROM (
      SELECT doc_id,
             len(regexp_extract_all(text, '[0-9]+|[^\\sa-zA-Z0-9]+', 0)) AS n_others,
             {bpe_merged_sql("text")} AS m
      FROM documents
    )
"""


SQL_TEXT_TOKENS_BPE_REAL = _sql_text_tokens_bpe_real()


_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")
_STOP_SQL = "('" + "','".join(_STOPWORDS) + "')"


def _dup_line_frac_expr(text):
    """Gopher repetition signal: fraction of non-empty lines that are
    duplicates of an earlier line. Pure per-row list ops — no shuffle."""
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    nl = F.size(lines)
    return F.when(
        nl > 0, F.round(1 - F.size(F.array_distinct(lines)) / nl, 4)
    ).otherwise(F.lit(0.0))


def _symbol_word_ratio_expr(text, n_toks):
    """Gopher signal: symbol characters per word token."""
    n_sym = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.round(n_sym / F.greatest(n_toks, F.lit(1)), 4)


def _top2gram_frac_expr(toks):
    """Gopher signal: fraction of token bigrams taken by the most frequent
    bigram. Linear per row (sort + run-length scan via F.aggregate) — the
    whole quality score stays shuffle-free at 100 TB."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    sg = F.array_sort(grams)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(sg, init, _merge, lambda acc: acc["best"])
    # the `when` guards sequence(1, n-1): evaluated only for n >= 2
    return F.when(n >= 2, F.round(best / (n - 1), 4)).otherwise(F.lit(0.0))


def _noisy_text_expr():
    """Deterministic crawl-noise injection: every 13th doc gains repeated
    boilerplate lines, every 17th a symbol-spam tail. The synthetic corpus
    is repetition-free, so without this the Gopher signals would be
    identically zero and the oracle would prove nothing; the same CASE is
    mirrored in the SQL twins."""
    return (
        F.when(
            F.pmod(F.col("doc_id"), F.lit(13)) == 0,
            F.concat(F.col("text"), F.repeat(F.lit("\nlorem spam line"), 6)),
        )
        .when(
            F.pmod(F.col("doc_id"), F.lit(17)) == 0,
            F.concat(F.col("text"), F.repeat(F.lit(" @#$%!"), 20)),
        )
        .otherwise(F.col("text"))
    )


_NOISY_TEXT_SQL = (
    "CASE WHEN doc_id % 13 = 0 THEN text || repeat(chr(10) || 'lorem spam line', 6) "
    "WHEN doc_id % 17 = 0 THEN text || repeat(' @#$%!', 20) "
    "ELSE text END"
)


def q_text_quality(spark, sf_dir):
    """Quality scoring: length, alpha ratio, stopword ratio, plus the
    Gopher-style repetition/symbol signals (Rae et al. 2021 §A1.1):
    duplicate-line fraction, top-bigram fraction, symbol-to-word ratio —
    over the deterministically-noised text (see _noisy_text_expr).
    Everything is a per-row expression — zero shuffles."""
    d = _t(spark, sf_dir, "documents").withColumn("text", _noisy_text_expr())
    # materialize toks as a REAL column before the higher-order exprs:
    # element_at(<split-expr>, i) inside a transform lambda re-evaluates
    # the whole split per ELEMENT (no CSE through HOF lambdas) — measured
    # 21 s vs 0.8 s on sf0.1 for the bigram scan alone
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text"),
        _tokens_expr().alias("toks"),
    )
    toks = F.col("toks")
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    return base.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        n_toks.cast("long").alias("n_tokens"),
        F.round(n_stop / F.greatest(n_toks, F.lit(1)), 4).alias("stop_ratio"),
        F.round(n_alpha / F.greatest(F.length("text"), F.lit(1)), 4).alias("alpha_ratio"),
        _dup_line_frac_expr(F.col("text")).alias("dup_line_frac"),
        _top2gram_frac_expr(toks).alias("top2gram_frac"),
        _symbol_word_ratio_expr(F.col("text"), n_toks).alias("symbol_word_ratio"),
    )


SQL_TEXT_QUALITY = f"""
    WITH noised AS (
      SELECT doc_id, {_NOISY_TEXT_SQL} AS text FROM documents
    ),
    base AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x <> '') AS toks,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> x <> '') AS lines
      FROM noised
    ),
    grams AS (
      SELECT doc_id, MAX(c) AS top2
      FROM (
        SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g, COUNT(*) AS c
        FROM base, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
        GROUP BY doc_id, g
      )
      GROUP BY doc_id
    )
    SELECT b.doc_id::BIGINT AS doc_id,
           length(text)::BIGINT AS n_chars_calc,
           len(toks)::BIGINT AS n_tokens,
           ROUND(len(list_filter(toks, x -> lower(x) IN {_STOP_SQL})) /
                 GREATEST(len(toks), 1), 4) AS stop_ratio,
           ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) /
                 GREATEST(length(text), 1), 4) AS alpha_ratio,
           CASE WHEN len(lines) > 0
                THEN ROUND(1 - len(list_distinct(lines)) / len(lines), 4)
                ELSE 0.0 END AS dup_line_frac,
           CASE WHEN len(toks) >= 2
                THEN ROUND(COALESCE(g.top2, 0) / (len(toks) - 1), 4)
                ELSE 0.0 END AS top2gram_frac,
           ROUND(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) /
                 GREATEST(len(toks), 1), 4) AS symbol_word_ratio
    FROM base b LEFT JOIN grams g ON b.doc_id = g.doc_id
"""

_LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "it": ("il", "la", "di", "che", "per", "con"),
    "en": ("the", "a", "and", "of", "to", "is"),
}


def q_text_langid(spark, sf_dir):
    """Language-ID heuristic: per-language marker-token hit counts, argmax
    with fixed precedence de>en>fr>it on ties."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_expr()
    d = d.select(F.col("doc_id").cast("long").alias("doc_id"), toks.alias("toks"))
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(arr, F.lower(x))))
    d = d.select("doc_id", *[scores[lg].alias(f"s_{lg}") for lg in ("de", "en", "fr", "it")])
    best = (
        F.when((F.col("s_de") >= F.col("s_en")) & (F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_it")), F.lit("de"))
        .when((F.col("s_en") >= F.col("s_fr")) & (F.col("s_en") >= F.col("s_it")), F.lit("en"))
        .when(F.col("s_fr") >= F.col("s_it"), F.lit("fr"))
        .otherwise(F.lit("it"))
    )
    return d.select(
        "doc_id",
        F.col("s_de").cast("long").alias("s_de"), F.col("s_en").cast("long").alias("s_en"),
        F.col("s_fr").cast("long").alias("s_fr"), F.col("s_it").cast("long").alias("s_it"),
        best.alias("lang_guess"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = "('" + "','".join(_LANG_MARKERS[lang]) + "')"
    return f"len(list_filter(toks, x -> lower(x) IN {markers}))"


SQL_TEXT_LANGID = f"""
    SELECT doc_id,
           s_de::BIGINT AS s_de, s_en::BIGINT AS s_en,
           s_fr::BIGINT AS s_fr, s_it::BIGINT AS s_it,
           CASE WHEN s_de >= s_en AND s_de >= s_fr AND s_de >= s_it THEN 'de'
                WHEN s_en >= s_fr AND s_en >= s_it THEN 'en'
                WHEN s_fr >= s_it THEN 'fr'
                ELSE 'it' END AS lang_guess
    FROM (
      SELECT doc_id::BIGINT AS doc_id,
             {_lang_score_sql("de")} AS s_de, {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("fr")} AS s_fr, {_lang_score_sql("it")} AS s_it
      FROM (
        SELECT doc_id, list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x <> '') AS toks
        FROM documents
      )
    )
"""

# --------------------------------------------------------------------------
# multimodal plumbing (binary columns)
# --------------------------------------------------------------------------

def q_multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: text→bytes, byte length + header hex.
    (The decode/feature kernels live in functions/multimodal.py and are
    exercised by the rows-only query crawl_multimodal.)"""
    d = _t(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.substring(F.lower(F.hex(blob)), 1, 16).alias("header_hex"),
    )


SQL_MULTIMODAL_META = """
    SELECT doc_id::BIGINT AS doc_id,
           octet_length(text::BLOB)::BIGINT AS n_bytes,
           substr(lower(hex(text::BLOB)), 1, 16) AS header_hex
    FROM documents
"""

# --------------------------------------------------------------------------
# ANN scale path: random-hyperplane LSH buckets + exact verify
# --------------------------------------------------------------------------

_N_PLANES = 8
_LSH_MAX_VEC = 300


def q_ann_lsh(spark, sf_dir, max_vec: int = _LSH_MAX_VEC):
    """Sign-LSH bucketed ANN: 8 md5-derived ±1 hyperplanes → bucket
    signature → candidate pairs meet ONLY via the bucket equi-join (the
    100TB path: no all-pairs work) → exact cosine verify ≥ 0.2.

    r3 fix: the verify computes dots for CANDIDATE pairs only (join cand
    to the exploded vectors, then aggregate) — the previous cand ⨝
    all-pairs-cosine join aggregated every pair before joining, which
    silently re-introduced the O(n²) work the buckets exist to avoid.
    ``max_vec`` parameterizes the corpus cap (bench runs 2000; the oracle
    default stays at the SQL twin's cap)."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < max_vec)
    ex = e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    planes = (
        spark.range(_N_PLANES).select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("pos")))
        .select(
            "j", "pos",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("j").cast("string"), F.lit(":"),
                                       F.col("pos").cast("string"))), 1, 1
                    ), 16, 10
                ).cast("int") < 8,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)).alias("h"),
        )
    )
    dots = (
        ex.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("val") * F.col("h")).alias("dot"))
    )
    sigs = dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("shiftleft(1, j)")).otherwise(F.lit(0))
        ).cast("long").alias("sig")
    )
    a = sigs.select(F.col("vec_id").alias("a"), "sig")
    b = sigs.select(F.col("vec_id").alias("b"), "sig")
    cand = a.join(b, "sig").where(F.col("a") < F.col("b")).select("a", "b")
    # exact verify on the candidate set ONLY: cand joins to the exploded
    # vectors first, so dot products exist solely for bucket-cohabitants
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )
    va = ex.select(F.col("vec_id").alias("a"), "pos", F.col("val").alias("va"))
    vb = ex.select(F.col("vec_id").alias("b"), "pos", F.col("val").alias("vb"))
    cand_cos = (
        cand.join(va, "a")
        .join(vb, ["b", "pos"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
        .join(norms.select(F.col("vec_id").alias("a"), F.col("norm").alias("na")), "a")
        .join(norms.select(F.col("vec_id").alias("b"), F.col("norm").alias("nb")), "b")
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4))
    )
    return cand_cos.where(F.col("cos") >= 0.2).select("a", "b", "cos")


SQL_ANN_LSH = (
    """
    WITH ex AS (
      SELECT vec_id::BIGINT AS vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      WHERE vec_id < {maxv}
    ),
    planes AS (
      SELECT j::INT AS j, pos::INT AS pos,
             CASE WHEN ('0x' || substr(md5(j::VARCHAR || ':' || pos::VARCHAR), 1, 1))::UBIGINT < 8
                  THEN 1.0 ELSE -1.0 END AS h
      FROM range(0, {np}) AS a(j), range(0, 64) AS b(pos)
    ),
    dots AS (
      SELECT vec_id, j, SUM(val * h) AS dot
      FROM ex JOIN planes USING (pos)
      GROUP BY vec_id, j
    ),
    sigs AS (
      SELECT vec_id, SUM(CASE WHEN dot > 0 THEN (1 << j) ELSE 0 END)::BIGINT AS sig
      FROM dots GROUP BY vec_id
    ),
    cand AS (
      SELECT x.vec_id AS a, y.vec_id AS b
      FROM sigs x JOIN sigs y USING (sig)
      WHERE x.vec_id < y.vec_id
    ),
    cosres AS (
    """
    + _PAIR_COS_SQL.format(a_max=_LSH_MAX_VEC, b_min=0, b_max=_LSH_MAX_VEC)
    + """
    )
    SELECT a, b, cos FROM cand JOIN cosres USING (a, b)
    WHERE cos >= 0.2
    """
).format(maxv=_LSH_MAX_VEC, np=_N_PLANES)


_LSH_TABLES = 4        # b independent hash tables
_LSH_ROWS = 12         # r planes per table → 4096-value buckets per table


def q_ann_lsh_multi(spark, sf_dir, max_vec: int = _LSH_MAX_VEC,
                    n_tables: int = _LSH_TABLES, n_rows: int = _LSH_ROWS):
    """Multi-table sign-LSH — the production ANN form (Indyk–Motwani
    amplification): b=4 independent tables of r=12 hyperplanes each;
    candidates collide when ANY table's full r-bit signature matches.
    r controls precision (P[collide] = (1−θ/π)^r per table: bucket
    occupancy bounded by genuine angular-collision mass — a large-r
    single table has the same bound but vanishing recall), b controls
    recall (1−(1−p^r)^b). The single-table q_ann_lsh keeps 8 planes as
    the compact oracle config; this variant is the tunable scale path.
    Verify is candidate-only (dots exist solely for bucket cohabitants)."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < max_vec)
    ex = e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    n_planes = n_tables * n_rows
    planes = (
        spark.range(n_planes).select(F.col("id").cast("int").alias("j"))
        .crossJoin(spark.range(64).select(F.col("id").cast("int").alias("pos")))
        .select(
            "j", "pos",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("j").cast("string"), F.lit(":"),
                                       F.col("pos").cast("string"))), 1, 1
                    ), 16, 10
                ).cast("int") < 8,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)).alias("h"),
        )
    )
    dots = (
        ex.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("val") * F.col("h")).alias("dot"))
    )
    # table t owns planes [t*r, (t+1)*r); signature = r bits within table
    sigs = (
        dots.withColumn("tbl", (F.col("j") / F.lit(n_rows)).cast("int"))
        .withColumn("bit", F.pmod(F.col("j"), F.lit(n_rows)).cast("int"))
        .groupBy("vec_id", "tbl")
        .agg(
            F.sum(
                F.when(F.col("dot") > 0, F.expr("shiftleft(1, bit)")).otherwise(F.lit(0))
            ).cast("long").alias("sig")
        )
    )
    a = sigs.select(F.col("vec_id").alias("a"), "tbl", "sig")
    b = sigs.select(F.col("vec_id").alias("b"), "tbl", "sig")
    cand = (
        a.join(b, ["tbl", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )
    va = ex.select(F.col("vec_id").alias("a"), "pos", F.col("val").alias("va"))
    vb = ex.select(F.col("vec_id").alias("b"), "pos", F.col("val").alias("vb"))
    return (
        cand.join(va, "a")
        .join(vb, ["b", "pos"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
        .join(norms.select(F.col("vec_id").alias("a"), F.col("norm").alias("na")), "a")
        .join(norms.select(F.col("vec_id").alias("b"), F.col("norm").alias("nb")), "b")
        .withColumn("cos", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4))
        .where(F.col("cos") >= 0.2)
        .select("a", "b", "cos")
    )


SQL_ANN_LSH_MULTI = (
    """
    WITH ex AS (
      SELECT vec_id::BIGINT AS vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      WHERE vec_id < {maxv}
    ),
    planes AS (
      SELECT j::INT AS j, pos::INT AS pos,
             CASE WHEN ('0x' || substr(md5(j::VARCHAR || ':' || pos::VARCHAR), 1, 1))::UBIGINT < 8
                  THEN 1.0 ELSE -1.0 END AS h
      FROM range(0, {np}) AS a(j), range(0, 64) AS b(pos)
    ),
    dots AS (
      SELECT vec_id, j, SUM(val * h) AS dot
      FROM ex JOIN planes USING (pos)
      GROUP BY vec_id, j
    ),
    sigs AS (
      SELECT vec_id, (j // {nr})::INT AS tbl,
             SUM(CASE WHEN dot > 0 THEN (1 << (j % {nr})) ELSE 0 END)::BIGINT AS sig
      FROM dots GROUP BY vec_id, (j // {nr})::INT
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM sigs x JOIN sigs y USING (tbl, sig)
      WHERE x.vec_id < y.vec_id
    ),
    cosres AS (
    """
    + _PAIR_COS_SQL.format(a_max=_LSH_MAX_VEC, b_min=0, b_max=_LSH_MAX_VEC)
    + """
    )
    SELECT a, b, cos FROM cand JOIN cosres USING (a, b)
    WHERE cos >= 0.2
    """
).format(maxv=_LSH_MAX_VEC, np=_LSH_TABLES * _LSH_ROWS, nr=_LSH_ROWS)


_IVF_NC = 8        # coarse centroids: vec_id < 8 (deterministic quantizer)
_IVF_DB_MIN, _IVF_DB_MAX = 8, 300
_IVF_Q_MIN, _IVF_Q_MAX = 300, 305
_IVF_NPROBE = 4


_IVF_LLOYD_ITERS = 2


def q_ann_ivf(spark, sf_dir, db_max: int = _IVF_DB_MAX):
    """IVF-style ANN (inverted-file coarse quantizer, cf. FAISS IVF-Flat)
    with LEARNED centroids (VERDICT r2 item 5): deterministic init
    (first-k vectors by id), then k-means Lloyd iterations expressed as
    DataFrame ops — assign = broadcast(centroids) join + per-vector
    argmax-cosine window, update = groupBy(cell, pos).avg, empty cells
    keep their previous centroid. Components and cosines are ROUNDED (4dp)
    so the DuckDB twin reproduces the trajectory exactly. db vectors live
    in their argmax cell; a query probes only its nprobe (=_IVF_NPROBE=4)
    nearest cells, and exact cosine runs on those candidates alone.

    100-TB shape: each Lloyd pass is one broadcast join + one (d) window
    shuffle + one (c,pos) aggregation — centroid table is k×dim, always
    broadcastable; search cost bounded by the probed cells' sizes, never
    the corpus. Brute-force twin: q_ann_topk; bucketed alternative:
    q_ann_lsh. Measured recall@5 vs brute force (sf0.001, nprobe=4 of 8
    cells): 0.48 with the raw first-k centroids → 0.56 after one Lloyd
    iteration → 0.60 after two (tests/test_round3.py pins ≥ 0.5; the
    synthetic embeddings are near-uniform, so absolute recall is bounded
    by how little cluster structure exists to learn).

    ``db_max`` parameterizes the db cap for the scale bench (default =
    the oracle twin's cap)."""
    ex = (
        _t(spark, sf_dir, "embeddings")
        .where((F.col("vec_id") < _IVF_Q_MAX) | (F.col("vec_id") < db_max))
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        .select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    )
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )

    cent = ex.where(F.col("vec_id") < _IVF_NC).select(
        F.col("vec_id").alias("c"), "pos", F.col("val").alias("cv"))
    db = ex.where(
        (F.col("vec_id") >= _IVF_DB_MIN) & (F.col("vec_id") < db_max)
        # when db_max exceeds the query range, keep queries out of the db
        & ~((F.col("vec_id") >= _IVF_Q_MIN) & (F.col("vec_id") < _IVF_Q_MAX))
    ).select(F.col("vec_id").alias("d"), "pos", F.col("val").alias("dv"))
    qs = ex.where(F.col("vec_id") >= _IVF_Q_MIN).select(
        F.col("vec_id").alias("q"), "pos", F.col("val").alias("qv"))

    def _cos(dots, a, b):
        return (
            dots.join(norms.select(F.col("vec_id").alias(a), F.col("norm").alias("_na")), a)
            .join(norms.select(F.col("vec_id").alias(b), F.col("norm").alias("_nb")), b)
            .withColumn("cos", F.round(F.col("dot") / (F.col("_na") * F.col("_nb")), 4))
            .drop("_na", "_nb", "dot")
        )

    def _assign(cent_df):
        """db → argmax-cosine cell under the given centroid table."""
        cnorm = cent_df.groupBy("c").agg(
            F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("_nc")
        )
        dc_ = (
            db.join(F.broadcast(cent_df), "pos")
            .groupBy("d", "c").agg(F.sum(F.col("dv") * F.col("cv")).alias("dot"))
            .join(norms.select(F.col("vec_id").alias("d"), F.col("norm").alias("_nd")), "d")
            .join(F.broadcast(cnorm), "c")
            .withColumn("cos", F.round(F.col("dot") / (F.col("_nd") * F.col("_nc")), 4))
        )
        wd_ = Window.partitionBy("d").orderBy(F.desc("cos"), F.asc("c"))
        return (
            dc_.withColumn("_rn", F.row_number().over(wd_))
            .where(F.col("_rn") == 1).select("d", "c")
        )

    for _ in range(_IVF_LLOYD_ITERS):
        members = _assign(cent)
        newc = (
            members.join(db, "d")
            .groupBy("c", "pos")
            .agg(F.round(F.avg("dv"), 4).alias("cv"))
        )
        # Lloyd update: empty cells keep their previous centroid.
        # localCheckpoint truncates the per-iteration lineage — the
        # centroid table is k×dim (tiny), but without it every later
        # assignment re-executes all earlier Lloyd passes from scratch
        cent = newc.unionByName(
            cent.join(newc.select("c").distinct(), "c", "left_anti")
        ).localCheckpoint()

    cnorm = cent.groupBy("c").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("_nc")
    )
    cells = _assign(cent)

    qc = (
        qs.join(F.broadcast(cent), "pos")
        .groupBy("q", "c").agg(F.sum(F.col("qv") * F.col("cv")).alias("dot"))
        .join(norms.select(F.col("vec_id").alias("q"), F.col("norm").alias("_nq")), "q")
        .join(F.broadcast(cnorm), "c")
        .withColumn("cos", F.round(F.col("dot") / (F.col("_nq") * F.col("_nc")), 4))
    )
    wq = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("c"))
    probes = (
        qc.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= _IVF_NPROBE).select("q", "c")
    )

    cand = probes.join(cells, "c").select("q", "d")
    qd = _cos(
        cand.join(qs, "q").join(db, ["d", "pos"])
        .groupBy("q", "d").agg(F.sum(F.col("qv") * F.col("dv")).alias("dot")),
        "q", "d",
    )
    wr = Window.partitionBy("q").orderBy(F.desc("cos"), F.asc("d"))
    return (
        qd.withColumn("rank", F.row_number().over(wr).cast("long"))
        .where(F.col("rank") <= 5)
        .select(F.col("q").alias("query_id"), F.col("d").alias("neighbor_id"),
                "rank", "cos")
    )


def _sql_ann_ivf_lloyd() -> str:
    """SQL twin of q_ann_ivf with the Lloyd iterations unrolled as CTEs
    (cent0 → cent1 → … ; empty cells carried forward via anti-semijoin)."""
    head = f"""
    WITH ex AS (
      SELECT vec_id::BIGINT AS vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS val
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      WHERE vec_id < {_IVF_Q_MAX}
    ),
    norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS norm FROM ex GROUP BY vec_id),
    db AS (SELECT vec_id AS d, pos, val AS dv FROM ex
           WHERE vec_id >= {_IVF_DB_MIN} AND vec_id < {_IVF_DB_MAX}),
    cent0 AS (SELECT vec_id AS c, pos, val AS cv FROM ex WHERE vec_id < {_IVF_NC})"""
    parts = [head]
    prev = "cent0"
    for i in range(_IVF_LLOYD_ITERS):
        parts.append(f""",
    cn{i} AS (SELECT c, sqrt(SUM(cv * cv)) AS cnorm FROM {prev} GROUP BY c),
    dc{i} AS (
      SELECT db.d AS d, ce.c AS c,
             ROUND(SUM(db.dv * ce.cv) / (nd.norm * cn.cnorm), 4) AS cos
      FROM db JOIN {prev} ce USING (pos)
      JOIN norms nd ON nd.vec_id = db.d
      JOIN cn{i} cn ON cn.c = ce.c
      GROUP BY db.d, ce.c, nd.norm, cn.cnorm
    ),
    cell{i} AS (
      SELECT d, c FROM (
        SELECT d, c, ROW_NUMBER() OVER (PARTITION BY d ORDER BY cos DESC, c ASC) AS rn
        FROM dc{i}
      ) WHERE rn = 1
    ),
    newc{i} AS (
      SELECT cl.c AS c, db.pos AS pos, ROUND(AVG(db.dv), 4) AS cv
      FROM cell{i} cl JOIN db ON db.d = cl.d
      GROUP BY cl.c, db.pos
    ),
    cent{i + 1} AS (
      SELECT * FROM newc{i}
      UNION ALL
      SELECT * FROM {prev} WHERE c NOT IN (SELECT DISTINCT c FROM newc{i})
    )""")
        prev = f"cent{i + 1}"
    parts.append(f""",
    cnF AS (SELECT c, sqrt(SUM(cv * cv)) AS cnorm FROM {prev} GROUP BY c),
    dcF AS (
      SELECT db.d AS d, ce.c AS c,
             ROUND(SUM(db.dv * ce.cv) / (nd.norm * cn.cnorm), 4) AS cos
      FROM db JOIN {prev} ce USING (pos)
      JOIN norms nd ON nd.vec_id = db.d
      JOIN cnF cn ON cn.c = ce.c
      GROUP BY db.d, ce.c, nd.norm, cn.cnorm
    ),
    cells AS (
      SELECT d, c FROM (
        SELECT d, c, ROW_NUMBER() OVER (PARTITION BY d ORDER BY cos DESC, c ASC) AS rn
        FROM dcF
      ) WHERE rn = 1
    ),
    qc AS (
      SELECT q.vec_id AS q, ce.c AS c,
             ROUND(SUM(q.val * ce.cv) / (nq.norm * cn.cnorm), 4) AS cos
      FROM ex q JOIN {prev} ce USING (pos)
      JOIN norms nq ON nq.vec_id = q.vec_id
      JOIN cnF cn ON cn.c = ce.c
      WHERE q.vec_id >= {_IVF_Q_MIN}
      GROUP BY q.vec_id, ce.c, nq.norm, cn.cnorm
    ),
    probes AS (
      SELECT q, c FROM (
        SELECT q, c, ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, c ASC) AS rn
        FROM qc
      ) WHERE rn <= {_IVF_NPROBE}
    ),
    cand AS (SELECT q, d FROM probes JOIN cells USING (c)),
    qd AS (
      SELECT cand.q AS q, cand.d AS d,
             ROUND(SUM(x.val * y.val) / (nq.norm * nd2.norm), 4) AS cos
      FROM cand
      JOIN ex x ON x.vec_id = cand.q
      JOIN ex y ON y.vec_id = cand.d AND y.pos = x.pos
      JOIN norms nq ON nq.vec_id = cand.q
      JOIN norms nd2 ON nd2.vec_id = cand.d
      GROUP BY cand.q, cand.d, nq.norm, nd2.norm
    )
    SELECT q AS query_id, d AS neighbor_id, rank, cos
    FROM (
      SELECT q, d, cos,
             ROW_NUMBER() OVER (PARTITION BY q ORDER BY cos DESC, d ASC)::BIGINT AS rank
      FROM qd
    ) WHERE rank <= 5
""")
    return "".join(parts)


SQL_ANN_IVF = _sql_ann_ivf_lloyd()


def q_corpus_prep(spark, sf_dir):
    """End-to-end training-corpus prep composite: exact dedup (first-doc-
    wins on the normalized-text md5) → quality gate (≥30 tokens AND
    alpha_ratio ≥ 0.81 AND the Gopher repetition/symbol gates:
    dup_line_frac ≤ 0.3, symbol_word_ratio ≤ 0.5, both over the
    deterministically-noised text — see _noisy_text_expr) → language
    filter (marker-argmax, keep de/en with at least one marker hit —
    zero-marker docs are unidentifiable, not 'de') → per-doc record.
    Fingerprint/dedup/token gates stay on the ORIGINAL text so dedup
    semantics are unchanged; only the noise-sensitive Gopher gates read
    the noised column. Each stage reuses the individually-oracled operator
    semantics (q_dedup_exact / q_text_quality / q_text_langid); one
    shuffle per stage boundary, everything whole-stage-codegen."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens_expr()
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    noisy = _noisy_text_expr()
    noisy_toks = F.size(
        F.filter(F.split(noisy, "[^a-zA-Z0-9]+"), lambda x: x != "")
    )
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
            / F.greatest(F.length("text"), F.lit(1)), 4,
        ).alias("alpha_ratio"),
        _dup_line_frac_expr(noisy).alias("dup_line_frac"),
        _symbol_word_ratio_expr(noisy, noisy_toks).alias("symbol_word_ratio"),
        toks.alias("toks"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .where(
            (F.col("n_tokens") >= 30)
            & (F.col("alpha_ratio") >= 0.81)
            & (F.col("dup_line_frac") <= 0.3)
            & (F.col("symbol_word_ratio") <= 0.5)
        )
    )
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        # expression is built eagerly at F.filter call time, so the loop
        # variable binds correctly (same pattern as q_text_langid)
        scores[lang] = F.size(
            F.filter(F.col("toks"), lambda x: F.array_contains(arr, F.lower(x)))
        )
    kept = kept.select(
        "doc_id", "fingerprint", "n_tokens", "alpha_ratio",
        *[scores[lg].alias(f"s_{lg}") for lg in ("de", "en", "fr", "it")],
    )
    best = (
        F.when((F.col("s_de") >= F.col("s_en")) & (F.col("s_de") >= F.col("s_fr"))
               & (F.col("s_de") >= F.col("s_it")), F.lit("de"))
        .when((F.col("s_en") >= F.col("s_fr")) & (F.col("s_en") >= F.col("s_it")),
              F.lit("en"))
        .when(F.col("s_fr") >= F.col("s_it"), F.lit("fr"))
        .otherwise(F.lit("it"))
    )
    s_max = F.greatest("s_de", "s_en", "s_fr", "s_it")
    return (
        kept.withColumn("lang_guess", best)
        .where(F.col("lang_guess").isin("de", "en") & (s_max > 0))
        .select("doc_id", "fingerprint", "n_tokens", "alpha_ratio", "lang_guess")
    )


SQL_CORPUS_PREP = f"""
    WITH base AS (
      SELECT doc_id::BIGINT AS doc_id,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
             len(toks)::BIGINT AS n_tokens,
             ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) /
                   GREATEST(length(text), 1), 4) AS alpha_ratio,
             CASE WHEN len(nlines) > 0
                  THEN ROUND(1 - len(list_distinct(nlines)) / len(nlines), 4)
                  ELSE 0.0 END AS dup_line_frac,
             ROUND(length(regexp_replace(ntext, '[A-Za-z0-9\\s]', '', 'g')) /
                   GREATEST(len(list_filter(string_split_regex(ntext, '[^a-zA-Z0-9]+'),
                                            x -> x <> '')), 1), 4) AS symbol_word_ratio,
             toks
      FROM (
        SELECT doc_id, text, ntext,
               list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x <> '') AS toks,
               list_filter(list_transform(string_split(ntext, chr(10)), x -> trim(x)),
                           x -> x <> '') AS nlines
        FROM (SELECT doc_id, text, {_NOISY_TEXT_SQL} AS ntext FROM documents)
      )
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM base
      ) WHERE rn = 1
    ),
    gated AS (SELECT * FROM dedup
              WHERE n_tokens >= 30 AND alpha_ratio >= 0.81
                AND dup_line_frac <= 0.3 AND symbol_word_ratio <= 0.5),
    scored AS (
      SELECT doc_id, fingerprint, n_tokens, alpha_ratio,
             {_lang_score_sql("de")} AS s_de, {_lang_score_sql("en")} AS s_en,
             {_lang_score_sql("fr")} AS s_fr, {_lang_score_sql("it")} AS s_it
      FROM gated
    )
    SELECT doc_id, fingerprint, n_tokens, alpha_ratio, lang_guess
    FROM (
      SELECT *,
             CASE WHEN s_de >= s_en AND s_de >= s_fr AND s_de >= s_it THEN 'de'
                  WHEN s_en >= s_fr AND s_en >= s_it THEN 'en'
                  WHEN s_fr >= s_it THEN 'fr'
                  ELSE 'it' END AS lang_guess
      FROM scored
    ) WHERE lang_guess IN ('de', 'en')
      AND GREATEST(s_de, s_en, s_fr, s_it) > 0
"""


def q_events_window_agg(spark, sf_dir):
    """Tumbling-window aggregation (streaming metrics analog, batch twin):
    hourly per-event-type counts + exact decimal sums."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


SQL_EVENTS_WINDOW = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*)::BIGINT AS n,
           (SUM(value::DECIMAL(18,2)))::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# Zyte product-JSON extraction analog (X2-X6 + keep_product, zyte.py:100-194)
# --------------------------------------------------------------------------

def _product_json_expr():
    """Deterministic nested product JSON built from doc_id — the Zyte
    response shape (zyte.py:56-72), with missing-field variants:
    doc_id%7==0 → no product object; %5==0 → no probability; %3==0 → no
    mainImage."""
    did = F.col("doc_id").cast("string")
    prob = F.round(F.pmod(F.col("doc_id") * 37, F.lit(100)) / 100.0, 2).cast("string")
    main = F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit("")).otherwise(
        F.concat(F.lit('"mainImage":{"url":"m'), did, F.lit('"},'))
    )
    meta = F.when(F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.lit("")).otherwise(
        F.concat(F.lit(',"metadata":{"probability":'), prob, F.lit("}"))
    )
    full = F.concat(
        F.lit('{"url":"https://shop'), did, F.lit('.ch","product":{'),
        main,
        F.lit('"name":"p'), did, F.lit('","price":"'), did,
        F.lit('.99 CHF","description":"d'), did,
        F.lit('","images":[{"url":"i'), did, F.lit('a"},{"url":null}]'),
        meta, F.lit("}}"),
    )
    return F.when(F.pmod(F.col("doc_id"), F.lit(7)) == 0,
                  F.concat(F.lit('{"url":"https://shop'), did, F.lit('.ch"}'))
                  ).otherwise(full)


def q_product_extract(spark, sf_dir):
    """X2-X6 — null-safe nested product-field extraction + the strict->
    keep_product threshold (missing probability ⇒ keep=false,
    zyte.py:100-117)."""
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("doc_id"))
    j = d.withColumn("raw", _product_json_expr())
    g = lambda p: F.get_json_object(F.col("raw"), p)
    prob = g("$.product.metadata.probability").cast("double")
    images = F.concat_ws(
        "|",
        g("$.product.mainImage.url"),
        g("$.product.images[0].url"),
        g("$.product.images[1].url"),
    )
    return j.select(
        "doc_id",
        g("$.product.name").alias("product_name"),
        g("$.product.price").alias("product_price"),
        g("$.product.description").alias("product_description"),
        images.alias("images_concat"),
        F.round(prob, 4).alias("probability"),
        F.coalesce(prob > 0.1, F.lit(False)).alias("keep"),
    )


SQL_PRODUCT_EXTRACT = """
    WITH j AS (
      SELECT doc_id::BIGINT AS doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN '{"url":"https://shop' || doc_id::VARCHAR || '.ch"}'
                  ELSE '{"url":"https://shop' || doc_id::VARCHAR || '.ch","product":{'
                       || CASE WHEN doc_id % 3 = 0 THEN ''
                               ELSE '"mainImage":{"url":"m' || doc_id::VARCHAR || '"},' END
                       || '"name":"p' || doc_id::VARCHAR || '","price":"' || doc_id::VARCHAR
                       || '.99 CHF","description":"d' || doc_id::VARCHAR
                       || '","images":[{"url":"i' || doc_id::VARCHAR || 'a"},{"url":null}]'
                       || CASE WHEN doc_id % 5 = 0 THEN ''
                               ELSE ',"metadata":{"probability":' ||
                                    ROUND((doc_id * 37) % 100 / 100.0, 2)::VARCHAR || '}' END
                       || '}}'
             END AS raw
      FROM documents
    )
    SELECT doc_id,
           json_extract_string(raw, '$.product.name') AS product_name,
           json_extract_string(raw, '$.product.price') AS product_price,
           json_extract_string(raw, '$.product.description') AS product_description,
           concat_ws('|',
             json_extract_string(raw, '$.product.mainImage.url'),
             json_extract_string(raw, '$.product.images[0].url'),
             json_extract_string(raw, '$.product.images[1].url')) AS images_concat,
           ROUND(json_extract_string(raw, '$.product.metadata.probability')::DOUBLE, 4) AS probability,
           COALESCE(json_extract_string(raw, '$.product.metadata.probability')::DOUBLE > 0.1,
                    FALSE) AS keep
    FROM j
"""


def q_simhash_pairs(spark, sf_dir, cap: int = 200):
    """SimHash near-dup pairs, all-pairs ORACLE TWIN (tiny 200-doc cap
    only — the primary, scale-path operator is q_simhash_pairs_banded):
    hamming(simhash_a, simhash_b) ≤ 3 (bit_count(xor) — integer-exact).
    ``cap`` is raised only by the head-to-head scale bench."""
    sh = q_dedup_simhash(spark, sf_dir).where(F.col("doc_id") < cap)
    a = sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)").cast("long"))
        .where(F.col("hamming") <= 3)
        .select("a", "b", "hamming")
    )


def simhash_pairs_banded(sh, max_hamming: int = 3, n_bands: int = 4,
                         bits: int = 16):
    """PRIMARY near-dup-pairs path: banded-bits candidate generation.

    Pigeonhole: two 16-bit simhashes within hamming ≤ 3 differ in at most
    3 of the 4 disjoint 4-bit bands, so they agree EXACTLY on ≥ 1 band.
    Candidates come from an equi-join on (band, band_value) — never an
    all-pairs cross join — then are hamming-verified exactly. Identical
    result set to the all-pairs scan by construction; join fan-out is
    bounded per (band, value) bucket instead of O(n²) global.
    """
    assert bits % n_bands == 0 and max_hamming < n_bands
    width = bits // n_bands
    mask = (1 << width) - 1
    spark = sh.sparkSession
    bands = spark.range(n_bands).select(F.col("id").cast("int").alias("band"))
    keyed = sh.crossJoin(F.broadcast(bands)).select(
        "doc_id", "simhash", "band",
        F.expr(f"shiftright(simhash, band * {width}) & {mask}").alias("bkey"),
    )
    a = keyed.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"),
                     "band", "bkey")
    b = keyed.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"),
                     "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sa ^ sb)").cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def q_simhash_pairs_banded(spark, sf_dir, cap: int = 200):
    """Banded 16-bit SimHash near-dup pairs — equal-by-hash to
    q_simhash_pairs on the same 200-doc cap (oracle = the same all-pairs
    SQL). The plan shape (per-band equi-join, no cross join) is right,
    but 4-bit bands have only 16 values, so candidate mass is still
    quadratic/16 — at n=5000 banding leaves 6.5M of 12.5M pairs. The
    SCALE path is q_simhash64_pairs_banded (65k-value bands → 188k
    candidates at the same n); this 16-bit variant stays as the compact
    oracle configuration."""
    sh = q_dedup_simhash(spark, sf_dir).where(F.col("doc_id") < cap)
    return simhash_pairs_banded(sh)


SQL_SIMHASH_PAIRS = f"""
    WITH toks AS (
      SELECT doc_id::BIGINT AS doc_id,
             (('0x' || substr(md5(tok), 1, 4))::UBIGINT)::BIGINT AS h
      FROM (
        SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents WHERE doc_id < 200
      ) WHERE tok <> ''
    ), agg AS (
      SELECT doc_id, {_SIMHASH_VOTES_SQL} FROM toks GROUP BY doc_id
    ), sh AS (
      SELECT doc_id, ({_SIMHASH_COMBINE_SQL})::BIGINT AS simhash FROM agg
    )
    SELECT x.doc_id AS a, y.doc_id AS b,
           bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
    FROM sh x, sh y
    WHERE x.doc_id < y.doc_id
      AND bit_count(xor(x.simhash, y.simhash)) <= 3
"""


# --------------------------------------------------------------------------
# int8 embedding quantization (r3)
# --------------------------------------------------------------------------


def q_embedding_quantize(spark, sf_dir):
    """Per-dimension symmetric int8 quantization of the embedding table
    with reconstruction-error accounting: scale_d = max|v_d| over the
    corpus, q = floor(v*127/scale + 0.5), and per-vector MSE / max-err
    of the dequantized values (reported in ppm / per-mille units so the
    4-decimal driver rounding keeps resolution).

    The compression step ANN quantized indexes start from (the IVF
    counterpart of q_ann_ivf; FAISS IVF-SQ8). Plan: one (pos) hash agg
    for the 64 per-dim scales, broadcast back onto the exploded values,
    one (vec_id) agg for the error metrics — all JVM, scales linearly
    in corpus size.
    """
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    ).select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    sc = ex.groupBy("pos").agg(
        F.greatest(F.max(F.abs("val")), F.lit(1e-12)).alias("scale")
    )
    j = ex.join(F.broadcast(sc), "pos")
    deq = (
        F.floor(F.col("val") * 127.0 / F.col("scale") + 0.5)
        * F.col("scale") / 127.0
    )
    err = F.col("val") - deq
    return j.groupBy("vec_id").agg(
        F.round(F.avg(err * err) * 1_000_000, 4).alias("mse_ppm"),
        F.round(F.max(F.abs(err)) * 1000, 4).alias("max_err_pm"),
    )


SQL_EMBEDDING_QUANTIZE = """
WITH ex AS (
  SELECT vec_id::BIGINT AS vec_id, i AS pos, embedding[i]::DOUBLE AS val
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
),
sc AS (
  SELECT pos, GREATEST(MAX(ABS(val)), 1e-12) AS scale FROM ex GROUP BY pos
),
q AS (
  SELECT vec_id, val,
         FLOOR(val * 127.0 / scale + 0.5) * scale / 127.0 AS deq
  FROM ex JOIN sc USING (pos)
)
SELECT vec_id,
       ROUND(AVG((val - deq) * (val - deq)) * 1000000, 4) AS mse_ppm,
       ROUND(MAX(ABS(val - deq)) * 1000, 4) AS max_err_pm
FROM q GROUP BY vec_id
"""


# --------------------------------------------------------------------------
# unigram LM perplexity filtering (CCNet-style) (r3)
# --------------------------------------------------------------------------


def q_perplexity_score(spark, sf_dir):
    """Unigram-LM perplexity scoring — the CCNet/RedPajama quality-filter
    family (Wenzek et al. 2020 score documents with a KenLM model; the
    unigram LM is its exact-arithmetic, SQL-twinnable core): train token
    frequencies over the corpus (one hash agg), score each doc by the
    mean negative log-probability of its tokens, report nll and
    perplexity = exp(nll).

    Plan: one vocab aggregation, the frequency table broadcast back onto
    the exploded tokens (web-scale vocab beyond broadcast range falls
    back to a token-key equi-join — same result), one per-doc agg. In a
    real pipeline docs above a ppl threshold (gibberish) and far below
    it (boilerplate) are both cut.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    tok = d.select("doc_id", F.explode("toks").alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("n"))
    nll = F.avg(-F.log(F.col("cnt") / F.col("n")))
    return (
        tok.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(nll, 4).alias("nll"),
            F.round(F.exp(nll), 2).alias("ppl"),
        )
    )


SQL_PERPLEXITY = """
WITH tok AS (
  SELECT doc_id::BIGINT AS doc_id, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
freq AS (SELECT t, COUNT(*)::DOUBLE AS cnt FROM tok GROUP BY t),
tot AS (SELECT SUM(cnt) AS n FROM freq)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(-ln(cnt / (SELECT n FROM tot))), 4) AS nll,
       ROUND(EXP(AVG(-ln(cnt / (SELECT n FROM tot)))), 2) AS ppl
FROM tok JOIN freq USING (t)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# incremental cross-corpus dedup (new crawl vs existing training set) (r3)
# --------------------------------------------------------------------------


def q_dedup_incremental(spark, sf_dir, max_doc: int = 300):
    """Incremental dedup: flag INCOMING docs (doc_id odd — the new crawl
    batch) that near-duplicate any BASE doc (doc_id even — the existing
    training corpus), via the same MinHash band signatures as
    q_dedup_minhash_lsh but joined ACROSS the two corpora only — the
    production shape of dedup-before-ingest: the base side's signatures
    are precomputed once and the per-batch cost is one band-signature
    equi-join, never a base×base or batch×batch comparison.
    """
    sh = _shingles(spark, sf_dir, max_doc)
    bands = spark.range(4).select(F.col("id").cast("int").alias("band"))
    sig = (
        sh.crossJoin(F.broadcast(bands))
        .select(
            "doc_id", "band",
            F.md5(
                F.concat(F.col("shingle"), F.lit("#"), F.col("band").cast("string"))
            ).alias("h"),
        )
        .groupBy("doc_id", "band")
        .agg(F.min("h").alias("sig"))
    )
    base = sig.where(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.col("doc_id").alias("base_doc"), "band", "sig"
    )
    inc = sig.where(F.pmod("doc_id", F.lit(2)) == 1)
    matches = (
        inc.join(base, ["band", "sig"])
        .select("doc_id", "base_doc")
        .distinct()
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_base_matches"),
            F.min("base_doc").alias("first_match"),
        )
    )
    incoming = inc.select("doc_id").distinct()
    return (
        incoming.join(matches, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_base_matches", F.lit(0)).cast("long").alias("n_base_matches"),
            "first_match",
            (F.coalesce("n_base_matches", F.lit(0)) > 0).alias("is_dup"),
        )
    )


SQL_DEDUP_INCREMENTAL = f"""
    WITH sh AS ({_SHINGLES_SQL.format(max_doc=300)}),
    sig AS (
      SELECT doc_id, band, MIN(md5(shingle || '#' || band::VARCHAR)) AS sig
      FROM sh, (SELECT UNNEST([0,1,2,3]) AS band)
      GROUP BY doc_id, band
    ),
    m AS (
      SELECT i.doc_id, COUNT(DISTINCT b.doc_id) AS n_base_matches,
             MIN(b.doc_id) AS first_match
      FROM sig i JOIN sig b USING (band, sig)
      WHERE i.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      GROUP BY i.doc_id
    ),
    inc AS (SELECT DISTINCT doc_id FROM sig WHERE doc_id % 2 = 1)
    SELECT inc.doc_id,
           CAST(COALESCE(m.n_base_matches, 0) AS BIGINT) AS n_base_matches,
           m.first_match,
           COALESCE(m.n_base_matches, 0) > 0 AS is_dup
    FROM inc LEFT JOIN m USING (doc_id)
"""


def q_perplexity_bigram(spark, sf_dir):
    """Bigram-LM perplexity: condition each token on its predecessor
    (p(t|prev) = c(prev,t) / c(prev,·)), score docs by mean negative
    log-prob over positions 2..n. The one-step-up-from-unigram member
    of the CCNet filter family — repetitive boilerplate scores low
    (predictable), shuffled word salad scores high, which the unigram
    model cannot see. Plan: one bigram-frequency agg + one
    prev-marginal agg, both joined back on the bigram/prev keys
    (broadcast at test vocab; equi-join at web scale), one per-doc agg.
    """
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.lower("text"), " ").alias("toks"),
    ).withColumn("n", F.size("toks"))
    grams = d.where(F.col("n") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            )
        ).alias("bg"),
    ).withColumn("prev", F.split("bg", " ")[0])
    bgf = grams.groupBy("bg").agg(F.count(F.lit(1)).cast("double").alias("cbg"))
    pvf = grams.groupBy("prev").agg(F.count(F.lit(1)).cast("double").alias("cpv"))
    nll = F.avg(-F.log(F.col("cbg") / F.col("cpv")))
    return (
        grams.join(F.broadcast(bgf), "bg")
        .join(F.broadcast(pvf), "prev")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(nll, 4).alias("nll2"),
            F.round(F.exp(nll), 2).alias("ppl2"),
        )
    )


SQL_PERPLEXITY_BIGRAM = """
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id, string_split(lower(text), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg, t[i] AS prev
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
bgf AS (SELECT bg, COUNT(*)::DOUBLE AS cbg FROM grams GROUP BY bg),
pvf AS (SELECT prev, COUNT(*)::DOUBLE AS cpv FROM grams GROUP BY prev)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(-ln(cbg / cpv)), 4) AS nll2,
       ROUND(EXP(AVG(-ln(cbg / cpv))), 2) AS ppl2
FROM grams JOIN bgf USING (bg) JOIN pvf USING (prev)
GROUP BY doc_id
"""


def q_inverted_index(spark, sf_dir):
    """Inverted-index build: per token, document frequency, total term
    frequency, and the first 5 postings (sorted doc_ids, serialized to
    a comma string — the driver canonicalizer hashes scalars, not
    lists). The retrieval-side product of the corpus: one shuffle on
    the token key; postings lists shard naturally by token at scale.
    """
    tok = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    )
    return tok.groupBy("t").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf_total"),
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_set("doc_id")), 1, 5)
        ).alias("postings_head"),
    )


SQL_INVERTED_INDEX = """
WITH tok AS (
  SELECT doc_id::BIGINT AS doc_id, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
)
SELECT t, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf_total,
       array_to_string(list_sort(list(DISTINCT doc_id))[1:5], ',')
         AS postings_head
FROM tok GROUP BY t
"""


def q_langid_eval(spark, sf_dir):
    """Classifier evaluation harness: confusion matrix of the langid
    heuristic against the documents table's ground-truth `lang` column,
    plus per-true-language accuracy. Reuses q_text_langid's guesses
    verbatim (one join on doc_id), then a (true, guess) hash agg — the
    eval-loop pattern every heuristic filter in this repo should be
    judged by, expressed as a two-agg DataFrame plan.
    """
    truth = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("lang").alias("lang_true"),
    )
    guess = q_text_langid(spark, sf_dir).select("doc_id", "lang_guess")
    j = truth.join(guess, "doc_id")
    cm = j.groupBy("lang_true", "lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_true = j.groupBy("lang_true").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum((F.col("lang_true") == F.col("lang_guess")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    )
    return cm.join(per_true, "lang_true").select(
        "lang_true",
        "lang_guess",
        "n",
        F.round(F.col("n_correct") / F.col("n_true"), 4).alias("true_lang_accuracy"),
    )


SQL_LANGID_EVAL = f"""
WITH guess AS ({SQL_TEXT_LANGID}),
j AS (
  SELECT d.doc_id, d.lang AS lang_true, g.lang_guess
  FROM documents d JOIN guess g ON d.doc_id = g.doc_id
),
cm AS (
  SELECT lang_true, lang_guess, COUNT(*) AS n
  FROM j GROUP BY lang_true, lang_guess
),
pt AS (
  SELECT lang_true, COUNT(*) AS n_true,
         SUM(CASE WHEN lang_true = lang_guess THEN 1 ELSE 0 END) AS n_correct
  FROM j GROUP BY lang_true
)
SELECT cm.lang_true, cm.lang_guess, cm.n,
       ROUND(pt.n_correct::DOUBLE / pt.n_true, 4) AS true_lang_accuracy
FROM cm JOIN pt USING (lang_true)
"""


def q_lsh_eval(spark, sf_dir):
    """Candidate-generation evaluation: MinHash-LSH candidate pairs
    scored against the EXACT 3-gram-Jaccard ≥ 0.2 pair set (same
    150-doc universe, both individually oracled) — recall (what the
    bucketed path would lose) and precision (wasted verify work). The
    number that justifies the banded plans: full outer join of the two
    pair sets, one aggregation, one row.
    """
    t = q_dedup_ngram_jaccard(spark, sf_dir).select("a", "b").withColumn(
        "in_t", F.lit(1)
    )
    c = q_dedup_minhash_lsh(spark, sf_dir).select("a", "b").withColumn(
        "in_c", F.lit(1)
    )
    m = t.join(c, ["a", "b"], "full")
    hit = (F.col("in_t").isNotNull() & F.col("in_c").isNotNull()).cast("int")
    return m.agg(
        F.sum("in_t").cast("long").alias("n_truth"),
        F.sum("in_c").cast("long").alias("n_candidates"),
        F.sum(hit).cast("long").alias("n_hit"),
        F.round(F.sum(hit) / F.greatest(F.sum("in_t"), F.lit(1)), 4).alias("recall"),
        F.round(F.sum(hit) / F.greatest(F.sum("in_c"), F.lit(1)), 4).alias(
            "precision"
        ),
    )


SQL_LSH_EVAL = f"""
WITH truth AS (SELECT a, b, 1 AS in_t FROM ({SQL_NGRAM_JACCARD}) q),
cand AS (SELECT a, b, 1 AS in_c FROM ({SQL_MINHASH_LSH}) q),
m AS (SELECT * FROM truth FULL JOIN cand USING (a, b))
SELECT CAST(SUM(in_t) AS BIGINT) AS n_truth,
       CAST(SUM(in_c) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN in_t IS NOT NULL AND in_c IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN in_t IS NOT NULL AND in_c IS NOT NULL THEN 1
                      ELSE 0 END)::DOUBLE
             / GREATEST(SUM(in_t), 1), 4) AS recall,
       ROUND(SUM(CASE WHEN in_t IS NOT NULL AND in_c IS NOT NULL THEN 1
                      ELSE 0 END)::DOUBLE
             / GREATEST(SUM(in_c), 1), 4) AS precision
FROM m
"""


# Gopher-style quality-gate thresholds (Rae et al. 2021 §A1.1): reject on
# duplicate-line fraction > 0.30 or symbol-to-word ratio > 0.10
_GATE_DUP_LINE = 0.30
_GATE_SYMBOL = 0.10


def q_quality_eval(spark, sf_dir):
    """Quality-gate evaluation harness (r3 verdict item 8, langid_eval
    pattern): _noisy_text_expr injects degradation DETERMINISTICALLY —
    doc_id % 13 == 0 gains repeated boilerplate lines, doc_id % 17 == 0
    (and not % 13) a symbol-spam tail — so the Gopher gate
    (dup_line_frac > 0.30 OR symbol_word_ratio > 0.10) has exact ground
    truth. Output: per truth class (clean / repetition / symbol_spam)
    the flag rate — recall for the degraded classes, false-positive
    rate for clean — the numbers that justify the thresholds before the
    gate drops terabytes. One join-free pass (truth derives from
    doc_id), one hash agg.
    """
    q = q_text_quality(spark, sf_dir)
    did = F.col("doc_id")
    truth = (
        F.when(F.pmod(did, F.lit(13)) == 0, F.lit("repetition"))
        .when(F.pmod(did, F.lit(17)) == 0, F.lit("symbol_spam"))
        .otherwise(F.lit("clean"))
    )
    flagged = (F.col("dup_line_frac") > _GATE_DUP_LINE) | (
        F.col("symbol_word_ratio") > _GATE_SYMBOL
    )
    return (
        q.select(truth.alias("truth_class"), flagged.cast("int").alias("fl"))
        .groupBy("truth_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("fl").cast("long").alias("n_flagged"),
            F.round(F.sum("fl") / F.count(F.lit(1)), 4).alias("flag_rate"),
        )
    )


SQL_QUALITY_EVAL = f"""
WITH q AS ({SQL_TEXT_QUALITY}),
lab AS (
  SELECT CASE WHEN doc_id % 13 = 0 THEN 'repetition'
              WHEN doc_id % 17 = 0 THEN 'symbol_spam'
              ELSE 'clean' END AS truth_class,
         CASE WHEN dup_line_frac > {_GATE_DUP_LINE}
                OR symbol_word_ratio > {_GATE_SYMBOL} THEN 1 ELSE 0 END AS fl
  FROM q
)
SELECT truth_class,
  COUNT(*) AS n_docs,
  CAST(SUM(fl) AS BIGINT) AS n_flagged,
  ROUND(SUM(fl)::DOUBLE / COUNT(*), 4) AS flag_rate
FROM lab GROUP BY truth_class
"""


# --------------------------------------------------------------------------
# r4: SemDeDup-style semantic dedup (cluster, then prune within cluster)
# --------------------------------------------------------------------------

_SEM_NC = 8      # coarse cells (same deterministic quantizer init as IVF)
_SEM_MAX = 300   # oracle cap; the scale knob, like _IVF_DB_MAX
_SEM_TAU = 0.35  # intra-cell cosine above this ⇒ semantic duplicate


def q_semdedup(spark, sf_dir):
    """Semantic dedup, SemDeDup-style (Abbas et al. 2023, arXiv
    2303.09540): assign every embedding to its nearest coarse centroid,
    then compute cosine ONLY within each cell and drop every vector that
    has a >= tau neighbor with a lower id in the same cell (keep-lowest-id
    greedy — the paper keeps one exemplar per tight group; lowest-id is
    the deterministic, SQL-expressible choice). This is the published
    scale path for embedding dedup: clustering bounds the candidate set
    so the pairwise stage is sum-of-squares of CELL sizes, never n²/2 —
    at k cells of n/k vectors each the pair mass drops by k×, and k grows
    with the corpus. Complements q_embedding_near_dup (all-pairs baseline
    twin) and q_ann_lsh (hash-bucketed candidates); centroids here are
    the deterministic first-k init — LEARNING them is orthogonal and
    already demonstrated by q_ann_ivf's Lloyd passes.

    Plan shape: one broadcast join (centroids are k×dim, always tiny) +
    one per-vector argmax window + one intra-cell equi-join. No
    CartesianProduct (pinned in tests/test_plans.py).

    Output: one row per vector — (vec_id, cell, kept).
    """
    ex = (
        _t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _SEM_MAX)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.posexplode("embedding").alias("pos", "val"),
        )
        .select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    )
    norms = ex.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )
    cent = ex.where(F.col("vec_id") < _SEM_NC).select(
        F.col("vec_id").alias("c"), "pos", F.col("val").alias("cv")
    )
    cnorm = cent.groupBy("c").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("_nc")
    )

    dc = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "c")
        .agg(F.sum(F.col("val") * F.col("cv")).alias("dot"))
        .join(norms, "vec_id")
        .join(F.broadcast(cnorm), "c")
        .withColumn("cos", F.round(F.col("dot") / (F.col("norm") * F.col("_nc")), 4))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("c"))
    cells = (
        dc.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", F.col("c").alias("cell"))
    )

    # intra-cell pairs only: equi-join on cell, a < b
    xa = cells.select(F.col("vec_id").alias("a"), "cell")
    xb = cells.select(F.col("vec_id").alias("b"), "cell")
    cand = xa.join(xb, "cell").where(F.col("a") < F.col("b")).select("a", "b")
    dots = (
        cand.join(ex.select(F.col("vec_id").alias("a"), "pos", F.col("val").alias("va")), "a")
        .join(ex.select(F.col("vec_id").alias("b"), "pos", F.col("val").alias("vb")), ["b", "pos"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
        .join(norms.select(F.col("vec_id").alias("a"), F.col("norm").alias("_na")), "a")
        .join(norms.select(F.col("vec_id").alias("b"), F.col("norm").alias("_nb")), "b")
        .withColumn("cos", F.round(F.col("dot") / (F.col("_na") * F.col("_nb")), 4))
    )
    dropped = (
        dots.where(F.col("cos") >= _SEM_TAU).select(F.col("b").alias("vec_id")).distinct()
        .withColumn("_drop", F.lit(1))
    )
    return (
        cells.join(dropped, "vec_id", "left")
        .select("vec_id", "cell", F.col("_drop").isNull().alias("kept"))
    )


SQL_SEMDEDUP = f"""
WITH ex AS (
  SELECT vec_id::BIGINT AS vec_id, i - 1 AS pos, embedding[i]::DOUBLE AS val
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
  WHERE vec_id < {_SEM_MAX}
),
norms AS (SELECT vec_id, sqrt(SUM(val * val)) AS norm FROM ex GROUP BY vec_id),
cent AS (SELECT vec_id AS c, pos, val AS cv FROM ex WHERE vec_id < {_SEM_NC}),
cn AS (SELECT c, sqrt(SUM(cv * cv)) AS cnorm FROM cent GROUP BY c),
dc AS (
  SELECT ex.vec_id AS vec_id, ce.c AS c,
         ROUND(SUM(ex.val * ce.cv) / (n.norm * cn.cnorm), 4) AS cos
  FROM ex JOIN cent ce USING (pos)
  JOIN norms n ON n.vec_id = ex.vec_id
  JOIN cn ON cn.c = ce.c
  GROUP BY ex.vec_id, ce.c, n.norm, cn.cnorm
),
cells AS (
  SELECT vec_id, c AS cell FROM (
    SELECT vec_id, c,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, c ASC) AS rn
    FROM dc
  ) WHERE rn = 1
),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         ROUND(SUM(e1.val * e2.val) / (na.norm * nb.norm), 4) AS cos
  FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id
  JOIN ex e1 ON e1.vec_id = x.vec_id
  JOIN ex e2 ON e2.vec_id = y.vec_id AND e2.pos = e1.pos
  JOIN norms na ON na.vec_id = x.vec_id
  JOIN norms nb ON nb.vec_id = y.vec_id
  GROUP BY x.vec_id, y.vec_id, na.norm, nb.norm
),
dropped AS (SELECT DISTINCT b AS vec_id FROM pairs WHERE cos >= {_SEM_TAU})
SELECT c.vec_id, c.cell, d.vec_id IS NULL AS kept
FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
"""


# --------------------------------------------------------------------------
# bm25_topk — ranked retrieval over the inverted index
# --------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 10
# deterministic query workload drawn from the corpus vocabulary
_BM25_QUERIES = [
    (0, "table scan fast"),
    (1, "spark window agg"),
    (2, "customer query join"),
    (3, "vector stream"),
]


def q_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval (Robertson & Spärck Jones; the Okapi
    formula Lucene/Elasticsearch default to): score every document
    against a fixed 4-query workload and keep the 10 best per query.
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term weight
    tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)), k1=1.2, b=0.75.

    Scale shape: ONE pass over the corpus builds term frequencies (the
    same aggregation the inverted index pays); doc length and document
    frequency both derive from that tf table, never from a re-scan
    (N comes from the parquet row count — metadata only). The KB-scale
    query-term table is BROADCAST to the posting lists, df/avgdl
    collapse to broadcast rows, and the final top-k is a per-query
    window over candidate docs only (docs sharing ≥1 query term),
    never the whole corpus. Ties break on rounded score then doc_id,
    so ranking is stable across engines and partitionings.

    Reference parity: none (the reference delegates retrieval to the
    SERP API, src/fraudcrawler/base/serpapi.py); this is the in-corpus
    retrieval stage a self-hosted crawl index serves (SURVEY.md §2.10).
    """
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    # materialize tf ONCE (localCheckpoint; a persisted index table in
    # production) — its three consumers prune different columns, which
    # defeats Spark's ReuseExchange and would otherwise re-scan the
    # corpus per consumer
    tf = tok.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint()
    # dl derives from tf — no second corpus scan (tf is vocab-compressed)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_docs = docs.count()  # parquet metadata only; parameterizes idf
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))  # 1 row, broadcast below

    qterms = local_df(
        spark,
        [(qid, q, t) for qid, q in _BM25_QUERIES for t in q.split(" ")],
        "qid long, query string, t string",
    )
    df_ = tf.join(F.broadcast(qterms.select("t").distinct()), "t").groupBy(
        "t"
    ).agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    hits = (
        tf.join(F.broadcast(qterms), "t")
        .join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .join(F.broadcast(avgdl))
        .select(
            "qid", "query", "doc_id",
            (
                idf
                * F.col("tf") * (1.0 + _BM25_K1)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("w"),
        )
    )
    scored = hits.groupBy("qid", "query", "doc_id").agg(
        F.round(F.sum("w"), 4).alias("bm25")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_K)
        .select("qid", "query", "doc_id", "bm25", F.col("rank").cast("long").alias("rank"))
    )


_BM25_Q_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS qid, '{q}' AS query, unnest(string_split('{q}', ' ')) AS t"
    for qid, q in _BM25_QUERIES
)

SQL_BM25_TOPK = f"""
WITH tok AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                 (SELECT AVG(dl) FROM dl) AS avgdl),
qterms AS ({_BM25_Q_SQL}),
dfq AS (
  SELECT tf.t, COUNT(*) AS df FROM tf
  JOIN (SELECT DISTINCT t FROM qterms) q ON q.t = tf.t GROUP BY 1
),
hits AS (
  SELECT q.qid, q.query, tf.doc_id,
         ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
         * tf.tf * (1.0 + {_BM25_K1})
         / (tf.tf + {_BM25_K1}
            * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl)) AS w
  FROM tf
  JOIN qterms q ON q.t = tf.t
  JOIN dfq ON dfq.t = tf.t
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scored AS (
  SELECT qid, query, doc_id, ROUND(SUM(w), 4) AS bm25
  FROM hits GROUP BY 1, 2, 3
),
ranked AS (
  SELECT qid, query, doc_id, bm25,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= {_BM25_K}
"""


# --------------------------------------------------------------------------
# cms_hot_shingles — Count-Min Sketch hot-key detection
# --------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 1024
_CMS_TOPK = 20


def q_cms_hot_shingles(spark, sf_dir):
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) over the corpus
    3-gram stream, evaluated against exact counts: estimate the top-20
    hottest shingles from a 4×1024 sketch and report the overestimate
    (CMS never underestimates — the invariant the oracle checks row by
    row). This is the hot-KEY detector feeding the salting decision
    (q_salted_agg): at 10^10 rows you can't afford an exact group-by
    just to learn which keys are skewed, but a 16 KB sketch per
    executor merges in one reduce.

    Plan: ONE corpus pass builds the exact shingle counts (the same
    aggregation the dedup family pays), materialized once; the sketch
    is a second aggregation over that vocab-compressed table (depth ×
    vocab rows in, 4×1024 out), and the 20-row probe set joins the
    4096-row sketch — broadcast, exchange-free. The sketch hash is the
    repo's cross-engine md5 idiom, so DuckDB builds the IDENTICAL
    sketch and the estimates match exactly.
    """
    from pyspark.sql import Window

    from fraudcrawler_spark.conformance_mix import _h32

    docs = _t(spark, sf_dir, "documents").select(
        F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    ).where(F.size("toks") >= 3)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ", F.col("toks")[i], F.col("toks")[i + 1], F.col("toks")[i + 2]
        ),
    )
    stream = docs.select(F.explode(sh).alias("shingle"))
    # exact counts: materialized once — both the sketch build and the
    # probe set read THIS vocab-sized table, never the corpus again
    cnt = stream.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    ).localCheckpoint()

    rows = F.explode(
        F.array(*[F.lit(r) for r in range(_CMS_DEPTH)])
    ).alias("r")
    keyed = cnt.select("shingle", "exact_cnt", rows).withColumn(
        "cell",
        F.pmod(
            _h32(F.concat(F.lit("cms"), F.col("r").cast("string"),
                          F.lit(":"), F.col("shingle"))),
            F.lit(_CMS_WIDTH),
        ),
    )
    cms = keyed.groupBy("r", "cell").agg(
        F.sum("exact_cnt").alias("cell_cnt")
    )
    # Global top-20 WITHOUT an unpartitioned window over the whole shingle
    # vocabulary (a 10^10-row corpus would funnel a billions-row vocab
    # through ONE task): orderBy+limit compiles to TakeOrderedAndProject —
    # per-partition top-20, driver merge — and rank is derived over the
    # bounded 20-row result via a window partitioned on a constant-valued
    # but NON-FOLDABLE key (same idiom as q_frontier_order; lit(1) would
    # be folded away and re-trigger the unpartitioned-window path).
    order = [F.desc("exact_cnt"), F.asc("shingle")]
    bounded = cnt.orderBy(*order).limit(_CMS_TOPK).withColumn(
        "_b", F.pmod(F.length("shingle"), F.lit(1))
    )
    w = Window.partitionBy("_b").orderBy(*order)
    top = bounded.withColumn("rank", F.row_number().over(w)).drop("_b")
    probe = top.select("shingle", "exact_cnt", "rank", rows).withColumn(
        "cell",
        F.pmod(
            _h32(F.concat(F.lit("cms"), F.col("r").cast("string"),
                          F.lit(":"), F.col("shingle"))),
            F.lit(_CMS_WIDTH),
        ),
    )
    return (
        probe.join(F.broadcast(cms), ["r", "cell"])
        .groupBy("shingle", "exact_cnt", "rank")
        .agg(F.min("cell_cnt").alias("cms_est"))
        .select(
            "shingle",
            "exact_cnt",
            F.col("rank").cast("long").alias("rank"),
            # DOUBLE, deliberately: the DuckDB twin's cell_cnt is
            # SUM(BIGINT) → HUGEINT, which pandas surfaces as float64 —
            # the driver's value hash is dtype-sensitive (r5 red row:
            # Spark long 31 vs oracle float 31.0, values equal). Matching
            # the oracle's surfaced dtype greens the hash without touching
            # the frozen oracle SQL.
            F.col("cms_est").cast("double").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt")).cast("double").alias(
                "overestimate"
            ),
        )
    )



def _sql_cms_hot_shingles() -> str:
    from fraudcrawler_spark.conformance_mix import _H32_SQL

    h = _H32_SQL.format(x="'cms' || r::VARCHAR || ':' || shingle")
    return f"""
WITH stream AS (
  SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
  FROM (
    SELECT string_split_regex(trim(text), '\\s+') AS toks FROM documents
  ), UNNEST(range(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 3
),
cnt AS (SELECT shingle, COUNT(*) AS exact_cnt FROM stream GROUP BY shingle),
keyed AS (
  SELECT shingle, exact_cnt, r, {h} % {_CMS_WIDTH} AS cell
  FROM cnt, generate_series(0, {_CMS_DEPTH - 1}) s(r)
),
cms AS (SELECT r, cell, SUM(exact_cnt) AS cell_cnt
        FROM keyed GROUP BY r, cell),
top AS (
  SELECT shingle, exact_cnt,
         ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, shingle ASC) AS rank
  FROM cnt QUALIFY rank <= {_CMS_TOPK}
),
est AS (
  SELECT k.shingle, k.exact_cnt, t.rank, MIN(c.cell_cnt) AS cms_est
  FROM keyed k
  JOIN top t ON t.shingle = k.shingle
  JOIN cms c ON c.r = k.r AND c.cell = k.cell
  GROUP BY k.shingle, k.exact_cnt, t.rank
)
SELECT shingle, exact_cnt, CAST(rank AS BIGINT) AS rank, cms_est,
       cms_est - exact_cnt AS overestimate
FROM est
"""
