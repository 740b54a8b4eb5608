"""Graph operators for the crawl/dedup pipeline: near-dup cluster
resolution (connected components), link-graph priority (PageRank), and
a salted skew-safe aggregation.

Why these belong in this engine: near-dup PAIR generation (minhash/
simhash, conformance_ml.py) is only half of dedup — turning pairs into
clusters and electing one canonical doc per cluster is a connected-
components problem; and the reference's priority frontier
(orchestrator.py:525-626 stage barriers; our frontier/politeness.py)
is the natural consumer of a link-graph rank score. Both are iterative
algorithms expressed as pure DataFrame joins/aggregations — the
Pregel-lite pattern — with exact SQL twins (recursive CTE / unrolled
iterations) so the driver oracle still value-checks them.

Deterministic edge sets are derived arithmetically from doc_id (the
synthetic documents table has no link column); the derivation is
mirrored in the SQL twins. The PLANS are edge-set-agnostic: swap in the
minhash-LSH pair output or real href edges and nothing changes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fraudcrawler_spark.conformance_ml import _t

# --------------------------------------------------------------------------
# connected components → dedup clusters
# --------------------------------------------------------------------------

_CC_MAX_ROUNDS = 60  # pathology bound, NOT a diameter bound: the
# alternating-star algorithm converges in O(log^2 n) rounds on any graph
# (log2(10^10) ≈ 33), so 60 is only hit by a logic error — and then we
# raise instead of silently splitting a component.


def _chain_edges(docs):
    """Symmetric edge set: doc d ↔ d-1 unless d % 7 == 0 — chains of
    length ≤7, so components are {7k..7k+6}. Chains (not stars) force
    real multi-round propagation."""
    e = docs.where(F.pmod("doc_id", F.lit(7)) != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster resolution: connected components via alternating
    large-star/small-star (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond"), then canonical-doc election (min doc_id) and
    cluster size.

    Converges in O(log^2 n) rounds on ANY graph — no diameter
    assumption (the r3 fixed-8-iteration min-label loop silently split
    components deeper than its bound; r3 verdict item 3). Convergence is
    detected by an edge-set fingerprint (count + xxhash64 bit-XOR — one
    cheap action per round over the just-checkpointed edges); a
    never-converging run raises at _CC_MAX_ROUNDS instead of returning
    wrong labels. Per round: two groupBy-min aggregations + two
    partitioning-aligned joins — the agg's hash partitioning on the
    group key satisfies the join's distribution, so each star phase
    costs one exchange, and edge count stays O(|V| + |E|) throughout.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return star_components(docs, _chain_edges(docs))


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE e AS (
  SELECT doc_id AS src, doc_id - 1 AS dst FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id - 1 AS src, doc_id AS dst FROM documents WHERE doc_id % 7 <> 0
),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id AS lbl FROM documents
  UNION
  SELECT e.src AS doc_id, r.lbl
  FROM reach r JOIN e ON e.dst = r.doc_id
),
comp AS (
  SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id
),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT
  comp.doc_id,
  comp.cluster_id,
  sizes.cluster_size,
  comp.doc_id = comp.cluster_id AS is_canonical
FROM comp JOIN sizes USING (cluster_id)
"""


# --------------------------------------------------------------------------
# PageRank link priority (2 unrolled iterations)
# --------------------------------------------------------------------------

_PR_DAMP = 0.85


def q_pagerank_priority(spark, sf_dir):
    """Link-graph priority for the frontier: two PageRank iterations
    (damping 0.85) over a deterministic 2-out-regular link graph, rank
    reported scaled by N (so values are O(1) and stable under 4-decimal
    rounding).

    Plan per iteration: contribution = rank/out_degree shipped along
    edges (equi-join on src), then a hash aggregation on dst — map-side
    partials bound the shuffle by the edge partition count. Out-degrees
    are computed once. This is the standard Spark PageRank shape; at
    100 TB the edge table partitions by src-hash and AQE coalesces the
    skewed-in-degree tail. Every graph op here is oracle-checked by the
    unrolled SQL twin.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # metadata-cheap count; N parameterizes the twin
    e1 = docs.select(
        "doc_id", F.pmod(F.col("doc_id") * 7 + 3, F.lit(n)).alias("dst")
    )
    # quadratic second family (collides, unlike the affine bijection) —
    # real in-degree skew, so the rank vector is non-constant (late-r5
    # fix: both affine maps were bijections whenever gcd(a, n) = 1,
    # making every in-degree exactly 2 and the output a constant 1.0)
    e2 = docs.select(
        "doc_id", F.pmod(F.col("doc_id") * F.col("doc_id") + 1, F.lit(n)).alias("dst")
    )
    edges = e1.unionByName(e2).select(F.col("doc_id").alias("src"), "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant edge ⨝ degree materialized once (see q_opic_priority)
    ed = edges.join(deg, "src").localCheckpoint()

    ranks = docs.select("doc_id", (F.lit(1.0) / n).alias("pr"))
    for _ in range(2):
        contrib = (
            ed.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            docs.join(inflow.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.lit((1.0 - _PR_DAMP) / n)
                    + F.lit(_PR_DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks.select(
        "doc_id", F.round(F.col("pr") * n, 4).alias("pr_scaled")
    )


SQL_PAGERANK = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 7 + 3) % (SELECT n FROM n) AS dst FROM documents
  UNION ALL
  SELECT doc_id AS src, (doc_id * doc_id + 1) % (SELECT n FROM n) AS dst FROM documents
),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
r0 AS (SELECT doc_id, 1.0 / (SELECT n FROM n) AS pr FROM documents),
i1 AS (
  SELECT e.dst AS doc_id, SUM(r0.pr / deg.deg) AS s
  FROM e JOIN deg USING (src) JOIN r0 ON r0.doc_id = e.src
  GROUP BY e.dst
),
r1 AS (
  SELECT d.doc_id,
         0.15 / (SELECT n FROM n) + 0.85 * COALESCE(i1.s, 0) AS pr
  FROM documents d LEFT JOIN i1 USING (doc_id)
),
i2 AS (
  SELECT e.dst AS doc_id, SUM(r1.pr / deg.deg) AS s
  FROM e JOIN deg USING (src) JOIN r1 ON r1.doc_id = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT d.doc_id,
         0.15 / (SELECT n FROM n) + 0.85 * COALESCE(i2.s, 0) AS pr
  FROM documents d LEFT JOIN i2 USING (doc_id)
)
SELECT doc_id, ROUND(pr * (SELECT n FROM n), 4) AS pr_scaled FROM r2
"""


# --------------------------------------------------------------------------
# salted skew-safe aggregation
# --------------------------------------------------------------------------

_SALT_SHARDS = 16


def q_salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation: partial totals on
    (source, salt) — 16 shards per group key — then final totals on
    source. Result-identical to a direct GROUP BY (the oracle proves
    it); the point is the PLAN: a Zipf-head group key never lands its
    entire mass on one reducer, because phase 1 spreads each hot key
    over 16 reduce partitions and phase 2 only merges 16 partial rows
    per key. Same salting discipline the politeness scheduler applies
    to hot hosts (frontier/politeness.py salt_shards).
    """
    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.pmod(F.col("doc_id"), F.lit(_SALT_SHARDS)).alias("salt"),
        "n_chars",
    )
    partial = docs.groupBy("source", "salt").agg(
        F.count(F.lit(1)).alias("pc"), F.sum("n_chars").alias("ps")
    )
    return partial.groupBy("source").agg(
        F.sum("pc").cast("long").alias("n_docs"),
        F.sum("ps").cast("long").alias("total_chars"),
        F.round(F.sum("ps") / F.sum("pc"), 4).alias("avg_chars"),
    )


SQL_SALTED_AGG = """
SELECT
  source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  ROUND(SUM(n_chars)::DOUBLE / COUNT(*), 4) AS avg_chars
FROM documents
GROUP BY source
"""


def _labels_to_clusters(docs, labels):
    """(doc_id, lbl) → the standard cluster output: (doc_id, cluster_id,
    cluster_size, is_canonical)."""
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        "cluster_size",
        (F.col("doc_id") == F.col("lbl")).alias("is_canonical"),
    )


def star_components(docs, edges, max_rounds: int = _CC_MAX_ROUNDS,
                    stats: dict | None = None):
    """Production connected components: alternating large-star /
    small-star (Kiveris et al. 2014) over ``docs(doc_id)`` + symmetric
    ``edges(src, dst)`` → (doc_id, cluster_id, cluster_size,
    is_canonical) with cluster_id = component-min doc_id.

    Large-star: every node links its strictly-larger neighbors to the
    minimum of its closed neighborhood. Small-star: every node (edges
    now oriented large→small) links all its smaller neighbors — and
    itself — to that minimum. Alternating the two converges to stars
    centered at each component's minimum in O(log^2 n) rounds
    REGARDLESS of graph diameter. Each round localCheckpoints the edge
    set (flat lineage) and compares a (count, xxhash64-sum) fingerprint
    against the previous round — identical fingerprint on an identical
    multiset means converged. Refuses (ValueError) rather than return
    split components if max_rounds is ever hit."""
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        # eager=False: the fingerprint's full-scan agg right below
        # materializes the checkpoint in the SAME job — one fewer Spark
        # job per call, identical truncation semantics (the fingerprint
        # always computes every partition)
        .localCheckpoint(eager=False)
    )

    def _fingerprint(df):
        # bit_xor, not sum: xxhash64 values are uniform 64-bit longs and
        # summing them overflows under ANSI mode; XOR is order-insensitive
        # and exact on a distinct edge set
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _fingerprint(e)
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        # ---- large-star: neighbors v > u attach to min(Γ(u) ∪ {u})
        nbr = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = nbr.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            nbr.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            # no distinct here: duplicates cannot change mins2 (a min) or
            # the small-star join output, and the round's final distinct
            # below dedups the edge set anyway — dropping it removes one
            # full exchange per round (§2.4); dup volume is bounded by
            # the undirected degree, same as nbr itself
        )
        # ---- small-star: edges now all point large→small; every node
        # re-links its neighbors (and itself) to its min neighbor
        mins2 = large.groupBy("src").agg(F.min("dst").alias("m"))
        e = (
            large.join(mins2, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .unionByName(mins2.select("src", F.col("m").alias("dst")))
            .distinct()
            # eager=False: materialized by the fingerprint below (full
            # scan), saving one job per round
            .localCheckpoint(eager=False)
        )
        cur = _fingerprint(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise ValueError(
            f"star_components did not converge in {max_rounds} rounds — "
            "O(log^2 n) convergence is guaranteed, so this is a logic "
            "error, not a deep graph; refusing to return split components"
        )
    if stats is not None:
        stats["rounds"] = rounds
    lbl = e.groupBy("src").agg(F.min("dst").alias("lbl"))
    labels = docs.join(
        lbl.withColumnRenamed("src", "doc_id"), "doc_id", "left"
    ).select("doc_id", F.coalesce("lbl", "doc_id").alias("lbl"))
    return _labels_to_clusters(docs, labels)


def min_label_components(docs, edges, max_iters: int = _CC_MAX_ROUNDS,
                         stats: dict | None = None):
    """Min-label-propagation connected components, kept as the simple
    O(diameter) twin of star_components: ``docs(doc_id)`` + symmetric
    ``edges(src, dst)`` → (doc_id, cluster_id, cluster_size,
    is_canonical). Pregel-lite per round (equi-join + hash agg). Since
    r4 it iterates TO CONVERGENCE (label-set fingerprint per round, one
    cheap action over just-checkpointed labels) instead of a fixed
    count — correct on any diameter ≤ max_iters, else raises. Prefer
    star_components for production graphs (diameter-free round bound)."""
    labels = docs.select("doc_id", F.col("doc_id").alias("lbl")).localCheckpoint()

    def _fingerprint(df):
        row = df.agg(
            F.coalesce(F.bit_xor(F.xxhash64("doc_id", "lbl")), F.lit(0)).alias("h")
        ).collect()[0]
        return row["h"]

    prev = _fingerprint(labels)
    for _ in range(max_iters):
        prop = edges.join(
            labels.withColumnRenamed("doc_id", "dst"), "dst"
        ).select(F.col("src").alias("doc_id"), "lbl")
        labels = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        cur = _fingerprint(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise ValueError(
            f"min_label_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds the bound) — use star_components"
        )
    return _labels_to_clusters(docs, labels)


def q_neardup_resolution(spark, sf_dir, cap: int = 300):
    """The two dedup stages WIRED TOGETHER: banded 64-bit SimHash pair
    generation (conformance_ml.simhash64_pairs_banded — equi-join
    buckets, never all-pairs) feeding connected-component resolution
    and canonical-doc election. This is the composite a real dedup
    pipeline ships: fingerprints → candidate pairs → clusters → keep
    one doc per cluster. Singleton docs are their own canonical. The
    DuckDB twin computes exact components (recursive CTE) over the
    all-pairs pair SQL — identical pairs by pigeonhole, so identical
    clusters.
    """
    from fraudcrawler_spark.conformance_ml import (
        q_dedup_simhash64,
        simhash64_pairs_banded,
    )

    sh = q_dedup_simhash64(spark, sf_dir).where(F.col("doc_id") < cap)
    pairs = simhash64_pairs_banded(sh).select("a", "b")
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    return star_components(sh.select("doc_id"), edges)


def _sql_neardup_resolution() -> str:
    from fraudcrawler_spark.conformance_ml import _S64_HAMMING_SQL, _simhash64_sql

    return f"""
WITH RECURSIVE sh AS ({_simhash64_sql(300)}),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM sh x JOIN sh y ON x.doc_id < y.doc_id
  WHERE ({_S64_HAMMING_SQL}) <= 3
),
e AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b AS src, a AS dst FROM pairs
),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id AS lbl FROM sh
  UNION
  SELECT e.src AS doc_id, r.lbl FROM reach r JOIN e ON e.dst = r.doc_id
),
comp AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp
          GROUP BY cluster_id)
SELECT comp.doc_id, comp.cluster_id, sizes.cluster_size,
       comp.doc_id = comp.cluster_id AS is_canonical
FROM comp JOIN sizes USING (cluster_id)
"""



# --------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg) — link-graph frontier signal
# --------------------------------------------------------------------------

_HITS_ITERS = 2


def q_hits_centrality(spark, sf_dir):
    """Two HITS iterations (Kleinberg hubs/authorities) over the same
    deterministic 2-out-regular link graph as PageRank: auth(v) =
    Σ hub(u) over in-edges, hub(u) = Σ auth(v) over out-edges, both
    rescaled at the end to mean 1 (×N/Σ — so values are O(1) and stable
    under 4-decimal rounding, same contract as pr_scaled).

    Why it belongs here: PageRank prices a page by WHO links to it;
    HITS separates directory-style hub pages from authority content —
    the pair is the classic frontier-prioritization signal set. Plan
    per iteration: one equi-join shipping the current score along
    edges + one hash aggregation on the receiving endpoint (map-side
    partials), identical shuffle shape to the PageRank twin; the final
    mean-normalization is a broadcast of ONE scalar row, never a
    collect. Swap the arithmetic edge set for real href edges and
    nothing changes.
    """
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # metadata-cheap count; N parameterizes the twin
    e1 = docs.select(
        F.col("doc_id").alias("src"),
        F.pmod(F.col("doc_id") * 7 + 3, F.lit(n)).alias("dst"),
    )
    # the second family is QUADRATIC — unlike the affine map (a bijection
    # whenever gcd(7, n) = 1) it collides, so in-degree is genuinely
    # skewed and hubs/authorities separate instead of collapsing to a
    # constant vector on a regular graph
    e2 = docs.select(
        F.col("doc_id").alias("src"),
        F.pmod(F.col("doc_id") * F.col("doc_id") + 1, F.lit(n)).alias("dst"),
    )
    edges = e1.unionByName(e2)
    # hub_0 = 1.0 on every node (all docs have out-degree 2)
    hub = docs.select(F.col("doc_id").alias("src"), F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(_HITS_ITERS):
        auth = (
            edges.join(hub, "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
        )
        hub = (
            edges.join(auth, "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
        )
    totals = auth.agg(F.sum("auth").alias("sa")).crossJoin(
        hub.agg(F.sum("hub").alias("sh"))
    )
    return (
        docs.join(auth.withColumnRenamed("dst", "doc_id"), "doc_id", "left")
        .join(hub.withColumnRenamed("src", "doc_id"), "doc_id", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.coalesce("auth", F.lit(0.0)) * n / F.col("sa"), 4
            ).alias("auth_scaled"),
            F.round(
                F.coalesce("hub", F.lit(0.0)) * n / F.col("sh"), 4
            ).alias("hub_scaled"),
        )
    )


SQL_HITS = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 7 + 3) % (SELECT n FROM n) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id AS src, (doc_id * doc_id + 1) % (SELECT n FROM n) AS dst
  FROM documents
),
a1 AS (SELECT dst, SUM(1.0) AS auth FROM e GROUP BY dst),
h1 AS (SELECT src, SUM(a1.auth) AS hub FROM e JOIN a1 USING (dst)
       GROUP BY src),
a2 AS (SELECT dst, SUM(h1.hub) AS auth FROM e JOIN h1 USING (src)
       GROUP BY dst),
h2 AS (SELECT src, SUM(a2.auth) AS hub FROM e JOIN a2 USING (dst)
       GROUP BY src),
t AS (SELECT (SELECT SUM(auth) FROM a2) AS sa,
             (SELECT SUM(hub) FROM h2) AS sh)
SELECT d.doc_id,
  round(COALESCE(a2.auth, 0) * (SELECT n FROM n) / t.sa, 4)
    AS auth_scaled,
  round(COALESCE(h2.hub, 0) * (SELECT n FROM n) / t.sh, 4)
    AS hub_scaled
FROM documents d
LEFT JOIN a2 ON a2.dst = d.doc_id
LEFT JOIN h2 ON h2.src = d.doc_id
CROSS JOIN t
"""


# --------------------------------------------------------------------------
# crawl_depth — BFS hop distance from the seed set over the link graph
# --------------------------------------------------------------------------

def _page_link_graph(spark):
    """(ids, n, edges) of the corpus's embedded link graph — page_id
    parsed from the url path, distinct dst = (pid·31 + k·101 + 7) % n
    for k = 0..6 (datagen.generate_pages targets). Edges are
    materialized once (localCheckpoint) because every consumer is
    iterative and re-joins them each round. Shared by q_crawl_depth
    and q_opic_priority so the derivation can never drift from the
    SQL twins."""
    import os

    from fraudcrawler_spark.registry import _crawl_corpus

    pages = spark.read.parquet(os.path.join(_crawl_corpus(), "pages.parquet"))
    ids = pages.select(
        F.regexp_extract("url", r"/p(\d{6})$", 1).cast("long").alias("page_id")
    )
    n = ids.count()
    edges = (
        ids.select(
            F.col("page_id").alias("src"),
            F.explode(
                F.array(*[
                    F.pmod(F.col("page_id") * 31 + k * 101 + 7, F.lit(n))
                    for k in range(7)
                ])
            ).alias("dst"),
        )
        .distinct()
        .localCheckpoint()  # reused every round; cut the scan lineage once
    )
    return ids, n, edges


_BFS_MAX_ROUNDS = 25  # pathology bound, not a diameter guess: the
# corpus link graph (out-degree 7, n=2000) has diameter ~5; a frontier
# still alive at 25 means the edge derivation broke, and we raise
# instead of emitting truncated depths. The SQL twin unrolls to the
# same bound, so both engines agree by construction when we converge.


def q_crawl_depth(spark, sf_dir):
    """Crawl-depth assignment: minimum hop distance of every reachable
    page from the seed set (page_id % 97 == 0), BFS over the corpus's
    embedded link graph (datagen.generate_pages targets:
    dst = (pid*31 + k*101 + 7) % n, k = 0..6). Depth-limited crawling
    and per-depth budget reports both key off this column.

    Scale shape: classic frontier BFS — per round ONE equi-join of the
    current frontier (small) against the edge table partitioned by src,
    then ONE anti-join against the visited set; lineage is cut per
    round (localCheckpoint locally; a checkpoint/frontier table on a
    cluster). Rounds = graph depth from seeds (~5 here), not n. The
    visited set stays hash-partitioned by page_id across rounds, so
    the anti-join never re-shuffles the big side.

    Reference parity: the reference crawls a fixed result list, depth 1
    by construction (src/fraudcrawler/base/orchestrator.py); this is
    the frontier-depth ledger a recursive crawl enforces max_depth
    with (SURVEY.md §2.10).
    """
    ids, n, edges = _page_link_graph(spark)
    dist = ids.where(F.pmod("page_id", F.lit(97)) == 0).select(
        "page_id", F.lit(0).cast("long").alias("depth")
    ).localCheckpoint()
    frontier = dist
    for r in range(1, _BFS_MAX_ROUNDS + 1):
        nxt = (
            frontier.join(edges, frontier["page_id"] == edges["src"])
            .select(
                F.col("dst").alias("page_id"),
                (F.col("depth") + 1).alias("depth"),
            )
            .groupBy("page_id")
            .agg(F.min("depth").alias("depth"))
        )
        new = nxt.join(dist.select("page_id"), "page_id", "left_anti")
        new = new.localCheckpoint()
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint()
        frontier = new
    else:
        raise RuntimeError(
            f"crawl_depth: frontier still alive after {_BFS_MAX_ROUNDS} "
            "rounds — edge derivation or dedup broke; refusing to emit "
            "truncated depths"
        )
    return dist.select("page_id", "depth")


def _sql_crawl_depth() -> str:
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
WITH RECURSIVE p AS (
  SELECT CAST(regexp_extract(url, '/p(\d{{6}})$', 1) AS BIGINT) AS pid
  FROM read_parquet('{_corpus_sql_dir()}/pages.parquet')
),
n AS (SELECT COUNT(*) AS n FROM p),
e AS (
  SELECT DISTINCT pid AS src,
         (pid * 31 + k * 101 + 7) % (SELECT n FROM n) AS dst
  FROM p, generate_series(0, 6) s(k)
),
bfs AS (
  SELECT pid AS page_id, 0 AS depth FROM p WHERE pid % 97 = 0
  UNION
  SELECT e.dst AS page_id, b.depth + 1 AS depth
  FROM bfs b JOIN e ON e.src = b.page_id
  WHERE b.depth < {_BFS_MAX_ROUNDS}
)
SELECT page_id, CAST(MIN(depth) AS BIGINT) AS depth
FROM bfs GROUP BY page_id
"""


# --------------------------------------------------------------------------
# opic_priority — On-line Page Importance Computation over the link graph
# --------------------------------------------------------------------------

_OPIC_ROUNDS = 3


def q_opic_priority(spark, sf_dir):
    """OPIC frontier priority (Abiteboul, Preda & Cobena, WWW 2003,
    "Adaptive On-Line Page Importance Computation" — the crawl-native
    importance measure: unlike PageRank it needs no damping dimension
    and its accumulated-history estimate is meaningful after ANY number
    of rounds, which is why crawlers use it to prioritize a frontier
    mid-crawl). Synchronous variant over the corpus link graph: every
    page starts with cash 1/n; each round it banks its cash into its
    history and distributes it equally along its out-edges. importance
    = (history + cash) / (R + 1), reported ×n so values are O(1).

    Scale shape: identical per-round plan to PageRank — one edge
    equi-join shipping cash/out-degree + one hash aggregation on the
    receiving endpoint (map-side partials); history folds in as a
    running column, no extra exchange. Total cash is conserved at 1.0
    by construction, so no renormalization pass is ever needed — the
    property that makes OPIC cheaper than PageRank per round at 10^10
    urls. Oracle: the unrolled SQL twin.

    Edge set: the VARIABLE-out-degree subset k ≤ pid mod 7 of the
    corpus link targets (out-degree 1..7, never 0 — no dangling cash).
    The full 7-target set is seven affine bijections mod n, i.e. a
    7-regular graph, on which ANY importance measure is a constant
    vector — the same degeneracy the r4 PageRank fix closed; the
    subset gives genuinely skewed in-degree.
    """
    ids, n, _ = _page_link_graph(spark)
    edges = (
        ids.select(
            F.col("page_id").alias("src"),
            F.explode(
                F.sequence(F.lit(0), F.pmod("page_id", F.lit(7)))
            ).alias("k"),
        )
        .select(
            "src",
            F.pmod(F.col("src") * 31 + F.col("k") * 101 + 7, F.lit(n)).alias(
                "dst"
            ),
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edge ⨝ out-degree is loop-invariant: materialize it once instead of
    # re-deriving the distinct edge set + degree agg every iteration
    # (§2.4 — the per-iteration plan keeps ONE equi-join + one hash agg)
    ed = edges.join(deg, "src").localCheckpoint()
    st = ids.select(
        "page_id",
        F.lit(1.0 / n).alias("cash"),
        F.lit(0.0).alias("hist"),
    )
    for _ in range(_OPIC_ROUNDS):
        inflow = (
            ed.join(
                st.select(F.col("page_id").alias("src"), "cash"), "src"
            )
            .select("dst", (F.col("cash") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        st = (
            st.join(
                inflow.withColumnRenamed("dst", "page_id"), "page_id", "left"
            )
            .select(
                "page_id",
                F.coalesce("inflow", F.lit(0.0)).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint()  # same lineage discipline as the BFS/CC loops
        )
    return st.select(
        "page_id",
        F.round(F.col("cash") * n, 4).alias("cash_scaled"),
        F.round(F.col("hist") * n, 4).alias("hist_scaled"),
        F.round(
            (F.col("hist") + F.col("cash")) * n / (_OPIC_ROUNDS + 1), 4
        ).alias("importance"),
    )


def _sql_opic_priority() -> str:
    from fraudcrawler_spark.registry import _corpus_sql_dir

    return rf"""
WITH p AS (
  SELECT CAST(regexp_extract(url, '/p(\d{{6}})$', 1) AS BIGINT) AS pid
  FROM read_parquet('{_corpus_sql_dir()}/pages.parquet')
),
n AS (SELECT COUNT(*) AS n FROM p),
e AS (
  SELECT DISTINCT pid AS src,
         (pid * 31 + k * 101 + 7) % (SELECT n FROM n) AS dst
  FROM p, generate_series(0, 6) s(k)
  WHERE k <= pid % 7
),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
s0 AS (SELECT pid, 1.0 / (SELECT n FROM n) AS cash, 0.0 AS hist FROM p),
i1 AS (SELECT e.dst, SUM(s.cash / deg.deg) AS inflow
       FROM e JOIN deg USING (src) JOIN s0 s ON s.pid = e.src GROUP BY e.dst),
s1 AS (SELECT p.pid, COALESCE(i1.inflow, 0) AS cash, s0.hist + s0.cash AS hist
       FROM p JOIN s0 USING (pid) LEFT JOIN i1 ON i1.dst = p.pid),
i2 AS (SELECT e.dst, SUM(s.cash / deg.deg) AS inflow
       FROM e JOIN deg USING (src) JOIN s1 s ON s.pid = e.src GROUP BY e.dst),
s2 AS (SELECT p.pid, COALESCE(i2.inflow, 0) AS cash, s1.hist + s1.cash AS hist
       FROM p JOIN s1 USING (pid) LEFT JOIN i2 ON i2.dst = p.pid),
i3 AS (SELECT e.dst, SUM(s.cash / deg.deg) AS inflow
       FROM e JOIN deg USING (src) JOIN s2 s ON s.pid = e.src GROUP BY e.dst),
s3 AS (SELECT p.pid, COALESCE(i3.inflow, 0) AS cash, s2.hist + s2.cash AS hist
       FROM p JOIN s2 USING (pid) LEFT JOIN i3 ON i3.dst = p.pid)
SELECT pid AS page_id,
       ROUND(cash * (SELECT n FROM n), 4) AS cash_scaled,
       ROUND(hist * (SELECT n FROM n), 4) AS hist_scaled,
       ROUND((hist + cash) * (SELECT n FROM n) / {_OPIC_ROUNDS + 1}, 4)
         AS importance
FROM s3
"""
