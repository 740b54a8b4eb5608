"""Property tests (SURVEY.md §5.2 item 5) + sink parity checks."""

import os

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fraudcrawler_spark.functions.urls import (
    _ref_get_domain,
    canonical_host_py,
    canonical_url_py,
)

url_texts = st.text(
    alphabet=st.sampled_from("abcdef0123456789.:/@?#-_~%"), min_size=1, max_size=60
)


@settings(max_examples=300, deadline=None)
@given(url_texts)
def test_canonicalization_idempotent(u):
    """canonical_url(canonical_url(u)) == canonical_url(u)."""
    c = canonical_url_py(u)
    assert canonical_url_py(c) == c


@settings(max_examples=300, deadline=None)
@given(url_texts)
def test_canonical_host_never_raises_and_strips_www(u):
    h = canonical_host_py(u)
    assert isinstance(h, str)
    assert not h.startswith("www.") or h == u  # fallback-to-full-url case


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=60))
def test_ref_domain_total(u):
    """The reference-parity kernel is total on arbitrary strings."""
    assert isinstance(_ref_get_domain(u), str)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["h1", "h2", "h3"]), st.integers(0, 999)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 8),
)
def test_politeness_budget_property(rows, budget):
    """Pure-python twin check: per-host scheduled ≤ host_budget for any
    frontier (cell budgets sum to ≤ ceil(B/s)*s, and each cell ≤ its
    budget)."""
    import zlib

    from fraudcrawler_spark.frontier.politeness import cell_budget

    shards = 4
    cells = {}
    for host, n in rows:
        url = f"https://{host}/p{n:06d}"
        salt = zlib.crc32(url.encode()) % shards
        cells.setdefault((host, salt), set()).add(url)
    per_host = {}
    for (host, salt), urls in cells.items():
        b = cell_budget(budget, shards, None)
        take = min(len(urls), b)
        per_host[host] = per_host.get(host, 0) + take
    for host, n in per_host.items():
        # the engine's per-host bound: s cells × ceil(B/s) tokens each
        # (≤ B + s - 1; exactly B when s | B — the crawl default)
        assert n <= (budget + shards - 1) // shards * shards


def test_csv_sink_quote_all(spark, tmp_path):
    """S5 — CSV sink with QUOTE_ALL (reference client.py:75)."""
    from fraudcrawler_spark.operators.sink import flatten_classifications, write_results

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://a.ch/p1", "https://b.ch/p2"],
                "product_name": ["x, with comma", None],
            }
        )
    ).withColumn(
        "classifications",
        F.create_map(F.lit("relevance"), F.lit(1)),
    )
    flat = flatten_classifications(df, ["relevance"])
    out = str(tmp_path / "csv_out")
    write_results(flat, out, fmt="csv")
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    body = "".join(open(os.path.join(out, f)).read() for f in files)
    # every non-null field quoted, header included
    assert '"url"' in body and '"classification_relevance"' in body
    assert '"x, with comma"' in body
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2


def test_dedup_no_unflagged_dup_property(spark, corpus_dir):
    """After dedup, no url appears twice unflagged — engine invariant."""
    from fraudcrawler_spark.operators.dedupe import dedup_flag

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").limit(500)
    # duplicate every url 3x with different arrival keys
    items = (
        pages.select("url")
        .crossJoin(spark.range(3).select(F.col("id").alias("arr")))
        .withColumn("filtered", F.pmod(F.col("arr"), F.lit(2)) == 1)
        .withColumn(
            "filtered_at_stage",
            F.when(F.col("filtered"), F.lit("country code filtering")),
        )
    )
    out = dedup_flag(items, order_by=[F.col("arr")])
    dup_unflagged = (
        out.where(~F.col("filtered")).groupBy("url").count().where(F.col("count") > 1)
    )
    assert dup_unflagged.count() == 0


@settings(max_examples=300, deadline=None)
@given(url_texts)
def test_normalize_url_idempotent(u):
    """normalize_url(normalize_url(u)) == normalize_url(u): param sort
    and tracking-strip are stable under re-application."""
    from fraudcrawler_spark.functions.urls import normalize_url_py

    n = normalize_url_py(u)
    assert normalize_url_py(n) == n


def test_normalize_url_expr_matches_py(spark):
    """The JVM expression and the Python twin agree byte-for-byte on a
    param-heavy url set (including &-ordering, tracking params, empty
    params, fragments, and no-query urls)."""
    from pyspark.sql import functions as F

    from fraudcrawler_spark.functions.urls import normalize_url_expr, normalize_url_py

    urls = [
        "https://www.a.ch/p?b=2&a=1&utm_source=x",
        "http://A.CH/p?utm_campaign=q&gclid=1",
        "https://a.ch/p?z=1&&y=2#frag",
        "https://a.ch/p",
        "https://a.ch/p?UTM_SOURCE=caps&a=1",
        "https://www.a.ch/?sessionid=9",
        "not a url at all",
        "https://a.ch/p?a=1&a=0",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = {r["u"]: r["n"] for r in df.select("u", normalize_url_expr(F.col("u")).alias("n")).collect()}
    for u in urls:
        assert got[u] == normalize_url_py(u), (u, got[u], normalize_url_py(u))


@settings(max_examples=5, deadline=None)
@given(
    st.integers(min_value=2, max_value=40),
    st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)),
        min_size=0, max_size=80,
    ),
)
def test_star_components_matches_union_find(spark, n, raw_edges):
    """Adversarial pin for the trickiest iterative operator: on random
    graphs (self-loops and duplicates included), alternating-star
    connected components must agree with an independent pure-Python
    union-find — labels (component-min), sizes, and canonical flags."""
    from fraudcrawler_spark.conformance_graph import star_components

    edges = [(a % n, b % n) for a, b in raw_edges if a % n != b % n]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label = {v: find(v) for v in range(n)}
    size: dict = {}
    for v in range(n):
        size[label[v]] = size.get(label[v], 0) + 1
    expect = sorted(
        (v, label[v], size[label[v]], v == label[v]) for v in range(n)
    )

    docs = spark.createDataFrame([(v,) for v in range(n)], "doc_id long")
    sym = edges + [(b, a) for a, b in edges]
    if sym:
        edf = spark.createDataFrame(sym, "src long, dst long")
    else:
        edf = spark.createDataFrame([], "src long, dst long")
    got = sorted(
        tuple(r)
        for r in star_components(docs, edf).collect()
    )
    assert got == expect
