"""Round-6 optimization pins.

cms_hot_shingles was the one red driver row in CORRECTNESS_r05:
(a) values were numerically equal but the DuckDB twin's SUM(BIGINT)
    surfaces as HUGEINT → pandas float64 while Spark returned long, so
    the driver's dtype-sensitive value hash diverged — fixed by casting
    the Spark columns to double (oracle SQL is frozen);
(b) the top-20 probe set ranked the ENTIRE shingle vocabulary through
    one unpartitioned window — fixed with the TakeOrderedAndProject +
    bounded-rank idiom (q_frontier_order).
Both fixes are pinned here.
"""

import os
import re

import duckdb
import pytest

from fraudcrawler_spark.registry import REGISTRY


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_cms_no_global_window(spark, sf_dir):
    from fraudcrawler_spark.conformance_ml import q_cms_hot_shingles

    p = _plan(spark, q_cms_hot_shingles(spark, sf_dir))
    # global top-20 must compile to TakeOrderedAndProject (per-partition
    # local top-k, driver merge), never an unpartitioned window over the
    # whole vocabulary (VERDICT r5 "What's wrong" 1b)
    assert "TakeOrderedAndProject" in p
    specs = re.findall(r"windowspecdefinition\(([^,]+),", p)
    assert specs and all("_b" in s for s in specs), specs


def test_worker_assign_window_over_summary_only(spark, sf_dir):
    """VERDICT r5 item 6: worker_assign's serpentine rank is a GLOBAL
    ordering (semantic — the oracle pins it), so its window is
    legitimately unpartitioned — but it must only ever rank the
    collapsed per-host summary (10^7 rows at web scale), never the
    page table. Pin: every Window in the plan sits above the host
    HashAggregate, and the scan below the windows is the aggregation's
    output, not pages rows."""
    from fraudcrawler_spark.conformance_net import q_worker_assign

    p = _plan(spark, q_worker_assign(spark, sf_dir))
    # the plan is linear here: scan -> ... -> HashAggregate (host
    # summary) -> sort -> Window(s). Assert the aggregate exists and
    # appears BELOW the first Window operator in the formatted tree
    # (higher operator number = deeper in the plan).
    # formatted-plan numbering: children carry LOWER ids than parents
    # (the scan is (1)), so "aggregate below every window" means some
    # HashAggregate id < every Window id
    win_ids = [int(m) for m in re.findall(r"\((\d+)\) Window", p)]
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) HashAggregate", p)]
    assert win_ids and agg_ids, p[:400]
    assert min(agg_ids) < min(win_ids), (
        "host-summary aggregation must sit below every window"
    )


def test_cms_oracle_dtype_parity(spark, sf_dir):
    """Driver-style compare: pandas dtypes AND values must match between
    Spark (toPandas) and the DuckDB twin (.df()) — the exact surface the
    driver hashes. The suite's fetchall()-based comparator normalizes
    dtypes away, which is how the r5 red row slipped through green tests.
    """
    fn, sql = REGISTRY["cms_hot_shingles"]
    pdf_s = fn(spark, sf_dir).toPandas()

    con = duckdb.connect()
    doc = os.path.join(sf_dir, "documents.parquet")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{doc}'")
    pdf_o = con.sql(sql).df()

    assert list(pdf_s.dtypes.astype(str)) == list(pdf_o.dtypes.astype(str)), (
        f"{dict(pdf_s.dtypes.astype(str))} vs {dict(pdf_o.dtypes.astype(str))}"
    )
    a = pdf_s.sort_values("shingle").reset_index(drop=True)
    b = pdf_o[pdf_s.columns].sort_values("shingle").reset_index(drop=True)
    assert a.equals(b), "value or dtype mismatch vs oracle .df()"
