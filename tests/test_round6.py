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
