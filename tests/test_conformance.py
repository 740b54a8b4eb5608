"""Replicates the driver's DuckDB-oracle compare for every registry query:
row count + column names + order-insensitive values."""

import math
import os

import duckdb
import pytest

from fraudcrawler_spark.registry import REGISTRY, _ROWS_ONLY

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # integral-valued floats normalize like ints: DuckDB surfaces
        # HUGEINT (SUM of BIGINT) as int via fetchall() but float64 via
        # .df(), and Spark twins deliberately match the .df() dtype
        # (double) for the driver's dtype-sensitive hash — 31 == 31.0
        # here. Round to 4dp FIRST so 2.00000001 and 2.0 still agree.
        s = f"{v:.4f}"
        if s.endswith(".0000"):
            s = s[:-5]
            return "0" if s == "-0" else s
        return s
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_match(spark, sf_dir, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.sql(sql)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a = _norm_rows(spark_cols, spark_rows)
    b = _norm_rows(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")

    # Driver-surface dtype pin (VERDICT r5 item 2, class-wide): the
    # driver's value hash is dtype-sensitive on the pandas surface —
    # DuckDB surfaces HUGEINT (SUM of BIGINT) as float64 via .df()
    # while a Spark long collects as int, which is exactly how
    # cms_hot_shingles went red in r5 with values numerically equal.
    # Pin per column: the oracle's .df() dtype CLASS must match the
    # surface Spark's side produces (integral schema stays integral
    # unless NULLs force pandas to float64). Costs one extra DuckDB
    # execution per twin and zero extra Spark work.
    import numpy as np

    pdf_o = res.df()
    nulls = {
        c: any(r[i] is None for r in spark_rows)
        for i, c in enumerate(spark_cols)
    }
    for f in sdf.schema.fields:
        s = f.dataType.simpleString()
        if s in ("tinyint", "smallint", "int", "bigint"):
            expect = "float" if nulls[f.name] else "int"
        elif s in ("float", "double"):
            expect = "float"
        elif s == "boolean" and not nulls[f.name]:
            expect = "bool"
        else:
            continue  # strings/dates/decimals/nullable bools: not hash-divergent by class
        dt = pdf_o[f.name].dtype
        if np.issubdtype(dt, np.bool_):
            got = "bool"
        elif np.issubdtype(dt, np.integer):
            got = "int"
        elif np.issubdtype(dt, np.floating):
            got = "float"
        else:
            continue  # object-dtype oracle column (e.g. decimal/None-mix)
        assert got == expect, (
            f"{name}.{f.name}: driver-surface dtype class diverges — "
            f"spark {s} (nulls={nulls[f.name]}) would hash as {expect}, "
            f"oracle .df() gives {dt} ({got}); cast the Spark column "
            f"to match the oracle surface (the cms_hot_shingles r5 class)"
        )


@pytest.mark.parametrize("name", sorted(_ROWS_ONLY))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = _ROWS_ONLY[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
