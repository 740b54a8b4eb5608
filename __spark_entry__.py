"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship composite pipeline query on sf0.001;
queries()/oracle_sql() expose the operator conformance catalog
(fraudcrawler_spark/registry.py) — one entry per implemented operator
family from SURVEY.md §2 plus the training-data operators, each with a
DuckDB ANSI-SQL twin. Since r5 EVERY entry is oracled (107/107): the
former rows-only trio gained byte-stat / chunk-hash / shared-batch
value oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fraudcrawler_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.REGISTRY["pipeline_composite"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query."""
    return registry.oracle_sql()
