"""Result sink — S5/S6/S7 (SURVEY.md §2.1).

Reference (/root/reference/fraudcrawler/base/client.py:47-76): collect all
rows, pd.json_normalize (flattens ``classifications.<name>`` to columns,
stripping the prefix with a collision check), write CSV with QUOTE_ALL,
filename ``{term}_{lang}_{loc}_{ts}.csv``.

Spark mapping: flatten the map column to ``classification_<name>``
columns, then a distributed write (parquet by default; csv with
quoteAll for byte-level reference parity). A ``runs`` registry table
stands in for the in-memory results list (client.py:45,130-134).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_classifications(df: DataFrame, prompt_names: Sequence[str]) -> DataFrame:
    """classifications map → classification_<name> columns (client.py:66-71).

    Collision check mirrored: duplicate prompt names would collide after
    flattening — raise instead of silently overwriting.
    """
    if len(set(prompt_names)) != len(prompt_names):
        raise ValueError("Duplicate prompt names would collide after flattening")
    out = df
    for name in prompt_names:
        out = out.withColumn(
            f"classification_{name}", F.col("classifications").getItem(name)
        )
    return out.drop("classifications")


def write_results(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Distributed result write (reference client.py:73-76)."""
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer.option("header", True).option("quoteAll", True).csv(path)
    else:
        writer.parquet(path)
