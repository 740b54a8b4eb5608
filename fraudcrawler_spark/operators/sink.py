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

import os
from collections.abc import Sequence
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
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
    elif fmt == "jsonl":
        # newline-delimited JSON — the training-data interchange format
        # (one doc per line; Spark's json sink IS jsonl). gzip per-part
        # keeps the 100-TB export splittable at the file level.
        writer.option("compression", "gzip").json(path)
    else:
        writer.parquet(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a jsonl export back (schema optional — pass the writing
    DataFrame's schema to skip the inference scan on big exports)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


@dataclass(frozen=True)
class Results:
    """One run's registry entry (reference client.py:20-24)."""

    search_term: str
    filename: str


class ResultsRegistry:
    """Run registry + templated result sink (reference client.py:30,45,99-134).

    Reproduces the reference's ``{search_term}_{language}_{location}_
    {timestamp}.csv`` naming (client.py:30,99-105) and ``load_results
    (index=-1)`` addressing (client.py:120-128). Difference at scale: the
    name addresses a DIRECTORY of part files (distributed CSV write with
    QUOTE_ALL), not one driver-side file — same template, cluster-safe.
    """

    _filename_template = "{search_term}_{language}_{location}_{timestamp}.csv"

    def __init__(self, spark: SparkSession, results_dir: str):
        self.spark = spark
        self.results_dir = results_dir
        os.makedirs(results_dir, exist_ok=True)
        self._results: list[Results] = []

    def save(
        self,
        df: DataFrame,
        search_term: str,
        language: str = "en",
        location: str = "ch",
        prompt_names: Sequence[str] = (),
        timestamp: str | None = None,
    ) -> str:
        """Flatten + CSV-write one run's results under the templated name.

        ``timestamp`` defaults to now() in the reference's %Y%m%d%H%M%S
        format (client.py:99); injectable for deterministic tests.
        """
        ts = timestamp or datetime.today().strftime("%Y%m%d%H%M%S")
        name = self._filename_template.format(
            search_term=search_term, language=language, location=location,
            timestamp=ts,
        )
        path = os.path.join(self.results_dir, name)
        # the timestamp has 1 s resolution: two same-second saves of the
        # same (term, lang, loc) would silently overwrite run 1 while the
        # registry kept both entries — disambiguate with a suffix instead.
        # Check DISK too, not just this instance's registry: another
        # process (or an earlier run) may own the colliding path.
        k = 1
        taken = {r.filename for r in self._results}
        while path in taken or os.path.exists(path):
            path = os.path.join(self.results_dir, f"{name[:-4]}_{k}.csv")
            k += 1
        out = (
            flatten_classifications(df, prompt_names)
            if "classifications" in df.columns
            else df
        )
        # CSV cells are scalars: serialize array columns to JSON strings —
        # the analog of what the reference's pd.DataFrame.to_csv does to
        # list cells (client.py:76)
        from pyspark.sql.types import ArrayType

        for f in out.schema.fields:
            if isinstance(f.dataType, ArrayType):
                out = out.withColumn(f.name, F.to_json(F.col(f.name)))
        write_results(out, path, fmt="csv")
        self._results.append(Results(search_term=search_term, filename=path))
        return path

    def load_results(self, index: int = -1) -> DataFrame:
        """Read back a saved run (index=-1 → most recent, client.py:120-128)."""
        r = self._results[index]
        return (
            self.spark.read.option("header", True)
            .option("inferSchema", True)
            .csv(r.filename)
        )

    def print_available_results(self) -> None:
        """client.py:130-134 byte-similar listing."""
        n_res = len(self._results)
        for i, res in enumerate(self._results):
            print(f"index={-n_res + i}: {res.search_term} - {res.filename}")
