"""Classification stage — F6/X8/X9 (SURVEY.md §2).

Reference (/root/reference/fraudcrawler/base/orchestrator.py:238-283,
processing/processor.py:45-105): for each UNflagged row, run every
configured prompt and store ``classifications[prompt.name] = int``;
flagged rows keep an empty map. Guards: missing name/description ⇒
``default_if_missing`` without a model call; out-of-allowed-classes or any
error ⇒ default.

All JVM-side (md5-based deterministic classifier, functions/classify.py);
the dynamic-keys ``classifications`` dict becomes a MapType column built
with ``map_from_arrays`` — flattened to ``classification_<name>`` columns
only at the sink, mirroring pd.json_normalize (client.py:66-71).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fraudcrawler_spark.config import DEFAULT_IS_RELEVANT, Prompt
from fraudcrawler_spark.functions.classify import classify_expr


def classify_stage(items: DataFrame, prompts: Sequence[Prompt]) -> DataFrame:
    """Add the ``classifications`` map column (empty map for flagged rows)."""
    if not prompts:
        classified = F.create_map().cast("map<string,int>")
    else:
        keys = F.array(*[F.lit(p.name) for p in prompts])
        vals = F.array(
            *[
                classify_expr(p, F.col("product_name"), F.col("product_description"))
                for p in prompts
            ]
        )
        classified = F.map_from_arrays(keys, vals)
    empty = F.create_map().cast("map<string,int>")
    return items.withColumn(
        "classifications",
        F.when(F.col("filtered"), empty).otherwise(classified),
    ).withColumn("is_relevant", F.lit(DEFAULT_IS_RELEVANT))
