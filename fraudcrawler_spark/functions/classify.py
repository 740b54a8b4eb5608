"""Deterministic classification stage (Processor analog).

Reference semantics (/root/reference/fraudcrawler/processing/processor.py:45-105):
- name or description null ⇒ ``default_if_missing`` without any model call
  (processor.py:62-67),
- else build the user prompt from the byte-exact template incl. its
  literal ``\\n`` typo (settings.py:21-23),
- parse the response as int; not in ``allowed_classes`` or any error ⇒
  ``default_if_missing`` (processor.py:87-105).

The LLM call is replaced by a deterministic hash rule so traces are
reproducible offline (SURVEY.md §2.8): digit = first-8-hex-chars of
md5(user_prompt) mod 10. Entirely JVM-side Catalyst expressions — md5,
conv, pmod — no Python in the hot path; the same rule is expressible in
ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from fraudcrawler_spark.config import USER_PROMPT_TEMPLATE, Prompt


def user_prompt_expr(context: str, name: Column, description: Column) -> Column:
    """Template fill via format_string — byte-exact vs settings.py:21-23."""
    # The template has {context}\n\nProduct Details: {name}\n{description}\\n\nRelevance:
    # (one literal backslash-n before the last newline).
    fmt = USER_PROMPT_TEMPLATE.replace("%", "%%").replace("{context}", "%s").replace(
        "{name}", "%s"
    ).replace("{description}", "%s")
    return F.format_string(fmt, F.lit(context), name, description)


def hash_digit_expr(s: Column) -> Column:
    """Deterministic stand-in for the model's single-digit answer."""
    return F.pmod(F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"), F.lit(10))


def classify_expr(prompt: Prompt, name: Column, description: Column) -> Column:
    """Full guard → template → classify → validate chain as one Column."""
    raw = hash_digit_expr(user_prompt_expr(prompt.context, name, description))
    allowed = F.array(*[F.lit(c) for c in prompt.allowed_classes])
    validated = F.when(
        F.array_contains(allowed, raw.cast("int")), raw.cast("int")
    ).otherwise(F.lit(prompt.default_if_missing))
    return F.when(
        name.isNull() | description.isNull(), F.lit(prompt.default_if_missing)
    ).otherwise(validated)


def classify_py(prompt: Prompt, url: str, name: str | None, description: str | None) -> int:
    """Pure-python twin of classify_expr (used by the trace oracle/tests)."""
    if name is None or description is None:
        return prompt.default_if_missing
    user_prompt = USER_PROMPT_TEMPLATE.format(
        context=prompt.context, url=url, name=name, description=description
    )
    digit = int(hashlib.md5(user_prompt.encode("utf-8")).hexdigest()[:8], 16) % 10
    if digit not in prompt.allowed_classes:
        return prompt.default_if_missing
    return digit
