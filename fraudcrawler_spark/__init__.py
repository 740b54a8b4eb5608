"""fraudcrawler_spark — a PySpark-native crawl/analytics engine.

A from-scratch reimplementation of the *semantics* of
open-vianu/vianu-fraudcrawler (reference at /root/reference, v0.3.2) as an
idiomatic Spark DataFrame pipeline: URL discovery, canonicalization,
flag-not-drop filtering, URL-seen dedup, fetch-join + listing extraction,
deterministic classification, and a distributed URL frontier with
Bloom-segment seen-state, per-host politeness and priority scheduling.

Architecture: iterated batch rounds over partitioned parquet tables (thin
catalog layer emulating Iceberg snapshot semantics), all logic declared via
the DataFrame API so Catalyst handles pushdown/pruning/join selection;
custom computation lives in four vectorized pandas-UDF kernels (no
per-row Python UDFs anywhere).
"""

__version__ = "0.1.0"
