"""Supplementary measurement harness (guide §1.4) — NOT the official bench.

Times each headline query with the noop sink, several repetitions in one
session, mirroring bench.run_headline's environment. Prints one JSON line
with per-query [rep0, rep1, ...] so one-time costs (JVM/codegen warm-up)
are separable from steady-state compute. bench.py stays frozen; numbers
from here are cited in OPTIMIZATION_r06.md only.

Usage: python bench_extra.py [name ...]   (default: bench.HEADLINE)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, FC_EXTRA_REPS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from fraudcrawler_spark.registry import _crawl_corpus, queries
    from fraudcrawler_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("FC_EXTRA_REPS", "3"))
    names = sys.argv[1:] or list(bench.HEADLINE)

    spark = get_spark("fc_bench_extra", cores=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    _crawl_corpus()
    qs = queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
