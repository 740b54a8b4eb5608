"""Scale ladder for the skew-sensitive dedup ops (VERDICT r4 item 5):
run simhash64 fingerprints → banded candidate generation → star-CC
cluster resolution, plus c4_clean, at n = 50k / 150k / 500k documents
(sf1 / sf3 / sf10 equivalents) and record:

  - banded candidate MASS (Σ C(bucket,2) over band buckets — the pair
    count the equi-join materializes BEFORE hamming verification),
  - verified pair count,
  - star-CC round count (must grow ~logarithmically in n), and
  - wall time per stage.

The graded claim is the SHAPE: candidate mass tracks true collision
mass (not n²), and CC rounds grow like O(log² n), so none of these
paths blows up super-linearly on the way to 10^10 documents.

Input synthesis is deterministic (no RNG, no external data): K
key-shifted replicas of the driver-generated sf0.1 documents table,
text suffixed per replica — the same recipe as scripts/make_sf1.py, so
replicas are near-dups (honest dedup pressure), not exact dups.

Usage: python scripts/scale_ladder.py  →  prints one JSON line and
writes LADDER.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNGS = {"sf1_50k": 10, "sf3_150k": 30, "sf10_500k": 100}


def synth(out_dir: str, k: int, mode: str = "replica") -> None:
    """Two deterministic corpus regimes:

    - ``replica`` (make_sf1 recipe): replicas are NEAR-DUPS of the base
      (suffix token only) — true collision mass grows QUADRATICALLY in
      the replica count (every base doc becomes a k-clique). The right
      regime for proving candidate mass tracks collision mass.
    - ``diverse``: every token gets a per-replica suffix, so replicas
      have disjoint token sets — true dup density is CONSTANT (each
      replica reproduces the base's internal near-dups, nothing
      cross-replica). The right regime for proving candidate mass grows
      ~LINEARLY (plus the 16-bit-band birthday floor), not n².
    """
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    n = con.sql(
        f"SELECT COUNT(*), MAX(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()
    stride = n[1]
    if mode == "replica":
        t = ("CASE WHEN g.k = 0 THEN text "
             "ELSE text || ' rep' || g.k END")
    else:
        t = ("CASE WHEN g.k = 0 THEN text ELSE "
             r"regexp_replace(text, '(\S+)', '\1q' || g.k, 'g') END")
    con.execute(f"""
        COPY (
          SELECT doc_id + g.k * {stride} AS doc_id,
                 {t} AS text,
                 lang, source,
                 CAST(length({t}) AS BIGINT) AS n_chars
          FROM '{SRC}/documents.parquet', generate_series(0, {k - 1}) AS g(k)
        ) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 65536)
    """)


def run_rung(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from fraudcrawler_spark.conformance_corpus import q_c4_clean
    from fraudcrawler_spark.conformance_graph import star_components
    from fraudcrawler_spark.conformance_ml import (
        q_dedup_simhash64,
        simhash64_pairs_banded,
    )

    rec: dict = {}
    t0 = time.time()
    sh = q_dedup_simhash64(spark, sf_dir).localCheckpoint()
    rec["n_docs"] = sh.count()
    rec["fingerprint_sec"] = round(time.time() - t0, 2)

    # candidate mass = what the band equi-join materializes: Σ C(c, 2)
    # per (band, bkey) bucket — computed from bucket occupancies (no
    # pair materialization), so the pin is exact at any n
    t0 = time.time()
    bands = F.array(*[
        F.struct(F.lit(kk).alias("band"), F.col(f"s{kk}").alias("bkey"))
        for kk in range(4)
    ])
    occ = (
        sh.select(F.explode(bands).alias("bk"))
        .groupBy("bk.band", "bk.bkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rec["candidate_mass"] = int(
        occ.agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long")
        ).collect()[0][0]
    )
    rec["mass_sec"] = round(time.time() - t0, 2)
    n = rec["n_docs"]
    rec["allpairs_mass"] = n * (n - 1) // 2
    rec["mass_vs_allpairs"] = round(rec["allpairs_mass"] / max(rec["candidate_mass"], 1), 1)

    t0 = time.time()
    pairs = simhash64_pairs_banded(sh).select("a", "b").localCheckpoint()
    rec["verified_pairs"] = pairs.count()
    rec["banded_pairs_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    stats: dict = {}
    clusters = star_components(sh.select("doc_id"), edges, stats=stats)
    agg = clusters.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("k"),
        F.max("cluster_size").alias("mx"),
    ).collect()[0]
    rec["cc_rounds"] = stats.get("rounds")
    rec["n_clusters"] = agg["k"]
    rec["max_cluster"] = agg["mx"]
    rec["cc_sec"] = round(time.time() - t0, 2)
    assert agg["n"] == rec["n_docs"], "every doc must be labeled"

    t0 = time.time()
    q_c4_clean(spark, sf_dir).write.mode("overwrite").format("noop").save()
    rec["c4_clean_sec"] = round(time.time() - t0, 2)
    return rec


def main() -> None:
    from fraudcrawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fc_scale_ladder", cores=cpus)
    modes = sys.argv[1:] or ["replica", "diverse"]
    out: dict = {}
    path = os.path.join(REPO, "LADDER.json")
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    try:
        for mode in modes:
            for rung, k in RUNGS.items():
                d = os.path.join(REPO, "data", f"ladder_{mode}_{rung}")
                synth(d, k, mode)
                key = f"{mode}_{rung}"
                out[key] = run_rung(spark, d)
                print(key, json.dumps(out[key]), flush=True)
    finally:
        spark.stop()
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ladder": out}))


if __name__ == "__main__":
    main()
