"""Deterministic sf1.0 synthesis (r3 verdict item 6): 10 key-shifted
replicas of the driver-generated sf0.1 tables, written to
data/sf1.0/ (gitignored). No external data, no RNG — every value is an
arithmetic function of the sf0.1 bytes, so the dataset is reproducible
bit-for-bit and the DuckDB-oracle conformance compare (which reads the
SAME parquet on both engines) is as meaningful here as at sf0.01.

Key discipline: foreign keys shift by the same per-table stride as their
primary keys (orders.o_custkey moves with customer.c_custkey, lineitem
follows orders/part/supplier), so join cardinalities scale linearly and
group-by keys (nation, region, mktsegment, priority...) keep their
distributions. documents' text gains a per-replica suffix (near-dups
across replicas, not exact dups — the honest shape for dedup at 10×);
embeddings get a small deterministic per-replica perturbation so cosine
neighborhoods are distinct rather than degenerate ties.

Usage: python scripts/make_sf1.py [out_dir] [src_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

K = 10  # replicas: sf0.1 -> sf1.0


def main(out_dir: str, src: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def src_tbl(t: str) -> str:
        return f"read_parquet('{src}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # fixed dims — copied verbatim
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src_tbl(t)}")

    # every stride is MAX(key)+1 from the actual source data — hard-coded
    # strides silently produce colliding keys if the generator ever grows
    def stride(table: str, key: str) -> int:
        return con.sql(
            f"SELECT MAX({key}) + 1 FROM {src_tbl(table)}"
        ).fetchone()[0]

    ck = stride("customer", "c_custkey")
    sk = stride("supplier", "s_suppkey")
    pk = stride("part", "p_partkey")
    ok_stride = stride("orders", "o_orderkey")
    ek = stride("events", "event_id")
    uid_stride = stride("events", "user_id")
    dk = stride("documents", "doc_id")

    write("customer", f"""
        SELECT c_custkey + k * {ck} AS c_custkey,
               CASE WHEN k = 0 THEN c_name ELSE c_name || '-r' || k END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src_tbl('customer')}, generate_series(0, {K - 1}) AS g(k)
    """)
    write("supplier", f"""
        SELECT s_suppkey + k * {sk} AS s_suppkey,
               CASE WHEN k = 0 THEN s_name ELSE s_name || '-r' || k END AS s_name,
               s_nationkey, s_acctbal
        FROM {src_tbl('supplier')}, generate_series(0, {K - 1}) AS g(k)
    """)
    write("part", f"""
        SELECT p_partkey + k * {pk} AS p_partkey,
               CASE WHEN k = 0 THEN p_name ELSE p_name || ' r' || k END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {src_tbl('part')}, generate_series(0, {K - 1}) AS g(k)
    """)
    write("orders", f"""
        SELECT o_orderkey + k * {ok_stride} AS o_orderkey,
               o_custkey + k * {ck} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src_tbl('orders')}, generate_series(0, {K - 1}) AS g(k)
    """)
    write("lineitem", f"""
        SELECT l_orderkey + k * {ok_stride} AS l_orderkey,
               l_partkey + k * {pk} AS l_partkey,
               l_suppkey + k * {sk} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src_tbl('lineitem')}, generate_series(0, {K - 1}) AS g(k)
    """)
    write("events", f"""
        SELECT event_id + k * {ek} AS event_id, ts,
               user_id + k * {uid_stride} AS user_id,
               event_type, value, props
        FROM {src_tbl('events')}, generate_series(0, {K - 1}) AS g(k)
    """)
    write("documents", f"""
        SELECT doc_id + k * {dk} AS doc_id,
               CASE WHEN k = 0 THEN text ELSE text || ' rep' || k END AS text,
               lang, source,
               CAST(length(CASE WHEN k = 0 THEN text
                                ELSE text || ' rep' || k END) AS BIGINT) AS n_chars
        FROM {src_tbl('documents')}, generate_series(0, {K - 1}) AS g(k)
    """)

    # embeddings: numpy perturbation (deterministic, per-replica) — pure
    # SQL has no indexed list map, and 20k rows is trivial in pandas
    emb = pd.read_parquet(f"{src}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    base = np.stack(emb["embedding"].to_numpy()).astype("float32")
    out = []
    for k in range(K):
        vecs = base.copy()
        if k:
            idx = emb["vec_id"].to_numpy()[:, None] * 31 + np.arange(dim)[None, :] * 7 + k * 13
            vecs = vecs + 0.003 * ((idx % 7) - 3).astype("float32")
        out.append(pd.DataFrame({
            "vec_id": emb["vec_id"] + k * len(emb),
            "embedding": list(vecs),
            "label": emb["label"],
        }))
    pd.concat(out, ignore_index=True).to_parquet(
        f"{out_dir}/embeddings.parquet", index=False, row_group_size=4096
    )
    n = len(out) * len(emb)
    print(f"embeddings: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1.0"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    main(out, src)
