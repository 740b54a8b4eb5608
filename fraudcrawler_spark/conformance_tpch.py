"""Multi-table analytics over the TPC-H-shaped tables: region market
share, top supplier, and order-priority backlog — the join-planning
showcase queries (TPC-H Q8 / Q15 / Q4 shapes).

What these pin that the single-table operators don't: multi-hop join
ORDER and STRATEGY. The dimension chain customer→nation→region is
broadcast end-to-end (dims are KBs even at 100 TB fact scale), the
lineitem↔orders fact joins are key equi-joins that AQE plans as
SMJ/shuffled-hash on the cluster, and money aggregates go through the
repo's DECIMAL(18,x) discipline so the DuckDB twins match to the cent
(double-summation order is not reproducible across engines; decimal
summation is).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fraudcrawler_spark.conformance_ml import _t


def _dec(c, p=2):
    return F.col(c).cast(f"decimal(18,{p})")


def q_market_share(spark, sf_dir):
    """Revenue and share per region (Q8 shape): lineitem→orders→
    customer→nation→region, revenue = Σ extprice·(1-disc) as DECIMAL,
    share of the global total. Dims broadcast; one fact equi-join
    chain; the scalar total rides a 1-row broadcast cross join."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("decimal(18,4)")
        .alias("rev"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    per = j.groupBy("r_name").agg(F.sum("rev").alias("_rev"))
    tot = per.agg(F.sum("_rev").alias("_tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "r_name",
        F.col("_rev").cast("double").alias("revenue"),
        F.round(F.col("_rev").cast("double") / F.col("_tot").cast("double"), 4)
        .alias("share"),
    )


SQL_MARKET_SHARE = """
WITH per AS (
  SELECT r_name,
         SUM((l_extendedprice::DECIMAL(18,2)
              * (1 - l_discount::DECIMAL(18,2)))::DECIMAL(18,4)) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
)
SELECT r_name, rev::DOUBLE AS revenue,
       ROUND(rev::DOUBLE / (SELECT SUM(rev) FROM per)::DOUBLE, 4) AS share
FROM per
"""


def q_top_suppliers(spark, sf_dir):
    """Top revenue supplier(s) (Q15 shape): per-supplier revenue, keep
    every supplier tied for the maximum via a rank window over a
    non-foldable constant key (the per-supplier agg is tiny — one
    bounded window, no global sort of facts)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("decimal(18,4)")
        .alias("rev"),
    )
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per = li.groupBy("l_suppkey").agg(F.sum("rev").alias("_rev"))
    w = Window.partitionBy(F.pmod(F.col("l_suppkey"), F.lit(1))).orderBy(
        F.col("_rev").desc()
    )
    top = per.withColumn("rk", F.rank().over(w)).where(F.col("rk") == 1)
    return top.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")).select(
        F.col("s_suppkey").cast("long").alias("s_suppkey"),
        "s_name",
        F.col("_rev").cast("double").alias("total_revenue"),
    )


SQL_TOP_SUPPLIERS = """
WITH per AS (
  SELECT l_suppkey,
         SUM((l_extendedprice::DECIMAL(18,2)
              * (1 - l_discount::DECIMAL(18,2)))::DECIMAL(18,4)) AS rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       rev::DOUBLE AS total_revenue
FROM per JOIN supplier ON l_suppkey = s_suppkey
WHERE rev = (SELECT MAX(rev) FROM per)
"""


def q_order_priority(spark, sf_dir):
    """Order-priority backlog (Q4 shape): count orders per priority
    having at least one late lineitem (shipdate after orderdate) — the
    EXISTS compiles to a LEFT SEMI equi-join on the order key, then one
    small aggregation."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


def q_shipping_priority(spark, sf_dir):
    """Unshipped-order backlog top-10 (TPC-H Q3 shape, adapted to this
    schema — no o_shippriority column): BUILDING-segment orders placed
    before the cutoff whose lineitems ship after it, ranked by pending
    revenue. Plan: the customer filter broadcast-semi-joins the orders
    scan (segment is a dim-side predicate), both fact filters push to
    the parquet scans, revenue aggregates in DECIMAL (double summation
    order is not cross-engine reproducible; decimal is), and the
    top-10 is a single global sort of the per-order aggregate — at
    100 TB that aggregate is orders-cardinality, and TakeOrderedAndProject
    keeps only 10 rows per partition, no full sort materialization.
    """
    cutoff = "1999-06-30"
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("o_date"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select(
            "l_orderkey",
            (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("decimal(18,4)")
            .alias("rev"),
        )
    )
    agg = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey", "o_date")
        .agg(F.sum("rev").alias("_rev"))
    )
    return (
        agg.select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            F.col("o_date").cast("string").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       SUM((l_extendedprice::DECIMAL(18,2)
            * (1 - l_discount::DECIMAL(18,2)))::DECIMAL(18,4))::DOUBLE
         AS revenue,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-06-30'
  AND l_shipdate > TIMESTAMP '1999-06-30'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def q_small_qty_revenue(spark, sf_dir):
    """Small-quantity-order revenue probe (TPC-H Q17 shape, adapted —
    brand only, no container column): for Brand#1 parts, the yearly
    revenue that would disappear if orders below half the part's
    average quantity were no longer filled. The textbook correlated
    subquery becomes a PRE-AGGREGATE + broadcast join: per-part avg
    quantity is computed once over the brand's lineitems (part-filtered
    via broadcast semi-join) and broadcast back — no per-row subquery,
    no second fact shuffle. Output is one row; DECIMAL end-to-end.
    """
    parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_partkey", "l_quantity", _dec("l_extendedprice").alias("price"))
        # one brand's lineitems are a sliver of the fact table —
        # materialize once so avgq and the revenue probe don't each
        # re-scan 100 TB of lineitem (ReuseExchange can't fire: the two
        # consumers aggregate differently)
        .localCheckpoint()
    )
    avgq = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    j = li.join(
        F.broadcast(avgq.withColumnRenamed("l_partkey", "a_partkey")),
        F.col("l_partkey") == F.col("a_partkey"),
    ).where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    return j.agg(
        F.count(F.lit(1)).alias("n_small"),
        (F.sum("price") / F.lit(7.0))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("avg_yearly"),
    )


SQL_SMALL_QTY_REVENUE = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice::DECIMAL(18,2) AS price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
),
avgq AS (
  SELECT l_partkey AS a_partkey, AVG(l_quantity) AS avg_qty
  FROM li GROUP BY 1
)
SELECT COUNT(*) AS n_small,
       ((SUM(price) / 7.0)::DECIMAL(18,4))::DOUBLE AS avg_yearly
FROM li JOIN avgq ON l_partkey = a_partkey
WHERE l_quantity < 0.5 * avg_qty
"""
