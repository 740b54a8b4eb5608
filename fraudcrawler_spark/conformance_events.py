"""Event-stream batch operators: gap-based sessionization and the
as-of (point-in-time) join.

Both are classic "operators Spark lacks as built-ins" (the as-of join
is named in the build brief) implemented as compositions of existing
DataFrame ops — windows over a per-key exchange — which is precisely
how they scale: one hash exchange on the entity key, then per-key
streaming window evaluation; no range-explosion join, no per-row
Python.

Timestamps are compared in exact microseconds (`unix_micros` after an
NTZ->TZ cast, exact because session.py pins spark.sql.session.timeZone
= UTC; == DuckDB `epoch_us`) — second-truncated casts would diverge from the
oracle on sub-second gaps.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fraudcrawler_spark.conformance_ml import _t

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization: a new session starts after >30 min of
    per-user inactivity; emit one row per session with bounds and size.

    Plan: lag + running-sum windows over ONE (user_id) exchange (same
    partitioning, same ordering — Spark evaluates both in a single
    WindowExec), then a hash aggregation on (user_id, session_no). The
    streaming twin of this operator is `session_window` /
    applyInPandasWithState (streaming/ingest.py); this is the batch
    form a 100-TB clickstream backfill uses.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.unix_micros(F.col("ts").cast("timestamp")).alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    new_sess = F.when(
        gap.isNull() | (gap > _SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("tus", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("session_no", F.sum(new_sess).over(run).cast("long"))
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.round(
            (F.max("tus") - F.min("tus")) / 1_000_000.0, 3
        ).alias("duration_sec"),
    )


SQL_SESSIONIZE = f"""
WITH e AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS tus FROM events
),
g AS (
  SELECT *,
         CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                                        ORDER BY tus, event_id)
                   > {_SESSION_GAP_US}
                OR LAG(tus) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
s AS (
  SELECT *,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM g
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(ts) AS t_start, MAX(ts) AS t_end,
       ROUND((MAX(tus) - MIN(tus)) / 1000000.0, 3) AS duration_sec
FROM s GROUP BY user_id, session_no
"""


def q_asof_join(spark, sf_dir):
    """As-of join: each event picks the most recent order (key =
    o_custkey % 150, the deterministic event→customer mapping) whose
    timestamp is at or before the event's; ties on timestamp break to
    the highest orderkey.

    Implemented as the UNION + carry-forward pattern — the scalable
    as-of shape: both sides union into one stream tagged (orders=0,
    events=1), one (key) exchange, one ordered window carrying the last
    non-null orderkey forward, then filter back to event rows. Cost is
    sort-merge linear per key; a naive inequality join would explode to
    |events|x|orders| per key before aggregation. DuckDB's native ASOF
    JOIN exists but has no tie-break contract, so the twin replicates
    the same union+window — identical semantics by construction.
    """
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast("long").alias("ok"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.pmod("o_custkey", F.lit(150)).alias("k"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("tus"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ok"),
    )
    u = ev.unionByName(orders)
    w = (
        Window.partitionBy("k")
        .orderBy("tus", "tag", "ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("asof_orderkey", F.last("ok", ignorenulls=True).over(w))
    return (
        carried.where(F.col("tag") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            "asof_orderkey",
            F.col("asof_orderkey").isNotNull().alias("has_order"),
        )
    )


SQL_ASOF_JOIN = """
WITH u AS (
  SELECT user_id AS k, epoch_us(ts) AS tus, 1 AS tag,
         event_id, NULL::BIGINT AS ok
  FROM events
  UNION ALL
  SELECT o_custkey % 150, epoch_us(o_orderdate), 0,
         NULL::BIGINT, o_orderkey
  FROM orders
),
w AS (
  SELECT *,
         LAST_VALUE(ok IGNORE NULLS) OVER (
           PARTITION BY k ORDER BY tus, tag, ok
           ROWS UNBOUNDED PRECEDING) AS asof_orderkey
  FROM u
)
SELECT event_id, k AS user_id, asof_orderkey,
       asof_orderkey IS NOT NULL AS has_order
FROM w WHERE tag = 1
"""


def q_event_funnel(spark, sf_dir):
    """Ordered conversion funnel per user: first `view`, first `click`
    strictly after it, first `purchase` strictly after that. Stage
    timestamps are conditional-min aggregations; each stage joins its
    predecessor back on user_id — three hash aggs + two equi-joins, all
    on the same user key (one logical partitioning end to end, reused
    by AQE). The standard product-analytics funnel, exactly the shape a
    100-TB clickstream uses (user key partitioning, no window over the
    full event stream).
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("tus").alias("t_view")
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("tus") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("tus") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t_purchase"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("t_view").isNotNull().alias("viewed"),
            F.col("t_click").isNotNull().alias("clicked_after_view"),
            F.col("t_purchase").isNotNull().alias("purchased_after_click"),
        )
    )


SQL_EVENT_FUNNEL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
),
v AS (SELECT user_id, MIN(tus) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, MIN(tus) AS t_click
      FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND tus > t_view GROUP BY ev.user_id),
p AS (SELECT ev.user_id, MIN(tus) AS t_purchase
      FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND tus > t_click GROUP BY ev.user_id)
SELECT u.user_id,
       v.t_view IS NOT NULL AS viewed,
       c.t_click IS NOT NULL AS clicked_after_view,
       p.t_purchase IS NOT NULL AS purchased_after_click
FROM (SELECT DISTINCT user_id FROM ev) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later active day by day-offset. Two hash aggregations (first
    day per user; distinct user-days) joined on the user key, then the
    (cohort_day, day_offset) rollup — the canonical retention query,
    linear in events with no window over the stream.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    active = ev.select("user_id", "d").distinct()
    return (
        active.join(first, "user_id")
        .select(
            "cohort_day",
            F.datediff("d", F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, MIN(d) AS cohort_day FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, d FROM ev)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_day, day_offset
"""
