"""Driver-facing time-series join queries: as-of join and bucketed
range join — the classic joins Spark lacks as primitives, verified
against DuckDB's NATIVE ASOF JOIN and a plain inequality join."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.operators.asof import asof_join, range_join
from oups_spark.queries import register
from oups_spark.tables import load


@register(
    "asof_click_before_purchase",
    oracle="""
    WITH p AS (SELECT event_id, ts, user_id, value
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, max(value) AS click_value
               FROM events WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.event_id, p.ts, p.user_id, p.value,
           c.ts AS click_ts, c.click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): every purchase gains the latest
    same-user click at-or-before it, left-join semantics for users
    with no prior click. One keyed shuffle (union + running window) —
    both sides unbounded; the oracle is DuckDB's NATIVE ASOF JOIN, so
    the semantics are checked against an independent implementation.
    Clicks are pre-deduped per (user, ts) so the match is unique and
    both engines are deterministic."""
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(
        purchases, clicks, on="ts", by="user_id",
        value_cols=["click_value"], direction="backward",
    )
    return out.select(
        "event_id", "ts", "user_id", "value",
        F.col("ts_right").alias("click_ts"), "click_value",
    ).orderBy("event_id")


@register(
    "asof_nearest_tolerance",
    oracle="""
    WITH v AS (SELECT event_id, ts, user_id FROM events
               WHERE event_type = 'view'),
         p AS (SELECT user_id, ts, max(value) AS pval
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         b AS (SELECT v.event_id, p.ts AS bts, p.pval AS bval
               FROM v ASOF LEFT JOIN p
                 ON v.user_id = p.user_id AND v.ts >= p.ts),
         f AS (SELECT v.event_id, p.ts AS fts, p.pval AS fval
               FROM v ASOF LEFT JOIN p
                 ON v.user_id = p.user_id AND v.ts <= p.ts),
         n AS (
           SELECT v.event_id, v.ts, v.user_id,
                  CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
                         abs(epoch_us(v.ts) - epoch_us(bts))
                           <= abs(epoch_us(v.ts) - epoch_us(fts)))
                       THEN bts ELSE fts END AS mts,
                  CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
                         abs(epoch_us(v.ts) - epoch_us(bts))
                           <= abs(epoch_us(v.ts) - epoch_us(fts)))
                       THEN bval ELSE fval END AS mval
           FROM v LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
         )
    SELECT event_id, ts, user_id,
           CASE WHEN abs(epoch_us(ts) - epoch_us(mts)) <= 1800000000
                THEN mts END AS purchase_ts,
           CASE WHEN abs(epoch_us(ts) - epoch_us(mts)) <= 1800000000
                THEN round(mval, 6) END AS purchase_value
    FROM n ORDER BY event_id
    """,
)
def asof_nearest_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest' with a 30-minute tolerance
    (pandas ``merge_asof`` parity): every view event gains the
    CLOSEST same-user purchase in time — before or after — nulled
    when the nearest one is farther than the tolerance; ties resolve
    backward. Backward and forward carries share one keyed shuffle
    (same partitioning, two in-partition sorts). The oracle states
    the semantics independently via two DuckDB NATIVE ASOF joins and
    a distance pick."""
    events = load(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id"
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    out = asof_join(
        views, purchases, on="ts", by="user_id",
        value_cols=["pval"], direction="nearest",
        tolerance="30 minutes",
    )
    return out.select(
        "event_id", "ts", "user_id",
        F.col("ts_right").alias("purchase_ts"),
        F.round("pval", 6).alias("purchase_value"),
    ).orderBy("event_id")


@register(
    "range_join_first_week",
    oracle="""
    WITH iv AS (SELECT user_id,
                       date_trunc('day', min(ts)) AS w_start,
                       date_trunc('day', min(ts)) + INTERVAL 3 DAY AS w_end
                FROM events GROUP BY 1)
    SELECT e.event_id, e.user_id, e.ts, iv.w_start, iv.w_end
    FROM events e JOIN iv
      ON e.user_id = iv.user_id
     AND e.ts >= iv.w_start AND e.ts < iv.w_end
    ORDER BY e.event_id
    """,
)
def range_join_first_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: events matched into each user's first-3-day
    activity window. Intervals explode onto a daily grid so the join
    is an EQUALITY join on (user, day-cell) with a residual interval
    predicate — never an unbounded inequality join; the oracle states
    the same result as a plain inequality join."""
    events = load(spark, sf_dir, "events")
    intervals = (
        events.groupBy("user_id")
        .agg(F.date_trunc("day", F.min("ts")).alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 3 DAYS"))
    )
    out = range_join(
        events.select("event_id", "user_id", "ts"),
        intervals,
        left_on="ts",
        start_col="w_start",
        end_col="w_end",
        by="user_id",
        grid="1D",
    )
    return out.select(
        "event_id", "user_id", "ts", "w_start", "w_end"
    ).orderBy("event_id")


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c_mktsegment
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact join via BUCKETED tables: orders and
    customer are each written hash-bucketed (8 buckets) and
    per-bucket sorted on custkey, then joined — the bucketed scans
    expose their partitioning to the planner, so the SortMergeJoin
    runs with NO Exchange on either side (asserted in
    tests/test_round8_ops.py). This is the pay-the-shuffle-once
    pattern for 100 TB fact-to-fact joins that repeat on the same
    key; the write cost amortizes over every subsequent join. The
    oracle states the plain-join result, proving co-location changes
    the plan and not the answer."""
    import os

    from oups_spark.operators.bucketed import (
        colocated_join,
        write_bucketed_table,
    )
    from oups_spark.queries._scratch import fresh as _fresh

    base = _fresh("bucketed_colocated_join")
    pid = os.getpid()
    ln, rn = f"b_orders_{pid}", f"b_customer_{pid}"
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    write_bucketed_table(
        orders, name=ln, path=os.path.join(base, "orders_b"),
        bucket_col="custkey", n_buckets=8,
    )
    write_bucketed_table(
        customer, name=rn, path=os.path.join(base, "customer_b"),
        bucket_col="custkey", n_buckets=8,
    )
    j = colocated_join(spark, ln, rn, on="custkey")
    # per-segment sums over the whole orders table are the largest
    # float accumulations in the suite: sum on the integer grid
    # (o_totalprice has exactly 2 decimals) so partial-agg order can
    # never move the 2-dp rounding boundary between engines
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "salted_join_order_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           count(*) AS n_orders,
           round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c_custkey
    """,
)
def salted_join_order_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe SALTED shuffle join, oracle-proven equivalent to the
    plain join: fact rows carry a deterministic xxhash64 salt, the
    dimension side replicates n_salts times, the join runs on
    (key, salt) so a hot key spreads across n_salts tasks. The
    shuffle_hash hint keeps the demo on the shuffle path (Spark would
    otherwise broadcast this small dimension and hide the pattern —
    salting targets the sizes where broadcast is impossible)."""
    from oups_spark.operators.asof import salted_join

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = salted_join(
        orders,
        cust.hint("shuffle_hash"),
        "c_custkey",
        salt_from="o_orderkey",
        n_salts=8,
    )
    return (
        j.groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0,
                2,
            ).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "interval_overlap_pairs",
    oracle="""
    WITH lu AS (SELECT user_id, min(ts) AS l_start,
                       min(ts) + INTERVAL 2 DAY AS l_end
                FROM events GROUP BY 1),
    rt AS (SELECT event_type, min(ts) AS r_start,
                  min(ts) + INTERVAL 1 DAY AS r_end
           FROM events GROUP BY 1)
    SELECT lu.user_id, rt.event_type,
           CAST(epoch_us(least(l_end, r_end))
                - epoch_us(greatest(l_start, r_start)) AS BIGINT)
             AS overlap_us
    FROM lu JOIN rt ON l_start < r_end AND r_start < l_end
    ORDER BY user_id, event_type
    """,
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-x-interval overlap join (beyond reference — the
    session/campaign overlap shape): each user's first-2-day activity
    window against each event type's first-day window. Both interval
    sets explode onto a daily grid and meet in an EQUALITY join on
    the cell — never an unbounded inequality join — with each
    overlapping pair emitted once from its canonical cell (the one
    holding the overlap's first instant), so no dedup shuffle. The
    oracle states the same pairs as a plain inequality join."""
    from oups_spark.operators.asof import interval_overlap_join

    events = load(spark, sf_dir, "events")
    lu = events.groupBy("user_id").agg(F.min("ts").alias("l_start")).withColumn(
        "l_end", F.col("l_start") + F.expr("INTERVAL 2 DAYS")
    )
    rt = events.groupBy("event_type").agg(
        F.min("ts").alias("r_start")
    ).withColumn("r_end", F.col("r_start") + F.expr("INTERVAL 1 DAYS"))
    j = interval_overlap_join(
        lu, rt,
        left_start="l_start", left_end="l_end",
        right_start="r_start", right_end="r_end",
        grid="1D",
    )
    overlap_us = F.unix_micros(
        F.least("l_end", "r_end").cast("timestamp")
    ) - F.unix_micros(F.greatest("l_start", "r_start").cast("timestamp"))
    return (
        j.select(
            "user_id", "event_type", overlap_us.alias("overlap_us")
        )
        .orderBy("user_id", "event_type")
    )
