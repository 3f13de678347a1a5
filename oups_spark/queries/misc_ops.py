"""Driver-facing queries for the utility operators (SURVEY §2.7):
ffill/bfill, ordered anti-membership, floor/ceil calendar arithmetic.
Each was pytest-only in round 1; these oracles make them
value-checked like every other operator."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from oups_spark.functions.dates import ceil_ts, floor_ts
from oups_spark.functions.fills import anti_by, bfill, ffill
from oups_spark.queries import register
from oups_spark.tables import load


@register(
    "ffill_bfill_user_values",
    oracle="""
    WITH m AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type <> 'error' THEN value END AS v
      FROM events
    )
    SELECT event_id,
           round(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_ffill,
           round(first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS v_bfill
    FROM m ORDER BY event_id
    """,
)
def ffill_bfill_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 ffill/bfill: per-user forward/backward fill of a masked
    value column ('error' events carry no value).  The window is
    PARTITIONED by user_id — fills parallelize across users; no
    global single-partition window at any scale."""
    events = load(spark, sf_dir, "events")
    m = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    return m.select(
        "event_id",
        F.round(ffill("v", w), 6).alias("v_ffill"),
        F.round(bfill("v", w), 6).alias("v_bfill"),
    ).orderBy("event_id")


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 isnotin/anti-membership as a hash anti-join (broadcastable
    when the excluded key set is small; a shuffled anti-join
    otherwise — either way no sortedness requirement).  Filtered to
    urgent orders so the result is non-empty at every SF."""
    customer = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    out = anti_by(customer, orders, on="c_custkey")
    return out.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    ).orderBy("c_custkey")


@register(
    "calendar_floor_ceil",
    oracle="""
    WITH g AS (
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 7200000000) AS f2h,
             date_trunc('week', ts)  AS fw,
             date_trunc('month', ts) AS fm,
             CASE WHEN date_trunc('month', ts) = ts THEN ts
                  ELSE date_trunc('month', ts) + INTERVAL 1 MONTH END AS cm,
             value
      FROM events
    )
    SELECT f2h,
           f2h + INTERVAL 2 HOUR AS c2h,
           fw, fm, cm,
           count(*) AS n_rows,
           round(sum(value), 6) AS sum_val
    FROM g GROUP BY f2h, fw, fm, cm ORDER BY f2h
    """,
)
def calendar_floor_ceil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 floor_ts/ceil_ts across fixed (2h), week, and month
    frequencies in one grouped projection — pure map-side column
    expressions feeding a bounded hash aggregation."""
    events = load(spark, sf_dir, "events")
    ts = F.col("ts")
    g = events.select(
        floor_ts(ts, "2h").alias("f2h"),
        floor_ts(ts, "W").alias("fw"),
        floor_ts(ts, "MS").alias("fm"),
        ceil_ts(ts, "MS").alias("cm"),
        "value",
    )
    return (
        g.groupBy("f2h", "fw", "fm", "cm")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 6).alias("sum_val"),
        )
        .withColumn("c2h", ceil_ts(F.col("f2h") + F.expr("INTERVAL 2 HOUR"), "2h"))
        .select("f2h", "c2h", "fw", "fm", "cm", "n_rows", "sum_val")
        .orderBy("f2h")
    )
