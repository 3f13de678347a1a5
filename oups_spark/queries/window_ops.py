"""Driver-facing queries for custom segmentation (SURVEY W4),
filter fan-out (F2/A5), synchronized intersections (J3), and the
beyond-reference grouping extensions (A7)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.operators.sessionize import session_agg, volume_bars
from oups_spark.queries import register
from oups_spark.tables import load


@register(
    "session_windows",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 2 DAY
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), y AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id,
           min(ts)                  AS session_start,
           max(ts) + INTERVAL 2 DAY AS session_end,
           count(*)                 AS n_events,
           round(sum(value), 6)     AS sum_val
    FROM y GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization per user (W4 via F.session_window):
    events closer than 2 days chain into one session."""
    events = load(spark, sf_dir, "events")
    out = session_agg(
        events,
        "ts",
        {"n_events": ("event_id", "count"), "sum_val": ("value", "sum")},
        gap="2 days",
        partition_by=["user_id"],
    )
    return out.select(
        "user_id", "session_start", "session_end", "n_events",
        F.round("sum_val", 6).alias("sum_val"),
    ).orderBy("user_id", "session_start")


@register(
    "volume_bars_10k",
    oracle="""
    WITH x AS (
      SELECT l_shipdate AS ts, l_quantity, l_extendedprice,
             coalesce(sum(l_quantity) OVER (
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cq
      FROM lineitem
    ), y AS (SELECT *, CAST(floor(cq / 10000) AS BIGINT) AS bin_id FROM x)
    SELECT bin_id,
           min(ts)                        AS bin_start,
           count(*)                       AS n_rows,
           round(sum(l_quantity), 6)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM y GROUP BY bin_id ORDER BY bin_id
    """,
)
def volume_bars_10k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume bars (W4's canonical custom bin_by): a bar closes when
    accumulated quantity crosses 10k — scalable two-phase prefix sum,
    no global window."""
    li = load(spark, sf_dir, "lineitem")
    barred = volume_bars(
        li, "l_shipdate", "l_quantity", threshold=10_000,
        tiebreak=["l_orderkey", "l_linenumber"],
    )
    return (
        barred.groupBy("bin_id")
        .agg(
            F.min("l_shipdate").alias("bin_start"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("bin_id")
    )


@register(
    "aggstream_filter_fanout",
    oracle="""
    SELECT 'purchases' AS key,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 86400000000) AS bin,
           count(*) AS n_rows, round(sum(value), 6) AS sum_val
    FROM events WHERE event_type = 'purchase'
    GROUP BY 2
    UNION ALL
    SELECT 'big_clicks' AS key,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 86400000000) AS bin,
           count(*) AS n_rows, round(sum(value), 6) AS sum_val
    FROM events WHERE event_type = 'click' AND value > 50.0
    GROUP BY 2
    ORDER BY key, bin
    """,
)
def aggstream_filter_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter fan-out (F2/A5): one seed feeds two keyed pipelines,
    each with its own DNF filter; results union-tagged by key."""
    from oups_spark.functions.filters import dnf_filter
    from oups_spark.operators.segment import assign_time_bin

    events = load(spark, sf_dir, "events")
    outs = []
    for key, filt in [
        ("purchases", [("event_type", "==", "purchase")]),
        ("big_clicks", [("event_type", "==", "click"), ("value", ">", 50.0)]),
    ]:
        f = dnf_filter(events, filt).withColumn(
            "bin", assign_time_bin(F.col("ts"), "1D")
        )
        outs.append(
            f.groupBy("bin")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("value"), 6).alias("sum_val"),
            )
            .select(F.lit(key).alias("key"), "bin", "n_rows", "sum_val")
        )
    return outs[0].unionByName(outs[1]).orderBy("key", "bin")


@register(
    "intersections_bucket_align",
    oracle="""
    WITH tagged AS (
      SELECT 'events' AS key, ts, value FROM events
      UNION ALL
      SELECT 'orders' AS key, o_orderdate AS ts, o_totalprice AS value
      FROM orders
    )
    SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 86400000000) AS bucket,
           key, count(*) AS n_rows, round(sum(value), 6) AS sum_val
    FROM tagged GROUP BY 1, 2 ORDER BY bucket, key
    """,
)
def intersections_bucket_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronized multi-table range processing (J3) the distributed
    way: tagged bucket union + one groupBy(bucket, key) — the
    driver-side chunk iterator reshaped into a single plan."""
    from oups_spark.store.intersections import tagged_bucket_union

    events = load(spark, sf_dir, "events").select("ts", "value")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("ts"), F.col("o_totalprice").alias("value")
    )
    tagged = tagged_bucket_union(
        {"events": events, "orders": orders}, "ts", bucket_by="1D"
    )
    return (
        tagged.groupBy("bucket", "key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 6).alias("sum_val"),
        )
        .orderBy("bucket", "key")
    )


@register(
    "rollup_pricing",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set rollup (A7 — absent in the reference, free in
    Spark): subtotals per (flag, status), per flag, and grand total."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "twap_hourly",
    oracle="""
    WITH x AS (
      SELECT event_type, ts, value, event_id,
             lead(ts) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS nxt,
             date_trunc('hour', ts) AS bin
      FROM events
    ), y AS (
      SELECT event_type, bin, value,
             epoch_us(least(coalesce(nxt, bin + INTERVAL 1 HOUR),
                            bin + INTERVAL 1 HOUR))
               - epoch_us(ts) AS dt
      FROM x
    )
    SELECT event_type, bin,
           round(sum(value * dt) / sum(dt), 6) AS twap,
           count(*) AS n_obs
    FROM y GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per (event_type, hour) — the financial
    TS aggregation the reference's store exists to serve: each
    observation is weighted by its holding time (until the next
    observation of its key, clamped to the bin end; the last
    observation holds to the bin edge). One keyed window (lead) + one
    hash agg — both partitioned by event_type, no global window; at
    100 TB this is a per-key shuffle of (type, ts) pairs and
    map-combined partial sums."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    bin_col = F.date_trunc("hour", F.col("ts"))
    bin_end = bin_col + F.expr("INTERVAL 1 HOUR")
    nxt = F.lead("ts").over(w)
    # ts reads as TIMESTAMP_NTZ (ns-parquet conversion); unix_micros
    # wants TIMESTAMP — the session is pinned UTC, so the cast is a
    # pure relabel
    dt = (
        F.unix_micros(
            F.least(F.coalesce(nxt, bin_end), bin_end).cast("timestamp")
        )
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ).cast("double")
    y = ev.select(
        "event_type",
        bin_col.alias("bin"),
        "value",
        dt.alias("dt"),
    )
    return (
        y.groupBy("event_type", "bin")
        .agg(
            F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias(
                "twap"
            ),
            F.count("*").alias("n_obs"),
        )
        .orderBy("event_type", "bin")
    )
