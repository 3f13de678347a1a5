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


@register(
    "moving_avg_per_user",
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma5,
           round(value - lag(value, 1) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta1
    FROM events ORDER BY event_id
    """,
)
def moving_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key sliding-window analytics (5-row moving average +
    1-lag delta): the bread-and-butter time-series smoothing shape.
    Windows are PARTITIONED by user_id — bounded frames, streaming
    state, parallel across keys, no global sort."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 6).alias("ma5"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("delta1"),
    ).orderBy("event_id")


@register(
    "value_percentiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99,
           CAST(count(*) AS BIGINT)             AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (continuous interpolation — Spark
    ``percentile`` matches DuckDB ``quantile_cont``). At cluster
    scale swap in ``percentile_approx`` (t-digest sketch, one pass,
    mergeable) — the exact form is the oracle-checkable anchor."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "daily_type_pivot",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(coalesce(sum(CASE WHEN event_type = 'click'    THEN 1 END), 0) AS BIGINT) AS click,
           CAST(coalesce(sum(CASE WHEN event_type = 'view'     THEN 1 END), 0) AS BIGINT) AS view,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
           CAST(coalesce(sum(CASE WHEN event_type = 'error'    THEN 1 END), 0) AS BIGINT) AS error
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per day × event type). Explicit value list
    keeps it a single-pass conditional aggregation — ``pivot`` with
    an unbounded value set would need a distinct-values pre-pass."""
    events = load(spark, sf_dir, "events")
    piv = (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .count()
    )
    out = piv.select(
        "day",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("click", "view", "purchase", "error")
        ],
    )
    return out.orderBy("day")


@register(
    "trailing_24h_per_user",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(count(*) OVER w AS BIGINT) AS n_24h,
           round(sum(value) OVER w, 6)     AS sum_24h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def trailing_24h_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE window frames (vs ``moving_avg_per_user``'s row
    frames): each event sees the count/sum of the same user's events
    in its trailing 24 hours. RANGE frames are tiebreak-free by
    construction — all rows sharing an instant share a frame — so
    the result is deterministic without a synthetic ordering column.
    Spark expresses the interval as a µs-precision ``rangeBetween``
    over ``unix_micros`` (exact twin of the SQL INTERVAL frame);
    keyed partitions keep frames bounded and parallel across users,
    never a global sort."""
    events = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-24 * 3600 * 1_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.round(F.sum("value").over(w), 6).alias("sum_24h"),
    ).orderBy("event_id")


_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id),
    n AS (
      SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3)
    SELECT stage_idx, stage,
           CASE stage_idx WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END
             AS users,
           round(CASE stage_idx WHEN 1 THEN n1 WHEN 2 THEN n2 ELSE n3 END
                 / CAST(n1 AS DOUBLE), 6) AS conversion
    FROM n, (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
             AS v(stage_idx, stage)
    ORDER BY stage_idx
"""


@register("conversion_funnel", oracle=_FUNNEL_ORACLE)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel with a 7-day horizon: users
    reaching each stage (each stage strictly after the previous one)
    and conversion vs stage 1. ONE shuffle for the whole chain — the
    per-user event array folds every stage with JVM array expressions
    (``operators/sessionize.py::funnel_stages``) instead of one
    join+shuffle per stage; the driver-visible result is 3 rows."""
    from oups_spark.operators.sessionize import funnel_summary

    events = load(spark, sf_dir, "events")
    return funnel_summary(
        events,
        user_col="user_id",
        ts_col="ts",
        type_col="event_type",
        stages=["view", "click", "purchase"],
        horizon="7 DAY",
    )


_COHORT_ORACLE = """
    WITH fu AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw,
             list(DISTINCT date_trunc('week', ts)) AS weeks
      FROM events GROUP BY user_id),
    offs AS (
      SELECT cw, datediff('day', cw, unnest(weeks)) // 7 AS week_offset,
             user_id
      FROM fu),
    coh AS (SELECT cw, count(*) AS cohort_size FROM fu GROUP BY cw)
    SELECT CAST(o.cw AS TIMESTAMP) AS cohort_week,
           CAST(o.week_offset AS INT) AS week_offset,
           count(*) AS active_users,
           round(count(*) / c.cohort_size::DOUBLE, 6) AS retention
    FROM offs o JOIN coh c USING (cw)
    GROUP BY o.cw, o.week_offset, c.cohort_size
    ORDER BY cohort_week, week_offset
"""


@register("cohort_retention_weekly", oracle=_COHORT_ORACLE)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    activity tracked as week offsets from the cohort week. ONE keyed
    shuffle — each user's distinct activity weeks collapse to a
    per-user set in the same agg that finds the cohort week, so
    offsets explode from a per-user row instead of re-joining the
    raw events (the funnel/sessionize single-shuffle pattern); the
    cohort-size side is one tiny agg over the per-user table."""
    fu = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.date_trunc("week", F.min("ts")).alias("cw"),
            F.collect_set(F.date_trunc("week", F.col("ts"))).alias("weeks"),
        )
    )
    coh = fu.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_size"))
    offs = fu.select(
        "user_id", "cw", F.explode("weeks").alias("w")
    ).withColumn(
        "week_offset",
        F.floor(F.datediff(F.col("w"), F.col("cw")) / 7).cast("int"),
    )
    return (
        offs.join(F.broadcast(coh), "cw")
        .groupBy("cw", "week_offset", "cohort_size")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.col("cw").alias("cohort_week"),
            "week_offset",
            "active_users",
            F.round(
                F.col("active_users") / F.col("cohort_size").cast("double"),
                6,
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


_EW_ORACLE = """
    WITH t AS (SELECT max(ts) AS T FROM events),
    w AS (
      SELECT user_id, value,
             exp(-(epoch_us(t.T) - epoch_us(ts)) / 604800000000.0) AS wt
      FROM events, t)
    SELECT user_id, count(*) AS n,
           round(sum(value * wt), 6) AS ew_sum,
           round(sum(value * wt) / sum(wt), 6) AS ew_mean
    FROM w GROUP BY user_id ORDER BY user_id
"""


@register("ewma_user_values", oracle=_EW_ORACLE)
def ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed aggregates per user (tau = 7 days,
    anchored at the corpus max timestamp) — the feature-store recency
    weighting that replaces 'last N days' cliffs. Pure map-side
    weight computation feeding one partial-combined hash agg; the
    anchor is a broadcast scalar, so nothing synchronizes beyond the
    usual keyed shuffle. Decayed sums are order-independent up to
    double noise (~1e-13 relative), absorbed by the 6dp rounding on
    both engines."""
    events = load(spark, sf_dir, "events")
    anchor = events.agg(F.max("ts").alias("T"))
    w = events.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        "value",
        F.exp(
            -(
                F.unix_micros(F.col("T").cast("timestamp"))
                - F.unix_micros(F.col("ts").cast("timestamp"))
            ).cast("double")
            / F.lit(604800000000.0)
        ).alias("wt"),
    )
    return (
        w.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") * F.col("wt")), 6).alias("ew_sum"),
            F.round(
                F.sum(F.col("value") * F.col("wt")) / F.sum("wt"), 6
            ).alias("ew_mean"),
        )
        .orderBy("user_id")
    )


@register(
    "interpolate_resample_6h",
    oracle="""
    WITH o AS (SELECT user_id, ts, max(value) AS v
               FROM events GROUP BY 1, 2
               HAVING max(value) IS NOT NULL),
         b AS (SELECT user_id,
                      make_timestamp(epoch_us(min(ts))
                        - epoch_us(min(ts)) % 21600000000) AS mn,
                      make_timestamp(epoch_us(max(ts))
                        - epoch_us(max(ts)) % 21600000000) AS mx
               FROM o GROUP BY user_id),
         g AS (SELECT user_id,
                      unnest(generate_series(mn, mx, INTERVAL 6 HOUR)) AS gt
               FROM b),
         p AS (SELECT g.user_id, g.gt, o.ts AS pt, o.v AS pv
               FROM g ASOF LEFT JOIN o
                 ON g.user_id = o.user_id AND g.gt >= o.ts),
         n AS (SELECT g.user_id, g.gt, o.ts AS nt, o.v AS nv
               FROM g ASOF LEFT JOIN o
                 ON g.user_id = o.user_id AND g.gt <= o.ts)
    SELECT p.user_id, p.gt AS ts,
           round(CASE WHEN epoch_us(pt) = epoch_us(nt) THEN pv
                      ELSE pv + (nv - pv)
                           * ((epoch_us(p.gt) - epoch_us(pt))
                              / CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
                 END, 6) AS v_interp
    FROM p JOIN n ON p.user_id = n.user_id AND p.gt = n.gt
    ORDER BY p.user_id, ts
    """,
)
def interpolate_resample_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear interpolation of event values onto a 6-hour
    grid (time-series resample + gap fill): grid rows generate
    map-side from each key's [min, max] bounds, observations and grid
    union through ONE keyed shuffle with forward/backward carries
    (the nearest-as-of plan shape), and the lerp is a single IEEE
    division + multiply — bit-identical to the DuckDB replay (two
    native ASOF joins). Edges outside a user's observation range are
    NULL by construction (none exist here: the grid is clamped to
    [floor(min), floor(max)])."""
    from oups_spark.functions.fills import interpolate_resample

    events = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = interpolate_resample(
        events, key="user_id", ts_col="ts", value_col="value", freq="6h"
    )
    return out.orderBy("user_id", "ts")
