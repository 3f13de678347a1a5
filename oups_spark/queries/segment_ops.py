"""Driver-facing segment-aggregation queries (SURVEY §2.4/2.5): time
bins with the 5 agg funcs + empty-bin materialization, closed-right
bins, row-count bins, and point-in-time snapshots. Oracles restate
the same semantics in DuckDB SQL (epoch-microsecond arithmetic for
bin/snapshot assignment so both engines use identical edge rules)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.operators.segment import segment_agg, snapshot_agg
from oups_spark.queries import register
from oups_spark.tables import load

_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


@register(
    "segment_bins_1h",
    oracle=f"""
    WITH agged AS (
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % {_HOUR_US}) AS bin,
             arg_min(value, ts)     AS first_val,
             arg_max(value, ts)     AS last_val,
             round(min(value), 6)   AS min_val,
             round(max(value), 6)   AS max_val,
             round(sum(value), 6)   AS sum_val
      FROM events GROUP BY 1
    ), cal AS (
      SELECT unnest(generate_series((SELECT min(bin) FROM agged),
                                    (SELECT max(bin) FROM agged),
                                    INTERVAL 1 HOUR)) AS bin
    )
    SELECT cal.bin, first_val, last_val, min_val, max_val, sum_val
    FROM cal LEFT JOIN agged USING (bin)
    ORDER BY cal.bin
    """,
)
def segment_bins_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly bins over the events stream: the reference's core
    aggregation (W1 + A1-A4) with empty bins emitted as nulls (A6)."""
    events = load(spark, sf_dir, "events")
    out = segment_agg(
        events,
        "ts",
        {
            "first_val": ("value", "first"),
            "last_val": ("value", "last"),
            "min_val": ("value", "min"),
            "max_val": ("value", "max"),
            "sum_val": ("value", "sum"),
        },
        bin_by="1h",
        empty_bins=True,
    )
    return out.select(
        "bin",
        "first_val",
        "last_val",
        F.round("min_val", 6).alias("min_val"),
        F.round("max_val", 6).alias("max_val"),
        F.round("sum_val", 6).alias("sum_val"),
    )


@register(
    "segment_bins_4h_right",
    oracle="""
    SELECT make_timestamp(epoch_us(ts) - (epoch_us(ts) - 1) % 14400000000
                          - 1 + 14400000000) AS bin,
           count(*)             AS n_rows,
           round(sum(value), 6) AS sum_val
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def segment_bins_4h_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """closed='right', label='right' bins: (start, end] with the right
    edge as label (TimeGrouper closed/label parity, W1)."""
    from oups_spark.operators.segment import assign_time_bin

    events = load(spark, sf_dir, "events")

    binned = events.withColumn(
        "bin", assign_time_bin(F.col("ts"), "4h", closed="right", label="right")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("value"), 6).alias("sum_val"),
        )
        .orderBy("bin")
    )


@register(
    "row_count_bins_500",
    oracle="""
    WITH numbered AS (
      SELECT value, ts,
             (row_number() OVER (ORDER BY ts) - 1) // 500 AS bin_id
      FROM events
    )
    SELECT bin_id,
           min(ts)                AS bin_label,
           arg_min(value, ts)     AS first_val,
           arg_max(value, ts)     AS last_val,
           round(sum(value), 6)   AS sum_val,
           count(*)               AS n_rows
    FROM numbered GROUP BY bin_id ORDER BY bin_id
    """,
)
def row_count_bins_500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count bins (W3 ``by_x_rows``): deterministic global
    numbering via quantile-bucketed two-phase counting — no
    single-partition window at any scale."""
    from oups_spark.operators.segment import add_row_count_bins

    events = load(spark, sf_dir, "events")

    binned = add_row_count_bins(events, "ts", 500, bin_col="bin_id")
    return (
        binned.groupBy("bin_id")
        .agg(
            F.min("ts").alias("bin_label"),
            F.min_by("value", F.col("ts")).alias("first_val"),
            F.max_by("value", F.col("ts")).alias("last_val"),
            F.round(F.sum("value"), 6).alias("sum_val"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("bin_id")
    )


@register(
    "segment_bins_month_right",
    oracle="""
    WITH f AS (SELECT * FROM orders WHERE o_totalprice > 450000),
    agged AS (
      SELECT date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS bin,
             CAST(count(*) AS BIGINT)     AS n_orders,
             round(sum(o_totalprice), 2)  AS sum_price
      FROM f GROUP BY 1
    ), cal AS (
      SELECT unnest(generate_series((SELECT min(bin) FROM agged),
                                    (SELECT max(bin) FROM agged),
                                    INTERVAL 1 MONTH)) AS bin
    )
    SELECT cal.bin, n_orders, sum_price
    FROM cal LEFT JOIN agged USING (bin)
    ORDER BY cal.bin
    """,
)
def segment_bins_month_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month bins with RIGHT labels and empty bins (W1 + A6
    over a non-fixed frequency): right edges come from ``add_months``
    and the empty-bin calendar steps INTERVAL 1 MONTH — a 30-day
    approximation would mislabel every non-30-day month and drift the
    grid. The >450k price filter leaves genuinely empty months."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .withColumn("odt", F.col("o_orderdate").cast("timestamp"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    out = segment_agg(
        orders,
        "odt",
        {"n_orders": ("one", "sum"), "sum_price": ("o_totalprice", "sum")},
        bin_by="MS",
        label="right",
        empty_bins=True,
    )
    return out.select(
        "bin",
        "n_orders",
        F.round("sum_price", 2).alias("sum_price"),
    )


@register(
    "segment_bins_quarter_right",
    oracle="""
    WITH f AS (SELECT * FROM orders WHERE o_totalprice > 450000),
    agged AS (
      SELECT time_bucket(INTERVAL '3 months', CAST(o_orderdate AS TIMESTAMP))
               + INTERVAL 3 MONTH            AS bin,
             CAST(count(*) AS BIGINT)        AS n_orders,
             round(sum(o_totalprice), 2)     AS sum_price
      FROM f GROUP BY 1
    ), cal AS (
      SELECT unnest(generate_series((SELECT min(bin) FROM agged),
                                    (SELECT max(bin) FROM agged),
                                    INTERVAL 3 MONTH)) AS bin
    )
    SELECT cal.bin, n_orders, sum_price
    FROM cal LEFT JOIN agged USING (bin)
    ORDER BY cal.bin
    """,
)
def segment_bins_quarter_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-period calendar bins (``3MS`` = quarters anchored at Jan,
    reference ``by_scale`` accepting any pandas TimeGrouper freq,
    ``segmentby.py:211-222``): months-since-epoch modulo arithmetic
    gives exact quarter edges, right labels via ``add_months``, empty
    quarters materialized (the >450k filter leaves some)."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .withColumn("odt", F.col("o_orderdate").cast("timestamp"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    out = segment_agg(
        orders,
        "odt",
        {"n_orders": ("one", "sum"), "sum_price": ("o_totalprice", "sum")},
        bin_by="3MS",
        label="right",
        empty_bins=True,
    )
    return out.select(
        "bin", "n_orders", F.round("sum_price", 2).alias("sum_price")
    )


@register(
    "segment_bins_4h_0930_offset",
    oracle="""
    SELECT make_timestamp((epoch_us(ts) - 34200000000)
             - (epoch_us(ts) - 34200000000) % 14400000000
             + 34200000000)      AS bin,
           count(*)              AS n_rows,
           round(sum(value), 6)  AS sum_val
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def segment_bins_4h_0930_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-anchored fixed bins (pandas TimeGrouper origin/offset,
    reference ``segmentby.py:211-222``): a 4h grid shifted to start
    at 09:30 — the classic market-session grid that epoch anchoring
    cannot express."""
    events = load(spark, sf_dir, "events").withColumn(
        "one", F.lit(1).cast("long")
    )
    out = segment_agg(
        events,
        "ts",
        {"n_rows": ("one", "sum"), "sum_val": ("value", "sum")},
        bin_by="4h",
        offset="9h30min",
    )
    return out.select("bin", "n_rows", F.round("sum_val", 6).alias("sum_val"))


@register(
    "snapshot_1y_1ms",
    oracle="""
    WITH base AS (
      SELECT CAST(o_orderdate AS TIMESTAMP) AS ts, o_totalprice AS value
      FROM orders
    ), partials AS (
      SELECT date_trunc('year', ts) AS bin,
             least(date_trunc('month', ts) + INTERVAL 1 MONTH,
                   date_trunc('year', ts) + INTERVAL 1 YEAR) AS snap,
             CAST(count(*) AS BIGINT) AS p_n,
             max(value) AS p_max,
             sum(value) AS p_sum
      FROM base GROUP BY 1, 2
    ), grid AS (
      SELECT bin, bin + to_months(CAST(k AS INT)) AS snap
      FROM (SELECT unnest(generate_series((SELECT min(bin) FROM partials),
                                          (SELECT max(bin) FROM partials),
                                          INTERVAL 1 YEAR)) AS bin),
           (SELECT unnest(generate_series(1, 12)) AS k)
    )
    SELECT bin, snap,
           CAST(coalesce(sum(p_n) OVER w, 0) AS BIGINT) AS n_orders,
           round(max(p_max) OVER w, 2)                  AS max_price,
           round(sum(p_sum) OVER w, 2)                  AS sum_price
    FROM grid LEFT JOIN partials USING (bin, snap)
    WINDOW w AS (PARTITION BY bin ORDER BY snap
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bin, snap
    """,
)
def snapshot_1y_1ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar snapshots inside calendar bins (reference ``snap_by``
    generality, ``segmentby.py:860-911``): at every month start, the
    cumulative year-to-date aggregate — both grids calendar-exact
    (28/29/30/31-day months), forward-filled quiet months.  Tie-unsafe
    first/last are omitted (order dates repeat); n/max/sum are
    order-insensitive."""
    orders = (
        load(spark, sf_dir, "orders")
        .withColumn("odt", F.col("o_orderdate").cast("timestamp"))
        .withColumn("one", F.lit(1).cast("long"))
    )
    out = snapshot_agg(
        orders,
        "odt",
        {
            "n_orders": ("one", "sum"),
            "max_price": ("o_totalprice", "max"),
            "sum_price": ("o_totalprice", "sum"),
        },
        bin_by="1Y",
        snap_by="MS",
        snap_closed="left",
    )
    return out.select(
        "bin",
        "snap",
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
        F.round("max_price", 2).alias("max_price"),
        F.round("sum_price", 2).alias("sum_price"),
    )


# irregular explicit bin grid over the events span (Jan 2024); the
# uneven spacing is the point — no period string can produce it
_EDGE_ENDS = [
    "2024-01-03 00:00:00",
    "2024-01-05 12:00:00",
    "2024-01-10 00:00:00",
    "2024-01-10 06:30:00",
    "2024-01-20 00:00:00",
    "2024-01-28 00:00:00",
]
_EDGE_VALUES = ", ".join(
    f"({i}, TIMESTAMP '{e}')" for i, e in enumerate(_EDGE_ENDS)
)


@register(
    "segment_bins_explicit_edges",
    oracle=f"""
    WITH ends AS (SELECT * FROM (VALUES {_EDGE_VALUES}) AS t(i, e)),
    assigned AS (
      SELECT (SELECT min(i) FROM ends WHERE ts < e) AS i, value, ts
      FROM events
    ), agged AS (
      SELECT i,
             arg_min(value, ts)   AS first_val,
             arg_max(value, ts)   AS last_val,
             round(sum(value), 6) AS sum_val
      FROM assigned WHERE i IS NOT NULL GROUP BY i
    )
    SELECT e AS bin, first_val, last_val, sum_val
    FROM ends LEFT JOIN agged USING (i)
    ORDER BY i
    """,
)
def segment_bins_explicit_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit irregular bin edges (reference ``by_scale`` Series
    contract): chunk i ends at ends[i] (closed-left), rows past the
    last end are dropped, every chunk materializes (empty -> nulls).
    The index assignment is a plan-literal array scan / searchsorted
    — no data-sized driver state, no shuffle beyond the one hash agg."""
    import pandas as pd

    events = load(spark, sf_dir, "events")
    out = segment_agg(
        events,
        "ts",
        {
            "first_val": ("value", "first"),
            "last_val": ("value", "last"),
            "sum_val": ("value", "sum"),
        },
        bin_by=[pd.Timestamp(e) for e in _EDGE_ENDS],
        closed="left",
    )
    return out.select(
        "bin",
        "first_val",
        "last_val",
        F.round("sum_val", 6).alias("sum_val"),
    )


@register(
    "snapshot_1d_6h",
    oracle=f"""
    WITH partials AS (
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % {_DAY_US}) AS bin,
             make_timestamp(least(
               epoch_us(ts) - epoch_us(ts) % 21600000000 + 21600000000,
               epoch_us(ts) - epoch_us(ts) % {_DAY_US} + {_DAY_US})) AS snap,
             arg_min(value, ts) AS p_first,
             arg_max(value, ts) AS p_last,
             min(value) AS p_min, max(value) AS p_max, sum(value) AS p_sum
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT bin, bin + k * (INTERVAL 6 HOUR) AS snap
      FROM (SELECT unnest(generate_series((SELECT min(bin) FROM partials),
                                          (SELECT max(bin) FROM partials),
                                          INTERVAL 1 DAY)) AS bin),
           (SELECT unnest(generate_series(1, 4)) AS k)
    )
    SELECT bin, snap,
           first_value(p_first IGNORE NULLS) OVER w AS first_val,
           last_value(p_last IGNORE NULLS)   OVER w AS last_val,
           round(min(p_min) OVER w, 6)       AS min_val,
           round(max(p_max) OVER w, 6)       AS max_val,
           round(sum(p_sum) OVER w, 6)       AS sum_val
    FROM grid LEFT JOIN partials USING (bin, snap)
    WINDOW w AS (PARTITION BY bin ORDER BY snap
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bin, snap
    """,
)
def snapshot_1d_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshots (W6): every 6h, the cumulative aggregate of the
    in-progress daily bin — closed-left observation, forward-filled
    quiet instants, bins resetting the accumulator."""
    events = load(spark, sf_dir, "events")
    out = snapshot_agg(
        events,
        "ts",
        {
            "first_val": ("value", "first"),
            "last_val": ("value", "last"),
            "min_val": ("value", "min"),
            "max_val": ("value", "max"),
            "sum_val": ("value", "sum"),
        },
        bin_by="1D",
        snap_by="6h",
        snap_closed="left",
    )
    return out.select(
        "bin",
        "snap",
        "first_val",
        "last_val",
        F.round("min_val", 6).alias("min_val"),
        F.round("max_val", 6).alias("max_val"),
        F.round("sum_val", 6).alias("sum_val"),
    )


# Irregular snapshot instants (think market-session closes): no
# divisibility relation with the daily bins, instants mid-day and on
# day boundaries, a deliberately sub-second one included.
_SNAP_EDGES = [
    "2024-01-03 09:30:00",
    "2024-01-03 16:00:00",
    "2024-01-05 00:00:00",
    "2024-01-10 12:34:56.789",
    "2024-01-15 00:00:00",
    "2024-01-22 18:45:00",
    "2024-02-01 00:00:00",
]
_SNAP_EDGE_VALUES = ", ".join(f"(TIMESTAMP '{e}')" for e in _SNAP_EDGES)


@register(
    "snapshot_irregular_edges",
    oracle=f"""
    WITH edges AS (SELECT * FROM (VALUES {_SNAP_EDGE_VALUES}) AS t(e)),
    p0 AS (
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % {_DAY_US}) AS bin,
             (SELECT min(e) FROM edges WHERE ts < e) AS snap,
             value, ts
      FROM events
    ), partials AS (
      SELECT bin, snap,
             arg_min(value, ts) AS p_first,
             arg_max(value, ts) AS p_last,
             sum(value) AS p_sum
      FROM p0 WHERE snap IS NOT NULL GROUP BY bin, snap
    ), grid AS (
      SELECT * FROM (
        SELECT make_timestamp(
                 epoch_us(e - INTERVAL 1 MICROSECOND)
                 - epoch_us(e - INTERVAL 1 MICROSECOND) % {_DAY_US}) AS bin,
               e AS snap
        FROM edges)
      WHERE bin BETWEEN (SELECT min(bin) FROM partials)
                    AND (SELECT max(bin) FROM partials)
    )
    SELECT bin, snap,
           first_value(p_first IGNORE NULLS) OVER w AS first_val,
           last_value(p_last IGNORE NULLS)   OVER w AS last_val,
           round(sum(p_sum) OVER w, 6)       AS sum_val
    FROM grid LEFT JOIN partials USING (bin, snap)
    WINDOW w AS (PARTITION BY bin ORDER BY snap
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bin, snap
    """,
)
def snapshot_irregular_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-edge snapshot grid (reference ``by_scale`` Series
    generality inside ``snap_by``): cumulative in-bin aggregates
    observed at arbitrary sorted instants — instants on a day
    boundary observe the CLOSING daily bin, rows whose next instant
    falls past their bin's end are never observed."""
    import pandas as pd

    events = load(spark, sf_dir, "events")
    out = snapshot_agg(
        events,
        "ts",
        {
            "first_val": ("value", "first"),
            "last_val": ("value", "last"),
            "sum_val": ("value", "sum"),
        },
        bin_by="1D",
        snap_by=[pd.Timestamp(e) for e in _SNAP_EDGES],
        snap_closed="left",
    )
    return out.select(
        "bin", "snap", "first_val", "last_val",
        F.round("sum_val", 6).alias("sum_val"),
    )


@register(
    "sliding_window_1h_15m",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 15 MINUTE, min(ts)) AS lo, max(ts) AS hi
      FROM events
    ),
    ws AS (
      SELECT unnest(generate_series(lo - INTERVAL 45 MINUTE, hi, INTERVAL 15 MINUTE)) AS w
      FROM b
    )
    SELECT ws.w AS win_start,
           count(e.ts)          AS n_events,
           round(sum(e.value), 6) AS sum_val,
           round(avg(e.value), 6) AS avg_val
    FROM ws JOIN events e
      ON e.ts >= ws.w AND e.ts < ws.w + INTERVAL 1 HOUR
    GROUP BY ws.w
    HAVING count(e.ts) > 0
    ORDER BY win_start
    """,
)
def sliding_window_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) windows — 1h length, 15min slide: every event
    contributes to 4 overlapping windows. The reference's segmentation
    model is strictly tumbling (one bin per row, ``segmentby.py``);
    Spark's ``F.window(ts, '1 hour', '15 minutes')`` generalizes it
    natively — the expansion happens inside the Generate node of the
    scan stage (each row fans out to length/slide window assignments
    BEFORE the hash agg, which partial-aggregates map-side), so the
    shuffle carries only per-(window, partition) partials at any
    scale. The oracle states the same semantics as an interval join
    against a generated window-start grid."""
    events = load(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "1 hour", "15 minutes")
    return (
        events.groupBy(win.alias("__w"))
        .agg(
            F.count("ts").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_val"),
            F.round(F.avg("value"), 6).alias("avg_val"),
        )
        .select(F.col("__w.start").alias("win_start"), "n_events", "sum_val", "avg_val")
        .orderBy("win_start")
    )
