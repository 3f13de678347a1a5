"""Incremental view maintenance (IVM) over a CDC upsert table:
keep a grouped aggregate of the CURRENT state exact as changelog
batches land, touching only per-batch deltas — never rescanning
history.

The delta rule (classic IVM — e.g. Gupta & Mumick's materialized
view maintenance survey, public literature): when a batch flips some
keys from old latest-row to new latest-row, the aggregate moves by

    Δ = agg(new rows of touched keys) − agg(old rows of touched keys)

Updates therefore RETRACT the old contribution before adding the new
one, and deletes retract without adding. Count is trivially
algebraic; the value sum is kept on an integer grid
(``round(v·10^d)`` summed as longs) so the incremental total is
bit-EQUAL to a one-shot aggregation — floating addition along a
different order would drift ulps and break the oracle equality that
proves correctness here.

Cost per batch: the touched-bucket read the CDC merge already does,
two tiny group-aggs over those rows, and a rewrite of the aggregate
table (O(#groups) — the point of a materialized aggregate is that
#groups ≪ #keys ≪ #rows). The delta applies to the stored aggregate
via a distributed FULL OUTER join — no driver-side state, so a
high-cardinality ``group_col`` costs one small shuffle instead of a
driver OOM.

Replay caveat: the state merge is idempotent under redelivery, but
the delta-apply is not — re-applying a batch's delta would double
it. Production pairs the two writes in one transaction (Delta/
Iceberg commit); the driver queries here apply batches from a
sequential loop, so the pairing holds by construction.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.streaming.cdc import (
    _tmp_of,
    commit_state,
    merge_latest,
    swap_dir,
)

_GRID = 6  # value quantization decimals for the exact integer sum


def _contrib(df: DataFrame, group_col: str, value_col: str, sign: int):
    fac = float(10**_GRID)
    return df.groupBy(F.col(group_col).alias("g")).agg(
        (F.lit(sign) * F.count(F.lit(1))).alias("dn"),
        (
            F.lit(sign)
            # a group whose live rows are all NULL-valued still counts
            # rows but contributes 0 to the sum (sum over all-nulls is
            # NULL, which would poison the merge arithmetic)
            * F.coalesce(
                F.sum(F.round(F.col(value_col) * fac).cast("long")),
                F.lit(0).cast("long"),
            )
        ).alias("dsum"),
    )


def cdc_merge_batch_with_agg(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    agg_path: str,
    *,
    key: str,
    order_cols: list[str],
    group_col: str,
    value_col: str,
    delete_col: str,
    n_buckets: int = 32,
) -> None:
    """CDC merge (shared core: ``cdc.merge_latest``) that also
    maintains the grouped (count, integer-grid sum) aggregate of the
    current state via the delta rule."""
    cur, flat, touched = merge_latest(
        spark, batch_df, state_path,
        key=key, order_cols=order_cols, n_buckets=n_buckets,
    )
    if not touched:
        return
    live = ~F.col(delete_col)
    new_contrib = _contrib(flat.filter(live), group_col, value_col, +1)
    delta = (
        new_contrib
        if cur is None
        else new_contrib.unionByName(
            _contrib(cur.filter(live), group_col, value_col, -1)
        )
    )
    delta_agg = delta.groupBy("g").agg(
        F.sum("dn").alias("dn"), F.sum("dsum").alias("dsum")
    )
    if os.path.exists(agg_path):
        # eqNullSafe: groupBy keeps NULL group keys as one group on
        # both sides, and a plain equi-join would never match them —
        # every batch would append another duplicate NULL-group row
        stored = spark.read.parquet(agg_path).withColumnRenamed("g", "__sg")
        merged = (
            stored.join(
                delta_agg,
                on=F.col("__sg").eqNullSafe(F.col("g")),
                how="full_outer",
            )
            .select(
                F.coalesce(F.col("__sg"), F.col("g")).alias("g"),
                (
                    F.coalesce(F.col("n"), F.lit(0))
                    + F.coalesce(F.col("dn"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("isum"), F.lit(0))
                    + F.coalesce(F.col("dsum"), F.lit(0))
                ).alias("isum"),
            )
        )
    else:
        merged = delta_agg.select(
            F.col("g"), F.col("dn").alias("n"), F.col("dsum").alias("isum")
        )
    # drop groups whose live row count hit zero (all keys deleted)
    merged = merged.filter(F.col("n") > 0)
    # ONE job writes the new aggregate into a .__tmp sibling; its
    # lineage reads the old aggregate files AND (via delta -> cur)
    # the old state files, all still in place — both tables then
    # swap in with driver-side renames, so no write replaces files
    # its own lineage reads (the hazard the old localCheckpoints
    # guarded against, minus their two extra jobs per batch)
    agg_tmp = _tmp_of(agg_path)
    merged.write.mode("overwrite").parquet(agg_tmp)
    swap_dir(agg_path, agg_tmp)
    commit_state(state_path, touched)


def read_agg(spark: SparkSession, agg_path: str) -> DataFrame:
    """The maintained aggregate, with the integer-grid sum surfaced
    back as a rounded double."""
    fac = float(10**_GRID)
    return spark.read.parquet(agg_path).select(
        F.col("g"),
        F.col("n"),
        F.round(F.col("isum") / F.lit(fac), _GRID).alias("sum_val"),
    )


# ------------------------------------------------- non-invertible aggs
# min/max cannot retract directly (removing the current minimum says
# nothing about the runner-up). The classic IVM answer (Gupta &
# Mumick) is an auxiliary structure that MAKES the maintenance
# invertible: a counted VALUE MULTISET per group — (g, value, count)
# on the same integer grid as the sum. Count deltas are algebraic
# (+1 new live row, -1 retracted row), so the multiset stays exact
# under updates and deletes; min/max are then just min/max over the
# values with count > 0, computed at read time. Size is
# O(distinct (group, value)) — bounded by, and usually far below, the
# live-row count — and each batch touches only the (g, value) pairs
# its keys moved, so cost per batch stays O(touched), never O(table).


def _value_counts(df: DataFrame, group_col: str, value_col: str, sign: int):
    fac = float(10**_GRID)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("g"),
            F.round(F.col(value_col) * fac).cast("long").alias("iv"),
        )
        .agg((F.lit(sign) * F.count(F.lit(1))).alias("dc"))
    )


def cdc_merge_batch_with_minmax(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    hist_path: str,
    *,
    key: str,
    order_cols: list[str],
    group_col: str,
    value_col: str,
    delete_col: str,
    n_buckets: int = 32,
) -> None:
    """CDC merge that also maintains the per-group counted value
    multiset backing exact MIN/MAX under retraction. Same distributed
    shape as :func:`cdc_merge_batch_with_agg`: per-batch deltas, a
    full-outer join onto the stored multiset (NULL-safe on the group
    key), no driver-side state."""
    cur, flat, touched = merge_latest(
        spark, batch_df, state_path,
        key=key, order_cols=order_cols, n_buckets=n_buckets,
    )
    if not touched:
        return
    live = ~F.col(delete_col)
    new_vc = _value_counts(flat.filter(live), group_col, value_col, +1)
    delta = (
        new_vc
        if cur is None
        else new_vc.unionByName(
            _value_counts(cur.filter(live), group_col, value_col, -1)
        )
    )
    delta = delta.groupBy("g", "iv").agg(F.sum("dc").alias("dc"))
    if os.path.exists(hist_path):
        stored = (
            spark.read.parquet(hist_path)
            .withColumnRenamed("g", "__sg")
            .withColumnRenamed("iv", "__siv")
        )
        merged = (
            stored.join(
                delta,
                on=F.col("__sg").eqNullSafe(F.col("g"))
                & (F.col("__siv") == F.col("iv")),
                how="full_outer",
            )
            .select(
                F.coalesce(F.col("__sg"), F.col("g")).alias("g"),
                F.coalesce(F.col("__siv"), F.col("iv")).alias("iv"),
                (
                    F.coalesce(F.col("c"), F.lit(0))
                    + F.coalesce(F.col("dc"), F.lit(0))
                ).alias("c"),
            )
        )
    else:
        merged = delta.select("g", "iv", F.col("dc").alias("c"))
    merged = merged.filter(F.col("c") > 0)
    # same shape as the sum variant: one tmp write whose lineage
    # reads only not-yet-replaced files, then rename both tables in
    hist_tmp = _tmp_of(hist_path)
    merged.write.mode("overwrite").parquet(hist_tmp)
    swap_dir(hist_path, hist_tmp)
    commit_state(state_path, touched)


def read_minmax(spark: SparkSession, hist_path: str) -> DataFrame:
    """Exact per-group min/max (and live valued-row count) from the
    maintained multiset."""
    fac = float(10**_GRID)
    return (
        spark.read.parquet(hist_path)
        .groupBy("g")
        .agg(
            F.round(F.min("iv") / F.lit(fac), _GRID).alias("min_val"),
            F.round(F.max("iv") / F.lit(fac), _GRID).alias("max_val"),
            F.sum("c").cast("long").alias("n_valued"),
        )
    )
