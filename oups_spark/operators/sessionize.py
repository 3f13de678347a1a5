"""Custom segmentation beyond fixed grids (reference W4: the
``bin_by`` callable contract, ``segmentby.py:735-800``): gap-based
session windows and threshold-accumulation bins (volume bars — the
reference's canonical custom-binning example).

- Sessions map directly onto ``F.session_window`` (built-in stateful
  window merge, streaming-capable).
- Volume bars need a global running sum — done scalably with the
  same range-bucketed two-phase pattern as row-count bins: bucket
  boundaries become plan literals, per-bucket totals are collected
  (tiny), and the within-bucket window runs at full parallelism. No
  single-partition window.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window



def session_agg(
    df: DataFrame,
    ordered_on: str,
    agg: dict,
    *,
    gap: str,
    partition_by: list[str] | None = None,
    session_start_col: str = "session_start",
    session_end_col: str = "session_end",
) -> DataFrame:
    """Gap-based sessionization: rows closer than ``gap`` chain into
    one session (per ``partition_by`` key). Session start = first
    event; end = last event + gap (``F.session_window`` semantics).

    ``agg``: {out: (in_col, func)} with func in count/min/max/sum.
    """
    keys = list(partition_by or [])
    w = F.session_window(F.col(ordered_on), gap)
    exprs = []
    for out, (col, func) in agg.items():
        if func == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        elif func in ("min", "max", "sum"):
            exprs.append(getattr(F, func)(F.col(col)).alias(out))
        else:
            raise ValueError(f"unsupported session agg func {func!r}")
    out = df.groupBy(*keys, w.alias("session")).agg(*exprs)
    return out.select(
        *keys,
        F.col("session.start").alias(session_start_col),
        F.col("session.end").alias(session_end_col),
        *[F.col(o) for o in agg],
    )


def add_prefix_sum(
    df: DataFrame,
    ordered_on: str,
    value_col: str,
    *,
    tiebreak: list[str] | None = None,
    out_col: str = "prefix_sum",
    exclusive: bool = False,
    n_buckets: int = 128,
) -> DataFrame:
    """Global running sum of ``value_col`` under the total order
    ``(ordered_on, *tiebreak)`` — two-phase, no global window:
    (1) uniform range buckets over ``ordered_on`` (plan literals);
    (2) per-bucket totals -> driver offsets (tiny);
    (3) within-bucket cumulative window + offset.

    ``exclusive=True`` gives the sum over strictly-preceding rows.
    """
    from oups_spark.operators.segment import _offset_lookup, bucketize

    tiebreak = tiebreak or []
    sort_cols = [ordered_on, *tiebreak]
    num = bucketize(df, ordered_on, n_buckets=n_buckets)
    totals = {
        r["__bucket"]: r["s"]
        for r in num.groupBy("__bucket")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0.0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b] or 0
    upper = -1 if exclusive else Window.currentRow
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*[F.col(c) for c in sort_cols])
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0.0))
    return num.withColumn(out_col, _offset_lookup(offsets) + local).drop("__bucket")


def volume_bars(
    df: DataFrame,
    ordered_on: str,
    volume_col: str,
    *,
    threshold: float,
    tiebreak: list[str] | None = None,
    bin_col: str = "bin_id",
    initial_volume: float = 0.0,
) -> DataFrame:
    """Threshold-accumulation bins: a new bar opens when accumulated
    ``volume_col`` (over strictly-preceding rows) crosses a multiple
    of ``threshold`` — the reference's volume-bar ``bin_by`` callable,
    expressed through the pluggable distributed binner
    (:mod:`oups_spark.operators.binby`); ``initial_volume`` carries
    the accumulator across chunks/restarts."""
    from oups_spark.operators.binby import VolumeBarBinner, assign_custom_bins

    binned, _state = assign_custom_bins(
        df, ordered_on, VolumeBarBinner(volume_col, threshold),
        tiebreak=tiebreak, bin_col=bin_col, initial_state=initial_volume,
    )
    return binned


def funnel_stages(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    horizon: str | None = None,
) -> DataFrame:
    """Ordered-funnel timestamps per user: for each stage ``i`` the
    earliest event of ``stages[i]`` STRICTLY after the user's stage
    ``i-1`` time (first stage: earliest occurrence overall), null once
    a stage is never reached. ``horizon`` (e.g. ``'7 days'``) bounds
    every later stage to ``first_stage_ts + horizon``.

    One shuffle total: events collect into a per-user array and the
    stage chain folds as JVM array expressions (``filter`` +
    ``array_min``), instead of one join + shuffle per stage. Per-user
    arrays keep only (ts, type) of events whose type is in ``stages``
    — filtered BEFORE the shuffle, so state per user is bounded by
    that user's funnel-relevant events. At 100 TB a runaway key (a
    bot account with millions of clicks) should be pre-capped
    upstream; typical funnels hold a few dozen events per user.

    Returns one row per user with ``ts_<stage>`` columns.
    """
    arr = (
        df.where(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .agg(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
            ).alias("ev")
        )
    )
    cols = [F.col(user_col)]
    prev = None
    first = None
    for i, stage in enumerate(stages):
        if i == 0:
            t = F.array_min(
                F.transform(
                    F.filter(F.col("ev"), lambda x: x["et"] == F.lit(stage)),
                    lambda x: x["ts"],
                )
            )
            first = f"ts_{stage}"
        else:
            pv = F.col(prev)

            def _make_pred(stage, pv):
                # closure factory: the callable handed to F.filter must
                # take EXACTLY one parameter (PySpark derives the
                # lambda arity from the signature; defaults count)
                def _pred(x):
                    ok = (x["et"] == F.lit(stage)) & (x["ts"] > pv)
                    if horizon is not None:
                        ok = ok & (
                            x["ts"]
                            <= F.col(first) + F.expr(f"INTERVAL {horizon}")
                        )
                    return ok

                return _pred

            t = F.array_min(
                F.transform(
                    F.filter(F.col("ev"), _make_pred(stage, pv)),
                    lambda x: x["ts"],
                )
            )
        name = f"ts_{stage}"
        cols.append(t.alias(name))
        arr = arr.select(*cols, "ev")
        cols = [F.col(c) for c in [user_col] + [f"ts_{s}" for s in stages[: i + 1]]]
        prev = name
    return arr.select(*cols)


def funnel_summary(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    horizon: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Stage-by-stage funnel counts: one row per stage with the number
    of users reaching it and the conversion rate vs the first stage.
    The per-user stage table reduces to one ~len(stages)-row result —
    driver state is O(stages), never O(users)."""
    per_user = funnel_stages(
        df,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        stages=stages,
        horizon=horizon,
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"ts_{s}")).alias(f"n_{i}")
            for i, s in enumerate(stages)
        ]
    )
    stacked = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("stage_idx"),
                        F.lit(s).alias("stage"),
                        F.col(f"n_{i}").alias("users"),
                        F.round(
                            F.col(f"n_{i}") / F.col("n_0"), decimals
                        ).alias("conversion"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.*").orderBy("stage_idx")
