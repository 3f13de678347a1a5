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
