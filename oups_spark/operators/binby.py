"""Pluggable custom binning with carried state (reference W4: the
``bin_by`` callable contract, ``segmentby.py:712-800``).

The reference's contract is sequential: the callable walks one
ordered pandas chunk with an in-place ``buffer``.  A faithful
translation would serialize the whole dataset through one worker, so
the Spark form decomposes the state transition the way parallel
prefix-scan does:

- ``summarize(pdf)``  — per-range-bucket digest, computed in
  PARALLEL (e.g. the bucket's total volume, its last timestamp);
- ``combine(state, summary)`` — associative fold of digests in
  bucket order, on the DRIVER over k tiny objects;
- ``assign(pdf, entry_state)`` — bin ids for one bucket given the
  state accumulated over all earlier buckets, in PARALLEL again.

Any binner whose carried state is reconstructible from an
associative digest fits (volume/dollar bars, row-count bins,
event-count triggers, monotone threshold crossings...).  The entry
state of the FIRST bucket is the restart buffer: feed the returned
``final_state`` back as ``initial_state`` on the next chunk and bin
ids continue seamlessly — the reference's ``buffer`` round-trip.

Plan shape: one pass for bucket digests (applyInPandas over range
buckets), a driver fold of k digests, one pass for assignment.  No
single-partition stage, no data through the driver.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType


@runtime_checkable
class BinBy(Protocol):
    """User contract for distributed stateful binning."""

    #: Spark type string of the produced bin column (e.g. ``"long"``).
    bin_dtype: str

    def initial_state(self) -> Any:
        """State before any row (the empty restart buffer)."""

    def summarize(self, pdf) -> Any:
        """Digest of one ordered bucket, sufficient for ``combine`` to
        advance the state past it without seeing its rows again."""

    def combine(self, state: Any, summary: Any) -> Any:
        """State after a bucket, given the state before it."""

    # Optional: ``summarize_agg() -> Column`` — a Spark aggregate
    # expression computing the SAME digest as ``summarize``.  When
    # present, phase 1 runs as a JVM hash aggregation instead of an
    # applyInPandas pass (no Python workers, no Arrow round-trip of
    # the bucket data) — provide it whenever the digest is expressible
    # with built-in aggregates (sums, counts, min/max).

    def assign(self, pdf, entry_state: Any):
        """Bin id/label per row of one ordered bucket, given the state
        accumulated over all preceding data.  Returns a pandas Series
        aligned with ``pdf``."""


def assign_custom_bins(
    df: DataFrame,
    ordered_on: str,
    binner: BinBy,
    *,
    tiebreak: list[str] | None = None,
    bin_col: str = "bin_id",
    n_buckets: int = 128,
    initial_state: Any = None,
) -> tuple[DataFrame, Any]:
    """Add ``bin_col`` assigned by ``binner`` under the total order
    ``(ordered_on, *tiebreak)``; returns ``(df_with_bins,
    final_state)`` — persist ``final_state`` and pass it back as
    ``initial_state`` to continue binning across chunks/restarts.
    """
    import pickle

    from oups_spark.operators.segment import bucketize

    tiebreak = tiebreak or []
    sort_cols = [ordered_on, *tiebreak]
    num = bucketize(df, ordered_on, n_buckets=n_buckets)

    if hasattr(binner, "summarize_agg"):
        # JVM digest: one hash aggregation, no Python workers
        rows = (
            num.groupBy("__bucket")
            .agg(binner.summarize_agg().alias("__summary"))
            .collect()
        )
        summaries = {r["__bucket"]: r["__summary"] for r in rows}
    else:
        summary_schema = StructType.fromDDL("__bucket long, __summary binary")

        def summarize(key, pdf):
            import pandas as pd

            pdf = pdf.sort_values(sort_cols, ignore_index=True)
            return pd.DataFrame(
                {
                    "__bucket": [key[0]],
                    "__summary": [pickle.dumps(binner.summarize(pdf))],
                }
            )

        rows = (
            num.groupBy("__bucket")
            .applyInPandas(summarize, summary_schema)
            .collect()
        )
        summaries = {
            r["__bucket"]: pickle.loads(r["__summary"]) for r in rows
        }
    state = initial_state if initial_state is not None else binner.initial_state()
    entry_states: dict[int, Any] = {}
    for b in sorted(summaries):
        entry_states[b] = state
        state = binner.combine(state, summaries[b])
    final_state = state

    if hasattr(binner, "jvm_assign"):
        # fully JVM phase 2: the binner expresses assignment as plan
        # columns (entry states become plan literals) — no Python
        # workers anywhere in the operator
        binned = binner.jvm_assign(num, entry_states, sort_cols, bin_col)
        return binned.drop("__bucket"), final_state

    frozen = {b: pickle.dumps(s) for b, s in entry_states.items()}
    out_schema = StructType(
        [*num.schema.fields, StructField(bin_col, _parse_dtype(binner.bin_dtype))]
    )

    def assign(key, pdf):
        pdf = pdf.sort_values(sort_cols, ignore_index=True)
        entry = pickle.loads(frozen[key[0]])
        pdf[bin_col] = binner.assign(pdf, entry)
        return pdf

    binned = num.groupBy("__bucket").applyInPandas(assign, out_schema)
    return binned.drop("__bucket"), final_state


def _parse_dtype(dtype: str):
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(dtype)


class VolumeBarBinner:
    """Threshold-accumulation bars (the reference's canonical custom
    ``bin_by``): a new bar opens when the volume accumulated over
    strictly-preceding rows crosses a multiple of ``threshold``.

    State = total volume seen so far (a float — the whole restart
    buffer); digest = a bucket's volume sum; assignment =
    ``floor(exclusive_prefix / threshold)``."""

    bin_dtype = "long"

    def __init__(self, volume_col: str, threshold: float):
        self.volume_col = volume_col
        self.threshold = float(threshold)

    def initial_state(self) -> float:
        return 0.0

    def summarize_agg(self):
        return F.coalesce(
            F.sum(F.col(self.volume_col)).cast("double"), F.lit(0.0)
        )

    def summarize(self, pdf) -> float:
        return float(pdf[self.volume_col].sum())

    def combine(self, state: float, summary: float) -> float:
        return state + summary

    def assign(self, pdf, entry_state: float):
        import numpy as np

        ps = entry_state + (
            pdf[self.volume_col].cumsum() - pdf[self.volume_col]
        )
        return np.floor(ps / self.threshold).astype("int64")

    def jvm_assign(self, num, entry_states, sort_cols, bin_col):
        """JVM phase 2: per-bucket exclusive-prefix window + entry
        offset as a plan-literal array — whole-stage codegen, no
        Python workers (same plan as the original prefix-sum form)."""
        from pyspark.sql import Window

        size = max(entry_states, default=0) + 1
        arr = F.array(
            *[F.lit(float(entry_states.get(i, 0.0))) for i in range(size)]
        )
        entry = F.element_at(arr, (F.col("__bucket") + 1).cast("int"))
        w = (
            Window.partitionBy("__bucket")
            .orderBy(*[F.col(c) for c in sort_cols])
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        ps = entry + F.coalesce(
            F.sum(F.col(self.volume_col)).over(w), F.lit(0.0)
        )
        return num.withColumn(
            bin_col, F.floor(ps / F.lit(self.threshold)).cast("long")
        )
