"""Custom stateful streaming operators via ``applyInPandasWithState``
— the escape hatch for semantics Spark's built-in streaming
aggregations can't express (reference: the accumulator-carry model of
``oups/aggstream/aggstream.py``; here the carried state lives in
Spark's checkpointed state store instead of kv metadata).

Contract shared with AggStream: micro-batches must arrive
event-time-ordered per key (the file/availableNow sources used here
satisfy it; a disordered source would need a watermark + sort stage
first). State per key is O(1) — a single carried value — so state
store size scales with |keys|, never with row count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def stateful_ffill(
    stream_df: DataFrame,
    *,
    key: str,
    ordered_on: str,
    tiebreak: str,
    value_col: str,
    id_col: str,
    out_col: str = "v_ffill",
) -> DataFrame:
    """Streaming forward-fill: each row's ``value_col`` is replaced by
    the most recent non-null value for its ``key``, INCLUDING values
    seen in earlier micro-batches — the per-key carry lives in the
    checkpointed state store (one double per key), so a restart
    resumes mid-stream without rescanning history.

    Rows emit exactly once, in the micro-batch that carried them.
    Equivalent to the batch window form
    (``last_value(v IGNORE NULLS) OVER (PARTITION BY key ORDER BY
    ordered_on, tiebreak)``) when batches are key-ordered in event
    time; the oracle for the driver query states exactly that.
    Output: (id_col, out_col).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fill(group_key, pdf_iter, state: GroupState):
        last = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdf_iter]
        rows = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        rows = rows.sort_values([ordered_on, tiebreak])
        filled = rows[value_col].ffill()
        if last is not None:
            filled = filled.fillna(last)
        new_last = filled.iloc[-1] if len(filled) else last
        if new_last is not None and not pd.isna(new_last):
            state.update((float(new_last),))
        out = pd.DataFrame({id_col: rows[id_col], out_col: filled})
        yield out

    return stream_df.groupBy(key).applyInPandasWithState(
        fill,
        outputStructType=f"{id_col} long, {out_col} double",
        stateStructType="last double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_volume_bars(
    stream_df: DataFrame,
    *,
    ordered_on: str,
    volume_col: str,
    threshold: float,
    tiebreak: list[str] | str | None = None,
    value_col: str | None = None,
    key: str | None = None,
    bin_col: str = "bin_id",
    initial_volume: float = 0.0,
) -> DataFrame:
    """Watermark-managed VOLUME BARS on the native streaming path —
    the reference's custom ``bin_by`` contract (W4,
    ``oups/aggstream/segmentby.py:735-800``) re-expressed on Spark's
    checkpointed state store instead of kv-metadata buffers.

    Semantics match the batch operator
    (:func:`oups_spark.operators.sessionize.volume_bars`): a row's
    bar is ``floor(cum_before / threshold)`` where ``cum_before`` is
    the accumulated ``volume_col`` over strictly-preceding rows
    (global order ``(ordered_on, *tiebreak)``), carried ACROSS
    micro-batches and restarts. Each batch emits the bars that CLOSED
    (no future row can join them — volumes are non-negative, so the
    accumulator is non-decreasing and every bar below the current
    open one is final); the open bar's partial aggregates are
    withheld in the state store and re-enter the fold when later rows
    close it — the T5/T6 accumulator-carry + last-bin-withholding
    contract on the native path. Result == batch ``volume_bars``
    MINUS the still-open last bar.

    ``key=None`` accumulates one global series (the reference's
    single-stream shape — inherently sequential, one state
    partition); pass a column name for independent per-key bars (the
    scalable fan-out form, like AggStream's filter fan-out). State
    per key is O(1): seven scalars, never row-proportional.

    Output: ``(key?, bin_col, bin_start, bin_end, n_rows, sum_vol
    [, sum_val])`` — timestamps are the bar's first/last event times.

    State-schema note: round 13 added the ``seen`` field (the
    global-order guard) — a checkpoint written by the 7-field version
    cannot restart under this one (Spark rejects the state-schema
    change); drain the old query and start a fresh checkpoint.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if isinstance(tiebreak, str):
        tiebreak = [tiebreak]
    tiebreak = list(tiebreak or [])
    grouped_key = key
    if key is None:
        stream_df = stream_df.withColumn("__k", F.lit(0))
        grouped_key = "__k"
    has_val = value_col is not None
    out_cols = ([key] if key is not None else []) + [
        bin_col, "bin_start", "bin_end", "n_rows", "sum_vol",
    ] + (["sum_val"] if has_val else [])
    key_type = (
        dict(stream_df.dtypes)[key] if key is not None else None
    )
    out_schema = (
        (f"{key} {key_type}, " if key is not None else "")
        + f"{bin_col} long, bin_start timestamp, bin_end timestamp, "
        + "n_rows long, sum_vol double"
        + (", sum_val double" if has_val else "")
    )

    def bars(group_key, pdf_iter, state: GroupState):
        import numpy as np

        if state.exists:
            acc, ob, o_start, o_end, o_n, o_vol, o_val, seen = state.get
        else:
            acc, ob = float(initial_volume), -1
            o_start = o_end = o_n = 0
            o_vol = o_val = 0.0
            seen = -(2**63)  # min int64: nothing seen yet
        chunks = [pdf for pdf in pdf_iter]
        rows = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        rows = rows.sort_values([ordered_on, *tiebreak], ignore_index=True)
        # GLOBAL-ORDER GUARD: rows are sorted within each micro-batch
        # only, and closed bars are emitted irrevocably — a batch that
        # starts BEFORE the last row already folded (an out-of-order
        # multi-part source, late data after a restart) would silently
        # misassign bars. The reference AggStream raises on
        # non-monotonic ordered_on seed input (aggstream.py disorder
        # check); mirror it here from one carried scalar. Ties on the
        # boundary instant are allowed (same contract as the batch
        # operator's tiebreak within one instant).
        first_ns = int(
            rows[ordered_on].astype("datetime64[ns]").astype("int64").iloc[0]
        )
        if first_ns < seen:
            raise ValueError(
                f"streaming_volume_bars: micro-batch starts at "
                f"{rows[ordered_on].iloc[0]} before the last folded row "
                f"({pd.Timestamp(seen)}); the source must deliver batches "
                "in global (ordered_on, tiebreak) order — use an ordered "
                "file source or re-sort upstream"
            )
        vol = rows[volume_col].astype(float)
        cum_before = acc + vol.cumsum().shift(1, fill_value=0.0)
        bins = np.floor(cum_before / threshold).astype("int64")
        acc = float(acc + vol.sum())
        open_bin = int(acc // threshold)

        ts_ns = rows[ordered_on].astype("datetime64[ns]").astype("int64")
        g = pd.DataFrame(
            {
                "b": bins,
                "n": 1,
                "vol": vol.to_numpy(),
                "val": (
                    rows[value_col].astype(float).to_numpy()
                    if has_val
                    else 0.0
                ),
                "t0": ts_ns,
                "t1": ts_ns,
            }
        ).groupby("b", sort=True).agg(
            n=("n", "sum"), vol=("vol", "sum"), val=("val", "sum"),
            t0=("t0", "min"), t1=("t1", "max"),
        )
        # fold the carried open-bar partial into its bin
        if ob >= 0:
            if ob in g.index:
                g.loc[ob, "n"] += o_n
                g.loc[ob, "vol"] += o_vol
                g.loc[ob, "val"] += o_val
                if o_n:
                    g.loc[ob, "t0"] = min(g.loc[ob, "t0"], o_start)
                    g.loc[ob, "t1"] = max(g.loc[ob, "t1"], o_end)
            elif o_n:
                # defensive: a non-empty batch's first row always has
                # cum_before == acc, i.e. lands IN the open bin, so
                # this branch is unreachable through the stream API —
                # kept for direct/edge callers. dtype-preserving
                # concat, NOT loc-enlargement: a new row via .loc
                # upcasts every column to float64, which silently
                # corrupts ns-precision timestamps (int64 ns exceeds
                # float64's 2^53 integer range)
                carry = pd.DataFrame(
                    {
                        "n": pd.array([o_n], dtype=g["n"].dtype),
                        "vol": [float(o_vol)],
                        "val": [float(o_val)],
                        "t0": pd.array([o_start], dtype=g["t0"].dtype),
                        "t1": pd.array([o_end], dtype=g["t1"].dtype),
                    },
                    index=pd.Index([ob], name="b"),
                )
                g = pd.concat([g, carry]).sort_index()
        closed = g[g.index < open_bin]
        if open_bin in g.index:
            oo = g.loc[open_bin]
            o_n, o_vol, o_val = int(oo["n"]), float(oo["vol"]), float(oo["val"])
            o_start, o_end = int(oo["t0"]), int(oo["t1"])
        else:
            o_n, o_vol, o_val, o_start, o_end = 0, 0.0, 0.0, 0, 0
        seen = max(seen, int(ts_ns.iloc[-1]))  # rows are sorted
        state.update(
            (acc, open_bin, o_start, o_end, o_n, o_vol, o_val, seen)
        )
        out = pd.DataFrame(
            {
                bin_col: closed.index.to_numpy(),
                "bin_start": pd.to_datetime(closed["t0"].to_numpy()),
                "bin_end": pd.to_datetime(closed["t1"].to_numpy()),
                "n_rows": closed["n"].to_numpy().astype("int64"),
                "sum_vol": closed["vol"].to_numpy(),
            }
        )
        if has_val:
            out["sum_val"] = closed["val"].to_numpy()
        if key is not None:
            out.insert(0, key, group_key[0])
        yield out[out_cols]

    return stream_df.groupBy(grouped_key).applyInPandasWithState(
        bars,
        outputStructType=out_schema,
        stateStructType=(
            "acc double, open_bin long, o_start long, o_end long, "
            "o_n long, o_vol double, o_val double, seen long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
