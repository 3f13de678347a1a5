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
