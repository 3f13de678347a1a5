"""applyInPandasWithState operator tests: the per-key carry must
survive micro-batch boundaries (the whole point of the state store)."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F


def test_stateful_ffill_carries_across_microbatches(spark, scratch):
    from oups_spark.streaming.stateful import stateful_ffill

    src = os.path.join(scratch, "src")
    os.makedirs(src, exist_ok=True)
    cols = ["event_id", "user_id", "ts", "v"]
    batch1 = pd.DataFrame(
        [
            (1, 1, pd.Timestamp("2024-01-01 00:00"), 5.0),
            (2, 1, pd.Timestamp("2024-01-01 01:00"), None),
            (3, 2, pd.Timestamp("2024-01-01 00:30"), None),
            (4, 2, pd.Timestamp("2024-01-01 02:00"), 7.0),
        ],
        columns=cols,
    )
    batch2 = pd.DataFrame(
        [
            (5, 1, pd.Timestamp("2024-01-02 00:00"), None),  # carry 5.0
            (6, 2, pd.Timestamp("2024-01-02 01:00"), None),  # carry 7.0
            (7, 3, pd.Timestamp("2024-01-02 02:00"), None),  # no state: null
        ],
        columns=cols,
    )
    schema = "event_id long, user_id long, ts timestamp, v double"
    # two files; maxFilesPerTrigger=1 forces two micro-batches in
    # modification-time order
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        os.path.join(src, "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "*"))
    )
    filled = stateful_ffill(
        stream,
        key="user_id",
        ordered_on="ts",
        tiebreak="event_id",
        value_col="v",
        id_col="event_id",
    )
    q = (
        filled.writeStream.format("memory")
        .queryName("ffill_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("ffill_out")
        .orderBy("event_id")
        .toPandas()
        .set_index("event_id")["v_ffill"]
    )
    assert got.loc[1] == 5.0
    assert got.loc[2] == 5.0
    assert pd.isna(got.loc[3])  # no value seen yet for user 2
    assert got.loc[4] == 7.0
    assert got.loc[5] == 5.0  # state carried across the batch boundary
    assert got.loc[6] == 7.0
    assert pd.isna(got.loc[7])  # user 3 never had a value
