"""applyInPandasWithState operator tests: the per-key carry must
survive micro-batch boundaries (the whole point of the state store)."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest


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


def test_streaming_volume_bars_carry_and_close(spark, scratch):
    """Native-path volume bars (W4 custom bin_by): a bar spanning a
    micro-batch boundary folds its carried partial when it closes;
    only CLOSED bars emit (the open bar is withheld in state); the
    result equals the batch operator minus the open bar — including
    a boundary-exact accumulator (open bar with zero rows so far)."""
    from oups_spark.operators.sessionize import volume_bars
    from oups_spark.streaming.stateful import streaming_volume_bars

    src = os.path.join(scratch, "vb_src")
    os.makedirs(src, exist_ok=True)
    cols = ["ts", "eid", "qty", "price"]
    t0 = pd.Timestamp("2024-01-01")
    # threshold 10: a row's bar is floor(cum_before / 10)
    rows = [
        # batch 1: cum-before 0,4,7 -> all bar 0; acc ends at 8, so
        # bar 0 stays OPEN across the boundary (the carried partial)
        (t0 + pd.Timedelta(hours=1), 1, 4.0, 1.0),
        (t0 + pd.Timedelta(hours=2), 2, 3.0, 2.0),
        (t0 + pd.Timedelta(hours=3), 3, 1.0, 3.0),
        # batch 2: cum 8, 9 -> still bar 0 (closes here with 5 rows);
        # cum 11 -> bar 1; acc lands EXACTLY on 20 -> open bar 2 is
        # empty at the boundary
        (t0 + pd.Timedelta(hours=4), 4, 1.0, 4.0),
        (t0 + pd.Timedelta(hours=5), 5, 2.0, 5.0),
        (t0 + pd.Timedelta(hours=6), 6, 9.0, 6.0),
        # batch 3: cum 20 -> bar 2 (closing the empty-opened bar);
        # bar 3 is jumped clean over; cum 45 -> bar 4 stays open
        (t0 + pd.Timedelta(hours=7), 7, 25.0, 7.0),
        (t0 + pd.Timedelta(hours=8), 8, 1.0, 8.0),
    ]
    schema = "ts timestamp, eid long, qty double, price double"
    for i, sl in enumerate((rows[:3], rows[3:6], rows[6:])):
        spark.createDataFrame(
            pd.DataFrame(sl, columns=cols), schema
        ).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "*"))
    )
    barred = streaming_volume_bars(
        stream,
        ordered_on="ts",
        volume_col="qty",
        threshold=10.0,
        tiebreak="eid",
        value_col="price",
    )
    q = (
        barred.writeStream.format("memory")
        .queryName("vb_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "vb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("vb_out")
        .orderBy("bin_id")
        .toPandas()
        .reset_index(drop=True)
    )

    # batch ground truth: same rows, one shot; drop the OPEN last bar
    bdf = spark.createDataFrame(pd.DataFrame(rows, columns=cols), schema)
    batch = (
        volume_bars(bdf, "ts", "qty", threshold=10.0, tiebreak=["eid"])
        .groupBy("bin_id")
        .agg(
            F.min("ts").alias("bin_start"),
            F.max("ts").alias("bin_end"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("sum_vol"),
            F.sum("price").alias("sum_val"),
        )
        .orderBy("bin_id")
        .toPandas()
    )
    exp = batch.iloc[:-1].reset_index(drop=True)  # open bar withheld
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # the bar spanning batches 1-2 folded its carried partial
    bar0 = got[got["bin_id"] == 0].iloc[0]
    assert bar0["n_rows"] == 5 and bar0["sum_vol"] == 11.0
    # bar 2 (opened empty at the exact acc=20 boundary) closed w/ row 7
    assert 2 in set(got["bin_id"])
    # the jumped-over bar 3 has no rows on either side
    assert 3 not in set(got["bin_id"])
    # bar 4 (open) is withheld
    assert got["bin_id"].max() == 2


def test_streaming_volume_bars_per_key_fanout(spark, scratch):
    """The scalable per-key form: independent accumulators per key
    (state fan-out like AggStream's filter fan-out), each key's bars
    equal to its own batch volume_bars minus its open bar — keys
    accumulate independently across micro-batch boundaries."""
    from oups_spark.operators.sessionize import volume_bars
    from oups_spark.streaming.stateful import streaming_volume_bars

    src = os.path.join(scratch, "vbk_src")
    os.makedirs(src, exist_ok=True)
    cols = ["sym", "ts", "eid", "qty"]
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    # two symbols with different volume profiles; threshold 10
    for h, (qa, qb) in enumerate([(4, 7), (4, 7), (4, 7), (4, 7), (9, 2)]):
        rows.append(("a", t0 + pd.Timedelta(hours=h), (eid := eid + 1), float(qa)))
        rows.append(("b", t0 + pd.Timedelta(hours=h), (eid := eid + 1), float(qb)))
    schema = "sym string, ts timestamp, eid long, qty double"
    for i, sl in enumerate((rows[:4], rows[4:])):
        spark.createDataFrame(
            pd.DataFrame(sl, columns=cols), schema
        ).coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "*"))
    )
    barred = streaming_volume_bars(
        stream,
        ordered_on="ts",
        volume_col="qty",
        threshold=10.0,
        tiebreak="eid",
        key="sym",
    )
    q = (
        barred.writeStream.format("memory")
        .queryName("vbk_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "vbk_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("vbk_out")
        .orderBy("sym", "bin_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert set(got.columns) == {
        "sym", "bin_id", "bin_start", "bin_end", "n_rows", "sum_vol"
    }

    # per-key batch ground truth, open bar dropped per key
    bdf = spark.createDataFrame(pd.DataFrame(rows, columns=cols), schema)
    frames = []
    for sym in ("a", "b"):
        one = (
            volume_bars(
                bdf.filter(F.col("sym") == sym),
                "ts", "qty", threshold=10.0, tiebreak=["eid"],
            )
            .groupBy("bin_id")
            .agg(
                F.min("ts").alias("bin_start"),
                F.max("ts").alias("bin_end"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("qty").alias("sum_vol"),
            )
            .orderBy("bin_id")
            .toPandas()
        )
        one.insert(0, "sym", sym)
        # each key's OPEN bar = floor(total volume / threshold); here
        # both keys' accumulators sit exactly in a fresh empty bar, so
        # every row-bearing bar is closed and none is withheld
        total = sum(q for s, _, _, q in rows if s == sym)
        frames.append(one[one["bin_id"] < int(total // 10)])
    exp = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # the keys genuinely diverged (different bar boundaries)
    assert got[got["sym"] == "a"]["n_rows"].tolist() != \
        got[got["sym"] == "b"]["n_rows"].tolist()


def test_streaming_volume_bars_rejects_out_of_order_batch(spark, scratch):
    """Global-order guard (round-13 ADVICE): closed bars emit
    irrevocably, so a micro-batch starting BEFORE the last folded row
    must raise (the reference AggStream's disorder rejection), not
    silently misassign bars. Delivered here via latestFirst=true,
    which feeds the newest source file first."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from oups_spark.streaming.stateful import streaming_volume_bars

    src = os.path.join(scratch, "ooo_src")
    os.makedirs(src, exist_ok=True)
    cols = ["ts", "eid", "qty"]
    t0 = pd.Timestamp("2024-01-01")
    schema = "ts timestamp, eid long, qty double"
    early = [(t0 + pd.Timedelta(hours=h), h, 6.0) for h in range(1, 4)]
    late = [(t0 + pd.Timedelta(hours=h), h, 6.0) for h in range(4, 7)]
    for name, sl in (("b0", early), ("b1", late)):
        spark.createDataFrame(
            pd.DataFrame(sl, columns=cols), schema
        ).coalesce(1).write.parquet(os.path.join(src, name))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "true")  # newest file first = disorder
        .parquet(os.path.join(src, "*"))
    )
    barred = streaming_volume_bars(
        stream, ordered_on="ts", volume_col="qty", threshold=10.0,
        tiebreak="eid",
    )
    q = (
        barred.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="before the last folded row"):
        q.awaitTermination()
