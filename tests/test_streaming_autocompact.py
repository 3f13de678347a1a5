"""Streaming sink auto-maintenance (round-14, VERDICT r13 ask #3):
a long-running sink commits one small file set per micro-batch and
must coalesce as it goes — ``max_n_off_target_rgs`` folds the
trailing undersized run into each write (reference auto-coalescing,
``write.py:204-217``) and ``compact_every`` adds a periodic
maintenance commit. Maintenance must bound the file count WITHOUT
changing any query result, and a crash mid-compact must converge on
restart (the compact is its own commit after the batch's data
commit; Spark redelivers the batch, keep-last absorbs it)."""

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from oups_spark.store.dataset import OrderedDataset
from oups_spark.streaming.native import (
    streaming_segment_agg,
    write_stream_to_dataset,
)

SCHEMA = "ts timestamp, val double"
AGG = {"sum_val": ("val", "sum"), "max_val": ("val", "max")}


def _mk_rows(n=5 * 96, start="2024-01-01"):
    # 5 days at 15-min cadence -> 120 hourly bins
    return pd.DataFrame(
        {
            "ts": pd.Timestamp(start)
            + pd.to_timedelta([i * 15 for i in range(n)], "min"),
            "val": [float((i * 13) % 37 - 18) for i in range(n)],
        }
    )


def _write_chunks(spark, pdf, src, n_chunks=4):
    cuts = pd.date_range(pdf["ts"].min(), pdf["ts"].max(), periods=n_chunks + 1)
    for i in range(n_chunks):
        lo, hi = cuts[i], cuts[i + 1]
        part = pdf[(pdf["ts"] >= lo) & ((pdf["ts"] < hi) | (i == n_chunks - 1))]
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )


def _run(spark, src, path, ckpt, **sink_kwargs):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(src, "*"))
    )
    agged = streaming_segment_agg(
        stream, "ts", AGG, bin_by="1h", watermark="0 seconds"
    )
    write_stream_to_dataset(
        agged, path, checkpoint_dir=ckpt,
        row_group_target_size=25, **sink_kwargs,
    )


def _one_shot(spark, frame):
    df = spark.createDataFrame(frame, SCHEMA)
    wm = frame["ts"].max()
    return (
        df.groupBy(F.date_trunc("hour", "ts").alias("bin"))
        .agg(F.sum("val").alias("sum_val"), F.max("val").alias("max_val"))
        .filter(F.col("bin") + F.expr("INTERVAL 1 HOUR") <= F.lit(wm))
        .orderBy("bin")
        .toPandas()
        .reset_index(drop=True)
    )


def test_sink_auto_maintenance_bounds_file_count(spark, scratch):
    """Maintained vs unmaintained twin on identical batches: the
    maintained sink's end-state file count must sit near the
    data-sized count and strictly below the unmaintained sink's,
    with bit-identical rows (maintenance never changes results)."""
    pdf = _mk_rows()
    src = os.path.join(scratch, "src")
    _write_chunks(spark, pdf, src)

    plain = os.path.join(scratch, "plain_ds")
    _run(spark, src, plain, os.path.join(scratch, "ckpt_plain"))
    maint = os.path.join(scratch, "maint_ds")
    _run(
        spark, src, maint, os.path.join(scratch, "ckpt_maint"),
        max_n_off_target_rgs=2, compact_every=2,
    )

    n_plain = OrderedDataset(spark, plain).n_files
    ds = OrderedDataset(spark, maint)
    # 119 closed bins / 25-row target -> ~5 data-sized files
    assert ds.n_files <= 7, f"maintenance left {ds.n_files} files"
    assert ds.n_files < n_plain, (ds.n_files, n_plain)

    got = ds.read().toPandas().sort_values("bin", ignore_index=True)
    want = _one_shot(spark, pdf)
    pd.testing.assert_frame_equal(got, want)
    # and the two sinks agree row-for-row
    got_plain = (
        OrderedDataset(spark, plain)
        .read().toPandas().sort_values("bin", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_plain, want)


def test_restart_mid_compact_converges(spark, scratch, monkeypatch):
    """Crash DURING the periodic compact (batch data already
    committed, checkpoint not advanced): the restarted query
    redelivers the batch — keep-last absorbs the replay — and the
    re-run compact completes; final rows equal the one-shot
    statement and the file count stays bounded."""
    pdf = _mk_rows()
    src = os.path.join(scratch, "src")
    _write_chunks(spark, pdf, src)
    path = os.path.join(scratch, "ds")
    ckpt = os.path.join(scratch, "ckpt")

    real_compact = OrderedDataset.compact
    armed = {"on": True}

    def crash_mid_compact(self, *a, **k):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("injected crash mid-compact")
        return real_compact(self, *a, **k)

    monkeypatch.setattr(OrderedDataset, "compact", crash_mid_compact)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((RuntimeError, StreamingQueryException)):
        _run(
            spark, src, path, ckpt,
            max_n_off_target_rgs=2, compact_every=2,
        )
    monkeypatch.setattr(OrderedDataset, "compact", real_compact)

    # the crashed batch's DATA commit is durable; restart redelivers
    # the batch and completes the stream
    _run(
        spark, src, path, ckpt,
        max_n_off_target_rgs=2, compact_every=2,
    )
    ds = OrderedDataset(spark, path)
    got = ds.read().toPandas().sort_values("bin", ignore_index=True)
    pd.testing.assert_frame_equal(got, _one_shot(spark, pdf))
    assert ds.n_files <= 7, f"maintenance left {ds.n_files} files"
