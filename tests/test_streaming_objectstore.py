"""Streaming sink on the object-store backend (round-13): the native
sink's exactly-once story must compose with conditional-put CAS — a
crash AFTER a micro-batch's manifest commit but BEFORE the checkpoint
records the batch makes Spark REDELIVER it on restart, and the
keep-last merge + put-if-match must absorb the replay; a concurrent
batch writer through the same backend must serialize via the CAS."""

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from oups_spark.store.dataset import OrderedDataset
from oups_spark.store.manifest import InMemoryParquetObjectStore
from oups_spark.streaming.native import (
    streaming_segment_agg,
    write_stream_to_dataset,
)

SCHEMA = "ts timestamp, val double"
AGG = {"sum_val": ("val", "sum"), "max_val": ("val", "max")}


def _mk_rows(n=72, start="2024-01-01"):
    return pd.DataFrame(
        {
            "ts": pd.Timestamp(start)
            + pd.to_timedelta([i * 25 for i in range(n)], "min"),
            "val": [float((i * 13) % 37 - 18) for i in range(n)],
        }
    )


def _run(spark, src, path, ckpt, backend):
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
        agged, path, checkpoint_dir=ckpt, backend=backend,
        conflict_retries=3,
    )


def test_crash_after_commit_redelivers_and_converges(
    spark, scratch, monkeypatch
):
    """Kill the sink right after batch 1's CAS commit (data durable,
    checkpoint not advanced): the restarted query REDELIVERS the
    batch; the keep-last merge on the bin label re-lands identical
    rows through a fresh put-if-match, and the final state equals the
    one-shot run. Then a later chunk resumes incrementally from the
    same checkpoint."""
    pdf = _mk_rows()
    cut = pd.Timestamp("2024-01-01 12:00")
    src = os.path.join(scratch, "src")
    path = os.path.join(scratch, "ds")
    ckpt = os.path.join(scratch, "ckpt")
    backend = InMemoryParquetObjectStore()
    spark.createDataFrame(pdf[pdf["ts"] < cut], SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "b1"))

    real_write = OrderedDataset.write
    armed = {"on": True}

    def crash_after_commit(self, *a, **k):
        real_write(self, *a, **k)
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError("injected crash after batch commit")

    monkeypatch.setattr(OrderedDataset, "write", crash_after_commit)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((RuntimeError, StreamingQueryException)):
        _run(spark, src, path, ckpt, backend)
    monkeypatch.setattr(OrderedDataset, "write", real_write)
    # the commit IS durable in the object store (no posix manifest)
    assert OrderedDataset(spark, path, backend=backend).exists

    # restart: Spark redelivers the uncheckpointed batch
    _run(spark, src, path, ckpt, backend)
    got1 = (
        OrderedDataset(spark, path, backend=backend)
        .read().toPandas().sort_values("bin", ignore_index=True)
    )

    def one_shot(frame):
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

    pd.testing.assert_frame_equal(got1, one_shot(pdf[pdf["ts"] < cut]))

    # incremental resume with a second chunk
    spark.createDataFrame(pdf[pdf["ts"] >= cut], SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "b2"))
    _run(spark, src, path, ckpt, backend)
    got2 = (
        OrderedDataset(spark, path, backend=backend)
        .read().toPandas().sort_values("bin", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got2, one_shot(pdf))


def test_concurrent_batch_writer_serializes_via_cas(spark, scratch):
    """A plain batch writer committing through the SAME object-store
    backend between streaming runs: both commits land (generation
    advances per commit), the stream's next run resumes cleanly, and
    the union of rows is exact — CAS serialization, not last-writer-
    wins clobbering."""
    pdf = _mk_rows(48)
    cut = pd.Timestamp("2024-01-01 10:00")
    src = os.path.join(scratch, "src")
    path = os.path.join(scratch, "ds")
    ckpt = os.path.join(scratch, "ckpt")
    backend = InMemoryParquetObjectStore()
    spark.createDataFrame(pdf[pdf["ts"] < cut], SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "b1"))
    _run(spark, src, path, ckpt, backend)
    ds = OrderedDataset(spark, path, backend=backend)
    gen1 = ds.manifest.generation

    # concurrent batch writer: a far-future bin through the same CAS
    extra = pd.DataFrame(
        {"bin": [pd.Timestamp("2030-01-01")], "sum_val": [1.0],
         "max_val": [1.0]}
    )
    OrderedDataset(spark, path, backend=backend).write(
        df=spark.createDataFrame(extra),
        ordered_on="bin",
        duplicates_on=[],
        validate_monotonic=False,
    )

    spark.createDataFrame(pdf[pdf["ts"] >= cut], SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "b2"))
    _run(spark, src, path, ckpt, backend)
    final = OrderedDataset(spark, path, backend=backend)
    assert final.manifest.generation >= gen1 + 2
    got = final.read().toPandas()
    assert pd.Timestamp("2030-01-01") in set(got["bin"])
    # every closed hour of the real data present exactly once
    wm = pdf["ts"].max()
    hours = pdf[pdf["ts"].dt.floor("h") + pd.Timedelta("1h") <= wm][
        "ts"
    ].dt.floor("h").nunique()
    assert (got["bin"] < pd.Timestamp("2030-01-01")).sum() == hours
