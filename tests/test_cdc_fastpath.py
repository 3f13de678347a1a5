"""Round-14 optimization pin: the CDC merge_latest driver fast path
(Arrow probe + driver-side keep-last + driver-written tmp bucket dirs)
must produce exactly the same state table and maintained aggregates as
the distributed plan it replaces."""

import os

import pyspark.sql.functions as F
import pytest

import oups_spark.streaming.cdc as cdc
from oups_spark.streaming.cdc import cdc_merge_batch, read_current
from oups_spark.streaming.ivm import (
    cdc_merge_batch_with_agg,
    cdc_merge_batch_with_minmax,
    read_agg,
    read_minmax,
)


def _changelog(spark):
    """Two batches with updates, deletes, a NULL-valued row and a
    NULL group key — the cases the keep-last/IVM semantics hinge on."""
    rows1 = [
        ("u1", 1, 10, "a", 1.5, False),
        ("u2", 1, 11, "b", 2.5, False),
        ("u3", 2, 12, "a", None, False),
        ("u4", 2, 13, None, 4.0, False),
    ]
    rows2 = [
        ("u1", 3, 20, "b", 9.0, False),   # update: moves group a -> b
        ("u2", 3, 21, "b", 0.0, True),    # delete tombstone
        ("u5", 1, 22, "a", 5.0, False),   # late row, older than nothing
        ("u4", 1, 23, "a", 7.0, False),   # older than u4's existing row
    ]
    cols = ["user_id", "ts", "event_id", "event_type", "value", "is_delete"]
    return (
        spark.createDataFrame(rows1, cols),
        spark.createDataFrame(rows2, cols),
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def _run_state(spark, batches, path, force_distributed, monkeypatch):
    if force_distributed:
        monkeypatch.setattr(cdc, "_probe_batch", lambda b: None)
    for bdf in batches:
        cdc_merge_batch(
            spark, bdf, path,
            key="user_id", order_cols=["ts", "event_id"], n_buckets=4,
        )
    monkeypatch.undo()
    return _rows(read_current(spark, path, delete_col="is_delete"))


def test_fast_path_state_equals_distributed(spark, tmp_path, monkeypatch):
    b1, b2 = _changelog(spark)
    fast = _run_state(
        spark, [b1, b2], str(tmp_path / "fast"), False, monkeypatch
    )
    slow = _run_state(
        spark, [b1, b2], str(tmp_path / "slow"), True, monkeypatch
    )
    assert fast == slow
    # keep-last picked the right rows: u1 updated, u2 tombstoned (gone
    # from read_current), u4's older row lost
    d = {r[0]: r for r in fast}
    assert d["u1"][1:3] == (3, 20)
    assert "u2" not in d
    assert d["u4"][1:3] == (2, 13)


def test_fast_path_engages_and_fallback_on_big_state(
    spark, tmp_path, monkeypatch
):
    b1, b2 = _changelog(spark)
    path = str(tmp_path / "state")
    cdc_merge_batch(
        spark, b1, path,
        key="user_id", order_cols=["ts", "event_id"], n_buckets=4,
    )
    # fast path wrote the driver-side file names
    assert any(
        f == "part-00000.parquet"
        for d in os.listdir(path)
        for f in os.listdir(os.path.join(path, d))
    )
    # over-cap touched state: probe succeeds but the state read bails
    monkeypatch.setattr(cdc, "_read_buckets_arrow", lambda *a, **k: None)
    cdc_merge_batch(
        spark, b2, path,
        key="user_id", order_cols=["ts", "event_id"], n_buckets=4,
    )
    monkeypatch.undo()
    d = {r[0]: r for r in _rows(read_current(spark, path, delete_col="is_delete"))}
    assert d["u1"][1:3] == (3, 20) and "u2" not in d


@pytest.mark.parametrize("force_distributed", [False, True])
def test_ivm_agg_and_minmax_identical_across_paths(
    spark, tmp_path, monkeypatch, force_distributed
):
    b1, b2 = _changelog(spark)
    base = str(tmp_path / ("dist" if force_distributed else "fast"))
    if force_distributed:
        monkeypatch.setattr(cdc, "_probe_batch", lambda b: None)
    for bdf in (b1, b2):
        cdc_merge_batch_with_agg(
            spark, bdf, base + "/st_a", base + "/agg",
            key="user_id", order_cols=["ts", "event_id"],
            group_col="event_type", value_col="value",
            delete_col="is_delete", n_buckets=4,
        )
        cdc_merge_batch_with_minmax(
            spark, bdf, base + "/st_m", base + "/hist",
            key="user_id", order_cols=["ts", "event_id"],
            group_col="event_type", value_col="value",
            delete_col="is_delete", n_buckets=4,
        )
    monkeypatch.undo()
    agg = _rows(read_agg(spark, base + "/agg"))
    mm = _rows(read_minmax(spark, base + "/hist"))
    # one-shot truth over the final state
    state = read_current(spark, base + "/st_a", delete_col="is_delete")
    fac = 10**6
    expect_agg = _rows(
        state.groupBy(F.col("event_type").alias("g")).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.coalesce(
                    F.sum(F.round(F.col("value") * fac).cast("long")),
                    F.lit(0).cast("long"),
                )
                / F.lit(float(fac)),
                6,
            ).alias("sum_val"),
        )
    )
    assert agg == expect_agg
    expect_mm = _rows(
        state.filter(F.col("value").isNotNull())
        .groupBy(F.col("event_type").alias("g"))
        .agg(
            F.round(
                F.min(F.round(F.col("value") * fac).cast("long"))
                / F.lit(float(fac)),
                6,
            ).alias("min_val"),
            F.round(
                F.max(F.round(F.col("value") * fac).cast("long"))
                / F.lit(float(fac)),
                6,
            ).alias("max_val"),
            F.count(F.lit(1)).cast("long").alias("n_valued"),
        )
    )
    assert mm == expect_mm
