"""Segment aggregation semantics (FIXTURES F1): time bins with the 5
agg funcs, empty-bin null emission, closed/label conventions,
row-count bins, and hand-golden snapshot cases (risk register item 3:
snapshot off-by-ones silently corrupt results — hand-verify)."""

from __future__ import annotations

import pandas as pd
import pytest

from oups_spark.operators.segment import (
    row_count_bin_agg,
    segment_agg,
    snapshot_agg,
)

AGG = {
    "first_val": ("val", "first"),
    "last_val": ("val", "last"),
    "min_val": ("val", "min"),
    "max_val": ("val", "max"),
    "sum_val": ("val", "sum"),
}


@pytest.fixture(scope="module")
def f1(spark):
    """F1 shape: duplicate timestamps, a gap longer than one bin,
    negative values, no zeros."""
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:05",
                    "2024-01-01 00:15",
                    "2024-01-01 00:15",  # duplicate ts
                    "2024-01-01 00:40",
                    "2024-01-01 01:10",
                    # gap: hour 02 empty
                    "2024-01-01 03:00",  # exactly on the hour edge
                    "2024-01-01 03:30",
                ]
            ),
            "id": [1, 2, 3, 4, 5, 6, 7],
            "val": [1.0, 2.0, -3.0, 4.0, 5.0, 6.0, 7.0],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_time_bins_left_with_empty(spark, f1):
    df, pdf = f1
    got = segment_agg(
        df, "ts", AGG, bin_by="1h", closed="left", label="left",
        empty_bins=True, tiebreak=["id"],
    ).toPandas()
    exp = (
        pdf.set_index("ts")
        .resample("1h", closed="left", label="left")["val"]
        .agg(["first", "last", "min", "max", "sum"])
    )
    # resample emits sum=0.0 for empty bins; reference semantics are
    # null (NULL_DICT, cumsegagg.py:42) — which is what we emit.
    assert list(got["bin"]) == list(exp.index)
    assert got.loc[2, "bin"] == pd.Timestamp("2024-01-01 02:00")
    assert pd.isna(got.loc[2, "sum_val"]) and pd.isna(got.loc[2, "first_val"])
    nonempty = got.drop(index=2)
    for ours, theirs in [("first_val", "first"), ("last_val", "last"),
                         ("min_val", "min"), ("max_val", "max"), ("sum_val", "sum")]:
        assert list(nonempty[ours]) == list(exp.drop(index=exp.index[2])[theirs]), ours


def test_time_bins_right_edge_assignment(spark, f1):
    df, _ = f1
    got = segment_agg(
        df, "ts", {"sum_val": ("val", "sum")}, bin_by="1h",
        closed="right", label="right", tiebreak=["id"],
    ).toPandas()
    # closed='right': (start, end] — the 03:00 row joins the bin
    # labeled 03:00 (i.e. (02:00, 03:00]); 03:30 is in (03:00, 04:00]
    by_bin = dict(zip(got["bin"], got["sum_val"]))
    assert by_bin[pd.Timestamp("2024-01-01 03:00")] == 6.0
    assert by_bin[pd.Timestamp("2024-01-01 04:00")] == 7.0
    assert by_bin[pd.Timestamp("2024-01-01 01:00")] == 4.0  # 00:05..00:40


def test_first_last_tiebreak_on_duplicate_ts(spark, f1):
    df, _ = f1
    got = segment_agg(
        df, "ts", AGG, bin_by="1h", tiebreak=["id"]
    ).toPandas()
    row0 = got[got["bin"] == pd.Timestamp("2024-01-01 00:00")].iloc[0]
    # duplicate ts 00:15: id=2 (val=2.0) comes before id=3 (val=-3.0)
    assert row0["first_val"] == 1.0
    assert row0["last_val"] == 4.0
    assert row0["min_val"] == -3.0 and row0["sum_val"] == 4.0


def test_row_count_bins(spark):
    n = 10
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "id": range(n),
            "val": [float(i + 1) for i in range(n)],
        }
    )
    got = row_count_bin_agg(
        spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
        n=4, tiebreak=["id"],
    ).toPandas()
    assert list(got["bin_id"]) == [0, 1, 2]
    assert list(got["sum_val"]) == [1 + 2 + 3 + 4, 5 + 6 + 7 + 8, 9 + 10.0]
    assert list(got["bin_label"]) == [
        pd.Timestamp("2024-01-01 00:00"),
        pd.Timestamp("2024-01-01 00:04"),
        pd.Timestamp("2024-01-01 00:08"),
    ]


def test_snapshot_hand_golden_closed_left(spark):
    """Bins 1h, snaps 15min, closed-left: a snapshot at instant s
    observes ts < s; snapshot at bin end observes the full bin."""
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:05", "2024-01-01 00:15", "2024-01-01 00:40",
                 "2024-01-01 01:10"]
            ),
            "id": [1, 2, 3, 4],
            "val": [1.0, 2.0, 3.0, 4.0],
        }
    )
    got = snapshot_agg(
        spark.createDataFrame(pdf), "ts", AGG, bin_by="1h", snap_by="15min",
        snap_closed="left", tiebreak=["id"],
    ).toPandas()
    h0 = got[got["bin"] == pd.Timestamp("2024-01-01 00:00")].set_index("snap")
    s = pd.Timestamp
    # 00:15 snapshot excludes the 00:15 row (closed left)
    assert h0.loc[s("2024-01-01 00:15")][["first_val", "last_val", "sum_val"]].tolist() == [1.0, 1.0, 1.0]
    assert h0.loc[s("2024-01-01 00:30")]["sum_val"] == 3.0
    assert h0.loc[s("2024-01-01 00:45")]["sum_val"] == 6.0
    assert h0.loc[s("2024-01-01 01:00")]["sum_val"] == 6.0  # forward-fill, full bin
    assert h0.loc[s("2024-01-01 01:00")]["last_val"] == 3.0
    # second bin restarts the accumulator (bins reset, cumsegagg.py:186-196)
    h1 = got[got["bin"] == pd.Timestamp("2024-01-01 01:00")].set_index("snap")
    assert h1.loc[s("2024-01-01 01:15")]["sum_val"] == 4.0
    assert h1.loc[s("2024-01-01 01:15")]["first_val"] == 4.0
    assert h1.loc[s("2024-01-01 02:00")]["sum_val"] == 4.0


def test_snapshot_closed_right_includes_instant(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:15"]),
            "id": [1, 2],
            "val": [1.0, 2.0],
        }
    )
    got = snapshot_agg(
        spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
        bin_by="1h", snap_by="15min", snap_closed="right", tiebreak=["id"],
    ).toPandas()
    h0 = got[got["bin"] == pd.Timestamp("2024-01-01 00:00")].set_index("snap")
    assert h0.loc[pd.Timestamp("2024-01-01 00:15")]["sum_val"] == 3.0  # includes 00:15


def test_snapshot_empty_leading_instants_are_null(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:40"]),
            "id": [1],
            "val": [5.0],
        }
    )
    got = snapshot_agg(
        spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
        bin_by="1h", snap_by="15min", tiebreak=["id"],
    ).toPandas().set_index("snap")
    assert pd.isna(got.loc[pd.Timestamp("2024-01-01 00:15")]["sum_val"])
    assert pd.isna(got.loc[pd.Timestamp("2024-01-01 00:30")]["sum_val"])
    assert got.loc[pd.Timestamp("2024-01-01 00:45")]["sum_val"] == 5.0
    assert got.loc[pd.Timestamp("2024-01-01 01:00")]["sum_val"] == 5.0
