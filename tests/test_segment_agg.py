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


# ---------------------------------------------------------------- calendar
# Month/year bins must be calendar-exact: a 30/365-day approximation
# mislabels right edges (Feb!) and drifts the empty-bin grid.


@pytest.fixture(scope="module")
def months(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-15 12:00",
                    "2024-02-10 08:00",   # leap February (29 days)
                    "2024-02-29 23:59",   # last day of leap Feb
                    "2024-03-01 00:00",   # exactly on a month edge
                    # gap: April + May empty
                    "2024-06-20 06:00",
                ]
            ),
            "id": [1, 2, 3, 4, 5],
            "val": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_month_bins_right_label_calendar_exact(spark, months):
    df, pdf = months
    got = segment_agg(
        df, "ts", {"sum_val": ("val", "sum")}, bin_by="MS",
        closed="left", label="right", empty_bins=True, tiebreak=["id"],
    ).toPandas()
    exp = (
        pdf.set_index("ts")
        .resample("MS", closed="left", label="right")["val"]
        .sum(min_count=1)
    )
    # pandas label='right' for MS gives the NEXT month start — exactly
    # add_months(start, 1): Feb bin labeled Mar 1, not Mar 2 (30-day).
    assert list(got["bin"]) == list(exp.index)
    assert [None if pd.isna(v) else v for v in got["sum_val"]] == [
        None if pd.isna(v) else v for v in exp
    ]
    # the empty-bin calendar spans Feb..Jul labels with Apr/May/Jun gaps
    assert pd.Timestamp("2024-05-01") in set(got["bin"])
    assert got.loc[got["bin"] == pd.Timestamp("2024-05-01"), "sum_val"].isna().all()


def test_month_bins_closed_right(spark, months):
    df, pdf = months
    got = segment_agg(
        df, "ts", {"sum_val": ("val", "sum")}, bin_by="MS",
        closed="right", label="left", tiebreak=["id"],
    ).toPandas()
    # closed='right': Mar 1 00:00 belongs to the February bin
    feb = got.loc[got["bin"] == pd.Timestamp("2024-02-01"), "sum_val"]
    assert feb.iloc[0] == pytest.approx(2.0 + 3.0 + 4.0)


def test_year_bins_right_label(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2023-06-01", "2024-02-29", "2025-12-31"]),
            "id": [1, 2, 3],
            "val": [1.0, 2.0, 4.0],
        }
    )
    got = segment_agg(
        spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
        bin_by="YS", label="right", empty_bins=True, tiebreak=["id"],
    ).toPandas()
    assert list(got["bin"]) == list(
        pd.to_datetime(["2024-01-01", "2025-01-01", "2026-01-01"])
    )
    assert list(got["sum_val"]) == [1.0, 2.0, 4.0]


def test_snapshot_month_bins_daily_snaps(spark):
    """Calendar-month bins with daily snapshots: the in-bin grid has
    31 instants for January and 29 for leap February, and cumulative
    sums reset at each month boundary."""
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-05 12:00", "2024-01-20 06:00", "2024-02-10 00:00",
                 "2024-02-28 18:00"]
            ),
            "id": [1, 2, 3, 4],
            "val": [1.0, 2.0, 4.0, 8.0],
        }
    )
    got = snapshot_agg(
        spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
        bin_by="MS", snap_by="1D", tiebreak=["id"],
    ).toPandas()
    jan = got[got["bin"] == pd.Timestamp("2024-01-01")]
    feb = got[got["bin"] == pd.Timestamp("2024-02-01")]
    assert len(jan) == 31 and len(feb) == 29
    # grid is (bin_start, bin_end]: first January snap is Jan 2 00:00,
    # last is Feb 1 00:00 (observing the closing bin)
    assert jan["snap"].iloc[0] == pd.Timestamp("2024-01-02")
    assert jan["snap"].iloc[-1] == pd.Timestamp("2024-02-01")
    # cumulative within the bin, reset across bins
    assert jan.loc[jan["snap"] == pd.Timestamp("2024-01-06"), "sum_val"].iloc[0] == 1.0
    assert jan["sum_val"].iloc[-1] == 3.0
    assert feb.loc[feb["snap"] == pd.Timestamp("2024-02-11"), "sum_val"].iloc[0] == 4.0
    assert feb["sum_val"].iloc[-1] == 12.0
    # snapshots before any data in the bin are null
    assert pd.isna(jan.loc[jan["snap"] == pd.Timestamp("2024-01-03"), "sum_val"]).all()


def test_snapshot_calendar_bin_rejects_nondividing_snap(spark):
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-05"]), "id": [1], "val": [1.0]}
    )
    with pytest.raises(ValueError, match="divide a day"):
        snapshot_agg(
            spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
            bin_by="MS", snap_by="7h",
        )


def test_multi_month_quarter_bins(spark):
    """3MS = standard quarters anchored at Jan (months-since-epoch
    modulo; same grid as DuckDB time_bucket(INTERVAL '3 months')) —
    NOT pandas resample's data-start anchoring."""
    ts = pd.to_datetime(
        ["2023-11-20", "2024-01-05", "2024-02-28", "2024-03-31", "2024-04-01"]
    )
    pdf = pd.DataFrame({"ts": ts, "val": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = segment_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")}, bin_by="3MS"
    ).toPandas()
    assert list(out["bin"]) == list(
        pd.to_datetime(["2023-10-01", "2024-01-01", "2024-04-01"])
    )
    assert list(out["s"]) == [1.0, 9.0, 5.0]


def test_biennial_bins_and_scalar_parity(spark):
    from oups_spark.functions.dates import floor_ts_scalar

    ts = pd.to_datetime(["1991-06-01", "1992-01-01", "1993-12-31", "1994-01-01"])
    pdf = pd.DataFrame({"ts": ts, "val": [1.0, 1.0, 1.0, 1.0]})
    out = segment_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")}, bin_by="2Y"
    ).toPandas()
    assert list(out["bin"]) == list(pd.to_datetime(["1990-01-01", "1992-01-01", "1994-01-01"]))
    assert list(out["s"]) == [1.0, 2.0, 1.0]
    for t in ts:
        assert floor_ts_scalar(t, "2Y") == pd.Timestamp(f"{t.year - t.year % 2}-01-01")


def test_origin_offset_anchored_bins(spark):
    """4h bins shifted to 09:30 (TimeGrouper origin/offset): edges at
    09:30/13:30/..., matching pandas resample(offset=...)."""
    ts = pd.to_datetime(
        ["2024-01-01 09:29", "2024-01-01 09:30", "2024-01-01 13:29",
         "2024-01-01 13:30", "2024-01-02 01:00"]
    )
    pdf = pd.DataFrame({"ts": ts, "val": [1.0, 2.0, 4.0, 8.0, 16.0]})
    out = segment_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
        bin_by="4h", offset="9h30min",
    ).toPandas()
    expect = (
        pdf.set_index("ts")["val"]
        .resample("4h", offset="9h30min")
        .sum(min_count=1)
        .dropna()
    )
    assert list(out["bin"]) == list(expect.index)
    assert list(out["s"]) == list(expect.values)
    # origin as a timestamp anchors identically
    out2 = segment_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
        bin_by="4h", origin="2000-01-01 09:30:00",
    ).toPandas()
    assert out.equals(out2)


def test_origin_rejected_for_calendar_freq(spark):
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-05"]), "val": [1.0]}
    )
    with pytest.raises(ValueError, match="fixed frequency"):
        segment_agg(
            spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
            bin_by="MS", offset="30min",
        ).collect()


def test_snapshot_calendar_snaps_in_year_bins(spark):
    """Monthly snapshots inside yearly bins: cumulative YTD at every
    month start, quiet months forward-filled, 12 snaps per bin."""
    ts = pd.to_datetime(["2024-01-15", "2024-03-02", "2024-03-20", "2024-11-30"])
    pdf = pd.DataFrame({"ts": ts, "val": [1.0, 2.0, 4.0, 8.0]})
    out = snapshot_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
        bin_by="1Y", snap_by="MS", snap_closed="left",
    ).toPandas()
    assert len(out) == 12
    assert list(out["snap"]) == list(
        pd.date_range("2024-02-01", "2025-01-01", freq="MS")
    )
    got = dict(zip(out["snap"].dt.strftime("%Y-%m-%d"), out["s"]))
    assert got["2024-02-01"] == 1.0      # jan row visible
    assert got["2024-03-01"] == 1.0      # quiet feb ffilled
    assert got["2024-04-01"] == 7.0      # both march rows
    assert got["2024-11-01"] == 7.0      # quiet months ffilled
    assert got["2024-12-01"] == 15.0     # nov row lands
    assert got["2025-01-01"] == 15.0     # year-end snapshot


def test_snapshot_calendar_snap_rejects_fixed_bin(spark):
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-05"]), "val": [1.0]}
    )
    with pytest.raises(ValueError, match="calendar snap_by"):
        snapshot_agg(
            spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
            bin_by="1D", snap_by="MS",
        )


# ------------------------------------------------------------ explicit edges


def test_explicit_edges_closed_left_and_right(spark, f1):
    df, pdf = f1
    ends = pd.to_datetime(["2024-01-01 00:15", "2024-01-01 01:10", "2024-01-01 02:00"])
    got_l = segment_agg(
        df, "ts", {"sum_val": ("val", "sum")}, bin_by=list(ends),
        closed="left", tiebreak=["id"],
    ).toPandas()
    # closed left: 00:15 rows fall in chunk 1, 01:10 in chunk 2;
    # 03:00/03:30 are past the last end -> dropped
    assert list(got_l["bin"]) == list(ends)
    assert got_l["sum_val"].tolist() == [1.0, 2.0 - 3.0 + 4.0, 5.0]
    got_r = segment_agg(
        df, "ts", {"sum_val": ("val", "sum")}, bin_by=list(ends),
        closed="right", tiebreak=["id"],
    ).toPandas()
    # closed right: 00:15 rows included in chunk 0, 01:10 in chunk 1
    assert got_r["sum_val"].tolist() == [1.0 + 2.0 - 3.0, 4.0 + 5.0, None] or (
        got_r["sum_val"].tolist()[:2] == [0.0, 9.0]
        and pd.isna(got_r["sum_val"].iloc[2])
    )


def test_explicit_edges_labels_tuple_and_empty_chunks(spark, f1):
    df, pdf = f1
    ends = pd.to_datetime(
        ["2024-01-01 00:30", "2024-01-01 00:31", "2024-01-01 04:00"]
    )
    labels = ["a", "b", "c"]
    got = segment_agg(
        df, "ts", {"sum_val": ("val", "sum")}, bin_by=(labels, list(ends)),
        closed="left", tiebreak=["id"],
    ).toPandas()
    assert got["bin"].tolist() == labels
    # chunk b (00:30, 00:31) is empty -> null row, not dropped
    assert pd.isna(got.loc[got["bin"] == "b", "sum_val"]).all()
    assert got.loc[got["bin"] == "a", "sum_val"].iloc[0] == pytest.approx(0.0)
    assert got.loc[got["bin"] == "c", "sum_val"].iloc[0] == pytest.approx(22.0)


def test_edge_bin_udf_path_matches_codegen_path(spark, f1):
    from oups_spark.operators.segment import assign_edge_bin
    import pyspark.sql.functions as F

    df, pdf = f1
    ends = pd.to_datetime(
        ["2024-01-01 00:15", "2024-01-01 01:00", "2024-01-01 03:00"]
    )
    for closed in ("left", "right"):
        jvm = df.select(
            "id", assign_edge_bin(F.col("ts"), list(ends), closed=closed).alias("i")
        ).toPandas().sort_values("id")
        udf = df.select(
            "id",
            assign_edge_bin(
                F.col("ts"), list(ends), closed=closed, max_codegen_edges=1
            ).alias("i"),
        ).toPandas().sort_values("id")
        assert jvm["i"].tolist() == udf["i"].tolist(), closed


def test_explicit_edges_unsorted_rejected(spark, f1):
    df, _ = f1
    with pytest.raises(ValueError, match="sorted"):
        segment_agg(
            df, "ts", {"s": ("val", "sum")},
            bin_by=list(pd.to_datetime(["2024-01-02", "2024-01-01"])),
            closed="left",
        )


def test_snapshot_anchored_grids(spark):
    """origin/offset anchor BOTH snapshot and bin grids: daily bins
    starting 09:30 with 4h-spaced snapshots — snap instants land on
    09:30-anchored edges and the bin end is the last snapshot."""
    ts = pd.to_datetime(
        ["2024-01-01 09:30", "2024-01-01 10:00", "2024-01-01 14:00",
         "2024-01-02 09:00"]
    )
    pdf = pd.DataFrame({"ts": ts, "val": [1.0, 2.0, 4.0, 8.0]})
    out = snapshot_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
        bin_by="1D", snap_by="4h", snap_closed="left", offset="9h30min",
    ).toPandas()
    # one full bin [01-01 09:30, 01-02 09:30); snaps at 13:30, 17:30,
    # 21:30, 01:30, 05:30, 09:30
    b0 = out[out["bin"] == pd.Timestamp("2024-01-01 09:30")]
    assert list(b0["snap"]) == list(
        pd.to_datetime(["2024-01-01 13:30", "2024-01-01 17:30",
                        "2024-01-01 21:30", "2024-01-02 01:30",
                        "2024-01-02 05:30", "2024-01-02 09:30"])
    )
    got = dict(zip(b0["snap"].dt.strftime("%m-%d %H:%M"), b0["s"]))
    assert got["01-01 13:30"] == 3.0   # 09:30 + 10:00 rows
    assert got["01-01 17:30"] == 7.0   # + 14:00 row
    assert got["01-02 09:30"] == 15.0  # + next-day 09:00 row (same bin)


def test_snapshot_anchoring_rejects_calendar(spark):
    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-01-05"]), "val": [1.0]})
    with pytest.raises(ValueError, match="fixed bin_by AND snap_by"):
        snapshot_agg(
            spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")},
            bin_by="MS", snap_by="6h", offset="30min",
        )


def test_multi_week_bins_monday_anchored(spark):
    """2W bins: Monday-anchored biweekly grid consistent with
    date_trunc('week') at n=1; labels step exactly 14 days."""
    from oups_spark.functions.dates import floor_ts_scalar

    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-14", "2024-01-15", "2024-01-28", "2024-01-29"]
    )  # 2024-01-01 is a Monday on the biweekly grid (epoch-Monday + 2820w)
    pdf = pd.DataFrame({"ts": ts, "val": [1.0, 2.0, 4.0, 8.0, 16.0]})
    out = segment_agg(
        spark.createDataFrame(pdf), "ts", {"s": ("val", "sum")}, bin_by="2W"
    ).toPandas()
    assert list(out["bin"]) == list(
        pd.to_datetime(["2024-01-01", "2024-01-15", "2024-01-29"])
    )
    assert list(out["s"]) == [3.0, 12.0, 16.0]
    for t in ts:
        f = floor_ts_scalar(t, "2W")
        assert f.weekday() == 0 and (t - f).days < 14


def test_snapshot_right_row_exactly_on_bin_start_observed(spark):
    """Round-4 regression: a row at exactly the bin start under
    snap_closed='right' sat on a snapshot instant owned by the
    PREVIOUS bin (snap-before-bin) and was silently dropped from
    every snapshot of its own bin."""
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-02 00:00", "2024-01-02 03:00"]),
            "id": [1, 2],
            "val": [10.0, 1.0],
        }
    )
    got = snapshot_agg(
        spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
        bin_by="1D", snap_by="6h", snap_closed="right", tiebreak=["id"],
    ).toPandas().set_index("snap")
    assert got.loc[pd.Timestamp("2024-01-02 06:00")]["sum_val"] == 11.0
    assert got.loc[pd.Timestamp("2024-01-03 00:00")]["sum_val"] == 11.0


def test_snapshot_explicit_edges(spark):
    """snap_by as an explicit instant sequence: arbitrary irregular
    grid, day-boundary instants observe the CLOSING bin, rows whose
    next instant lies past their bin's end are never observed."""
    edges = list(pd.to_datetime([
        "2024-01-02 02:00", "2024-01-02 11:30",
        "2024-01-03 00:00", "2024-01-03 16:00",
    ]))
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-02 00:00", "2024-01-02 01:00", "2024-01-02 12:00",
                 "2024-01-03 10:00", "2024-01-03 20:00"]
            ),
            "id": [1, 2, 3, 4, 5],
            "val": [10.0, 1.0, 100.0, 7.0, 1000.0],
        }
    )
    for closed in ("left", "right"):
        got = snapshot_agg(
            spark.createDataFrame(pdf), "ts", {"sum_val": ("val", "sum")},
            bin_by="1D", snap_by=edges, snap_closed=closed, tiebreak=["id"],
        ).toPandas()
        idx = got.set_index(["bin", "snap"])["sum_val"]
        s = pd.Timestamp
        assert idx[(s("2024-01-02"), s("2024-01-02 02:00"))] == 11.0
        assert idx[(s("2024-01-02"), s("2024-01-02 11:30"))] == 11.0
        # midnight instant observes the CLOSING Jan-2 bin incl. 12:00 row
        assert idx[(s("2024-01-02"), s("2024-01-03 00:00"))] == 111.0
        # Jan-3 bin: 10:00 row observed at 16:00; 20:00 row never
        # observed (no later instant inside the Jan-3 bin)
        assert idx[(s("2024-01-03"), s("2024-01-03 16:00"))] == 7.0
        assert len(got) == 4

    # 'right' with a row exactly on a mid-bin instant: included there
    pdf2 = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-02 02:00"]), "id": [1], "val": [5.0]}
    )
    got2 = snapshot_agg(
        spark.createDataFrame(pdf2), "ts", {"sum_val": ("val", "sum")},
        bin_by="1D", snap_by=edges, snap_closed="right", tiebreak=["id"],
    ).toPandas().set_index("snap")
    assert got2.loc[pd.Timestamp("2024-01-02 02:00")]["sum_val"] == 5.0
    # 'left' excludes it at its own instant, sees it at the next
    got3 = snapshot_agg(
        spark.createDataFrame(pdf2), "ts", {"sum_val": ("val", "sum")},
        bin_by="1D", snap_by=edges, snap_closed="left", tiebreak=["id"],
    ).toPandas().set_index("snap")
    assert pd.isna(got3.loc[pd.Timestamp("2024-01-02 02:00")]["sum_val"])
    assert got3.loc[pd.Timestamp("2024-01-02 11:30")]["sum_val"] == 5.0


def test_snapshot_edges_validation(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]), "val": [1.0]})
    )
    with pytest.raises(ValueError, match="ascending"):
        snapshot_agg(
            df, "ts", {"s": ("val", "sum")}, bin_by="1D",
            snap_by=list(pd.to_datetime(["2024-01-02", "2024-01-02"])),
        )
    with pytest.raises(ValueError, match="non-empty"):
        snapshot_agg(df, "ts", {"s": ("val", "sum")}, bin_by="1D", snap_by=[])
    with pytest.raises(ValueError, match="anchoring"):
        snapshot_agg(
            df, "ts", {"s": ("val", "sum")}, bin_by="1D",
            snap_by=list(pd.to_datetime(["2024-01-02"])), offset="9h",
        )
