"""Calendar / explicit-edge snapshots on the native streaming path
(round-13): streamed tiles re-observed by the batch snapshot kernel
must equal batch ``snapshot_agg`` over the raw rows cut at the final
watermark — for every fold (first/last/min/max/sum) — and the
two-stage unit must converge across an injected crash between the
stages."""

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from oups_spark.operators.segment import snapshot_agg
from oups_spark.store.dataset import OrderedDataset
from oups_spark.streaming.native import streaming_snapshot_calendar_agg

SCHEMA = "ts timestamp, id long, val double"

AGG = {
    "first_val": ("val", "first"),
    "last_val": ("val", "last"),
    "min_val": ("val", "min"),
    "max_val": ("val", "max"),
    "sum_val": ("val", "sum"),
}

# irregular, 6h-aligned snapshot edges across the span (the uneven
# spacing is the point — no frequency string can produce it)
EDGES = [
    pd.Timestamp("2024-01-01 06:00"),
    pd.Timestamp("2024-01-02 18:00"),
    pd.Timestamp("2024-01-03 00:00"),
    pd.Timestamp("2024-01-05 12:00"),
    pd.Timestamp("2024-01-07 06:00"),
    pd.Timestamp("2024-01-08 00:00"),
]


def _rows(n=60):
    # unique, non-boundary timestamps (~3.1h apart over ~8 days) so
    # first/last are tie-free
    return pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01 00:17")
            + pd.to_timedelta([i * 187 for i in range(n)], "min"),
            "id": range(n),
            "val": [float((i * 17) % 23 - 11) for i in range(n)],
        }
    )


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).parquet(os.path.join(src, "*"))


def _norm(df):
    return (
        df.toPandas()
        .sort_values(["bin", "snap"], ignore_index=True)
        [["bin", "snap", *AGG]]
    )


def test_explicit_edges_equal_batch_cut_at_watermark(spark, scratch):
    """Streamed 6h tiles + edge re-observation == batch snapshot_agg
    over the raw rows with ``ts < final watermark``, filtered to
    emitted instants — fixed 2D bins, irregular edges, all five
    folds."""
    pdf = _rows()
    src = os.path.join(scratch, "src")
    spark.createDataFrame(pdf, SCHEMA).coalesce(1).write.parquet(
        os.path.join(src, "b1")
    )
    out = streaming_snapshot_calendar_agg(
        _stream(spark, src), "ts", AGG,
        bin_by="2D", snap_by=EDGES, tile_by="6h",
        base_path=os.path.join(scratch, "unit"),
    )
    got = _norm(out.read())

    # expected final watermark: last closed populated 6h tile's end
    closed = pdf["ts"].dt.floor("6h")
    t_last = pdf["ts"].max().floor("6h")
    wm = closed[closed < t_last].max() + pd.Timedelta("6h")
    exp = _norm(
        snapshot_agg(
            spark.createDataFrame(pdf[pdf["ts"] < wm], SCHEMA),
            "ts", AGG, bin_by="2D", snap_by=EDGES, snap_closed="left",
        ).filter(F.col("snap") <= F.lit(wm))
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_restart_between_stages_and_incremental_converge(
    spark, scratch, monkeypatch
):
    """Crash injected between the tile sink and the snapshot stage:
    re-invocation folds the already-sunk tiles (checkpointed stream is
    a no-op); a later invocation with NEW data replaces stale rows via
    the keep-last merge — both equal the one-shot computation."""

    pdf = _rows()
    cut = pd.Timestamp("2024-01-04")
    src = os.path.join(scratch, "src")
    base = os.path.join(scratch, "unit")
    spark.createDataFrame(pdf[pdf["ts"] < cut], SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "b1"))

    from oups_spark.operators import segment as seg_mod

    real = seg_mod.snapshot_agg

    def boom(*a, **k):
        raise RuntimeError("injected crash between stages")

    monkeypatch.setattr(seg_mod, "snapshot_agg", boom)
    with pytest.raises(RuntimeError, match="injected"):
        streaming_snapshot_calendar_agg(
            _stream(spark, src), "ts", AGG,
            bin_by="1MS", snap_by="1D", base_path=base,
        )
    monkeypatch.setattr(seg_mod, "snapshot_agg", real)
    assert OrderedDataset(spark, os.path.join(base, "tiles")).exists
    assert not OrderedDataset(spark, os.path.join(base, "snaps")).exists

    def one_shot(frame, tag):
        wm = frame["ts"].max().floor("D")  # daily tiles: last closed day end
        return _norm(
            snapshot_agg(
                spark.createDataFrame(frame[frame["ts"] < wm], SCHEMA),
                "ts", AGG, bin_by="1MS", snap_by="1D", snap_closed="left",
            ).filter(F.col("snap") <= F.lit(wm))
        )

    out = streaming_snapshot_calendar_agg(
        _stream(spark, src), "ts", AGG,
        bin_by="1MS", snap_by="1D", base_path=base,
    )
    pd.testing.assert_frame_equal(
        _norm(out.read()), one_shot(pdf[pdf["ts"] < cut], "b1")
    )

    spark.createDataFrame(pdf[pdf["ts"] >= cut], SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "b2"))
    out = streaming_snapshot_calendar_agg(
        _stream(spark, src), "ts", AGG,
        bin_by="1MS", snap_by="1D", base_path=base,
    )
    pd.testing.assert_frame_equal(_norm(out.read()), one_shot(pdf, "all"))


def test_grid_validation(spark, scratch):
    """Tile-alignment contract: off-grid explicit edges, sub-tile
    fixed snaps and non-day-dividing tiles are rejected up front; the
    fixed-frequency streaming twin points calendar users here."""
    from oups_spark.streaming.native import streaming_snapshot_agg

    df = spark.createDataFrame(_rows(5), SCHEMA)
    with pytest.raises(ValueError, match="tile grid"):
        streaming_snapshot_calendar_agg(
            df, "ts", AGG, bin_by="2D",
            snap_by=[pd.Timestamp("2024-01-01 03:30")],
            base_path=os.path.join(scratch, "x1"),
        )
    with pytest.raises(ValueError, match="multiple of"):
        streaming_snapshot_calendar_agg(
            df, "ts", AGG, bin_by="1D", snap_by="6h", tile_by="12h",
            base_path=os.path.join(scratch, "x2"),
        )
    with pytest.raises(ValueError, match="dividing a day"):
        streaming_snapshot_calendar_agg(
            df, "ts", AGG, bin_by="1MS", snap_by="1D", tile_by="7h",
            base_path=os.path.join(scratch, "x3"),
        )
    with pytest.raises(
        ValueError, match="streaming_snapshot_calendar_agg"
    ):
        streaming_snapshot_agg(
            df, "ts", AGG, bin_by="1MS", snap_by="1D"
        )


def test_snap_closed_right_equals_batch_cut(spark, scratch):
    """Round-14 (VERDICT r13 ask #4): closed-right snapshots on the
    native streaming path — the last semantic asymmetry vs
    batch/AggStream (reference cumsegagg.py:243-252). Rows exactly ON
    tile edges (the only ones a tile-level view cannot resolve),
    interior rows, and a row exactly on a BIN boundary (must count
    toward the OPENING bin, invisible to that instant's snapshot)
    must all match batch snapshot_agg(snap_closed='right') cut
    STRICTLY below the final watermark (a closed-right snapshot AT
    the watermark would need the unemitted tile's edge rows)."""
    import pandas as pd

    from oups_spark.operators.segment import snapshot_agg
    from oups_spark.streaming.native import streaming_snapshot_calendar_agg

    rows = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",  # exactly on the Jan bin edge
                    "2024-01-05 00:00:00",  # tile-edge row = snap edge
                    "2024-01-05 13:00:00",  # interior
                    "2024-01-20 00:00:00",  # tile-edge row = snap edge
                    "2024-02-01 00:00:00",  # Feb bin edge row
                    "2024-02-10 07:30:00",  # interior
                    "2024-02-20 00:00:00",  # snap-edge row
                    "2024-03-03 09:00:00",  # advances the watermark
                ]
            ),
            "v": [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0],
        }
    )
    src = os.path.join(scratch, "src")
    os.makedirs(src)
    spark.createDataFrame(rows, "ts timestamp, v double").coalesce(
        1
    ).write.parquet(os.path.join(src, "b0"))
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    agg = {
        "sum_v": ("v", "sum"),
        "max_v": ("v", "max"),
        "first_v": ("v", "first"),
        "last_v": ("v", "last"),
    }
    edges = [
        pd.Timestamp(x)
        for x in [
            "2024-01-05", "2024-01-20", "2024-02-01", "2024-02-10",
            "2024-02-20", "2024-03-01", "2024-03-05",
        ]
    ]
    out = streaming_snapshot_calendar_agg(
        stream, "ts", agg, bin_by="MS", snap_by=edges,
        base_path=os.path.join(scratch, "ds"), snap_closed="right",
    )
    got = out.read().orderBy("snap").toPandas()

    # final watermark: max ts 03-03 09:00 -> last EMITTED tile is
    # [02-20, 02-21) (the 03-03 tile never expires), so the cut is
    # snap < 02-21
    batch = (
        snapshot_agg(
            spark.createDataFrame(rows, "ts timestamp, v double"),
            "ts", agg, bin_by="MS", snap_by=edges, snap_closed="right",
        )
        .filter(F.col("snap") < F.lit(pd.Timestamp("2024-02-21")))
        .orderBy("snap")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, batch)
    # the bin-boundary snapshot (02-01) must NOT include the 02-01
    # edge row (it opens Feb; the snapshot observes closing Jan)
    at_feb1 = got[got["snap"] == pd.Timestamp("2024-02-01")]
    assert at_feb1["sum_v"].iloc[0] == 15.0
    # but the row IS the Feb bin's first observation
    at_feb10 = got[got["snap"] == pd.Timestamp("2024-02-10")]
    assert at_feb10["first_v"].iloc[0] == 16.0
