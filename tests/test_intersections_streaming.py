"""Intersections (FIXTURES F4 shape) and the Structured Streaming
bridge (stream run == batch run)."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
import pytest

from oups_spark.store.indexer import toplevel
from oups_spark.store.intersections import tagged_bucket_union
from oups_spark.store.store import Store


@toplevel
class SeriesKey:
    name: str


def ts(h, m=0, d=1):
    return pd.Timestamp(2024, 1, d, h, m)


@pytest.fixture()
def f4_store(spark, scratch):
    """F4: 3 keys, 2-row files, overlapping/disjoint spans, repeated
    boundary timestamps across file boundaries."""
    store = Store(spark, os.path.join(scratch, "store"), SeriesKey)
    data = {
        "k1": [ts(0), ts(1), ts(2), ts(2), ts(4), ts(5)],  # dup ts over file edge
        "k2": [ts(1), ts(2), ts(3), ts(6)],
        "k3": [ts(4), ts(5), ts(6), ts(7)],
    }
    for name, stamps in data.items():
        pdf = pd.DataFrame({"ts": stamps, "v": [float(i) for i in range(len(stamps))]})
        store[SeriesKey(name)].write(
            df=spark.createDataFrame(pdf), ordered_on="ts", row_group_target_size=2
        )
    return store, data


def test_iter_intersections_covers_range_exactly(spark, f4_store):
    store, data = f4_store
    keys = [SeriesKey(n) for n in data]
    chunks = list(store.iter_intersections(keys, start=ts(1), end_excl=ts(6)))
    assert len(chunks) > 1
    # every key's concatenated chunks == its rows in [start, end)
    for name, stamps in data.items():
        got = pd.concat([c[SeriesKey(name)] for c in chunks], ignore_index=True)
        exp = pd.DataFrame(
            {"ts": stamps, "v": [float(i) for i in range(len(stamps))]}
        )
        exp = exp[(exp.ts >= ts(1)) & (exp.ts < ts(6))].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)
    # chunks are aligned: within one yielded dict, every key's rows
    # fall in the same [b, e) interval
    for c, e in zip(chunks, [x for x in chunks[1:]] + [None]):
        spans = [
            (df["ts"].min(), df["ts"].max())
            for df in c.values()
            if len(df)
        ]
        if len(spans) >= 2:
            # all mins of the next interval exceed all maxes here
            if e is not None:
                next_mins = [df["ts"].min() for df in e.values() if len(df)]
                if next_mins:
                    assert max(s[1] for s in spans) < min(next_mins)


def test_tagged_bucket_union_distributed(spark, f4_store):
    store, data = f4_store
    dfs = {n: store[SeriesKey(n)].read() for n in data}
    out = tagged_bucket_union(dfs, "ts", bucket_by="2h")
    got = (
        out.groupBy("bucket", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .pivot(index="bucket", columns="key", values="n")
    )
    # bucket [00,02): k1 has 2 rows (00,01); k2 has 1 (01)
    assert got.loc[ts(0), "k1"] == 2 and got.loc[ts(0), "k2"] == 1
    # bucket [02,04): k1 has dup-ts rows (02,02), k2 has (02,03)
    assert got.loc[ts(2), "k1"] == 2 and got.loc[ts(2), "k2"] == 2
    # bucket [04,06): k1 (04,05), k3 (04,05)
    assert got.loc[ts(4), "k1"] == 2 and got.loc[ts(4), "k3"] == 2


def test_streaming_bridge_equals_batch(spark, scratch):
    """foreachBatch-driven AggStream == batch-chunked AggStream."""
    from oups_spark.streaming.aggstream import AggStream, KeyConfig
    from oups_spark.streaming.bridge import run_parquet_file_stream
    from oups_spark.store.dataset import OrderedDataset

    n = 60
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="17min"),
            "id": range(n),
            "val": [float(i + 1) for i in range(n)],
        }
    )
    # two source files arriving in order
    src = os.path.join(scratch, "src")
    os.makedirs(src, exist_ok=True)
    sdf = spark.createDataFrame(pdf)
    half = pdf["ts"].iloc[n // 2]
    # the file stream needs FLAT files (a .write.parquet target is a
    # directory, which the source does not recurse into)
    import glob
    import shutil

    for i, cond in enumerate(
        [F.col("ts") < F.lit(half), F.col("ts") >= F.lit(half)]
    ):
        tmp = os.path.join(scratch, f"tmp{i}")
        sdf.filter(cond).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(tmp)

    agg = {"sum_val": ("val", "sum"), "last_val": ("val", "last")}
    stream = AggStream(
        spark,
        ordered_on="ts",
        keys={"k": KeyConfig(path=os.path.join(scratch, "stream_bins"),
                             agg=agg, bin_by="1h", tiebreak=["id"])},
    )
    run_parquet_file_stream(
        spark, stream, src, sdf.schema,
        checkpoint_dir=os.path.join(scratch, "ckpt"),
    )

    batch = AggStream(
        spark,
        ordered_on="ts",
        keys={"k": KeyConfig(path=os.path.join(scratch, "batch_bins"),
                             agg=agg, bin_by="1h", tiebreak=["id"])},
    )
    batch.agg(
        [
            spark.createDataFrame(pdf[pdf.ts < half]),
            spark.createDataFrame(pdf[pdf.ts >= half]),
        ],
        discard_last=True,
    )
    got = OrderedDataset(spark, os.path.join(scratch, "stream_bins")).read().toPandas()
    exp = OrderedDataset(spark, os.path.join(scratch, "batch_bins")).read().toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("bin", ignore_index=True),
        exp.sort_values("bin", ignore_index=True),
    )


def test_iter_intersections_batched_equals_unbatched(spark, f4_store):
    """A 1-row batch budget forces one load per interval; the yielded
    chunks must be identical to the single-batch run (memory bound =
    one intersection, not the whole range)."""
    store, data = f4_store
    keys = [SeriesKey(n) for n in data]
    big = list(store.iter_intersections(keys, start=ts(1), end_excl=ts(6)))
    small = list(
        store.iter_intersections(keys, start=ts(1), end_excl=ts(6), batch_rows=1)
    )
    assert len(big) == len(small)
    for cb, cs in zip(big, small):
        assert set(cb) == set(cs)
        for k in cb:
            pd.testing.assert_frame_equal(cb[k], cs[k])


def test_native_streaming_windows_equal_batch_closed_bins(spark, scratch):
    """Watermarked append-mode streaming aggregation == batch
    segment_agg on every CLOSED bin (the open tail bin is withheld by
    the watermark — the streaming twin of discard_last)."""
    import glob
    import shutil

    from oups_spark.operators.segment import segment_agg
    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.native import (
        streaming_segment_agg,
        write_stream_to_dataset,
    )

    n = 80
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="11min"),
            "id": range(n),
            "val": [float((i * 7) % 13 - 6) for i in range(n)],
        }
    )
    src = os.path.join(scratch, "nsrc")
    os.makedirs(src, exist_ok=True)
    sdf = spark.createDataFrame(pdf)
    half = pdf["ts"].iloc[n // 2]
    for i, cond in enumerate(
        [F.col("ts") < F.lit(half), F.col("ts") >= F.lit(half)]
    ):
        tmp = os.path.join(scratch, f"ntmp{i}")
        sdf.filter(cond).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(tmp)

    agg = {
        "first_val": ("val", "first"),
        "last_val": ("val", "last"),
        "sum_val": ("val", "sum"),
    }
    reader = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agged = streaming_segment_agg(
        reader, "ts", agg, bin_by="1h", tiebreak=["id"]
    )
    out_path = os.path.join(scratch, "native_bins")
    write_stream_to_dataset(
        agged, out_path, checkpoint_dir=os.path.join(scratch, "nckpt")
    )

    got = (
        OrderedDataset(spark, out_path).read().toPandas()
        .sort_values("bin", ignore_index=True)
    )
    exp = (
        segment_agg(sdf, "ts", agg, bin_by="1h", tiebreak=["id"])
        .toPandas().sort_values("bin", ignore_index=True)
    )
    # every emitted bin matches batch exactly; only the open tail bin
    # (and possibly the one straddling the watermark) is withheld
    assert 0 < len(got) <= len(exp)
    assert len(exp) - len(got) <= 1
    merged = exp.iloc[: len(got)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, merged)


def test_streaming_snapshots_match_batch_on_observed_instants(spark, scratch):
    """Native streaming snapshots (bounded fan-out + one watermarked
    window agg) == batch snapshot_agg at every emitted (bin, snap):
    append mode omits quiet instants (no forward-fill) and withholds
    instants past the final watermark; everything emitted must match
    the batch accumulator exactly."""
    import glob
    import shutil

    from oups_spark.operators.segment import snapshot_agg
    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.native import (
        streaming_snapshot_agg,
        write_stream_to_dataset,
    )

    n = 90
    pdf = pd.DataFrame(
        {
            # 97min spacing: several quiet 2h snap instants per day
            "ts": pd.date_range("2024-01-01", periods=n, freq="97min"),
            "id": range(n),
            "val": [float((i * 11) % 17 - 8) for i in range(n)],
        }
    )
    src = os.path.join(scratch, "snsrc")
    os.makedirs(src, exist_ok=True)
    sdf = spark.createDataFrame(pdf)
    half = pdf["ts"].iloc[n // 2]
    for i, cond in enumerate(
        [F.col("ts") < F.lit(half), F.col("ts") >= F.lit(half)]
    ):
        tmp = os.path.join(scratch, f"sntmp{i}")
        sdf.filter(cond).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(tmp)

    agg = {
        "first_val": ("val", "first"),
        "last_val": ("val", "last"),
        "min_val": ("val", "min"),
        "sum_val": ("val", "sum"),
    }
    reader = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agged = streaming_snapshot_agg(
        reader, "ts", agg, bin_by="1D", snap_by="2h", tiebreak=["id"]
    )
    out_path = os.path.join(scratch, "native_snaps")
    write_stream_to_dataset(
        agged, out_path, bin_col="snap",
        checkpoint_dir=os.path.join(scratch, "snckpt"),
    )
    got = (
        OrderedDataset(spark, out_path).read().toPandas()
        .sort_values(["bin", "snap"], ignore_index=True)
        [["bin", "snap", *agg]]
    )
    assert len(got) > 10

    exp = (
        snapshot_agg(
            sdf, "ts", agg, bin_by="1D", snap_by="2h",
            snap_closed="left", tiebreak=["id"],
        )
        .toPandas()
    )
    # restrict batch to the emitted instants and compare exactly
    exp = (
        exp.merge(got[["bin", "snap"]], on=["bin", "snap"], how="inner")
        .sort_values(["bin", "snap"], ignore_index=True)[got.columns]
    )
    assert len(exp) == len(got)
    pd.testing.assert_frame_equal(got, exp)

    # every withheld instant is either quiet (forward-fill only: its
    # cumulative state equals the previous emitted instant's) or past
    # the final watermark — no observed instant under the watermark
    # may be missing
    final_wm = (pdf["ts"].max().floor("1D") + pd.Timedelta("1D"))
    first_obs = pdf["ts"].dt.floor("2h") + pd.Timedelta("2h")
    observed = set(zip(pdf["ts"].dt.floor("1D"), first_obs))
    emitted = set(zip(got["bin"], got["snap"]))
    missing = {
        (b, s) for (b, s) in observed
        if s + pd.Timedelta("2h") <= final_wm
    } - emitted
    assert missing == set()


def test_fill_snapshot_grid_equals_batch_twin_on_sparse_bins(spark, scratch):
    """The sink-side calendar fill (``fill_snapshot_grid``) turns the
    append-mode native snapshot stream into the FULL batch
    ``snapshot_agg`` frame cut at the final watermark: leading quiet
    instants (before a bin's first observation) and entirely-empty
    bins come back as NULL aggregates (reference
    ``cumsegagg.py:556-569``), trailing quiet instants already carry
    the cumulative value from the fan-out. Sparse data on purpose —
    a bin starting late, a whole empty day, a bin with a mid-day gap
    — so every fill class is exercised."""
    import glob
    import shutil

    from oups_spark.operators.segment import snapshot_agg
    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.native import (
        fill_snapshot_grid,
        streaming_snapshot_agg,
        write_stream_to_dataset,
    )

    ts = [
        # day 1: starts late (05:10) -> quiet 02:00/04:00 lead nulls
        "2024-03-01 05:10", "2024-03-01 07:30",
        # day 2: entirely empty -> a full bin of nulls
        # day 3: one early row, one late -> mid-bin trailing ffill
        "2024-03-03 00:30", "2024-03-03 21:15",
        # day 4: single morning row; final watermark = day 5 00:00
        "2024-03-04 09:00", "2024-03-04 11:40",
    ]
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts),
            "id": range(len(ts)),
            "val": [3.0, -1.5, 7.25, 2.0, -4.0, 0.5],
        }
    )
    src = os.path.join(scratch, "ffsrc")
    os.makedirs(src, exist_ok=True)
    sdf = spark.createDataFrame(pdf)
    for i, cond in enumerate(
        [F.col("ts") < F.lit("2024-03-03"), F.col("ts") >= F.lit("2024-03-03")]
    ):
        tmp = os.path.join(scratch, f"fftmp{i}")
        sdf.filter(cond).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(tmp)

    agg = {
        "first_val": ("val", "first"),
        "last_val": ("val", "last"),
        "min_val": ("val", "min"),
        "sum_val": ("val", "sum"),
    }
    reader = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agged = streaming_snapshot_agg(
        reader, "ts", agg, bin_by="1D", snap_by="2h", tiebreak=["id"]
    )
    out_path = os.path.join(scratch, "ff_snaps")
    write_stream_to_dataset(
        agged, out_path, bin_col="snap",
        checkpoint_dir=os.path.join(scratch, "ffckpt"),
    )
    emitted = OrderedDataset(spark, out_path).read().toPandas()
    filled = (
        fill_snapshot_grid(
            OrderedDataset(spark, out_path).read(), bin_by="1D", snap_by="2h"
        )
        .toPandas()
        .sort_values(["bin", "snap"], ignore_index=True)
        [["bin", "snap", *agg]]
    )
    # the fill added the quiet instants append mode never emitted
    assert len(filled) > len(emitted)
    # ... including the whole empty day 2, as 12 all-null rows
    day2 = filled[filled["bin"] == pd.Timestamp("2024-03-02")]
    assert len(day2) == 12 and day2[list(agg)].isna().all().all()

    exp = (
        snapshot_agg(
            sdf, "ts", agg, bin_by="1D", snap_by="2h",
            snap_closed="left", tiebreak=["id"],
        )
        .toPandas()
    )
    cut = emitted["snap"].max()
    exp_cut = (
        exp[exp["snap"] <= cut]
        .sort_values(["bin", "snap"], ignore_index=True)
        [["bin", "snap", *agg]]
    )
    pd.testing.assert_frame_equal(filled, exp_cut)


def test_streaming_window_start_time_aligns_with_floor_ts(spark):
    """`F.window` anchors buckets at the epoch (1970-01-01, a
    THURSDAY); `window_start_time` supplies the startTime shift that
    makes the streaming grid coincide with batch `floor_ts` — Monday
    anchoring for weekly frequencies (pandas/reference convention)
    and origin/offset anchors for fixed ones. Verified by running
    F.window on a BATCH frame (same expression the streaming plan
    uses) against floor_ts over two years of awkward instants."""
    import pytest

    from oups_spark.functions.dates import floor_ts
    from oups_spark.streaming.native import (
        freq_to_interval,
        window_start_time,
    )

    assert freq_to_interval("1W") == "7 days"
    assert freq_to_interval("2W") == "14 days"
    assert freq_to_interval("1h") == "1 hour"
    # weekly grids shift epoch-Thursday starts to Mondays: 4 days
    assert window_start_time("1W") == f"{4 * 86400 * 1_000_000} microseconds"
    # already epoch-aligned -> no shift
    assert window_start_time("1h") is None
    with pytest.raises(ValueError, match="fixed-duration"):
        window_start_time("1MS")

    pdf = pd.DataFrame(
        {"ts": pd.date_range("2023-11-07 03:14:15", periods=400, freq="37h")}
    )
    sdf = spark.createDataFrame(pdf)
    cases = [
        ("1W", None, None),
        ("2W", None, None),
        ("4h", "2024-01-01 09:30:00", None),
        ("90min", None, "17min"),
        ("2D", "2024-03-05", "1h"),
    ]
    for freq, origin, offset in cases:
        st = window_start_time(freq, origin=origin, offset=offset)
        win = F.window(
            F.col("ts"), freq_to_interval(freq), freq_to_interval(freq), st
        )
        mismatches = (
            sdf.select(
                win.start.alias("w"),
                floor_ts(F.col("ts"), freq, origin=origin, offset=offset)
                .alias("f"),
            )
            .filter(F.col("w") != F.col("f"))
            .count()
        )
        assert mismatches == 0, (freq, origin, offset)


def test_native_streaming_weekly_and_anchored_equal_batch(spark, scratch):
    """End-to-end: weekly (Monday-anchored) and origin/offset-anchored
    streaming grids == batch segment_agg on every closed bin (VERDICT
    r10 #3 — the reference's by_scale handles weekly grids,
    segmentby.py:211-222, so the native path must too)."""
    import glob
    import shutil

    from oups_spark.operators.segment import segment_agg
    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.native import (
        streaming_segment_agg,
        write_stream_to_dataset,
    )

    n = 120
    pdf = pd.DataFrame(
        {
            # ~5.5 weeks starting mid-week: first Monday bin starts
            # BEFORE the data, exercising the partial leading bin
            "ts": pd.date_range("2024-01-03 05:00", periods=n, freq="8h"),
            "id": range(n),
            "val": [float((i * 7) % 13 - 6) for i in range(n)],
        }
    )
    src = os.path.join(scratch, "wsrc")
    os.makedirs(src, exist_ok=True)
    sdf = spark.createDataFrame(pdf)
    half = pdf["ts"].iloc[n // 2]
    for i, cond in enumerate(
        [F.col("ts") < F.lit(half), F.col("ts") >= F.lit(half)]
    ):
        tmp = os.path.join(scratch, f"wtmp{i}")
        sdf.filter(cond).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(tmp)

    agg = {
        "first_val": ("val", "first"),
        "last_val": ("val", "last"),
        "sum_val": ("val", "sum"),
    }
    for tag, kw in [
        ("weekly", dict(bin_by="1W")),
        ("anchored", dict(bin_by="1D", origin="2024-01-01 09:30:00")),
    ]:
        reader = (
            spark.readStream.schema(sdf.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agged = streaming_segment_agg(
            reader, "ts", agg, tiebreak=["id"], **kw
        )
        out_path = os.path.join(scratch, f"{tag}_bins")
        write_stream_to_dataset(
            agged, out_path,
            checkpoint_dir=os.path.join(scratch, f"{tag}_ckpt"),
        )
        got = (
            OrderedDataset(spark, out_path).read().toPandas()
            .sort_values("bin", ignore_index=True)
        )
        exp = (
            segment_agg(sdf, "ts", agg, tiebreak=["id"], **kw)
            .toPandas().sort_values("bin", ignore_index=True)
        )
        assert 0 < len(got) <= len(exp), tag
        assert len(exp) - len(got) <= 1, tag
        merged = exp.iloc[: len(got)].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, merged)


def test_streaming_snapshots_sparse_bins_pin_fanout_contract(spark, scratch):
    """ADVICE r10: pin the snapshot contract on SPARSE bins (the
    driver data populates every 6h slice, so the r10 oracle couldn't
    tell first-observer-only from full fan-out). The implementation
    fans each row to every later instant of its bin, so:
    - instants BEFORE a bin's first observation are absent;
    - quiet instants AFTER it are present, carrying the cumulative
      value forward (the batch twin's ffill);
    - instants past the final watermark are withheld."""
    import glob
    import shutil

    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.native import (
        streaming_snapshot_agg,
        write_stream_to_dataset,
    )

    d1 = pd.Timestamp("2024-03-01")
    d2 = pd.Timestamp("2024-03-02")
    d3 = pd.Timestamp("2024-03-03")
    pdf = pd.DataFrame(
        {
            # day 1: first row at 08:00 (leading 06:00 instant quiet),
            # quiet 18:00 instant, last row at 20:00
            # day 2: ONE row at 01:00 — all later instants quiet
            # day 3: row at 00:30 pushes the final watermark to day 4
            "ts": [
                d1 + pd.Timedelta("8h"),
                d1 + pd.Timedelta("20h"),
                d2 + pd.Timedelta("1h"),
                d3 + pd.Timedelta("30min"),
            ],
            "id": [0, 1, 2, 3],
            "val": [1.0, 2.0, 4.0, 8.0],
        }
    )
    src = os.path.join(scratch, "sparse_src")
    os.makedirs(src, exist_ok=True)
    sdf = spark.createDataFrame(pdf)
    for i, cond in enumerate(
        [F.col("ts") < F.lit(d2), F.col("ts") >= F.lit(d2)]
    ):
        tmp = os.path.join(scratch, f"sparse_tmp{i}")
        sdf.filter(cond).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))
        shutil.rmtree(tmp)

    reader = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agged = streaming_snapshot_agg(
        reader,
        "ts",
        {"last_val": ("val", "last"), "sum_val": ("val", "sum")},
        bin_by="1D",
        snap_by="6h",
        tiebreak=["id"],
    )
    out_path = os.path.join(scratch, "sparse_snaps")
    write_stream_to_dataset(
        agged, out_path, bin_col="snap",
        checkpoint_dir=os.path.join(scratch, "sparse_ckpt"),
    )
    got = (
        OrderedDataset(spark, out_path).read().toPandas()
        .sort_values(["bin", "snap"], ignore_index=True)
    )
    expect = pd.DataFrame(
        [
            # day 1: 06:00 absent (pre-first-observation), 12:00 sees
            # the 08:00 row, QUIET 18:00 still emitted (ffill), 00:00
            # cumulative of both rows
            (d1, d1 + pd.Timedelta("12h"), 1.0, 1.0),
            (d1, d1 + pd.Timedelta("18h"), 1.0, 1.0),
            (d1, d2, 2.0, 3.0),
            # day 2: one 01:00 row observed by all four instants
            (d2, d2 + pd.Timedelta("6h"), 4.0, 4.0),
            (d2, d2 + pd.Timedelta("12h"), 4.0, 4.0),
            (d2, d2 + pd.Timedelta("18h"), 4.0, 4.0),
            (d2, d3, 4.0, 4.0),
            # day 3: watermark (day 4 00:00) passes ends of the 06:00,
            # 12:00, 18:00 instants only — 00:00's window end is day 4
            # 06:00, past the watermark, withheld
            (d3, d3 + pd.Timedelta("6h"), 8.0, 8.0),
            (d3, d3 + pd.Timedelta("12h"), 8.0, 8.0),
            (d3, d3 + pd.Timedelta("18h"), 8.0, 8.0),
        ],
        columns=["bin", "snap", "last_val", "sum_val"],
    )
    pd.testing.assert_frame_equal(got[expect.columns.tolist()], expect)


def test_rollup_closed_bins_equals_batch_monthly(spark):
    """Calendar rollup of closed daily partials == batch monthly
    segment_agg cut at the final watermark, for ALL five fold paths —
    first/last (min_by/max_by over the day label) included. Daily
    partials come from batch segment_agg with empty days dropped
    (exactly what the streaming sink holds: append mode never emits
    an empty window); the last, incomplete month must be withheld."""
    from oups_spark.operators.segment import segment_agg
    from oups_spark.streaming.native import rollup_closed_bins

    n = 200
    pdf = pd.DataFrame(
        {
            # ~11h spacing across ~3 months, gaps leave some days empty
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta([(i * 11 + (i % 7) * 31) for i in range(n)], "h"),
            "id": range(n),
            "val": [float((i * 13) % 29 - 14) for i in range(n)],
        }
    ).sort_values("ts", ignore_index=True)
    sdf = spark.createDataFrame(pdf)
    agg = {
        "first_val": ("val", "first"),
        "last_val": ("val", "last"),
        "min_val": ("val", "min"),
        "sum_val": ("val", "sum"),
        "n": ("id", "sum"),
    }
    daily = (
        segment_agg(sdf, "ts", agg, bin_by="1D", tiebreak=["id"])
        .filter(F.col("n").isNotNull())  # the sink holds populated days only
    )
    got = (
        rollup_closed_bins(
            daily,
            {
                "first_val": ("first_val", "first"),
                "last_val": ("last_val", "last"),
                "min_val": ("min_val", "min"),
                "sum_val": ("sum_val", "sum"),
                "n": ("n", "sum"),
            },
            bin_by="1MS",
            bin_col="bin",
        )
        .toPandas()
        .sort_values("bin", ignore_index=True)
    )
    final_wm = pdf["ts"].max().floor("D") + pd.Timedelta("1D")
    exp = (
        segment_agg(sdf, "ts", agg, bin_by="1MS", tiebreak=["id"])
        .toPandas()
    )
    exp = exp[
        (exp["bin"] + pd.offsets.MonthBegin(1)) <= final_wm
    ].sort_values("bin", ignore_index=True)[got.columns]
    assert len(got) >= 2  # at least two complete months in the data
    pd.testing.assert_frame_equal(got, exp)

    # empty daily input -> schema-STABLE empty frame: aggregate dtypes
    # match the daily partials', never NullType (unions downstream)
    empty = rollup_closed_bins(
        daily.limit(0),
        {"sum_val": ("sum_val", "sum"), "n": ("n", "sum")},
        bin_by="1MS",
        bin_col="bin",
    )
    assert empty.count() == 0
    dtypes = dict(empty.dtypes)
    assert dtypes["sum_val"] == dict(daily.dtypes)["sum_val"]
    assert dtypes["n"] == dict(daily.dtypes)["n"]
    assert "void" not in set(dtypes.values())


def test_calendar_streaming_restart_between_stages(spark, scratch, monkeypatch):
    """The one-unit calendar streaming API survives a crash BETWEEN
    its stages: the first invocation dies after the daily sink
    committed but before the rollup ran (injected), the re-invocation
    resumes from the stream checkpoint (no-op) and folds the
    already-sunk days — equal to a one-shot run. A later invocation
    with NEW data stays equal to the one-shot over everything (the
    rollup's keep-last merge replaces stale bins)."""
    import os

    import oups_spark.streaming.native as native
    from oups_spark.store.dataset import OrderedDataset
    from oups_spark.streaming.native import streaming_calendar_agg

    src = os.path.join(scratch, "cal_src")
    os.makedirs(src, exist_ok=True)
    schema = "ts timestamp, k long, val double"

    def mk(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["ts", "k", "val"]), schema
        )

    t = pd.Timestamp
    batch1 = [
        (t("2024-01-03"), 1, 1.0), (t("2024-01-20"), 2, 2.0),
        (t("2024-02-05"), 3, 3.0), (t("2024-02-25"), 4, 4.0),
        (t("2024-03-10"), 5, 5.0),
    ]
    batch2 = [
        (t("2024-03-15"), 6, 6.0), (t("2024-04-02"), 7, 7.0),
        (t("2024-04-20"), 8, 8.0), (t("2024-05-06"), 9, 9.0),
    ]
    mk(batch1).coalesce(1).write.parquet(os.path.join(src, "b1"))
    agg = {"n": ("k", "sum"), "sum_val": ("val", "sum")}

    def stream():
        return spark.readStream.schema(schema).parquet(
            os.path.join(src, "*")
        )

    base = os.path.join(scratch, "cal_unit")

    # invocation 1 "crashes" between the stages
    real_rollup = native.rollup_closed_bins

    def boom(*a, **k):
        raise RuntimeError("injected crash between stages")

    monkeypatch.setattr(native, "rollup_closed_bins", boom)
    with pytest.raises(RuntimeError, match="injected"):
        streaming_calendar_agg(
            stream(), "ts", agg, bin_by="1MS", base_path=base
        )
    monkeypatch.setattr(native, "rollup_closed_bins", real_rollup)
    # the daily sink committed; the bins dataset never materialized
    assert OrderedDataset(spark, os.path.join(base, "daily")).exists
    assert not OrderedDataset(spark, os.path.join(base, "bins")).exists

    # invocation 2 restarts: checkpointed stream is a no-op, rollup
    # folds the already-sunk days
    out = streaming_calendar_agg(
        stream(), "ts", agg, bin_by="1MS", base_path=base
    )
    got = out.read().toPandas().sort_values("bin", ignore_index=True)

    def one_shot(rows, tag):
        b2 = os.path.join(scratch, f"cal_ref_{tag}")
        s2 = os.path.join(scratch, f"cal_ref_src_{tag}")
        os.makedirs(s2, exist_ok=True)
        mk(rows).coalesce(1).write.parquet(os.path.join(s2, "b"))
        ref = streaming_calendar_agg(
            spark.readStream.schema(schema).parquet(os.path.join(s2, "*")),
            "ts", agg, bin_by="1MS", base_path=b2,
        )
        return ref.read().toPandas().sort_values("bin", ignore_index=True)

    pd.testing.assert_frame_equal(got, one_shot(batch1, "a"))

    # invocation 3: new data arrives, the unit re-runs end to end and
    # equals the one-shot over everything
    mk(batch2).coalesce(1).write.parquet(os.path.join(src, "b2"))
    out2 = streaming_calendar_agg(
        stream(), "ts", agg, bin_by="1MS", base_path=base
    )
    got2 = out2.read().toPandas().sort_values("bin", ignore_index=True)
    pd.testing.assert_frame_equal(got2, one_shot(batch1 + batch2, "b"))
    assert len(got2) > len(got)  # later months actually closed
