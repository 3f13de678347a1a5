"""Ordered merge write semantics (FIXTURES F3): appends, overlapping
inserts, keep-last dedup, row-group sizing/coalescing, monotonicity
rejection, period-sized files, kv metadata. Oracle = pandas emulation
of the reference's merge: concat in physical order, stable sort on
ordered_on, drop_duplicates keep-last (reference
``iter_merge_split_data.py:112-119``)."""

from __future__ import annotations

import pandas as pd
import pytest

from oups_spark.store.dataset import OrderedDataset


def ts(h, m=0, d=1):
    return pd.Timestamp(2024, 1, d, h, m)


def make_df(spark, rows, cols=("ts", "val", "sym")):
    pdf = pd.DataFrame(rows, columns=list(cols))
    return spark.createDataFrame(pdf)


def read_sorted(ds, extra_sort=("val",)):
    pdf = ds.read().toPandas()
    return pdf.sort_values(["ts", *extra_sort], ignore_index=True)


def merge_oracle(batches, duplicates_on=None, ordered_on="ts"):
    """Pandas emulation of ordered merge of successive batches."""
    out = batches[0]
    for b in batches[1:]:
        out = pd.concat([out, b], ignore_index=True).sort_values(
            ordered_on, kind="stable", ignore_index=True
        )
    if duplicates_on is not None:
        subset = list(duplicates_on)
        if ordered_on not in subset:
            subset.append(ordered_on)
        out = out.drop_duplicates(subset=subset, keep="last", ignore_index=True)
    return out


def test_first_write_and_read(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d1")
    b1 = pd.DataFrame({"ts": [ts(0), ts(1), ts(2)], "val": [1.0, 2.0, 3.0], "sym": list("aaa")})
    ds.write(df=spark.createDataFrame(b1), ordered_on="ts")
    assert ds.exists and ds.n_rows == 3 and ds.n_files == 1
    got = read_sorted(ds)
    pd.testing.assert_frame_equal(got[["ts", "val", "sym"]], b1)


def test_pure_append_does_not_rewrite(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d2")
    b1 = pd.DataFrame({"ts": [ts(0), ts(1)], "val": [1.0, 2.0], "sym": list("aa")})
    b2 = pd.DataFrame({"ts": [ts(5), ts(6)], "val": [3.0, 4.0], "sym": list("bb")})
    ds.write(df=spark.createDataFrame(b1), ordered_on="ts")
    first_files = {e.name for e in ds.manifest.files}
    ds.write(df=spark.createDataFrame(b2))
    assert first_files <= {e.name for e in ds.manifest.files}, "append rewrote old files"
    assert ds.n_rows == 4
    got = read_sorted(ds)
    exp = merge_oracle([b1, b2])
    pd.testing.assert_frame_equal(got[["ts", "val", "sym"]], exp)


def test_overlap_rewrites_only_overlapping_files(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d3")
    # 3 files of 2 rows each: [0,1] [2,3] [4,5] hours
    b1 = pd.DataFrame(
        {"ts": [ts(h) for h in range(6)], "val": [float(h) for h in range(6)], "sym": list("aaaaaa")}
    )
    ds.write(df=spark.createDataFrame(b1), ordered_on="ts", row_group_target_size=2)
    assert ds.n_files == 3
    by_min = sorted(ds.manifest.files, key=lambda e: e.min)
    untouched = by_min[0].name  # file [0h,1h] must survive
    # insert spanning hours 2.5-4.5 -> overlaps files 2 and 3 only
    b2 = pd.DataFrame(
        {"ts": [ts(2, 30), ts(4, 30)], "val": [20.0, 40.0], "sym": list("bb")}
    )
    ds.write(df=spark.createDataFrame(b2), row_group_target_size=2)
    names = {e.name for e in ds.manifest.files}
    assert untouched in names, "non-overlapping file was rewritten"
    assert by_min[1].name not in names and by_min[2].name not in names
    got = read_sorted(ds)
    exp = merge_oracle([b1, b2])
    pd.testing.assert_frame_equal(got[["ts", "val", "sym"]], exp)


@pytest.mark.parametrize("dup_cols", [["sym"], []])
def test_keep_last_dedup(spark, scratch, dup_cols):
    ds = OrderedDataset(spark, f"{scratch}/d4")
    b1 = pd.DataFrame(
        {
            "ts": [ts(0), ts(1), ts(1), ts(2)],
            "val": [1.0, 2.0, 3.0, 4.0],
            "sym": ["a", "a", "b", "a"],
        }
    )
    # b2 collides with b1 on (sym, ts) at ts(1) 'a' and ts(2) 'a';
    # also contains an internal duplicate pair -> later row wins.
    b2 = pd.DataFrame(
        {
            "ts": [ts(1), ts(2), ts(2)],
            "val": [20.0, 40.0, 41.0],
            "sym": ["a", "a", "a"],
        }
    )
    ds.write(df=spark.createDataFrame(b1), ordered_on="ts", duplicates_on=dup_cols or None)
    ds.write(df=spark.createDataFrame(b2), duplicates_on=dup_cols)
    got = read_sorted(ds)
    exp = (
        merge_oracle([b1, b2], duplicates_on=dup_cols)
        .sort_values(["ts", "val"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[["ts", "val", "sym"]], exp)


def test_duplicate_boundary_file_merged(spark, scratch):
    """Batch whose min equals an existing file's max: that file must be
    selected for merge so dedup applies across the boundary."""
    ds = OrderedDataset(spark, f"{scratch}/d5")
    b1 = pd.DataFrame({"ts": [ts(0), ts(1), ts(2), ts(3)], "val": [1.0, 2.0, 3.0, 4.0], "sym": list("aaaa")})
    ds.write(df=spark.createDataFrame(b1), ordered_on="ts", row_group_target_size=2)
    b2 = pd.DataFrame({"ts": [ts(1)], "val": [99.0], "sym": ["a"]})
    ds.write(df=spark.createDataFrame(b2), duplicates_on=["sym"])
    got = read_sorted(ds)
    exp = merge_oracle([b1, b2], duplicates_on=["sym"])
    pd.testing.assert_frame_equal(got[["ts", "val", "sym"]], exp)
    assert len(got) == 4 and got.loc[got.ts == ts(1), "val"].iloc[0] == 99.0


def test_monotonic_rejection(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d6")
    bad = pd.DataFrame({"ts": [ts(2), ts(0), ts(1)], "val": [1.0, 2.0, 3.0], "sym": list("aaa")})
    with pytest.raises(ValueError, match="not ordered"):
        ds.write(df=spark.createDataFrame(bad), ordered_on="ts")


def test_ordered_on_immutable(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d7")
    b1 = pd.DataFrame({"ts": [ts(0)], "val": [1.0], "sym": ["a"]})
    ds.write(df=spark.createDataFrame(b1), ordered_on="ts")
    with pytest.raises(ValueError, match="immutable"):
        ds.write(df=spark.createDataFrame(b1), ordered_on="val")


def test_row_group_sizing(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d8")
    n = 20
    b = pd.DataFrame({"ts": [ts(0) + pd.Timedelta(minutes=i) for i in range(n)],
                      "val": [float(i) for i in range(n)], "sym": ["a"] * n})
    ds.write(df=spark.createDataFrame(b), ordered_on="ts", row_group_target_size=6)
    assert ds.n_files == 4  # ceil(20/6)
    sizes = sorted(e.n_rows for e in ds.manifest.files)
    assert sum(sizes) == n and max(sizes) <= 6


def test_off_target_coalescing(spark, scratch):
    """Repeated 1-row appends fragment the dataset; with
    max_n_off_target_rgs=3 the trailing small files get coalesced."""
    ds = OrderedDataset(spark, f"{scratch}/d9")
    for i in range(6):
        b = pd.DataFrame({"ts": [ts(i)], "val": [float(i)], "sym": ["a"]})
        ds.write(df=spark.createDataFrame(b), ordered_on="ts",
                 row_group_target_size=10, max_n_off_target_rgs=3)
    # without coalescing this would be 6 files; the trigger should
    # have merged trailing runs of >=3 off-target files
    assert ds.n_files < 6
    assert ds.n_rows == 6
    got = read_sorted(ds)
    assert list(got["val"]) == [float(i) for i in range(6)]


def test_period_row_groups(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d10")
    b = pd.DataFrame({
        "ts": [ts(0), ts(0, 30), ts(2), ts(2, 30), ts(5)],
        "val": [1.0, 2.0, 3.0, 4.0, 5.0],
        "sym": list("aaaaa"),
    })
    ds.write(df=spark.createDataFrame(b), ordered_on="ts", row_group_target_size="2h")
    # periods: [0h,2h) -> 2 rows, [2h,4h) -> 2 rows, [4h,6h) -> 1 row
    assert ds.n_files == 3
    assert sorted(e.n_rows for e in ds.manifest.files) == [1, 2, 2]
    got = read_sorted(ds)
    pd.testing.assert_frame_equal(got[["ts", "val", "sym"]], b)


def test_range_read_prunes_files(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d11")
    b = pd.DataFrame({"ts": [ts(h) for h in range(8)], "val": [float(h) for h in range(8)],
                      "sym": ["a"] * 8})
    ds.write(df=spark.createDataFrame(b), ordered_on="ts", row_group_target_size=2)
    got = ds.read(start=ts(3), end_excl=ts(6)).toPandas().sort_values("ts", ignore_index=True)
    assert list(got["val"]) == [3.0, 4.0, 5.0]
    # pruning: the plan should only reference 2 of the 4 files
    df = ds.read(start=ts(3), end_excl=ts(6))
    n_files_in_plan = df.select(
        __import__("pyspark.sql.functions", fromlist=["F"]).input_file_name()
    ).distinct().count()
    assert n_files_in_plan == 2


def test_kv_metadata_roundtrip(spark, scratch):
    ds = OrderedDataset(spark, f"{scratch}/d12")
    b = pd.DataFrame({"ts": [ts(0)], "val": [1.0], "sym": ["a"]})
    state = {"restart_index": ts(0), "buffer": {"acc": [1, 2, 3]}}
    ds.write(df=spark.createDataFrame(b), ordered_on="ts",
             key_value_metadata={"aggstream": state, "note": "hi"})
    ds2 = OrderedDataset(spark, f"{scratch}/d12")
    assert ds2.key_value_metadata["note"] == "hi"
    assert ds2.key_value_metadata["aggstream"]["restart_index"] == ts(0)
    assert ds2.key_value_metadata["aggstream"]["buffer"]["acc"] == [1, 2, 3]
    # metadata-only update + removal via None
    ds2.write(key_value_metadata={"note": None, "other": 5})
    ds3 = OrderedDataset(spark, f"{scratch}/d12")
    assert "note" not in ds3.key_value_metadata
    assert ds3.key_value_metadata["other"] == 5
    assert ds3.n_rows == 1  # data untouched
