"""Session windows, volume bars (prefix-sum correctness), and the
fill/membership/flatten utilities."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Window

from oups_spark.functions.fills import anti_by, bfill, ffill, flatten_struct_columns
from oups_spark.operators.sessionize import add_prefix_sum, session_agg, volume_bars


def test_session_agg_gap_split(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 03:00",
                 "2024-01-01 03:20"]
            ),
            "u": [1, 1, 1, 2],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = session_agg(
        spark.createDataFrame(pdf), "ts",
        {"n": ("v", "count"), "s": ("v", "sum")},
        gap="30 minutes", partition_by=["u"],
    ).toPandas().sort_values(["u", "session_start"], ignore_index=True)
    # user 1: two sessions (gap 00:10 -> 03:00 exceeds 30min)
    assert len(out) == 3
    assert out.loc[0, "n"] == 2 and out.loc[0, "s"] == 3.0
    assert out.loc[0, "session_end"] == pd.Timestamp("2024-01-01 00:40")
    assert out.loc[1, "n"] == 1 and out.loc[1, "s"] == 3.0
    assert out.loc[2, "u"] == 2


def test_prefix_sum_matches_pandas(spark):
    n = 500
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "id": range(n),
            "q": [(i % 7) + 1.0 for i in range(n)],
        }
    )
    got = (
        add_prefix_sum(spark.createDataFrame(pdf), "ts", "q", tiebreak=["id"])
        .toPandas().sort_values("id", ignore_index=True)
    )
    assert list(got["prefix_sum"]) == list(pdf["q"].cumsum())
    got_ex = (
        add_prefix_sum(
            spark.createDataFrame(pdf), "ts", "q", tiebreak=["id"], exclusive=True
        ).toPandas().sort_values("id", ignore_index=True)
    )
    assert list(got_ex["prefix_sum"]) == [0.0, *pdf["q"].cumsum()[:-1]]


def test_volume_bars_threshold(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=6, freq="h"),
            "id": range(6),
            "q": [4.0, 4.0, 4.0, 4.0, 4.0, 4.0],
        }
    )
    out = (
        volume_bars(spark.createDataFrame(pdf), "ts", "q", threshold=10,
                    tiebreak=["id"])
        .toPandas().sort_values("id", ignore_index=True)
    )
    # exclusive cumsum: 0,4,8,12,16,20 -> bins 0,0,0,1,1,2
    assert list(out["bin_id"]) == [0, 0, 0, 1, 1, 2]


def test_ffill_bfill(spark):
    pdf = pd.DataFrame({"i": [1, 2, 3, 4], "v": [None, 10.0, None, 20.0]})
    w = Window.orderBy("i")
    got = (
        spark.createDataFrame(pdf)
        .select("i", ffill("v", w).alias("f"), bfill("v", w).alias("b"))
        .toPandas().sort_values("i", ignore_index=True)
    )
    assert list(got["f"])[1:] == [10.0, 10.0, 20.0] and pd.isna(got["f"][0])
    assert list(got["b"])[:2] == [10.0, 10.0] and got["b"][3] == 20.0


def test_anti_by(spark):
    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 4]}))
    b = spark.createDataFrame(pd.DataFrame({"k": [2, 4]}))
    got = sorted(r["k"] for r in anti_by(a, b, "k").collect())
    assert got == [1, 3]


def test_flatten_struct_columns(spark):
    df = spark.range(1).select(
        F.lit(1).alias("x"),
        F.struct(F.lit(2).alias("a"), F.lit(3).alias("b")).alias("s"),
    )
    out = flatten_struct_columns(df)
    assert out.columns == ["x", "s_a", "s_b"]
    assert out.collect()[0]["s_b"] == 3
