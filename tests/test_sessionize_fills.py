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


# ------------------------------------------------------- pluggable binner


def _ticks(n=200, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="7min"),
            "id": range(n),
            "vol": rng.integers(1, 50, n).astype("float64"),
            "val": rng.normal(0, 1, n).round(3),
        }
    )


def test_custom_binner_restart_equivalence(spark):
    """Chunked binning with the carried state must produce identical
    bin ids to a one-shot run (the reference buffer round-trip)."""
    from oups_spark.operators.binby import VolumeBarBinner, assign_custom_bins

    pdf = _ticks()
    binner = VolumeBarBinner("vol", threshold=100.0)
    one, _ = assign_custom_bins(
        spark.createDataFrame(pdf), "ts", binner, tiebreak=["id"]
    )
    one = one.toPandas().sort_values("id", ignore_index=True)

    state = None
    parts = []
    for lo, hi in [(0, 70), (70, 145), (145, 200)]:
        chunk = spark.createDataFrame(pdf.iloc[lo:hi])
        got, state = assign_custom_bins(
            chunk, "ts", binner, tiebreak=["id"],
            initial_state=state if state is not None else binner.initial_state(),
        )
        parts.append(got.toPandas())
    many = (
        pd.concat(parts, ignore_index=True).sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_custom_binner_pluggability_count_trigger(spark):
    """A second binner through the same mechanism: a new bin opens
    after every n qualifying rows (count trigger) — oracle is a
    pandas cumulative count."""
    import numpy as np

    from oups_spark.operators.binby import assign_custom_bins

    class CountTrigger:
        bin_dtype = "long"

        def __init__(self, col, pred, n):
            self.col, self.pred, self.n = col, pred, n

        def initial_state(self):
            return 0

        def summarize(self, pdf):
            return int(self.pred(pdf[self.col]).sum())

        def combine(self, state, summary):
            return state + summary

        def assign(self, pdf, entry):
            hits = self.pred(pdf[self.col]).astype("int64")
            excl = entry + hits.cumsum() - hits
            return (excl // self.n).astype("int64")

    pdf = _ticks()
    binner = CountTrigger("val", lambda s: s > 0, 10)
    got, final = assign_custom_bins(
        spark.createDataFrame(pdf), "ts", binner, tiebreak=["id"]
    )
    got = got.toPandas().sort_values("id", ignore_index=True)
    hits = (pdf["val"] > 0).astype("int64")
    exp = ((hits.cumsum() - hits) // 10).astype("int64")
    assert got["bin_id"].tolist() == exp.tolist()
    assert final == int(hits.sum())


def test_volume_bars_initial_volume_continues_bars(spark):
    from oups_spark.operators.sessionize import volume_bars

    pdf = _ticks(n=50)
    full = volume_bars(
        spark.createDataFrame(pdf), "ts", "vol", threshold=100.0, tiebreak=["id"]
    ).toPandas().sort_values("id", ignore_index=True)
    head_vol = float(pdf.iloc[:20]["vol"].sum())
    tail = volume_bars(
        spark.createDataFrame(pdf.iloc[20:]), "ts", "vol", threshold=100.0,
        tiebreak=["id"], initial_volume=head_vol,
    ).toPandas().sort_values("id", ignore_index=True)
    pd.testing.assert_frame_equal(
        full.iloc[20:].reset_index(drop=True), tail
    )


def test_flatten_struct_columns_nested(spark):
    import pyspark.sql.functions as F

    from oups_spark.functions.fills import flatten_struct_columns

    df = spark.range(2).select(
        F.col("id"),
        F.struct(
            F.lit(1).alias("x"),
            F.struct(F.lit("a").alias("lo"), F.lit("b").alias("hi")).alias("inner"),
        ).alias("s"),
    )
    flat = flatten_struct_columns(df)
    assert flat.columns == ["id", "s_x", "s_inner_lo", "s_inner_hi"]
    assert flat.first()["s_inner_hi"] == "b"
    one_level = flatten_struct_columns(df, max_depth=1)
    assert one_level.columns == ["id", "s_x", "s_inner"]
    assert one_level.schema["s_inner"].dataType.typeName() == "struct"


def test_funnel_stages_strict_ordering(spark):
    import datetime as dt

    from oups_spark.operators.sessionize import funnel_stages

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        # u1 completes in order
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        # u2: purchase BEFORE click -> only reaches click
        (2, ts(0), "view"), (2, ts(2), "click"), (2, ts(1), "purchase"),
        # u3: click before view -> stalls at view
        (3, ts(5), "view"), (3, ts(4), "click"),
        # u4: no view at all -> no row contribution beyond null stage 1
        (4, ts(0), "click"), (4, ts(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: (r["ts_view"], r["ts_click"], r["ts_purchase"])
        for r in funnel_stages(
            df, user_col="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
        ).collect()
    }
    assert got[1] == (ts(0), ts(1), ts(2))
    assert got[2] == (ts(0), ts(2), None)
    assert got[3] == (ts(5), None, None)
    assert got[4] == (None, None, None)


def test_funnel_horizon_bounds_later_stages(spark):
    import datetime as dt

    from oups_spark.operators.sessionize import funnel_stages

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "view"),
        (1, t0 + dt.timedelta(days=8), "click"),  # outside 7d horizon
        (2, t0, "view"),
        (2, t0 + dt.timedelta(days=6), "click"),  # inside
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["user_id"]: r["ts_click"]
        for r in funnel_stages(
            df, user_col="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click"], horizon="7 DAY",
        ).collect()
    }
    assert got[1] is None
    assert got[2] == t0 + dt.timedelta(days=6)


def test_funnel_summary_shape(spark):
    import datetime as dt

    from oups_spark.operators.sessionize import funnel_summary

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "view"), (1, t0 + dt.timedelta(hours=1), "click"),
        (2, t0, "view"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = funnel_summary(
        df, user_col="user_id", ts_col="ts", type_col="event_type",
        stages=["view", "click"],
    ).collect()
    assert [(r["stage"], r["users"], r["conversion"]) for r in out] == [
        ("view", 2, 1.0),
        ("click", 1, 0.5),
    ]


def test_unflatten_rejects_leaf_after_deeper_path(spark):
    """ADVICE r9: a leaf mapping arriving AFTER a deeper path sharing
    its prefix (schema-evolved dataset holding both m_t_x and m_t)
    must raise, not silently drop the subtree's columns. The opposite
    arrival order already raised."""
    import pytest

    from oups_spark.functions.fills import unflatten_struct_columns

    df = spark.createDataFrame([(1, 2)], "m_t_x long, m_t long")
    with pytest.raises(ValueError, match="deeper paths"):
        unflatten_struct_columns(
            df, {"m_t_x": ["m", "t", "x"], "m_t": ["m", "t"]}
        )
    # the opposite order keeps raising through the existing check
    df2 = spark.createDataFrame([(1, 2)], "m_t long, m_t_x long")
    with pytest.raises(ValueError, match="nests under leaf"):
        unflatten_struct_columns(
            df2, {"m_t": ["m", "t"], "m_t_x": ["m", "t", "x"]}
        )


def test_flatten_collision_check_covers_all_output_names(spark):
    """ADVICE r9: the collision check now runs over ALL surviving
    output names (duplicate detection on the actual output), not just
    non-struct top-level fields. A mapped struct SURVIVOR under
    max_depth colliding with a plain column is the reachable case:
    struct m.t survives max_depth=1 as an output column named m_t
    next to the plain column m_t."""
    import pyspark.sql.functions as F
    import pytest

    from oups_spark.functions.fills import flatten_struct_columns

    df = spark.createDataFrame([(1, 2)], "x long, m_t long").select(
        F.struct(
            F.struct(F.col("x").alias("v")).alias("t")
        ).alias("m"),
        "m_t",
    )
    # full flatten is fine: m expands past the collision to m_t_v
    full = flatten_struct_columns(df)
    assert set(full.columns) == {"m_t_v", "m_t"}
    # max_depth=1 leaves struct m.t as an output column named m_t,
    # duplicating the plain m_t
    with pytest.raises(ValueError, match="collide"):
        flatten_struct_columns(df, max_depth=1)
