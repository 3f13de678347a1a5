"""As-of join, range join, token packing, stratified sampling."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
import pytest

from oups_spark.operators.asof import asof_join, range_join
from oups_spark.operators.pack import pack_token_budget, stratified_sample


def _quotes_trades(spark):
    quotes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["a", "a", "a", "b"],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 10:05",
                     "2024-01-01 10:10", "2024-01-01 10:02"]
                ),
                "bid": [1.0, 2.0, 3.0, 9.0],
            }
        )
    )
    trades = spark.createDataFrame(
        pd.DataFrame(
            {
                "sym": ["a", "a", "a", "a", "b", "b"],
                "ts": pd.to_datetime(
                    ["2024-01-01 09:59", "2024-01-01 10:00",
                     "2024-01-01 10:07", "2024-01-01 10:30",
                     "2024-01-01 10:01", "2024-01-01 10:02"]
                ),
                "qty": [10, 20, 30, 40, 50, 60],
            }
        )
    )
    return quotes, trades


def test_asof_backward_matches_merge_asof(spark):
    quotes, trades = _quotes_trades(spark)
    got = (
        asof_join(trades, quotes, on="ts", by="sym", value_cols=["bid"])
        .orderBy("sym", "ts")
        .toPandas()
    )
    exp = pd.merge_asof(
        trades.toPandas().sort_values("ts"),
        quotes.toPandas().sort_values("ts"),
        on="ts", by="sym", direction="backward",
    ).sort_values(["sym", "ts"], ignore_index=True)
    pd.testing.assert_series_equal(
        got["bid"], exp["bid"], check_names=False
    )
    # 09:59 trade predates every quote -> null match
    assert pd.isna(got.iloc[0]["bid"])
    # equal timestamp matches (10:00 trade sees 10:00 quote)
    assert got.iloc[1]["bid"] == 1.0


def test_asof_forward_and_tolerance(spark):
    quotes, trades = _quotes_trades(spark)
    fwd = (
        asof_join(
            trades, quotes, on="ts", by="sym",
            value_cols=["bid"], direction="forward",
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    exp = pd.merge_asof(
        trades.toPandas().sort_values("ts"),
        quotes.toPandas().sort_values("ts"),
        on="ts", by="sym", direction="forward",
    ).sort_values(["sym", "ts"], ignore_index=True)
    pd.testing.assert_series_equal(fwd["bid"], exp["bid"], check_names=False)

    tol = (
        asof_join(
            trades, quotes, on="ts", by="sym",
            value_cols=["bid"], tolerance="3min",
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    exp_tol = pd.merge_asof(
        trades.toPandas().sort_values("ts"),
        quotes.toPandas().sort_values("ts"),
        on="ts", by="sym", direction="backward",
        tolerance=pd.Timedelta("3min"),
    ).sort_values(["sym", "ts"], ignore_index=True)
    pd.testing.assert_series_equal(tol["bid"], exp_tol["bid"], check_names=False)


def test_range_join_end_exclusive_and_cell_edges(spark):
    rows = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x"] * 4,
                "ts": pd.to_datetime(
                    ["2024-01-01 00:00", "2024-01-02 23:59",
                     "2024-01-03 00:00", "2024-01-05 00:00"]
                ),
                "rid": [1, 2, 3, 4],
            }
        )
    )
    # interval ends exactly on a day boundary: end-exclusive
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x"],
                "s": pd.to_datetime(["2024-01-01 00:00"]),
                "e": pd.to_datetime(["2024-01-03 00:00"]),
            }
        )
    )
    got = (
        range_join(rows, iv, left_on="ts", start_col="s", end_col="e",
                   by="k", grid="1D")
        .orderBy("rid")
        .toPandas()
    )
    assert list(got["rid"]) == [1, 2]  # 00:00 on end day excluded


def test_pack_token_budget_contiguous_fill(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "grp": ["g1"] * 4 + ["g2"] * 2,
            "n_tok": [600, 600, 600, 600, 100, 5000],
        }
    )
    got = (
        pack_token_budget(
            spark.createDataFrame(pdf), id_col="doc_id",
            token_col="n_tok", budget=1000, by="grp",
        )
        .orderBy("doc_id")
        .toPandas()
    )
    # g1 offsets: 0, 600, 1200, 1800 -> packs 0, 0, 1, 1
    # g2 offsets: 0, 100            -> packs 0, 0 (straddler starts in 0)
    assert list(got["pack_offset"]) == [0, 600, 1200, 1800, 0, 100]
    assert list(got["pack_id"]) == [0, 0, 1, 1, 0, 0]


def test_pack_matches_pandas_cumsum_across_buckets(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "doc_id": range(500),
            "grp": rng.choice(["a", "b"], 500),
            "n_tok": rng.integers(1, 400, 500),
        }
    )
    got = (
        pack_token_budget(
            spark.createDataFrame(pdf), id_col="doc_id",
            token_col="n_tok", budget=777, by="grp", n_buckets=7,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    exp_off = (
        pdf.sort_values("doc_id")
        .groupby("grp")["n_tok"]
        .transform(lambda s: s.cumsum().shift(fill_value=0))
    )
    assert list(got["pack_offset"]) == list(exp_off)
    assert list(got["pack_id"]) == list(exp_off // 777)


def test_stratified_sample_deterministic_md5(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(1000), "src": ["a", "b"] * 500}
    )
    got = (
        stratified_sample(
            spark.createDataFrame(pdf), id_col="doc_id",
            strata_col="src", rates={"a": 0.3}, default_rate=0.05,
        )
        .orderBy("doc_id")
        .toPandas()
    )

    def keep(i, rate):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return h % 10_000 < rate * 10_000

    exp = [
        i for i, s in zip(pdf["doc_id"], pdf["src"])
        if keep(i, 0.3 if s == "a" else 0.05)
    ]
    assert list(got["doc_id"]) == exp
    # rerun is bit-identical
    again = (
        stratified_sample(
            spark.createDataFrame(pdf), id_col="doc_id",
            strata_col="src", rates={"a": 0.3}, default_rate=0.05,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert got.equals(again)


def test_range_join_degenerate_intervals_and_suffix(spark):
    rows = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x"],
                "ts": pd.to_datetime(["2024-01-01 06:00", "2024-01-02 06:00"]),
                "v": [1, 2],
            }
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x", "x"],
                "s": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-03"]
                ),
                "e": pd.to_datetime(
                    ["2024-01-02", "2024-01-02", "2024-01-02"]  # zero/inverted
                ),
                "v": [10, 20, 30],  # collides with left 'v'
            }
        )
    )
    got = (
        range_join(rows, iv, left_on="ts", start_col="s", end_col="e",
                   by="k", grid="1D")
        .orderBy("ts")
        .toPandas()
    )
    # only the valid interval matches; degenerate ones match nothing
    assert list(got["v"]) == [1]
    assert list(got["v_right"]) == [10]


def test_asof_tiebreak_deterministic_on_equal_instants(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"],
                "ts": pd.to_datetime(["2024-01-01 10:30"]),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"] * 3,
                "ts": pd.to_datetime(["2024-01-01 10:00"] * 3),
                "seq": [2, 3, 1],
                "px": [20.0, 30.0, 10.0],
            }
        ).sample(frac=1, random_state=0)  # shuffled input order
    )
    got = asof_join(
        left, right, on="ts", by="k", value_cols=["px"], tiebreak=["seq"]
    ).toPandas()
    # largest tiebreak (seq=3) wins, regardless of input/partition order
    assert list(got["px"]) == [30.0]


def test_pack_null_group_keys_and_string_id_rejected(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "grp": ["g1", None, "g1", None, "g2", None],
            "n_tok": [100, 200, 300, 400, 500, 600],
        }
    )
    got = (
        pack_token_budget(
            spark.createDataFrame(pdf), id_col="doc_id",
            token_col="n_tok", budget=450, by="grp",
        )
        .orderBy("doc_id")
        .toPandas()
    )
    # NULL is its own group: offsets 0,200,600 -> packs 0,0,1
    nulls = got[got["grp"].isna()].sort_values("doc_id")
    assert list(nulls["pack_offset"]) == [0, 200, 600]
    assert list(nulls["pack_id"]) == [0, 0, 1]

    sdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "n_tok": [1, 2]})
    )
    with pytest.raises(ValueError, match="numeric/timestamp id_col"):
        pack_token_budget(sdf, id_col="doc_id", token_col="n_tok", budget=10)


def test_asof_tiebreak_column_shared_with_left(spark):
    # regression: when the tiebreak column name also exists on the
    # LEFT side, it must still order RIGHT rows (round 3 excluded
    # shared names from the right select, so unionByName filled NULL
    # for every right row and ties went nondeterministic again)
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"],
                "ts": pd.to_datetime(["2024-01-01 10:30"]),
                "seq": [999],  # same name as the right-side tiebreak
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"] * 3,
                "ts": pd.to_datetime(["2024-01-01 10:00"] * 3),
                "seq": [2, 3, 1],
                "px": [20.0, 30.0, 10.0],
            }
        ).sample(frac=1, random_state=0)
    )
    got = asof_join(
        left, right, on="ts", by="k", value_cols=["px"], tiebreak=["seq"]
    ).toPandas()
    assert list(got["px"]) == [30.0]
    # left's own column is untouched in the output
    assert list(got["seq"]) == [999]


def test_range_join_rejects_right_full_how(spark):
    rows = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"]), "v": [1]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "s": pd.to_datetime(["2024-01-01"]),
                "e": pd.to_datetime(["2024-01-02"]),
            }
        )
    )
    for how in ("right", "full", "outer", "left_anti"):
        with pytest.raises(ValueError, match="inner.*left"):
            range_join(
                rows, iv, left_on="ts", start_col="s", end_col="e", how=how
            )


def test_pack_null_id_rejected(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, None], "n_tok": [100, 200, 300]}
    ).astype({"doc_id": "Int64"})
    with pytest.raises(ValueError, match="contains NULLs"):
        pack_token_budget(
            spark.createDataFrame(pdf),
            id_col="doc_id",
            token_col="n_tok",
            budget=450,
        )


def test_salted_join_equals_plain_join(spark):
    from oups_spark.operators.asof import salted_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 1, 2, 3, 9],  # key 1 is hot
                "rid": [10, 11, 12, 13, 14, 15, 16],
                "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    )
    salted = (
        salted_join(left, right, "k", salt_from="rid", n_salts=4)
        .orderBy("rid")
        .toPandas()
    )
    plain = left.join(right, on="k").orderBy("rid").toPandas()
    pd.testing.assert_frame_equal(
        salted.reset_index(drop=True)[sorted(salted.columns)],
        plain.reset_index(drop=True)[sorted(plain.columns)],
    )
    # left join keeps unmatched left rows exactly once
    lsalted = salted_join(
        left, right, "k", salt_from="rid", n_salts=4, how="left"
    )
    assert lsalted.filter(F.col("k") == 9).count() == 1
    with pytest.raises(ValueError):
        salted_join(left, right, "k", salt_from="rid", how="right")


def test_grouped_topk_matches_window(spark):
    import random

    from pyspark.sql import Window
    import pyspark.sql.functions as F

    from oups_spark.operators.pack import grouped_topk

    rng = random.Random(7)
    # skewed: group 'hot' holds 80% of rows; ties in score included
    rows = [
        (
            "hot" if rng.random() < 0.8 else f"g{rng.randrange(6)}",
            float(rng.randrange(50)),
            i,
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "grp string, score double, id long").repartition(7)
    got = {
        (r.grp, r.id, r.rk)
        for r in grouped_topk(
            df, group_col="grp", order_col="score", id_col="id", k=5
        ).collect()
    }
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.col("id"))
    want = {
        (r.grp, r.id, r.rk)
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert got == want


def test_grouped_topk_null_order_values_match_window(spark):
    """NULL order values must rank identically in both phases: the
    contract is nulls-LAST in both directions (pandas na_position=
    'last' in phase 1, asc_nulls_last/desc_nulls_last window in
    phase 2) — a bare asc() window would put nulls first, ranking
    rows phase 1 already dropped."""
    import random

    from pyspark.sql import Window
    import pyspark.sql.functions as F

    from oups_spark.operators.pack import grouped_topk

    rng = random.Random(11)
    rows = [
        (
            f"g{rng.randrange(3)}",
            None if rng.random() < 0.4 else float(rng.randrange(10)),
            i,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "grp string, score double, id long"
    ).repartition(5)
    for asc in (True, False):
        got = {
            (r.grp, r.id, r.rk)
            for r in grouped_topk(
                df,
                group_col="grp",
                order_col="score",
                id_col="id",
                k=4,
                ascending=asc,
            ).collect()
        }
        order = (
            F.col("score").asc_nulls_last()
            if asc
            else F.col("score").desc_nulls_last()
        )
        w = Window.partitionBy("grp").orderBy(order, F.col("id"))
        want = {
            (r.grp, r.id, r.rk)
            for r in df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 4)
            .collect()
        }
        assert got == want, f"ascending={asc}"


def test_pack_sequences_layout(spark):
    """pack_sequences materializes the concat-then-chunk layout: ids
    concatenated in (by, id) order, a doc owned by the pack where it
    starts, boundary map in the same order."""
    import hashlib

    from oups_spark.operators.pack import pack_sequences

    rows = [
        (0, "g", "aa bb cc"),       # 3 tokens
        (1, "g", "dd ee"),          # 2 -> pack 0 holds docs 0,1 (budget 4: doc1 starts at off 3? no: 3 >= budget? floor(3/4)=0)
        (2, "g", "ff gg hh ii jj"), # starts at off 5 -> pack 1
        (3, "g", ""),               # empty doc, off 10 -> pack 2
    ]
    df = spark.createDataFrame(rows, "id long, grp string, text string")
    out = {
        (r["grp"], r["pack_id"]): (r["n_docs"], r["n_tokens"], r["token_ids"], r["doc_ids"])
        for r in pack_sequences(
            df, id_col="id", by="grp", budget=4, vocab_size=64
        ).collect()
    }

    def tid(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    # BPE-ish pre-tokenizer: " bb" keeps the leading space token shape;
    # build expectation with the same md5 vocab on the raw matches
    import re

    from oups_spark.operators.text import BPE_PATTERN

    def ids_of(text):
        return [tid(m) for m in re.findall(BPE_PATTERN, text)]

    assert out[("g", 0)][0] == 2  # docs 0,1 (offsets 0 and 3)
    assert out[("g", 0)][2] == ids_of("aa bb cc") + ids_of("dd ee")
    assert out[("g", 0)][3] == [0, 1]
    assert out[("g", 1)][0] == 1  # doc 2 starts at offset 5
    assert out[("g", 1)][2] == ids_of("ff gg hh ii jj")
    # empty doc lands in the pack of its offset with zero tokens
    assert out[("g", 2)][0] == 1 and out[("g", 2)][1] == 0
    assert out[("g", 2)][2] == [] and out[("g", 2)][3] == [3]


def test_interval_overlap_join_matches_naive(spark):
    """Bucketed interval-overlap join == naive inequality join on
    randomized intervals spanning multiple grid cells (each pair must
    appear exactly ONCE despite sharing several cells), including
    degenerate (empty) intervals which match nothing."""
    import datetime as dt
    import random

    from oups_spark.operators.asof import interval_overlap_join

    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)

    def mk(n, tag):
        rows = []
        for i in range(n):
            s = t0 + dt.timedelta(hours=rng.randrange(0, 200))
            # some spans cross many daily cells; a few are degenerate
            span = rng.choice([0, 1, 5, 30, 80])
            rows.append((f"{tag}{i}", s, s + dt.timedelta(hours=span)))
        return rows

    lrows, rrows = mk(40, "L"), mk(30, "R")
    left = spark.createDataFrame(lrows, "lid string, ls timestamp, le timestamp")
    right = spark.createDataFrame(rrows, "rid string, rs timestamp, re timestamp")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", grid="1D",
        ).collect()
    )
    # an empty interval [t, t) contains no instants: the bare
    # inequality predicate wrongly calls it overlapping, so the naive
    # twin must exclude degenerates like the operator does
    naive = sorted(
        (lid, rid)
        for lid, ls, le in lrows
        for rid, rs, re in rrows
        if ls < le and rs < re and ls < re and rs < le
    )
    assert got == naive
    assert len(got) == len(set(got))  # canonical-cell emit: no dupes


def test_interval_overlap_join_by_key_and_self_source(spark):
    """by-key equality restricts pairs, and both sides deriving from
    ONE source frame must not trip the ambiguous-self-join check."""
    import datetime as dt

    import pyspark.sql.functions as F

    from oups_spark.operators.asof import interval_overlap_join

    t0 = dt.datetime(2024, 1, 1)
    base = spark.createDataFrame(
        [
            ("u1", t0, t0 + dt.timedelta(days=2)),
            ("u1", t0 + dt.timedelta(days=1), t0 + dt.timedelta(days=3)),
            ("u2", t0, t0 + dt.timedelta(days=2)),
        ],
        "k string, s timestamp, e timestamp",
    )
    out = interval_overlap_join(
        base,
        base.select("k", F.col("s").alias("s2"), F.col("e").alias("e2")),
        left_start="s", left_end="e",
        right_start="s2", right_end="e2",
        by="k", grid="1D",
    ).collect()
    # u1 has 2 intervals -> 4 ordered pairs (incl. self-pairs);
    # u2 has 1 -> 1 self-pair; never cross-key
    assert len(out) == 5
    assert all(r["k"] in ("u1", "u2") for r in out)


def test_interval_overlap_join_accepts_ntz_timestamps(spark):
    """ADVICE r9: TIMESTAMP_NTZ interval columns previously produced
    F.sequence(NTZ, LTZ) with mixed operand types (analysis error)
    because only the end bound was cast; both endpoints now cast."""
    import pyspark.sql.functions as F

    from oups_spark.operators.asof import interval_overlap_join

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", "2024-01-01 01:00:00"),
         (2, "2024-01-01 00:30:00", "2024-01-01 02:00:00")],
        "id long, s string, e string",
    ).select(
        "id",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    got = interval_overlap_join(
        df, df, left_start="s", left_end="e",
        right_start="s", right_end="e", grid="1h",
    )
    pairs = {(r["id"], r["id_right"]) for r in got.collect()}
    assert (1, 2) in pairs and (2, 1) in pairs
