"""HLL sketch operator: accuracy vs exact distinct, mergeability, and
cross-engine determinism of the register table."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from oups_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_register_table,
)


def _ids(spark, n, prefix="item"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("x")
    )


def test_hll_accuracy_within_std_error(spark):
    # p=8 -> sigma ~ 6.5%; 5 sigma bound keeps this deterministic-ish
    # (the sketch itself is fully deterministic; the bound is about
    # hash luck for this fixed input, measured once and stable).
    for n in (50, 500, 5000):
        est = hll_distinct(_ids(spark, n), "x", p=8).collect()[0][0]
        assert abs(est - n) / n < 0.2, (n, est)


def test_hll_duplicates_do_not_move_estimate(spark):
    once = hll_distinct(_ids(spark, 300), "x", p=8).collect()[0][0]
    dup = _ids(spark, 300).union(_ids(spark, 300)).union(_ids(spark, 300))
    thrice = hll_distinct(dup, "x", p=8).collect()[0][0]
    assert once == thrice


def test_hll_registers_merge_by_max(spark):
    """Register tables from two disjoint slices merged with
    union+max(M) give the same estimate as sketching the union —
    the property that makes per-batch persisted sketches sound."""
    a = _ids(spark, 200, "a")
    b = _ids(spark, 300, "b")
    ra = hll_register_table(a, "x", p=8)
    rb = hll_register_table(b, "x", p=8)
    merged = (
        ra.union(rb).groupBy("j").agg(F.max("M").alias("M"))
    )
    direct = hll_distinct(a.union(b), "x", p=8).collect()[0][0]
    via_merge = hll_estimate(merged, p=8).collect()[0][0]
    assert direct == via_merge


def test_hll_grouped(spark):
    df = spark.range(400).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("x"),
    )
    rows = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct(df, "x", ["g"], p=8).collect()
    }
    assert set(rows) == {"0", "1"}
    for v in rows.values():
        assert abs(v - 200) / 200 < 0.2


def test_hll_register_table_is_bounded(spark):
    regs = hll_register_table(_ids(spark, 5000), "x", p=6)
    assert regs.count() <= 64


@pytest.mark.parametrize("p", [6, 8, 10])
def test_hll_duckdb_twin_matches(spark, duck, p):
    """The oracle generator replays the exact same sketch: estimates
    agree to the rounded decimal for several precisions."""
    from oups_spark.operators.sketch import hll_oracle_sql

    df = spark.range(700).select(
        F.concat(F.lit("w"), F.col("id")).alias("x"),
        F.lit("g").alias("g"),
    )
    got = hll_distinct(df, "x", ["g"], p=p).collect()[0]["approx_distinct"]
    sql = hll_oracle_sql(
        "SELECT 'g' AS g, 'w' || CAST(range AS VARCHAR) AS x FROM range(700)",
        "x",
        ["g"],
        p=p,
    )
    want = duck.sql(sql).fetchall()[0][1]
    assert got == want


def test_countmin_never_undercounts(spark):
    from oups_spark.operators.sketch import (
        countmin_estimate,
        countmin_register_table,
    )

    # zipf-ish: token k appears 400//k times
    rows = [(f"t{k}",) for k in range(1, 40) for _ in range(400 // k)]
    df = spark.createDataFrame(rows, ["tok"])
    regs = countmin_register_table(df, "tok")
    est = {
        r["tok"]: r["cm_count"]
        for r in countmin_estimate(regs, df, "tok").collect()
    }
    exact = {f"t{k}": 400 // k for k in range(1, 40)}
    for t, n in exact.items():
        assert est[t] >= n  # CM is an upper bound
    # with depth 4 x width 1024 and ~2k items, estimates are tight
    assert sum(est[t] - exact[t] for t in exact) == 0


def test_countmin_registers_merge_by_sum(spark):
    import pyspark.sql.functions as F

    from oups_spark.operators.sketch import (
        countmin_estimate,
        countmin_register_table,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, ["tok"])
    b = spark.createDataFrame([("x",)] * 3 + [("z",)] * 7, ["tok"])
    ra = countmin_register_table(a, "tok")
    rb = countmin_register_table(b, "tok")
    merged = ra.union(rb).groupBy("i", "b").agg(F.sum("c").alias("c"))
    direct = countmin_register_table(a.union(b), "tok")
    cand = spark.createDataFrame([("x",), ("y",), ("z",)], ["tok"])
    e1 = {
        r["tok"]: r["cm_count"]
        for r in countmin_estimate(merged, cand, "tok").collect()
    }
    e2 = {
        r["tok"]: r["cm_count"]
        for r in countmin_estimate(direct, cand, "tok").collect()
    }
    assert e1 == e2 == {"x": 8, "y": 2, "z": 7}


def test_countmin_register_table_is_bounded(spark):
    from oups_spark.operators.sketch import countmin_register_table

    df = spark.range(5000).selectExpr("CAST(id AS STRING) AS tok")
    regs = countmin_register_table(df, "tok", depth=2, width=64)
    assert regs.count() <= 2 * 64


def test_histogram_quantiles_close_to_exact(spark):
    import numpy as np

    from oups_spark.operators.sketch import histogram_quantiles

    rng = np.random.RandomState(7)
    vals = rng.gamma(2.0, 10.0, 4000).tolist()
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r["q"]: r["approx_value"]
        for r in histogram_quantiles(df, "v", [0.1, 0.5, 0.9]).collect()
    }
    width = (max(vals) - min(vals)) / 128
    for q in (0.1, 0.5, 0.9):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= width + 1e-9, (q, got[q], exact)


def test_histogram_quantiles_degenerate_group(spark):
    from oups_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([("a", 5.0)] * 10 + [("b", 1.0), ("b", 2.0)],
                               ["g", "v"])
    got = {
        (r["g"], r["q"]): r["approx_value"]
        for r in histogram_quantiles(df, "v", [0.5], ["g"]).collect()
    }
    assert got[("a", 0.5)] == 5.0
    assert 1.0 <= got[("b", 0.5)] <= 2.0


def test_bloom_no_false_negatives(spark):
    from oups_spark.operators.sketch import bloom_probe, bloom_word_table

    members = spark.range(500).selectExpr("'m' || CAST(id AS STRING) AS g")
    words = bloom_word_table(members, "g")
    got = {
        r["g"]: r["bloom_hit"]
        for r in bloom_probe(words, members, "g").collect()
    }
    assert all(got.values())  # every member must test positive


def test_bloom_false_positive_rate_bounded(spark):
    from oups_spark.operators.sketch import bloom_probe, bloom_word_table

    members = spark.range(2000).selectExpr("'m' || CAST(id AS STRING) AS g")
    others = spark.range(2000).selectExpr("'x' || CAST(id AS STRING) AS g")
    words = bloom_word_table(members, "g")
    hits = (
        bloom_probe(words, others, "g")
        .where("bloom_hit")
        .count()
    )
    # k=3, n=2000, m=65536 -> fp ~ (1-exp(-3*2000/65536))^3 ~ 6e-4
    assert hits <= 20


def test_bloom_words_merge_by_or(spark):
    import pyspark.sql.functions as F

    from oups_spark.operators.sketch import bloom_probe, bloom_word_table

    a = spark.range(100).selectExpr("'a' || CAST(id AS STRING) AS g")
    b = spark.range(100).selectExpr("'b' || CAST(id AS STRING) AS g")
    merged = (
        bloom_word_table(a, "g")
        .union(bloom_word_table(b, "g"))
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_word_table(a.union(b), "g")
    mm = {r["w"]: r["bits"] for r in merged.collect()}
    dd = {r["w"]: r["bits"] for r in direct.collect()}
    assert mm == dd


def test_hll_pairwise_overlap_accuracy(spark):
    import pyspark.sql.functions as F

    from oups_spark.operators.sketch import (
        hll_pairwise_overlap,
        hll_register_table,
    )

    # groups A and B share 300 of 500 items each
    a = spark.range(500).selectExpr("'A' AS g", "'i' || CAST(id AS STRING) AS x")
    b = spark.range(200, 700).selectExpr(
        "'B' AS g", "'i' || CAST(id AS STRING) AS x"
    )
    regs = hll_register_table(a.union(b), "x", ["g"], p=10)
    row = hll_pairwise_overlap(regs, "g", p=10).collect()[0]
    assert row["group_a"] == "A" and row["group_b"] == "B"
    assert abs(row["approx_union"] - 700) / 700 < 0.15
    assert abs(row["approx_intersection"] - 300) / 300 < 0.35

def test_histogram_quantiles_ignore_nulls(spark):
    """NULL values must not shift the rank math: a NULL bucket sorts
    NULLS FIRST in Spark's ASC window, which used to inflate every
    cumulative count while __n already excluded the null rows."""
    from oups_spark.operators.sketch import histogram_quantiles

    clean = [(float(v),) for v in range(1, 101)]
    dirty = clean + [(None,)] * 37
    df_c = spark.createDataFrame(clean, "v double")
    df_d = spark.createDataFrame(dirty, "v double")
    qs = [0.1, 0.5, 0.9]
    got_c = {
        r["q"]: r["approx_value"]
        for r in histogram_quantiles(df_c, "v", qs).collect()
    }
    got_d = {
        r["q"]: r["approx_value"]
        for r in histogram_quantiles(df_d, "v", qs).collect()
    }
    assert got_c == got_d


def test_histogram_quantiles_nulls_match_oracle(duck, spark):
    """Cross-engine: with NULLs present, Spark and the DuckDB replay
    still agree (the oracle filters them in its bucketing CTE)."""
    from oups_spark.operators.sketch import (
        histogram_quantile_oracle_sql,
        histogram_quantiles,
    )

    rows = [(("g%d" % (i % 2)), float(i)) for i in range(200)]
    rows += [("g0", None), ("g1", None), ("g1", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(
        (r["g"], r["q"], r["approx_value"])
        for r in histogram_quantiles(df, "v", [0.25, 0.75], ["g"]).collect()
    )
    src = " UNION ALL ".join(
        f"SELECT '{g}' AS g, {'NULL' if v is None else v} AS v"
        for g, v in rows
    )
    sql = histogram_quantile_oracle_sql(src, "v", [0.25, 0.75], ["g"])
    want = sorted((g, q, v) for g, q, v in duck.sql(sql).fetchall())
    assert got == want


def test_countmin_grouped_probe_respects_groups(spark):
    """A register table built per group must be probed per group —
    joining on (i, b) alone would sum counters across groups."""
    from oups_spark.operators.sketch import (
        countmin_estimate,
        countmin_register_table,
    )

    rows = [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 9
    df = spark.createDataFrame(rows, ["g", "tok"])
    regs = countmin_register_table(df, "tok", ["g"])
    est = {
        (r["g"], r["tok"]): r["cm_count"]
        for r in countmin_estimate(regs, df, "tok", ["g"]).collect()
    }
    assert est == {("a", "x"): 5, ("a", "y"): 2, ("b", "x"): 9}


def test_countmin_grouped_register_rejects_ungrouped_probe(spark):
    from oups_spark.operators.sketch import (
        countmin_estimate,
        countmin_register_table,
    )

    df = spark.createDataFrame([("a", "x"), ("b", "x")], ["g", "tok"])
    regs = countmin_register_table(df, "tok", ["g"])
    with pytest.raises(ValueError, match="grouping columns"):
        countmin_estimate(regs, df, "tok")


def test_fixed_grid_counts_merge_equals_one_shot(spark):
    """The mergeability contract streaming_quantile_ingest rests on:
    per-batch fixed-grid counts summed == one-shot counts over the
    union, and the quantile estimates from either table agree. Also
    pins edge-bucket clamping for out-of-range values."""
    import pyspark.sql.functions as SF

    from oups_spark.operators.sketch import (
        fixed_grid_counts,
        fixed_grid_quantiles,
    )

    grid = {"lo": 0.0, "hi": 100.0, "n_bins": 16}
    df = spark.range(1_000).select(
        (SF.col("id") % 3).cast("string").alias("g"),
        # values 0..124: the >100 tail must clamp into bucket 15
        (SF.col("id") % 125).cast("double").alias("v"),
    )
    a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    merged = (
        fixed_grid_counts(a, "v", ["g"], **grid)
        .unionByName(fixed_grid_counts(b, "v", ["g"], **grid))
        .groupBy("g", "b")
        .agg(SF.sum("c").alias("c"))
    )
    oneshot = fixed_grid_counts(df, "v", ["g"], **grid)
    m = {(r["g"], r["b"]): r["c"] for r in merged.collect()}
    o = {(r["g"], r["b"]): r["c"] for r in oneshot.collect()}
    assert m == o
    assert max(bkt for _, bkt in o) == 15  # clamped tail present

    qm = {
        (r["g"], r["q"]): r["approx_value"]
        for r in fixed_grid_quantiles(merged, [0.5, 0.99], ["g"], **grid).collect()
    }
    qo = {
        (r["g"], r["q"]): r["approx_value"]
        for r in fixed_grid_quantiles(oneshot, [0.5, 0.99], ["g"], **grid).collect()
    }
    assert qm == qo and len(qm) == 6


def test_fold_register_write_equals_distributed(spark, tmp_path):
    """The driver-side register fold (round 15) must leave the SAME
    register table behind as the distributed union+groupBy plan it
    replaces — both merge orders, sum and max."""
    import pyspark.sql.functions as F

    from oups_spark.operators.sketch import (
        fold_register_write,
        hll_register_table,
    )
    from oups_spark.store.dataset import OrderedDataset

    rows = [(f"s{i % 3}", f"tok{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "source string, tok string")
    a = df.filter(F.col("tok").substr(4, 10).cast("int") % 2 == 0)
    b = df.filter(F.col("tok").substr(4, 10).cast("int") % 2 == 1)

    def run(path, driver_fold: bool):
        ds = OrderedDataset(spark, path)
        for batch in (a, b):
            regs = hll_register_table(batch, "tok", ["source"], p=6)
            if driver_fold:
                fold_register_write(
                    spark, ds, regs,
                    keys=["source", "j"], value_col="M", merge="max",
                    ordered_on="source",
                )
            else:
                merged = regs
                if ds.exists:
                    merged = (
                        ds.read()
                        .unionByName(regs)
                        .groupBy("source", "j")
                        .agg(F.max("M").alias("M"))
                    )
                ds.write(
                    df=merged.orderBy("source", "j"),
                    ordered_on="source",
                    duplicates_on=["source", "j"],
                    row_group_target_size=100_000,
                    validate_monotonic=False,
                )
        return ds

    ds_fold = run(str(tmp_path / "fold"), True)
    ds_dist = run(str(tmp_path / "dist"), False)
    got = [tuple(r) for r in ds_fold.read(ordered=True).collect()]
    want = [tuple(r) for r in ds_dist.read(ordered=True).collect()]
    assert sorted(got) == sorted(want)
    # same dtypes on disk
    import os

    import pyarrow.parquet as pq

    sa = pq.read_schema(
        os.path.join(ds_fold.path, ds_fold._manifest.files[0].name)
    )
    sb = pq.read_schema(
        os.path.join(ds_dist.path, ds_dist._manifest.files[0].name)
    )
    assert sa == sb
