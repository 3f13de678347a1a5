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
