"""Physical-plan regression guards.

PLANS.md records the plan evidence per query; these tests pin the
load-bearing properties so a refactor cannot silently regress them:
filters reaching the parquet scan, small dimensions broadcast, and —
for EVERY registered query — no CartesianProduct node (the only join
strategy that is always wrong at 100 TB; broadcast nested-loop over a
one-row/driver-bounded side is fine and excluded from the ban).
"""

from __future__ import annotations

import pytest

from oups_spark.queries import REGISTRY, load_all_query_modules
from tests.conftest import SF_DIR

load_all_query_modules()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


ALL_QUERIES = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_cartesian_product(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert "CartesianProduct" not in plan_of(df), name


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_of(REGISTRY["pricing_summary"].fn(spark, SF_DIR))
    # the shipdate predicate reaches the parquet scan
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan schema must not include untouched
    # wide columns like l_comment
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema


def test_revenue_by_nation_broadcasts_dims(spark):
    plan = plan_of(REGISTRY["revenue_by_nation"].fn(spark, SF_DIR))
    # nation/region are tiny dimensions: they must broadcast, never
    # shuffle the fact side for them
    assert "BroadcastHashJoin" in plan


def test_dnf_filter_reaches_scan(spark):
    plan = plan_of(REGISTRY["dnf_filter_events"].fn(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters")[1][:300]
    assert pushed.strip().startswith(": []") is False


def test_store_range_read_prunes_and_pushes(spark, scratch):
    import os

    import pandas as pd

    from oups_spark.store.dataset import OrderedDataset

    path = os.path.join(scratch, "plan_ds")
    ds = OrderedDataset(spark, path)
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=100, freq="h"),
            "v": [float(i) for i in range(100)],
        }
    )
    ds.write(df=spark.createDataFrame(pdf), ordered_on="ts", row_group_target_size=20)
    out = ds.read(
        start=pd.Timestamp("2024-01-02"), end_excl=pd.Timestamp("2024-01-03")
    )
    plan = plan_of(out)
    # range predicate pushed to the files that survived manifest pruning
    assert "PushedFilters: [" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan
    assert len(out.inputFiles()) < ds.n_files  # manifest file pruning


def test_exact_dedup_stays_jvm_side(spark):
    # the exact-dedup hot path must not drop into Python workers
    plan = plan_of(REGISTRY["dedup_exact"].fn(spark, SF_DIR))
    for marker in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython"):
        assert marker not in plan


def test_classifier_epoch_agg_is_partial_combined(spark):
    """The per-epoch gradient aggregation must partial-combine
    map-side (the shuffle then carries (dim+1) x n_partitions cells,
    not one row per exploded element) and compute the residual ONCE
    per row, before the posexplode Generate — both load-bearing for
    the 100 TB shape claimed in operators/classifier.py."""
    import pyspark.sql.functions as F

    from oups_spark.operators.classifier import _logit, _round_fixed

    df = spark.createDataFrame(
        [([1.0, 0.0], 1), ([0.0, 1.0], 0)], "features array<double>, label int"
    )
    w = [0.0, 0.0, 0.0]
    xa = F.concat(F.col("features"), F.array(F.lit(1.0)))
    r = _round_fixed(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(F.col("features"), w)))
        - F.col("label").cast("double"),
        6,
    )
    # the operator's two-step shape: residual projected BELOW the
    # explode (fusing both into one select makes Catalyst evaluate
    # the sigmoid fold per exploded element — (dim+1)x the work)
    pre = df.select(r.alias("__r"), xa.alias("__xa"))
    g = (
        pre.select("__r", F.posexplode(F.col("__xa")).alias("d", "x"))
        .groupBy("d")
        .agg(F.avg(F.col("__r") * F.col("x")).alias("g"))
    )
    plan = plan_of(g)
    assert "partial_avg" in plan
    # the Project computing the sigmoid (EXP) must sit BELOW the
    # Generate line, i.e. run once per input row
    gen_pos = plan.index("Generate posexplode")
    assert "EXP" in plan[gen_pos:], "residual must be computed under Generate, once per row"
