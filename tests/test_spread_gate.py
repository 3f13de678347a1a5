"""Row-group-gated scan spreading (round 15).

``load(..., spread=True)`` replaces the unconditional
``repartition(defaultParallelism)`` the text/embedding queries used:
the round-robin exchange must fire ONLY when the parquet input cannot
parallelize by itself (fewer row groups than cores — the sf fixture
shape), and must disappear for a multi-row-group input (the 100 TB
shape), where it would be a full-corpus exchange (VERDICT r14
"what's wrong #2").
"""

from __future__ import annotations

import os

import pytest

from oups_spark.tables import _scan_row_groups, load


@pytest.fixture(scope="module")
def spark():
    from oups_spark.session import get_spark

    return get_spark("test-spread-gate")


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_single_row_group_fixture_still_spreads(spark):
    df = load(spark, SF_DIR, "documents", spread=True).select(
        "doc_id", "text"
    )
    plan = _plan(df)
    assert "RoundRobinPartitioning" in plan
    # the projection is pushed BELOW the exchange: the scan reads (and
    # the exchange carries) only the selected columns
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_multi_row_group_input_pays_no_exchange(spark, tmp_path):
    n = spark.sparkContext.defaultParallelism
    src = os.path.join(SF_DIR, "documents.parquet")
    dst = os.path.join(str(tmp_path), "documents.parquet")
    spark.read.parquet(src).repartition(n + 8).write.parquet(dst)
    assert _scan_row_groups(dst, n) >= n
    df = load(spark, str(tmp_path), "documents", spread=True).select(
        "doc_id", "text"
    )
    assert "Exchange" not in _plan(df)


def test_scan_row_groups_counts_and_caps(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    single = os.path.join(SF_DIR, "documents.parquet")
    assert _scan_row_groups(single, 32) == 1
    # a directory with >= cap part files short-circuits at the cap
    d = str(tmp_path / "many.parquet")
    os.makedirs(d)
    for i in range(5):
        pq.write_table(pa.table({"x": [i]}), os.path.join(d, f"p{i}.parquet"))
    assert _scan_row_groups(d, 4) == 5  # file count alone suffices
    assert _scan_row_groups(d, 5) == 5
