"""Shared pytest fixtures: one SparkSession per test session, a DuckDB
connection with the sf0.001 tables registered as views, and a scratch
directory inside the repo (gitignored)."""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("OUPS_TEST_SF_DIR", "/root/testdata/sf0.001")
# Corpus-dependent oracle generators (the IVF quantizer bakes centroid
# literals from the table it will run against) must read the SAME sf
# the tests query. Set before any oups_spark.queries import — the
# registry is populated, and oracles frozen, at module-import time.
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", SF_DIR)
# pid-scoped so a concurrent driver-check/bench run can never clobber
# a dataset a test is mid-scan on (round-5 flake)
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    f"pid{os.getpid()}",
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from oups_spark.session import get_spark

    # Tests are small: fewer shuffle partitions keep task overhead low.
    sp = get_spark("oups-spark-tests", cpus=8, shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture()
def scratch(request):
    d = os.path.join(SCRATCH, request.node.name.replace("[", "_").replace("]", "_"))
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def assert_matches_oracle(spark_df, duck_con, oracle_sql, *, atol=1e-9, check_row_order=False):
    """Compare a Spark DataFrame against DuckDB oracle output the way
    the driver does: sort columns by name, sort rows, compare values."""
    import pandas as pd

    got = spark_df.toPandas()
    exp = duck_con.sql(oracle_sql).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"column mismatch: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if not check_row_order:
        got = got.sort_values(list(got.columns), ignore_index=True)
        exp = exp.sort_values(list(exp.columns), ignore_index=True)
    else:
        got = got.reset_index(drop=True)
        exp = exp.reset_index(drop=True)
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_datetime64_any_dtype(g) and pd.api.types.is_datetime64_any_dtype(e):
            # Spark yields datetime64[ns], DuckDB datetime64[us]; with
            # differing units assert_series_equal compares raw epoch
            # ints — align the unit first
            g = g.astype("datetime64[ns]")
            e = e.astype("datetime64[ns]")
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            pd.testing.assert_series_equal(
                g.astype(float), e.astype(float), check_names=False, atol=atol, rtol=1e-9
            )
        else:
            # normalize dtypes (e.g. int32 vs int64, datetime units)
            pd.testing.assert_series_equal(
                g, e, check_names=False, check_dtype=False, check_exact=False
            )
