"""Every registered query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's correctness gate (which runs at sf0.01) so
regressions surface locally before a round ends.
"""

from __future__ import annotations

import pytest

from oups_spark.queries import REGISTRY, load_all_query_modules
from tests.conftest import SF_DIR, assert_matches_oracle

load_all_query_modules()

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    assert_matches_oracle(q.fn(spark, SF_DIR), duck, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
