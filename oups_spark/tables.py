"""Helpers for loading the driver's test tables.

``load(spark, sf_dir, name)`` reads one parquet table; ``load_all``
registers every table as a temp view so queries can go through
``spark.sql`` when convenient.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (Spark reads them as
    long nanos under ``spark.sql.legacy.parquet.nanosAsLong``)."""
    try:
        import pyarrow.parquet as pq

        return [f.name for f in pq.read_schema(path) if str(f.type) == "timestamp[ns]"]
    except Exception:  # noqa: BLE001 - non-local path or no footer access
        return []


def ensure_session_confs(spark: SparkSession) -> None:
    """Set the runtime SQL confs query correctness depends on.

    ``load`` must work on ANY SparkSession (the driver harness builds its
    own, without :func:`oups_spark.session.get_spark`), so every conf a
    query's semantics rely on is applied here at runtime rather than only
    at session build time:

    - ``nanosAsLong``: ``events.ts`` is parquet timestamp[ns]; without
      this flag a vanilla session dies with ``PARQUET_TYPE_ILLEGAL``
      before the query runs.  With it, ns columns read as long and
      ``load`` converts to microsecond timestamps (DuckDB truncation).
    - UTC session time zone: timestamp binning/formatting must match the
      DuckDB oracle, which runs in UTC.
    - ANSI off: oracle comparisons rely on permissive null-on-overflow
      arithmetic, matching the engine's documented semantics.
    """
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:  # noqa: BLE001 - conf locked by a custom session
            pass


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    ensure_session_confs(spark)
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        # floor-divide to micros: identical truncation to DuckDB's
        # ns -> us read of the same file.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            dfs[name] = load(spark, sf_dir, name)
            dfs[name].createOrReplaceTempView(name)
    return dfs
