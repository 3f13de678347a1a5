"""Helpers for loading the driver's test tables.

``load(spark, sf_dir, name)`` reads one parquet table; ``load_all``
registers every table as a temp view so queries can go through
``spark.sql`` when convenient.
"""

from __future__ import annotations

import os

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            dfs[name] = spark.read.parquet(path)
            dfs[name].createOrReplaceTempView(name)
    return dfs
