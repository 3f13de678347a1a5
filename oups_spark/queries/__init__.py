"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (plus the LLM-pipeline additions) gets
a named entry here: a Spark callable ``(spark, sf_dir) -> DataFrame``
and, when SQL-expressible, a DuckDB oracle string over the same parquet
tables. ``__spark_entry__.py`` exposes the registry to the driver.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver hash-compares values
after sorting columns by name). Floating-point aggregates are rounded
on both sides so cross-engine summation-order differences cannot flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every query module so registration side-effects run."""
    from oups_spark.queries import (  # noqa: F401
        core,
        join_ops,
        llm_ops,
        misc_ops,
        quality_ops,
        retrieval_ops,
        segment_ops,
        store_ops,
        stream_ops,
        window_ops,
    )
