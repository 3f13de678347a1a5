"""Bucketed (pre-shuffled) tables and co-located joins.

The 100 TB fact-to-fact join problem: a shuffle join on two large
tables moves BOTH sides over the network every time the join runs.
Bucketing pays that shuffle ONCE at write time — each table is
hash-partitioned into a fixed number of buckets on the join key and
each bucket written pre-sorted — after which any number of joins on
that key are Exchange-free: Spark's bucketed scan exposes the
hash-partitioning to the planner and the SortMergeJoin consumes both
sides in place (``spark.sql.sources.bucketing.enabled``, public
Spark SQL docs; same design as Hive bucketed tables).

Local note: bucket metadata lives in the session catalog
(``saveAsTable`` — path-based parquet writes cannot carry it). The
tables are registered as EXTERNAL tables with explicit scratch
paths in the session's in-memory catalog, so no Hive metastore is
required and concurrent processes cannot collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    *,
    name: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed table: hash-bucketed on
    ``bucket_col`` into ``n_buckets`` files per partition, each
    bucket internally sorted (so the downstream SortMergeJoin skips
    its Sort too). Re-registers on rerun (same session, bench reps).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = df.write.mode("overwrite").option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. The
    ``merge`` hint pins SortMergeJoin (broadcast would hide the
    co-location; at the sizes bucketing targets, broadcast is not an
    option anyway) — with matching bucketing on both scans the
    planner inserts NO Exchange under the join."""
    lt = spark.table(left_name).hint("merge")
    rt = spark.table(right_name)
    return lt.join(rt, on=on, how=how)
