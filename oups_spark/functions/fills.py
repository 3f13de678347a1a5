"""Column fills and ordered membership — Spark equivalents of the
reference's numpy utilities (``oups/numpy_utils.py:20-118``)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window, WindowSpec


def ffill(col: str | Column, w: WindowSpec) -> Column:
    """Forward fill over a window ordering (reference ``ffill1d``):
    last non-null value at or before the current row."""
    return F.last(col, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def bfill(col: str | Column, w: WindowSpec) -> Column:
    """Backward fill (reference ``bfill1d``): first non-null value at
    or after the current row."""
    return F.first(col, ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )


def anti_by(df: DataFrame, other: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of ``df`` whose key does not appear in ``other``
    (reference ``isnotin_ordered`` — sortedness is irrelevant to a
    hash anti-join)."""
    return df.join(other, on=on, how="left_anti")


def flatten_struct_columns(df: DataFrame, sep: str = "_") -> DataFrame:
    """Flatten one level of struct columns into ``parent_child``
    names (reference ``conform_cmidx`` handles pandas column
    MultiIndex the same way, ``parquet_adapter.py:45-85``)."""
    cols = []
    for field in df.schema.fields:
        if field.dataType.typeName() == "struct":
            for sub in field.dataType.fields:
                cols.append(
                    F.col(f"`{field.name}`.`{sub.name}`").alias(
                        f"{field.name}{sep}{sub.name}"
                    )
                )
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols)
