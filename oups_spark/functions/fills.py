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


def flatten_struct_columns(
    df: DataFrame, sep: str = "_", max_depth: int | None = None
) -> DataFrame:
    """Flatten struct columns into ``parent_child`` (recursively
    ``parent_child_grandchild``) names — the Spark face of the
    reference's ``conform_cmidx``, which collapses a pandas column
    MultiIndex the same way (``parquet_adapter.py:45-85``); arbitrary
    nesting depth matches a MultiIndex of any number of levels.
    ``max_depth`` bounds the recursion (None = fully flatten)."""

    def expand(prefix_path: str, prefix_name: str, dtype, depth: int):
        if dtype.typeName() == "struct" and (
            max_depth is None or depth < max_depth
        ):
            out = []
            for sub in dtype.fields:
                out.extend(
                    expand(
                        f"{prefix_path}.`{sub.name}`",
                        f"{prefix_name}{sep}{sub.name}",
                        sub.dataType,
                        depth + 1,
                    )
                )
            return out
        return [F.col(prefix_path).alias(prefix_name)]

    cols = []
    for field in df.schema.fields:
        cols.extend(expand(f"`{field.name}`", field.name, field.dataType, 0))
    return df.select(*cols)
