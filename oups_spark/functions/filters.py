"""DNF (disjunctive-normal-form) filters.

Same filter language as the reference's ``dataframe_filter``
(reference: ``oups/aggstream/utils.py:16-71``): a filter is a list of
AND-groups, OR-ed together; each term is ``(column, op, value)`` with
ops ``== = != > >= < <= in not-in ~`` (``~`` = boolean NOT of the
column). This is also exactly the shape of parquet pushdown
predicates, so expressing it as Spark ``Column`` logic keeps the
whole thing pushable into the scan.
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_OPS = {
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "in": lambda c, v: c.isin(list(v)),
    "not-in": lambda c, v: ~c.isin(list(v)),
    "~": lambda c, v: ~c,
}


def dnf_term(col: str, op: str, value) -> Column:
    if op not in _OPS:
        raise ValueError(f"unknown filter op {op!r}; valid: {sorted(_OPS)}")
    return _OPS[op](F.col(col), value)


def dnf_condition(filters: list[list[tuple]] | list[tuple]) -> Column:
    """Build a Column from DNF filters.

    ``[[("a", ">", 1), ("b", "==", "x")], [("c", "in", [1, 2])]]``
    means ``(a > 1 AND b = 'x') OR c IN (1, 2)``. A flat list of
    tuples is treated as one AND-group.
    """
    if filters and isinstance(filters[0], tuple):
        filters = [filters]
    groups = [
        reduce(and_, [dnf_term(*term) for term in group]) for group in filters
    ]
    return reduce(or_, groups)


def dnf_filter(df: DataFrame, filters: list[list[tuple]] | list[tuple] | None) -> DataFrame:
    """Apply DNF filters (None / empty -> unchanged)."""
    if not filters:
        return df
    return df.filter(dnf_condition(filters))
