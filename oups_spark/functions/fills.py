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
    df: DataFrame,
    sep: str = "_",
    max_depth: int | None = None,
    return_mapping: bool = False,
):
    """Flatten struct columns into ``parent_child`` (recursively
    ``parent_child_grandchild``) names — the Spark face of the
    reference's ``conform_cmidx``, which collapses a pandas column
    MultiIndex the same way (``parquet_adapter.py:45-85``); arbitrary
    nesting depth matches a MultiIndex of any number of levels.
    ``max_depth`` bounds the recursion (None = fully flatten).

    With ``return_mapping`` returns ``(df, mapping)`` where mapping is
    ``{flat_name: [level, ...]}`` for every column that WAS nested —
    the information :func:`unflatten_struct_columns` needs to invert
    the rename (``sep`` alone is ambiguous when level names contain
    it). Raises if a flat name collides with an existing column."""

    mapping: dict[str, list[str]] = {}
    out_names: list[str] = []

    def expand(prefix_path: str, levels: list[str], dtype, depth: int):
        if dtype.typeName() == "struct" and (
            max_depth is None or depth < max_depth
        ):
            out = []
            for sub in dtype.fields:
                out.extend(
                    expand(
                        f"{prefix_path}.`{sub.name}`",
                        levels + [sub.name],
                        sub.dataType,
                        depth + 1,
                    )
                )
            return out
        flat = sep.join(levels)
        if len(levels) > 1:
            if flat in mapping:
                raise ValueError(
                    f"two struct paths flatten to the same name {flat!r} "
                    f"(separator {sep!r})"
                )
            mapping[flat] = levels
        out_names.append(flat)
        return [F.col(prefix_path).alias(flat)]

    cols = []
    for field in df.schema.fields:
        cols.extend(expand(f"`{field.name}`", [field.name], field.dataType, 0))
    # collision check over ALL surviving output names (not just
    # non-struct top-level fields): with max_depth set, a flattened
    # name could otherwise silently duplicate the name of a struct
    # column left unexpanded
    seen: set[str] = set()
    clash = {n for n in out_names if n in seen or seen.add(n)}
    if clash:
        raise ValueError(
            f"flattened struct column(s) {sorted(clash)} collide with "
            f"other output columns (separator {sep!r})"
        )
    out = df.select(*cols)
    return (out, mapping) if return_mapping else out


def unflatten_struct_columns(
    df: DataFrame, mapping: dict[str, list[str]]
) -> DataFrame:
    """Inverse of :func:`flatten_struct_columns`: rebuild struct
    columns from flat names using the recorded ``{flat: levels}``
    mapping (the Spark face of restoring a pandas column MultiIndex).
    Flat names absent from ``df`` are skipped, so the inverse
    composes with column projection; unmapped columns pass through
    in their original position."""

    def insert(tree: dict, levels: list[str], flat: str) -> None:
        head, rest = levels[0], levels[1:]
        if rest:
            node = tree.setdefault(head, {})
            if not isinstance(node, dict):
                raise ValueError(
                    f"cmidx mapping nests under leaf column {head!r}"
                )
            insert(node, rest, flat)
        else:
            if isinstance(tree.get(head), dict):
                # mirror of the nests-under-leaf check above: a leaf
                # mapping arriving AFTER a deeper path sharing its
                # prefix would silently drop the subtree's columns
                raise ValueError(
                    f"cmidx mapping places leaf column {head!r} where "
                    "deeper paths already nest"
                )
            tree[head] = flat

    roots: dict[str, dict | str] = {}
    order: list[str] = []
    for c in df.columns:
        levels = mapping.get(c)
        if levels is None:
            roots[c] = c
            order.append(c)
        else:
            if levels[0] not in roots:
                order.append(levels[0])
            insert(roots, levels, c)

    def build(node, name: str) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`").alias(name)
        return F.struct(
            *[build(sub, k) for k, sub in node.items()]
        ).alias(name)

    return df.select(*[build(roots[n], n) for n in order])


def interpolate_resample(
    df: DataFrame,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    freq: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-key linear interpolation onto a regular time grid — the
    classic time-series ``resample().interpolate()`` (gap fill with
    straight lines between surrounding observations; the TimescaleDB
    / InfluxDB ``interpolate`` shape). Grid points outside a key's
    observation range stay NULL (strict interior interpolation);
    observations landing exactly on a grid point pass through.

    One keyed shuffle, same union-carry plan as the nearest as-of
    join: observations (tag 0) and grid rows (tag 1) union, the
    previous observation carries forward and the next carries
    backward over ONE hash partitioning (two in-partition sorts, no
    second Exchange), then the lerp is pure arithmetic:

      v = pv + (nv - pv) * (t - pt) / (nt - pt)

    All timestamps fold to microsecond longs first, so the fraction
    is a single correctly-rounded IEEE division — the whole thing
    replays bit-identically in the DuckDB oracle. Observations are
    pre-deduplicated per (key, ts) with ``max`` — an order-sensitive
    mean would not be engine-portable.

    At scale: grid density is the cost dial (rows ≈ keys x
    span/freq); the grid generates map-side from each key's [min,
    max] bounds (one small pre-agg), never from a global calendar.
    """
    from oups_spark.functions.dates import floor_ts, step_interval_sql

    obs = (
        df.groupBy(F.col(key), F.col(ts_col))
        .agg(F.max(F.col(value_col)).alias("__v"))
        # a null-valued observation carries no information — drop it
        # HERE so the prev/next VALUE and TIMESTAMP carries stay in
        # sync (pv skips nulls via ignorenulls, but pt would advance
        # on every observation row and anchor a surviving older
        # value to the null row's timestamp)
        .filter(F.col("__v").isNotNull())
        .withColumn("__tag", F.lit(0))
    )
    # grid bounds come from the null-FILTERED observations: a key
    # whose boundary rows carry NULL values must not widen its grid
    # (and an all-NULL key gets no grid at all) — the same universe
    # the SQL twin derives its bounds from. Filtering df directly
    # (rather than aggregating obs) keeps this a single exchange
    # instead of stacking on obs's (key, ts) pre-agg.
    bounds = df.filter(F.col(value_col).isNotNull()).groupBy(key).agg(
        F.min(ts_col).alias("__mn"), F.max(ts_col).alias("__mx")
    )
    grid = bounds.select(
        F.col(key),
        F.explode(
            F.sequence(
                floor_ts(F.col("__mn"), freq),
                floor_ts(F.col("__mx"), freq),
                F.expr(step_interval_sql(freq)),
            )
        ).alias(ts_col),
    ).withColumn("__tag", F.lit(1))
    both = obs.unionByName(grid, allowMissingColumns=True)

    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).desc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_obs = F.col("__tag") == 0
    pv = F.last(F.when(is_obs, F.col("__v")), ignorenulls=True).over(wb)
    pt = F.last(F.when(is_obs, t_us), ignorenulls=True).over(wb)
    nv = F.last(F.when(is_obs, F.col("__v")), ignorenulls=True).over(wf)
    nt = F.last(F.when(is_obs, t_us), ignorenulls=True).over(wf)
    return (
        both.withColumn("__pv", pv)
        .withColumn("__pt", pt)
        .withColumn("__nv", nv)
        .withColumn("__nt", nt)
        .filter(~is_obs)
        .select(
            F.col(key),
            F.col(ts_col),
            F.round(
                F.when(
                    F.col("__pt") == F.col("__nt"), F.col("__pv")
                ).otherwise(
                    F.col("__pv")
                    + (F.col("__nv") - F.col("__pv"))
                    * (
                        (t_us - F.col("__pt")).cast("double")
                        / (F.col("__nt") - F.col("__pt")).cast("double")
                    )
                ),
                decimals,
            ).alias("v_interp"),
        )
    )
