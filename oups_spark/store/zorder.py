"""Z-order (Morton) clustering for multi-dimensional data skipping.

A single-column sort gives perfect file pruning on that column and
none on any other. Interleaving the bits of several columns' rank
buckets (the Z-order / Morton curve — the layout behind Delta
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order z-curves, public
docs) makes every file's footer min/max TIGHT ON ALL the clustered
columns at once, so a conjunctive box predicate
(``a BETWEEN .. AND b BETWEEN ..``) prunes most files from the scan
plan no matter which subset of columns it touches.

Pipeline (all JVM-side expressions):

1. per column, ~equi-depth bucket boundaries from one
   ``approx_percentile`` row (at 100 TB the approximation is the
   point — one sketch pass, driver gets ``n_buckets`` doubles);
2. map-side bucket index = #boundaries <= value via a balanced
   binary-search CASE tree over the literal boundaries (Spark's
   ``width_bucket`` is the equi-width 4-arg form; equi-DEPTH buckets
   keep the curve balanced under skewed value distributions);
3. bit interleave of the bucket indices -> ``__z``, with the spread
   bits precomputed driver-side into each search-tree leaf;
4. ``repartitionByRange(n_files, __z)`` + in-partition sort, one
   file per range — parquet footers then carry the tight per-file
   min/max this layout exists for.

The curve changes the LAYOUT, never the rows: readers see the same
table, only with fewer matching files (asserted against footer
stats in tests/test_round8_ops.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_ZBITS = 6  # 64 equi-depth rank buckets per column


def _spread(idx: int, n: int, j: int, bits: int = _ZBITS) -> int:
    """Morton-spread a bucket index driver-side: bit i of column j
    lands at position i*n + j (same mapping the interleave used)."""
    z = 0
    for i in range(bits):
        z |= ((idx >> i) & 1) << (i * n + j)
    return z


def _bucket_spread_tree(
    v: Column, bounds: list[float], n: int, j: int, lo: int, hi: int
) -> Column:
    """Balanced binary-search CASE tree over sorted ``bounds``
    yielding the Morton-SPREAD bucket index ``spread(#bounds <= v)``
    as a literal at each leaf. Equivalent to the fold
    ``sum((v >= b) for b in bounds)`` + bit interleave, but: the
    driver-side tree is O(len(bounds)) nodes referenced ONCE (the
    naive unrolled sum fanned out 6x per interleave bit and blew up
    Catalyst analysis), and per-row cost is log2(len(bounds))
    comparisons instead of len(bounds) interpreted lambda steps."""
    if lo > hi:  # all boundary checks decided -> bucket index == lo
        return F.lit(_spread(lo, n, j)).cast("long")
    mid = (lo + hi) // 2
    # v >= bounds[mid] <=> at least mid+1 boundaries are <= v
    return F.when(
        v >= F.lit(float(bounds[mid])),
        _bucket_spread_tree(v, bounds, n, j, mid + 1, hi),
    ).otherwise(_bucket_spread_tree(v, bounds, n, j, lo, mid - 1))


def _interleave_bucketed(
    vals: list[Column], all_bounds: list[list[float]]
) -> Column:
    """Morton code over per-column equi-depth bucket indices: each
    column contributes a pre-spread literal from its search tree;
    disjoint bit positions OR together. Null in ANY value column
    nulls the whole code (the semantics of the original per-bit
    shift/AND/OR chain, where null propagates through bitwiseOR)."""
    n = len(vals)
    z = F.lit(0).cast("long")
    for j, (v, bounds) in enumerate(zip(vals, all_bounds)):
        spread = F.when(
            v.isNull(), F.lit(None).cast("long")
        ).otherwise(
            _bucket_spread_tree(v, bounds, n, j, 0, len(bounds) - 1)
        )
        z = z.bitwiseOR(spread)
    return z


def zorder_column(
    df: DataFrame, cols: list[str], *, n_buckets: int = 2**_ZBITS
) -> Column:
    """The Morton-curve expression over ``cols`` for ``df``'s value
    distribution: equi-depth bucket boundaries from ONE eager
    ``approx_percentile`` sketch pass over ``df`` (driver receives
    ``n_buckets`` doubles per column), then a map-side codegen'd
    bucket fold + bit interleave. Shared by :func:`zorder_write`
    (fresh layout) and ``OrderedDataset.compact(zorder_by=...)``
    (in-place re-clustering)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    pcts = [i / (n_buckets - 1) for i in range(1, n_buckets - 1)]
    bounds_row = df.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"), F.lit(pcts)
            ).alias(c)
            for c in cols
        ]
    ).first()
    vals = [F.col(c).cast("double") for c in cols]
    all_bounds = [sorted(set(bounds_row[c] or [0.0])) for c in cols]
    return _interleave_bucketed(vals, all_bounds)


def zorder_write(
    df: DataFrame,
    path: str,
    *,
    cols: list[str],
    n_files: int = 16,
    n_buckets: int = 2**_ZBITS,
) -> None:
    """Write ``df`` to ``path`` z-order-clustered on ``cols``."""
    z = zorder_column(df, cols, n_buckets=n_buckets)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] for ``cols`` from parquet FOOTERS only —
    what a stats-pruning reader (or this repo's ordered store
    manifest) consults before planning the scan."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins: dict = {}
        maxs: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    mins[name] = (
                        st.min if name not in mins else min(mins[name], st.min)
                    )
                if st.max is not None:
                    maxs[name] = (
                        st.max if name not in maxs else max(maxs[name], st.max)
                    )
        out.append(
            {"file": f, **{f"{c}_min": mins.get(c) for c in cols},
             **{f"{c}_max": maxs.get(c) for c in cols}}
        )
    return out


def files_matching_box(
    stats: list[dict], box: dict[str, tuple]
) -> int:
    """How many files a conjunctive range predicate must scan, by
    footer stats alone."""
    n = 0
    for s in stats:
        hit = True
        for c, (lo, hi) in box.items():
            if s[f"{c}_min"] is None or s[f"{c}_max"] is None:
                continue
            if s[f"{c}_max"] < lo or s[f"{c}_min"] > hi:
                hit = False
                break
        n += hit
    return n
