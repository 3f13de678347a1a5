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
2. map-side bucket index = #boundaries <= value, a codegen'd fold
   over the literal boundary array (Spark's ``width_bucket`` is the
   equi-width 4-arg form; the fold gives equi-DEPTH buckets, which
   keep the curve balanced under skewed value distributions);
3. bit interleave of the bucket indices -> ``__z``;
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


def _interleave(cols: list[Column], bits: int = _ZBITS) -> Column:
    """Morton-interleave ``len(cols)`` bucket indices of ``bits``
    bits each: bit i of column j lands at position i*n + j."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
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
    idx_cols = []
    for c in cols:
        bounds = sorted(set(bounds_row[c] or [0.0]))
        # bucket = #boundaries <= v — an UNROLLED sum of comparisons
        # (bucket index in [0, len(bounds)] ⊆ [0, n_buckets)). The
        # straight-line expression whole-stage-codegens to flat Java;
        # the previous ``F.aggregate`` fold over a literal array ran
        # interpreted per row (~60 lambda steps × columns) and was
        # the rewrite's dominant CPU cost — 139 CPU-s over 200k rows
        # at sf0.1, measured round-14 — for identical arithmetic.
        v = F.col(c).cast("double")
        idx = F.lit(0)
        for b in bounds:
            idx = idx + (v >= F.lit(float(b))).cast("int")
        idx_cols.append(idx)
    return _interleave(idx_cols)


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
