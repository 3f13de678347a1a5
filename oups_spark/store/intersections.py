"""Synchronized multi-dataset range iteration (reference
``oups/store/store/iter_intersections.py:66-302``).

Two forms:

- ``iter_intersections`` — the API-parity driver-side iterator:
  yields ``{key: pandas.DataFrame}`` chunks covering the same
  ``[start, end_excl)`` span, with global boundaries derived from
  the union of every dataset's per-file ``min`` stats (duplicate
  boundary values collapsed, reference ``:132-134``). Useful for
  driver-side pipelines over modest ranges.

- ``tagged_bucket_union`` — the Spark-idiomatic scale form: one
  distributed DataFrame with every dataset's rows tagged by source
  key and bucketed on a caller-chosen period; downstream
  per-interval logic is a ``groupBy(bucket)`` (+ ``applyInPandas``
  for the general case). A driver-side chunk loop is an anti-pattern
  at 100 TB — this is the shape that distributes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oups_spark.functions.dates import floor_ts


def _boundaries(datasets: dict, start, end_excl) -> list:
    """Global sorted boundary set: union of per-file min values of
    every dataset, trimmed to [start, end_excl), prefixed by start
    (or the global min when start is None)."""
    vals = set()
    for ds in datasets.values():
        for e in ds.manifest.files:
            vals.add(e.min)
    if start is not None:
        vals = {v for v in vals if v > start}
        vals.add(start)
    if end_excl is not None:
        vals = {v for v in vals if v < end_excl}
    return sorted(vals)


def _range_row_estimate(per_ds: list, b, e) -> int:
    """Upper-bound row count over ``[b, e)`` from manifest stats:
    every file whose span touches the range counts fully (ordered
    datasets have non-overlapping files, so mins and maxs are both
    sorted — two bisects per dataset)."""
    import bisect

    total = 0
    for mins, maxs, pref in per_ds:
        lo = bisect.bisect_left(maxs, b)  # first file with max >= b
        hi = bisect.bisect_left(mins, e) if e is not None else len(mins)
        if hi > lo:
            total += pref[hi] - pref[lo]
    return total


def iter_intersections(
    store, keys, start=None, end_excl=None, *, batch_rows: int = 1_000_000
) -> Iterator[dict]:
    """Yield per-interval dicts ``{key: pandas.DataFrame}``.

    Each yielded chunk set covers one ``[b_i, b_{i+1})`` interval of
    the global boundary grid.  Intervals are loaded in BATCHES sized
    by a manifest-estimated row budget (``batch_rows``): consecutive
    intervals are grouped while their covering files stay under the
    budget, each batch is loaded once per key (manifest-pruned), and
    sliced per interval driver-side.  Driver memory is bounded by
    ``max(batch_rows, rows of one interval)`` — matching the
    reference's incremental per-row-group loading
    (``iter_intersections.py:132-193``) rather than the whole range.
    Use ``tagged_bucket_union`` when the per-interval logic itself
    should distribute."""
    datasets = {k: store[k] for k in keys}
    for k, ds in datasets.items():
        if not ds.exists:
            raise FileNotFoundError(f"no dataset for key {k!r}")
    bounds = _boundaries(datasets, start, end_excl)
    if not bounds:
        return
    ends = bounds[1:] + [end_excl]

    per_ds = []
    for ds in datasets.values():
        files = ds.manifest.files
        mins = [f.min for f in files]
        maxs = [f.max for f in files]
        pref = [0]
        for f in files:
            pref.append(pref[-1] + f.n_rows)
        per_ds.append((mins, maxs, pref))

    # greedy batching: extend while the batch's covering files fit
    # the budget (a single oversized interval still forms its own
    # batch — it cannot be subdivided on the boundary grid)
    intervals = list(zip(bounds, ends))
    batches: list[list[tuple]] = []
    cur: list[tuple] = []
    for b, e in intervals:
        if cur and _range_row_estimate(per_ds, cur[0][0], e) > batch_rows:
            batches.append(cur)
            cur = []
        cur.append((b, e))
    if cur:
        batches.append(cur)

    for batch in batches:
        b0, e_last = batch[0][0], batch[-1][1]
        frames = {}
        for k, ds in datasets.items():
            o = ds.ordered_on
            pdf = ds.read(start=b0, end_excl=e_last).orderBy(o).toPandas()
            frames[k] = (o, pdf)
        for b, e in batch:
            out = {}
            for k, (o, pdf) in frames.items():
                m = pdf[o] >= b
                if e is not None:
                    m &= pdf[o] < e
                out[k] = pdf[m].reset_index(drop=True)
            yield out


def tagged_bucket_union(
    dfs: dict[str, DataFrame],
    ordered_on: str,
    *,
    bucket_by: str,
    key_col: str = "key",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Union all datasets tagged with their key, bucketed on a period
    grid — the distributed equivalent of synchronized iteration:
    ``out.groupBy(bucket).applyInPandas(fn)`` runs the per-interval
    logic in parallel over the whole range."""
    frames = []
    for name, df in dfs.items():
        frames.append(
            df.withColumn(key_col, F.lit(name)).withColumn(
                bucket_col, floor_ts(F.col(ordered_on), bucket_by)
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
