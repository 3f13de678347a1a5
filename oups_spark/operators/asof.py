"""As-of joins and interval (range) joins — the two classic
time-series joins Spark's DataFrame API lacks as primitives.

Reference parity: none — the reference (yohplala/oups) stops at
n-way synchronized iteration (``oups/store/iter_intersections.py``);
these are the join-shaped completions of that capability, expressed
Spark-first.

As-of join (``asof_join``): for every left row, the single latest
right row with ``right.on <= left.on`` (direction='backward'; the
mirror for 'forward'), per ``by`` key, optionally bounded by a
``tolerance``. Implemented as the UNION + running-window trick — the
scalable shape:

  tag right rows 0 / left rows 1 → union → one shuffle on ``by`` →
  per-key window ordered by (on, tag): a running ``last(..,
  ignorenulls)`` over UNBOUNDED PRECEDING..CURRENT ROW carries the
  most recent right payload forward onto each left row.

One keyed shuffle total, running (streaming) window state, no
row-at-a-time UDF, no broadcast requirement on either side — both
sides may be arbitrarily large. Equal timestamps match (right sorts
before left at the same instant); ties among right rows at one
instant are broken by the LAST ``tiebreak`` value so results are
deterministic.

Range join (``range_join``): left rows matched to right intervals
``[start, end)``. The naive form is an inequality join (quadratic
blowup); here intervals are EXPLODED onto a fixed period grid so the
join is an equality join on (by, grid_cell) with a residual interval
predicate — the standard bucketed-range-join strategy (same family
as Databricks' range-join bin optimization, public docs), with
AQE handling any residual skew. Grid period defaults to the p95
interval length scale; pick coarser grids for long intervals.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_TAG = "__asof_src"
_VALS = "__asof_vals"
_MTS = "__asof_mts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_right",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the payload of the
    latest (direction='backward') or earliest ('forward') right row
    within the same ``by`` group whose ``on`` does not pass the left
    row's; 'nearest' (pandas ``merge_asof`` parity) takes whichever
    side is closer in ``on``, ties resolving backward. Unmatched rows
    keep nulls (left-join semantics).

    Parameters
    ----------
    on : ordering column name, present in both sides.
    by : equality key column(s) — the shuffle key. Required: an
        un-keyed as-of at scale should go through a range-bucketed
        two-phase plan instead (see ``add_row_count_bins`` for the
        pattern).
    value_cols : right columns to attach (default: all right columns
        except ``on``/``by``), renamed with ``suffix`` on collision.
    tolerance : optional max distance (pandas Timedelta-like or
        numeric) — matches farther than this are nulled out,
        pandas ``merge_asof`` semantics.
    tiebreak : right-side column(s) ordering ties when several right
        rows share one (by, on) instant — the row with the LARGEST
        tiebreak wins (both directions). Without it, equal-instant
        right rows make the match nondeterministic; pre-aggregate the
        right side per (by, on) or pass a tiebreak.
    """
    if isinstance(by, str):
        by = [by]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, on)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in value_cols
    }

    lt = left.withColumn(_TAG, F.lit(1))
    # tiebreak columns must come from the RIGHT side even when left
    # shares the name — unionByName aligns by name, and left rows at
    # an equal instant sort after all right rows (tag) regardless of
    # their own values, so selecting the right column is always safe;
    # excluding shared names silently nulled the sort key for right
    # rows and made equal-instant ties nondeterministic again
    extra_tb = [c for c in (tiebreak or []) if c not in (*by, on)]
    rt = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        *[F.col(c) for c in extra_tb],
        F.struct(*[F.col(c) for c in value_cols]).alias(_VALS),
    ).withColumn(_TAG, F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)

    # within one (on, tag=0) group the tiebreak columns order right
    # rows ascending, so the running `last` picks the LARGEST
    # tiebreak; tag sorts right before left at equal instants
    tb = [F.col(c).asc() for c in (tiebreak or [])]

    def _carry(desc: bool):
        order = [
            F.col(on).desc() if desc else F.col(on).asc(),
            F.col(_TAG).asc(),
            *tb,
        ]
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            F.last(F.col(_VALS), ignorenulls=True).over(w),
            F.last(
                F.when(F.col(_TAG) == 0, F.col(on)), ignorenulls=True
            ).over(w),
        )

    if direction == "nearest":
        # backward and forward carries share the partitioning (one
        # Exchange, two in-partition Sorts); the closer match wins,
        # ties (including exact-instant matches, distance 0 on both
        # sides) resolve BACKWARD so results are deterministic
        dtype = dict(left.dtypes)[on]
        is_ts = dtype.startswith("timestamp")

        def _as_num(c):
            # unix_micros requires TIMESTAMP; NTZ casts losslessly
            # under the session's UTC timezone
            return F.unix_micros(c.cast("timestamp")) if is_ts else c

        vb, mb = _carry(desc=False)
        vf, mf = _carry(desc=True)
        both = (
            both.withColumn("__vb", vb)
            .withColumn("__mb", mb)
            .withColumn("__vf", vf)
            .withColumn("__mf", mf)
        )
        db = F.abs(_as_num(F.col(on)) - _as_num(F.col("__mb")))
        df_ = F.abs(_as_num(F.col(on)) - _as_num(F.col("__mf")))
        pick_b = F.col("__mf").isNull() | (
            F.col("__mb").isNotNull() & (db <= df_)
        )
        out = (
            both.withColumn(
                _VALS, F.when(pick_b, F.col("__vb")).otherwise(F.col("__vf"))
            )
            .withColumn(
                _MTS, F.when(pick_b, F.col("__mb")).otherwise(F.col("__mf"))
            )
            .filter(F.col(_TAG) == 1)
            .drop("__vb", "__mb", "__vf", "__mf")
        )
    else:
        matched, matched_on = _carry(desc=direction == "forward")
        out = (
            both.withColumn(_VALS, matched)
            .withColumn(_MTS, matched_on)
            .filter(F.col(_TAG) == 1)
        )
    if tolerance is not None:
        import pandas as pd

        dtype = dict(left.dtypes)[on]
        if dtype.startswith("timestamp"):
            tol_us = int(pd.Timedelta(tolerance).value // 1000)
            dist = F.abs(
                F.unix_micros(F.col(on).cast("timestamp"))
                - F.unix_micros(F.col(_MTS).cast("timestamp"))
            )
            in_tol = dist <= F.lit(tol_us)
        else:
            in_tol = F.abs(F.col(on) - F.col(_MTS)) <= F.lit(tolerance)
        out = out.withColumn(
            _VALS, F.when(in_tol, F.col(_VALS))
        ).withColumn(_MTS, F.when(in_tol, F.col(_MTS)))
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(_MTS).alias(on + suffix))
    sel.extend(
        F.col(f"{_VALS}.{c}").alias(out_names[c]) for c in value_cols
    )
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    start_col: str,
    end_col: str,
    by: list[str] | str | None = None,
    grid: str = "1D",
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Join left rows to right intervals: match iff
    ``start <= left_on < end`` (and ``by`` keys equal, if given).

    Bucketed plan: each interval explodes onto the ``grid``-period
    cells it spans; left rows map to their single cell; the join is
    an EQUALITY join on (by, cell) + the residual interval predicate
    — never an unbounded inequality join. Cost scales with
    Σ interval_span/grid, so choose ``grid`` near the typical
    interval length.

    Degenerate intervals (``end <= start``) match nothing and are
    dropped before the cell explode (a reversed sequence would
    otherwise error). Right columns whose names collide with left
    ones are renamed with ``suffix``.
    """
    from oups_spark.functions.dates import floor_ts, step_interval_sql

    if how not in ("inner", "left"):
        # the exploded right side makes right/full joins wrong: an
        # unmatched interval spanning k grid cells would emit k
        # null-extended duplicate rows
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    if isinstance(by, str):
        by = [by]
    by = by or []
    # [start, end) spans cells floor(start) .. floor(end - 1µs): an
    # interval ending exactly on a cell edge does not touch that cell
    end_last_us = F.timestamp_micros(F.unix_micros(F.col(end_col)) - 1)
    cells = F.explode(
        F.sequence(
            floor_ts(F.col(start_col), grid),
            floor_ts(end_last_us, grid),
            F.expr(step_interval_sql(grid)),
        )
    ).alias("__cell")
    rt = right.filter(F.col(end_col) > F.col(start_col)).select("*", cells)
    lt = left.withColumn("__cell", floor_ts(F.col(left_on), grid))
    cond = [lt["__cell"] == rt["__cell"]]
    cond.extend(lt[c] == rt[c] for c in by)
    cond.append(lt[left_on] >= rt[start_col])
    cond.append(lt[left_on] < rt[end_col])
    joined = lt.join(rt, on=cond, how=how)
    keep = [lt[c] for c in left.columns]
    keep.extend(
        rt[c].alias(c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in (*by, "__cell")
    )
    return joined.select(*keep)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equality join with SALTED keys for skewed key distributions —
    the manual escape hatch when AQE's skew-join split (enabled in
    the session defaults) can't help: AQE splits oversized SHUFFLE
    partitions, but a single hot KEY whose rows must meet matching
    rows still lands in one task under plain hash partitioning.

    Salting fixes the key side: every left row gets a deterministic
    salt in ``[0, n_salts)`` derived from ``xxhash64(salt_from)``
    (any left column that spreads rows — an id, a timestamp; NOT the
    join key), and the right side is replicated ``n_salts`` times via
    a tiny posexplode, so the join runs on ``(on…, salt)`` and the
    hot key's rows spread over ``n_salts`` tasks. Replication
    multiplies only the RIGHT side — use it dimension-side (small),
    exactly where broadcast is ruled out by size but one key
    dominates the fact side.

    Deterministic (no rand()), so results are stable across retries
    and the oracle can assert bit-equality with the plain join.
    ``how`` is restricted to inner/left: right/full would count
    unmatched right rows once per replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'|'left', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lt = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    rt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return lt.join(rt, on=[*keys, "__salt"], how=how).drop("__salt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list[str] | str | None = None,
    grid: str = "1D",
    suffix: str = "_right",
) -> DataFrame:
    """Interval-x-interval OVERLAP join: emit (left, right) pairs with
    ``l.start < r.end AND r.start < l.end`` (half-open intervals).

    Bucketed plan — never an unbounded inequality join: BOTH sides
    explode onto ``grid``-period cells, the join is an equality join
    on (by, cell) + the residual overlap predicate. An overlapping
    pair shares every cell its overlap spans, so rather than a
    ``distinct`` over the full output the pair is emitted only from
    its CANONICAL cell — the one containing ``greatest(l.start,
    r.start)``, i.e. the overlap's first instant, which exists and is
    unique for every true overlap. Cost scales with
    Σ span/grid per side; choose ``grid`` near the typical interval
    length. Degenerate intervals (end <= start) match nothing.

    At 100 TB the (by, cell) key is the partitioner: time-local pairs
    co-locate, AQE splits hot cells, and the canonical-cell filter
    keeps the join 1-output-per-pair without a dedup shuffle.
    """
    from oups_spark.functions.dates import floor_ts, step_interval_sql

    if isinstance(by, str):
        by = [by]
    by = by or []

    def cells(df, start, end):
        # cast BOTH endpoints: unix_micros rejects TIMESTAMP_NTZ (the
        # session is UTC), and an uncast NTZ start would make
        # F.sequence(NTZ, LTZ) fail analysis on mixed operand types
        end_last_us = F.timestamp_micros(
            F.unix_micros(F.col(end).cast("timestamp")) - 1
        )
        return df.filter(F.col(end) > F.col(start)).select(
            "*",
            F.explode(
                F.sequence(
                    floor_ts(F.col(start).cast("timestamp"), grid),
                    floor_ts(end_last_us, grid),
                    F.expr(step_interval_sql(grid)),
                )
            ).alias("__cell"),
        )

    # the right side's columns are renamed to a reserved prefix before
    # the join: both inputs commonly derive from one source frame, and
    # plain two-sided references would trip Spark's ambiguous-self-join
    # check
    r = "__r_"
    rt_in = right.select(
        *[F.col(f"`{c}`").alias(r + c) for c in right.columns]
    )
    lt = cells(left, left_start, left_end)
    rt = cells(rt_in, r + right_start, r + right_end).withColumnRenamed(
        "__cell", r + "__cell"
    )
    cond = [F.col("__cell") == F.col(r + "__cell")]
    cond.extend(F.col(f"`{c}`") == F.col(r + c) for c in by)
    cond.append(F.col(left_start) < F.col(r + right_end))
    cond.append(F.col(r + right_start) < F.col(left_end))
    # canonical cell: the one holding the overlap's first instant
    cond.append(
        F.col("__cell")
        == floor_ts(
            F.greatest(F.col(left_start), F.col(r + right_start)), grid
        )
    )
    joined = lt.join(rt, on=reduce(lambda a, b: a & b, cond), how="inner")
    # by columns surface from the left side (they are equal anyway)
    keep = [F.col(f"`{c}`") for c in left.columns]
    keep.extend(
        F.col(r + c).alias(c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in by
    )
    return joined.select(*keep)
