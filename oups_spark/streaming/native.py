"""Native Structured Streaming segment aggregation.

Two streaming paths coexist (reference seeds both from the same
aggregation model, ``oups/aggstream/aggstream.py``):

- ``bridge.py``: AggStream as a ``foreachBatch`` sink — EXACT
  restart/holdback semantics, bins re-emitted and overwritten via
  keep-last merge writes.  Right when results must match the batch
  engine bin-for-bin at every instant.
- this module: Spark's own watermark + window machinery —
  ``withWatermark`` bounds state, append mode emits each bin ONCE
  when the watermark passes its end (late rows inside the watermark
  are still folded in).  Right for high-rate production streams: the
  state store handles failures, and bins never need rewriting.

The trade: the watermark path holds back any bin newer than
(max event time - watermark) — the streaming twin of AggStream's
``discard_last`` completeness gate — and drops rows later than the
watermark, where AggStream would raise on disorder.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from oups_spark.functions.dates import (
    _FIXED_SECONDS,
    _MONDAY_EPOCH_US,
    _parse,
    anchor_us,
    period_duration,
)

_UNIT_NAMES = {
    "s": "second", "sec": "second", "m": "minute", "min": "minute",
    "h": "hour", "D": "day", "W": "day",
}


def freq_to_interval(freq: str) -> str:
    """``'4h'`` -> ``'4 hours'`` (Spark window duration syntax);
    fixed frequencies only — streaming windows need a constant
    duration for state management. Weeks become day multiples
    (``'1W'`` -> ``'7 days'``); their Monday anchoring — Spark's
    ``F.window`` aligns to the epoch, a THURSDAY, where batch
    ``floor_ts('W')`` anchors Mondays — is carried by the
    ``startTime`` offset from :func:`window_start_time`, so always
    pass both together (``streaming_segment_agg`` does)."""
    n, unit = _parse(freq)
    if unit == "W":
        n *= 7
    elif unit not in _FIXED_SECONDS and unit != "D":
        raise ValueError(
            f"streaming windows need a fixed-duration frequency, got {freq!r}"
        )
    name = _UNIT_NAMES[unit]
    return f"{n} {name}" + ("s" if n != 1 else "")


def window_start_time(
    freq: str, *, origin=None, offset=None
) -> str | None:
    """The ``F.window`` ``startTime`` interval that aligns a streaming
    grid with batch :func:`floor_ts`: ``F.window`` anchors buckets at
    the epoch (1970-01-01, a Thursday), so a weekly grid needs a
    ``'4 days'`` shift to land on Mondays (floor_ts('W') / pandas
    convention — verified: 2026-08-16 falls in the window starting
    2026-08-10, a Monday), and ``origin``/``offset`` anchors (the
    pandas TimeGrouper contract floor_ts implements for fixed
    frequencies) become ``anchor mod step``. Returns None when the
    default epoch alignment already matches."""
    n, unit = _parse(freq)
    if unit not in _FIXED_SECONDS and unit not in ("D", "W"):
        raise ValueError(
            f"streaming windows need a fixed-duration frequency, got {freq!r}"
        )
    step_us = int(period_duration(freq)) * 1_000_000
    if origin is None and offset is None:
        a = _MONDAY_EPOCH_US if unit == "W" else 0
    else:
        a = anchor_us(origin, offset)
    rem = a % step_us  # non-negative: python % follows the divisor
    return None if rem == 0 else f"{rem} microseconds"


def streaming_segment_agg(
    stream_df: DataFrame,
    ordered_on: str,
    agg: dict,
    *,
    bin_by: str,
    slide_by: str | None = None,
    watermark: str = "0 seconds",
    tiebreak: list[str] | None = None,
    bin_col: str = "bin",
    origin=None,
    offset=None,
) -> DataFrame:
    """Watermarked window aggregation on a streaming DataFrame —
    same agg spec as :func:`segment_agg` (first/last/min/max/sum via
    order-explicit min_by/max_by), bins labeled by their left edge.
    ``slide_by`` makes the windows HOPPING (each row enters
    length/slide overlapping windows — the fan-out happens in the
    stateful operator, state is per open window). ``origin``/
    ``offset`` anchor the grid exactly as batch ``floor_ts`` does
    (pandas TimeGrouper contract; reference ``segmentby.py:211-222``),
    and weekly frequencies anchor Mondays matching ``floor_ts('W')``
    — both via the window's ``startTime``. Use append output mode:
    each window emits exactly once, when the watermark passes its
    end."""
    from oups_spark.operators.segment import _agg_exprs

    order_key = F.struct(ordered_on, *(tiebreak or []))
    # alignment rides on the SLIDE grid (for tumbling windows the
    # slide IS the bin): startTime shifts window starts modulo slide
    slide = slide_by if slide_by is not None else bin_by
    start_time = window_start_time(slide, origin=origin, offset=offset)
    if slide_by is not None or start_time is not None:
        win = F.window(
            F.col(ordered_on),
            freq_to_interval(bin_by),
            freq_to_interval(slide),
            start_time,
        )
    else:
        win = F.window(F.col(ordered_on), freq_to_interval(bin_by))
    agged = (
        stream_df.withWatermark(ordered_on, watermark)
        .groupBy(win.alias("__w"))
        .agg(*_agg_exprs(agg, order_key))
    )
    return agged.select(
        F.col("__w.start").alias(bin_col), *[F.col(o) for o in agg]
    )


def streaming_snapshot_agg(
    stream_df: DataFrame,
    ordered_on: str,
    agg: dict,
    *,
    bin_by: str,
    snap_by: str,
    watermark: str = "0 seconds",
    tiebreak: list[str] | None = None,
    bin_col: str = "bin",
    snap_col: str = "snap",
) -> DataFrame:
    """Native Structured-Streaming twin of :func:`snapshot_agg`
    (reference point-in-time snapshots, ``cumsegagg.py:186-196``):
    at every ``snap_by`` instant, the CUMULATIVE aggregate of the
    in-progress ``bin_by`` bin, closed-left observation (a snapshot
    at instant s observes rows with ts < s), snapshot grid within a
    bin = (bin_start, bin_end] (snap-before-bin-close,
    ``segmentby.py:965-1012``).

    Plan: each row fans out to EVERY instant of its bin's grid that
    observes it — ``explode(sequence(first_observer, bin_end))``, a
    bounded map-side fan-out of at most bin/snap copies (the same
    cost shape as Spark's own hopping windows, which fan each row
    into length/slide open windows) — then one watermarked
    window-aggregation on the observation instant. Each (bin, snap)
    group therefore holds exactly the rows a batch snapshot observes,
    so ordinary first/last/min/max/sum ARE the cumulative values; no
    cross-row running accumulation survives into streaming state, and
    state is bounded by the watermark exactly like any windowed agg.

    Divergence from the batch twin, stated precisely (the oracle for
    ``streaming_native_snapshots`` replays the fan-out literally):
    - WITHIN a populated bin the batch forward-fill is preserved:
      every grid instant from the bin's first observation through
      bin end is emitted, quiet trailing instants carrying the
      cumulative value (they observe the same rows, so the one
      window aggregation reproduces the ffill);
    - instants BEFORE a bin's first observation and entirely-empty
      bins are ABSENT — append mode emits a group only where some
      row is observed (there is no prior value to fill from anyway:
      batch fills those with nulls/zeros of an empty aggregate);
    - instants newer than the final watermark are withheld: a
      snapshot s emits once the watermark (max observation instant
      seen, i.e. the newest populated bin's end) passes s + snap.

    Fixed frequencies only, ``snap_by`` must divide ``bin_by`` —
    streaming state needs constant durations.
    """
    from oups_spark.functions.dates import (
        floor_ts,
        is_fixed_freq,
        next_edge,
        period_duration,
        step_interval_sql,
    )
    from oups_spark.operators.segment import _agg_exprs

    if not (
        isinstance(snap_by, str)
        and is_fixed_freq(bin_by)
        and is_fixed_freq(snap_by)
    ):
        raise ValueError(
            "streaming snapshots need fixed bin_by and snap_by, got "
            f"{bin_by!r}/{snap_by!r} — calendar frequencies and explicit "
            "edge grids stream through streaming_snapshot_calendar_agg"
        )
    bin_us = int(period_duration(bin_by) * 1_000_000)
    snap_us = int(period_duration(snap_by) * 1_000_000)
    if bin_us % snap_us:
        raise ValueError("snap_by must evenly divide bin_by")

    o = F.col(ordered_on)
    bin_start = floor_ts(o, bin_by)
    bin_end = next_edge(bin_start, bin_by)
    # first observing instant, closed-left: the smallest grid point
    # strictly above ts (a row exactly on an edge is observed by the
    # NEXT instant); capped at bin_end by construction since snap_by
    # divides bin_by
    first_obs = next_edge(floor_ts(o, snap_by), snap_by)
    order_key = F.struct(ordered_on, *(tiebreak or []))
    fanned = stream_df.withColumn(bin_col, bin_start).withColumn(
        "__obs",
        F.explode(
            F.sequence(first_obs, bin_end, F.expr(step_interval_sql(snap_by)))
        ),
    )
    agged = (
        fanned.withWatermark("__obs", watermark)
        .groupBy(
            F.window(F.col("__obs"), freq_to_interval(snap_by)).alias("__w"),
            F.col(bin_col),
        )
        .agg(*_agg_exprs(agg, order_key))
    )
    return agged.select(
        F.col(bin_col),
        F.col("__w.start").alias(snap_col),
        *[F.col(a) for a in agg],
    )


def rollup_closed_bins(
    daily: DataFrame,
    agg: dict,
    *,
    bin_by: str,
    day_col: str = "bin",
    bin_col: str = "bin",
) -> DataFrame:
    """CALENDAR frequencies for the native streaming path: Spark's
    window operator needs constant durations, so months/quarters/years
    can't be streamed directly (``freq_to_interval`` rejects them).
    The scalable shape is two-level: stream FIXED daily windows
    (state bounded, append emits each day once — every calendar bin
    holds whole days), sink them, then this EXACT batch rollup of
    closed daily partials into calendar bins, emitting only bins whose
    end has passed the sink's final watermark (max emitted day + 1
    day) — the same completeness gate append mode applies to fixed
    windows.

    Exactness per function over non-empty days: first = first_val of
    the earliest day (``min_by``), last = last_val of the latest,
    min/max/sum fold their partials. ``agg`` maps output column ->
    (daily partial column, func) exactly like ``segment_agg``.
    """
    from oups_spark.functions.dates import floor_ts, next_edge

    bounds = daily.agg(F.max(day_col).alias("mx")).collect()[0]
    if bounds["mx"] is None:
        # schema-stable empty frame: cast the null aggregates to the
        # daily partial columns' dtypes (a bare F.lit(None) would be
        # NullType and break downstream unions / dtype inspection)
        return daily.select(
            F.col(day_col).alias(bin_col),
            *[
                F.lit(None).cast(daily.schema[col].dataType).alias(out)
                for out, (col, _func) in agg.items()
            ],
        ).limit(0)
    import datetime as _dt

    import pandas as pd

    final_wm = pd.Timestamp(bounds["mx"]) + _dt.timedelta(days=1)
    d = F.col(day_col)
    exprs = []
    for out, (col, func) in agg.items():
        c = F.col(col)
        if func == "first":
            exprs.append(F.min_by(c, d).alias(out))
        elif func == "last":
            exprs.append(F.max_by(c, d).alias(out))
        elif func in ("min", "max", "sum"):
            exprs.append(getattr(F, func)(c).alias(out))
        else:
            raise ValueError(f"unknown agg func {func!r}")
    binned = daily.withColumn("__cb", floor_ts(d, bin_by))
    return (
        binned.filter(next_edge(F.col("__cb"), bin_by) <= F.lit(final_wm))
        .groupBy(F.col("__cb").alias(bin_col))
        .agg(*exprs)
    )


def streaming_calendar_agg(
    stream_df: DataFrame,
    ordered_on: str,
    agg: dict,
    *,
    bin_by: str,
    base_path: str,
    bin_col: str = "bin",
    watermark: str = "0 seconds",
    tiebreak: list | None = None,
    row_group_target_size: int | str = 100_000,
):
    """ONE restartable unit for CALENDAR-frequency native streaming
    (VERDICT r11 ask #5): daily-tile stream + exact calendar rollup
    behind a single driver call with a shared on-disk layout under
    ``base_path`` (``daily/`` sink, ``bins/`` result, ``ckpt/``
    stream checkpoint).

    Restart story — every stage is idempotent, so re-invoking after a
    crash ANYWHERE converges to the one-shot result:

    1. the daily stage resumes from Spark's checkpoint (a re-delivered
       micro-batch is absorbed by the sink's keep-last merge on the
       day label);
    2. the rollup stage recomputes every CLOSED calendar bin from the
       daily partials — work ∝ number of daily tiles (365 rows per
       year per key), never corpus size — and lands them in the
       ``bins/`` dataset through the same keep-last merge, replacing
       any stale bins a previous crashed run left behind.

    A crash BETWEEN the stages (daily sink committed, rollup never
    ran) therefore needs no special recovery: the next invocation's
    stream is a checkpointed no-op and the rollup folds the already-
    sunk days (``test_calendar_streaming_restart_between_stages``).

    ``agg`` maps output column -> (input column, func) exactly like
    :func:`segment_agg`; the same spec drives both the daily partials
    and the rollup fold (first = earliest day's first, min/max/sum
    fold losslessly, per :func:`rollup_closed_bins`).

    Returns the ``bins/`` OrderedDataset handle, or ``None`` when no
    calendar bin has closed yet (empty source, or the sunk days all
    belong to the still-open bin) AND no previous invocation created
    the dataset — callers chaining ``.read()`` must handle ``None``
    rather than hit a missing-dataset error.
    """
    import os as _os

    from oups_spark.store.dataset import OrderedDataset

    spark = stream_df.sparkSession
    daily_path = _os.path.join(base_path, "daily")
    bins_path = _os.path.join(base_path, "bins")
    daily = streaming_segment_agg(
        stream_df, ordered_on, agg,
        bin_by="1D", watermark=watermark, tiebreak=tiebreak,
    )
    write_stream_to_dataset(
        daily, daily_path, bin_col="bin",
        checkpoint_dir=_os.path.join(base_path, "ckpt"),
        row_group_target_size=row_group_target_size,
    )
    ds_daily = OrderedDataset(spark, daily_path)
    out = OrderedDataset(spark, bins_path)
    if not ds_daily.exists or ds_daily.n_rows == 0:
        return out if out.exists else None
    rolled = rollup_closed_bins(
        ds_daily.read(),
        {o: (o, func) for o, (_c, func) in agg.items()},
        bin_by=bin_by,
        bin_col=bin_col,
    )
    if rolled.isEmpty():
        # every sunk day belongs to a still-open calendar bin — a
        # previous run's dataset (if any) is already current
        return out if out.exists else None
    out.write(
        df=rolled, ordered_on=bin_col, duplicates_on=[],
        row_group_target_size=row_group_target_size,
        validate_monotonic=False,
    )
    return out


def streaming_snapshot_calendar_agg(
    stream_df: DataFrame,
    ordered_on: str,
    agg: dict,
    *,
    bin_by: str,
    snap_by,
    base_path: str,
    tile_by: str = "1D",
    bin_col: str = "bin",
    snap_col: str = "snap",
    watermark: str = "0 seconds",
    tiebreak: list | None = None,
    row_group_target_size: int | str = 100_000,
    snap_closed: str = "left",
):
    """CALENDAR-frequency and EXPLICIT-EDGE snapshots on the native
    streaming path (round-13 lift of ``streaming_snapshot_agg``'s
    fixed-frequency restriction; reference ``by_scale`` Series
    snapshots, ``segmentby.py:227-234``): point-in-time cumulative
    aggregates of in-progress calendar bins — monthly snaps in yearly
    bins, irregular market-close edges — where Spark's constant-
    duration window operator cannot stream the grids directly.

    Same two-level shape as :func:`streaming_calendar_agg`: stream
    FIXED ``tile_by`` windows (state bounded, each tile emits once at
    watermark passage) into a ``tiles/`` dataset, then an EXACT batch
    re-observation of the closed tiles at the calendar/edge snapshot
    instants, cut at the final watermark. The re-observation is the
    batch :func:`snapshot_agg` itself applied to TILE PARTIALS with
    the tile label as the ordering column — closed-left observation
    of a tile's label is exactly whole-tile observation when snapshot
    instants are tile-aligned (a snapshot at instant s observes tiles
    with label < s ⟺ tile_end <= s ⟺ every row ts < s), so the result
    equals batch ``snapshot_agg`` over the raw rows, filtered to
    ``snap <= final watermark`` (max emitted tile end; any row the
    stream withheld lies at ts >= that instant, so no emitted
    snapshot can observe it, under any watermark delay). Folds are
    lossless per function: first = earliest tile's first (``min_by``
    on the tile label), last = latest tile's last, min/max/sum fold.

    Tile alignment contract (checked): ``tile_by`` is fixed and
    divides a day — calendar bin/snap edges land on whole days, hence
    on the tile grid; a fixed ``snap_by`` must be a multiple of
    ``tile_by``; explicit ``snap_by`` edges must each lie on the tile
    grid (pick a finer ``tile_by`` for sub-day edges).

    ``snap_closed`` (round-14, closing the last native-twin gap vs
    batch/AggStream; reference ``cumsegagg.py:243-252``): ``'left'``
    = a snapshot at instant s observes rows ts < s; ``'right'`` =
    ts <= s. Closed-right needs ROW-level, not tile-level, boundary
    observation — the only rows a tile-level view cannot resolve are
    those EXACTLY ON the tile grid (every snapshot instant is
    tile-aligned; interior rows satisfy ts < s ⟺ ts <= s). So the
    tile stage splits each tile into at most two partials inside the
    SAME streaming aggregation (one extra group key, no extra pass or
    state): an EDGE partial of the rows at exactly the tile label,
    keyed AT the label, and an INTERIOR partial keyed at label + 1µs.
    The batch re-observation then runs ``snap_closed='right'`` over
    those synthetic keys: key <= s includes the edge partial at s
    (row-exact) and every earlier tile, excludes the observing tile's
    interior (label + 1µs > s) — and bin assignment of an edge row on
    a BIN boundary lands in the opening bin, exactly as a raw row
    would (the snapshot at that boundary observes the closing bin
    without it). Cut strictly below the final watermark: a
    closed-right snapshot AT the watermark would need the unemitted
    tile's edge rows.

    Restart story — both stages idempotent, re-invocation after a
    crash anywhere converges: the tile stage resumes from Spark's
    checkpoint (redelivered micro-batches absorbed by the sink's
    keep-last merge on the tile label), and the snapshot stage
    recomputes every emitted (bin, snap) row from the tiles — work ∝
    tiles x snaps-per-bin, never corpus size — replacing stale rows
    through the same keep-last merge (``snap`` instants are unique
    across bins: a bin-end snapshot belongs to the CLOSING bin).

    Returns the ``snaps/`` OrderedDataset handle, or ``None`` when no
    snapshot instant has passed the watermark yet and no previous
    invocation created the dataset.
    """
    import os as _os

    import pandas as pd

    from oups_spark.functions.dates import is_fixed_freq, period_duration
    from oups_spark.operators.segment import snapshot_agg
    from oups_spark.store.dataset import OrderedDataset

    if snap_closed not in ("left", "right"):
        raise ValueError(f"snap_closed must be left|right, got {snap_closed!r}")
    tile_us = int(period_duration(tile_by) * 1_000_000)
    if not is_fixed_freq(tile_by) or (86400 * 1_000_000) % tile_us:
        raise ValueError(
            f"tile_by must be a fixed frequency dividing a day, got {tile_by!r}"
        )
    if is_fixed_freq(bin_by):
        bin_us = int(period_duration(bin_by) * 1_000_000)
        if bin_us % tile_us:
            raise ValueError(
                f"fixed bin_by {bin_by!r} must be a multiple of "
                f"tile_by {tile_by!r}"
            )
    if isinstance(snap_by, str):
        if is_fixed_freq(snap_by):
            snap_us = int(period_duration(snap_by) * 1_000_000)
            if snap_us % tile_us:
                raise ValueError(
                    f"fixed snap_by {snap_by!r} must be a multiple of "
                    f"tile_by {tile_by!r}"
                )
    else:
        off = [
            e for e in snap_by
            if (pd.Timestamp(e).value // 1000) % tile_us
        ]
        if off:
            raise ValueError(
                f"explicit snap_by edges must lie on the {tile_by!r} tile "
                f"grid (offenders: {off[:3]}); use a finer tile_by"
            )

    spark = stream_df.sparkSession
    tiles_path = _os.path.join(base_path, "tiles")
    snaps_path = _os.path.join(base_path, "snaps")
    if snap_closed == "left":
        tiles = streaming_segment_agg(
            stream_df, ordered_on, agg,
            bin_by=tile_by, watermark=watermark, tiebreak=tiebreak,
            bin_col="__tile",
        )
    else:
        # closed-right: split each tile into (edge, interior) partials
        # in the same watermarked aggregation — one extra boolean
        # group key, same state bound, both groups emit once when the
        # tile's window expires
        from oups_spark.operators.segment import _agg_exprs

        order_key = F.struct(ordered_on, *(tiebreak or []))
        edge = (F.unix_micros(F.col(ordered_on)) % tile_us) == 0
        agged = (
            stream_df.withWatermark(ordered_on, watermark)
            .groupBy(
                F.window(
                    F.col(ordered_on), freq_to_interval(tile_by)
                ).alias("__w"),
                edge.alias("__edge"),
            )
            .agg(*_agg_exprs(agg, order_key))
        )
        tiles = agged.select(
            F.when(F.col("__edge"), F.col("__w.start"))
            .otherwise(
                F.col("__w.start") + F.expr("INTERVAL 1 MICROSECOND")
            )
            .alias("__tile"),
            *[F.col(o) for o in agg],
        )
    write_stream_to_dataset(
        tiles, tiles_path, bin_col="__tile",
        checkpoint_dir=_os.path.join(base_path, "ckpt"),
        row_group_target_size=row_group_target_size,
    )
    ds_tiles = OrderedDataset(spark, tiles_path)
    out = OrderedDataset(spark, snaps_path)
    if not ds_tiles.exists or ds_tiles.n_rows == 0:
        return out if out.exists else None
    tiles_df = ds_tiles.read()
    hi = tiles_df.agg(F.max("__tile").alias("mx")).collect()[0]["mx"]
    # synthetic +1µs interior keys floor back onto the tile grid
    hi_us = pd.Timestamp(hi).value // 1000
    final_wm = pd.Timestamp((hi_us - hi_us % tile_us + tile_us) * 1000)
    snaps = snapshot_agg(
        tiles_df,
        "__tile",
        {o: (o, func) for o, (_c, func) in agg.items()},
        bin_by=bin_by,
        snap_by=snap_by,
        snap_closed=snap_closed,
        bin_col=bin_col,
        snap_col=snap_col,
    )
    if snap_closed == "left":
        snaps = snaps.filter(F.col(snap_col) <= F.lit(final_wm))
    else:
        # a closed-right snapshot AT the watermark would observe the
        # unemitted tile's edge rows (ts == final_wm) — cut strictly
        snaps = snaps.filter(F.col(snap_col) < F.lit(final_wm))
    if snaps.isEmpty():
        return out if out.exists else None
    out.write(
        df=snaps, ordered_on=snap_col, duplicates_on=[],
        row_group_target_size=row_group_target_size,
        validate_monotonic=False,
    )
    return out


def fill_snapshot_grid(
    df: DataFrame,
    *,
    bin_by: str,
    snap_by: str,
    bin_col: str = "bin",
    snap_col: str = "snap",
) -> DataFrame:
    """Sink-side calendar fill for :func:`streaming_snapshot_agg`
    output: materialize the quiet instants the append-mode stream
    never emitted, with the BATCH twin's values — null aggregates
    (reference ``cumsegagg.py:556-569``: instants before any data in
    their bin, and entirely-empty bins, are null; trailing quiet
    instants of a populated bin already carry the cumulative value in
    the streamed rows, because the fan-out makes them observe the
    same rows). The result equals batch :func:`snapshot_agg` cut at
    the final watermark (``snap <= max emitted snap``).

    Pure batch post-processing over the sunk dataset — the streaming
    core stays append-mode with once-per-group emission. The grid is
    generated (``F.sequence`` + explode) from three driver-side
    bounds, never collected data rows, and is at most
    n_bins x bin/snap rows: the same size as the result itself.
    """
    from oups_spark.functions.dates import next_edge, step_interval_sql

    bounds = df.agg(
        F.min(bin_col).alias("lo"),
        F.max(bin_col).alias("hi"),
        F.max(snap_col).alias("cut"),
    ).collect()[0]
    if bounds["lo"] is None:
        return df
    spark = df.sparkSession
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(bounds["lo"]).cast("timestamp"),
                    F.lit(bounds["hi"]).cast("timestamp"),
                    F.expr(step_interval_sql(bin_by)),
                )
            ).alias(bin_col)
        )
        .select(
            bin_col,
            F.explode(
                F.sequence(
                    next_edge(F.col(bin_col), snap_by),
                    next_edge(F.col(bin_col), bin_by),
                    F.expr(step_interval_sql(snap_by)),
                )
            ).alias(snap_col),
        )
        # instants past the final watermark stay withheld: the fill
        # adds quiet instants, never future ones
        .filter(F.col(snap_col) <= F.lit(bounds["cut"]))
    )
    return grid.join(df, on=[bin_col, snap_col], how="left").orderBy(
        bin_col, snap_col
    )


def write_stream_to_dataset(
    agged: DataFrame,
    path: str,
    *,
    bin_col: str = "bin",
    checkpoint_dir: str | None = None,
    row_group_target_size: int | str = 100_000,
    available_now: bool = True,
    backend=None,
    conflict_retries: int = 0,
    max_n_off_target_rgs: int | None = None,
    compact_every: int | None = None,
):
    """Sink a streaming aggregation into an OrderedDataset: each
    append-mode micro-batch (closed bins only) goes through the
    ordered merge write, so the dataset stays one sorted,
    size-controlled parquet sequence with exactly-once bins (the
    keep-last dedup on the bin label absorbs Spark's at-least-once
    redelivery after a checkpoint recovery).

    ``backend``: optional ManifestBackend routing each micro-batch's
    manifest commit — an :class:`ObjectStoreBackend` makes the sink's
    exactly-once story compose with conditional-put CAS on S3/GCS:
    Spark's checkpoint replays at-least-once, the keep-last merge
    absorbs redelivery, and the CAS (with ``conflict_retries`` for
    concurrent batch writers) serializes each batch commit against
    any other writer of the same dataset. The sink runs on the
    driver (``foreachBatch``), so the backend instance is shared
    across batches and restarts within a process; on a real object
    store the backend is stateless against the bucket anyway.

    AUTO-MAINTENANCE (round-14; reference auto-coalesces off-target
    row groups on every write, ``write.py:204-217``): a long-running
    sink commits one small file set per micro-batch and would
    otherwise never coalesce — a week of 1-minute micro-batches is
    ~10k files per dataset at 100 TB.
    - ``max_n_off_target_rgs``: passed through to each micro-batch's
      merge write — when the run of undersized files ADJACENT to the
      batch's span reaches this length, the write folds it in (for an
      append-only stream that is the dataset's tail, so the trailing
      small files self-coalesce as the stream advances).
    - ``compact_every``: every N-th micro-batch additionally runs a
      scoped ``compact(row_group_target_size=...)`` maintenance
      commit after its write. Crash-safe by construction: the compact
      is its own CAS commit AFTER the batch's data commit, Spark's
      checkpoint only advances when the sink returns, and a replayed
      batch re-runs both — the keep-last merge absorbs the data
      redelivery and compact is idempotent maintenance (a re-run
      coalesces whatever runs remain, or no-ops).
    """
    from oups_spark.store.dataset import OrderedDataset

    spark = agged.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # no pre-sort: the merge write sorts on the ordering
        # column itself, and within one append-mode micro-batch
        # bin labels are unique (one row per expired window), so
        # the keep-last tiebreak never depends on batch row order.
        # No isEmpty probe either: the write's single-job collect
        # detects the empty batch and no-ops without a commit.
        OrderedDataset(spark, path, backend=backend).write(
            df=batch_df,
            ordered_on=bin_col,
            duplicates_on=[],
            row_group_target_size=row_group_target_size,
            validate_monotonic=False,
            conflict_retries=conflict_retries,
            max_n_off_target_rgs=max_n_off_target_rgs,
        )
        if compact_every and batch_id % compact_every == compact_every - 1:
            ds = OrderedDataset(spark, path, backend=backend)
            if ds.exists:
                ds.compact(
                    row_group_target_size=row_group_target_size,
                    conflict_retries=conflict_retries,
                )

    writer = agged.writeStream.outputMode("append").foreachBatch(sink)
    if available_now:
        writer = writer.trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        # size the state-store layout to the stream (see
        # scoped_shuffle_partitions): every micro-batch pays per
        # state partition, data or not
        n_state = int(os.environ.get("OUPS_STREAM_STATE_PARTITIONS", "8"))
        with scoped_shuffle_partitions(spark, n_state):
            query = writer.start()
            query.awaitTermination()
        return query
    return writer.start()


from contextlib import contextmanager  # noqa: E402  (helper below)


@contextmanager
def scoped_shuffle_partitions(spark, n: int):
    """Temporarily set ``spark.sql.shuffle.partitions`` — a streaming
    query FREEZES this value into its state-store layout at start, so
    it must be sized to the stream's state volume, not the session's
    batch default: every micro-batch touches every state partition
    (delta file + CRC each), making per-batch overhead linear in the
    partition count whatever the data size. The driver-harness
    streams are small; a production deployment sizes this to
    state-volume / executor-memory instead (and cannot change it
    without a new checkpoint — Spark pins it per checkpoint)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
