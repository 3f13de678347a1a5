"""AggStream: restartable, incremental segmented aggregation.

Re-expresses the reference's streamed aggregation engine (reference:
``oups/aggstream/aggstream.py``) as a batch-incremental driver over
Spark plans:

- the seed is an iterable of ordered DataFrame chunks (a Structured
  Streaming ``foreachBatch`` adapter lives in
  ``oups_spark.streaming.bridge``);
- per chunk and per key: DNF filter fan-out
  (``aggstream.py:571-591``), distributed ``segment_agg`` /
  ``snapshot_agg`` over the chunk, then driver-side stitching of the
  (small, aggregated) bin results across chunk boundaries — the
  reference's accumulator carry (``jcumsegagg`` ``initial/use_init``
  machinery, ``cumsegagg.py:437-442,516-517``) reduced to a
  combine-by-bin of partial aggregates;
- results are flushed to ordered datasets via the store's merge
  write with keep-last dedup on the bin label, so re-emitting the
  open (in-progress) bin *overwrites* its previous partial row —
  the reference's last-row rewrite rule (``aggstream.py:875-887``);
- restart state (restart index, open-bin accumulator, pre/post
  buffers) rides the same manifest swap as the data
  (``key_value_metadata``), making flush atomic: a crash either
  kept the old data+state or the new data+state
  (reference persists the same way, ``aggstream.py:799-806``).

Scale posture: Spark does the heavy per-chunk aggregation (hash agg
over the chunk); only *aggregated bins* (thousands, not billions of
rows) cross the driver for stitching — the same asymmetry the
reference exploits, with Spark replacing the numba kernel.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oups_spark.functions.filters import dnf_filter
from oups_spark.operators.segment import segment_agg, snapshot_agg
from oups_spark.store.dataset import OrderedDataset

_META_KEY = "aggstream"
_PANDAS_AGG = {"first": "first", "last": "last", "min": "min", "max": "max"}


class SeedPreException(RuntimeError):
    """The user ``pre`` hook failed on a seed chunk.

    Crash ergonomics match the reference (``aggstream.py:1508-1528``,
    its ``SeedPreException`` path): everything aggregated from chunks
    BEFORE the failing one — buffered bin/snap frames and restart
    state — is flushed before the exception propagates, so a restart
    resumes from the completed prefix instead of recomputing it."""


@dataclass
class KeyConfig:
    """Per-key aggregation pipeline config (reference keys_config,
    ``aggstream.py:115-271``)."""

    path: str                       # bins dataset directory
    agg: dict                       # {out: (in_col, func)}
    bin_by: str | int | Any         # period string, int = row-count bins,
                                    # an explicit edge sequence / (labels,
                                    # ends) tuple (reference by_scale
                                    # Series), or a BinBy object
    snap_by: str | None = None      # optional snapshot period
    snap_path: str | None = None    # snapshots dataset directory
    filter: list | None = None      # DNF filter for this key
    post: Callable | None = None    # post(buffer, bin_df[, snap_df]) -> df(s)
    tiebreak: list[str] | None = None
    bin_col: str = "bin"
    snap_col: str = "snap"
    row_group_target_size: int | str = 100_000
    origin: Any = None              # TimeGrouper grid anchoring for
    offset: Any = None              # fixed bin_by/snap_by frequencies


def _config_fingerprint(ordered_on: str, cfg: "KeyConfig") -> str:
    """Stable description of the state-shaping parts of a key's
    config. Persisted with the kv state and validated at restart: a
    fresh AggStream pointed at the same datasets with a DIFFERENT
    ``bin_by`` / ``agg`` / ordering would otherwise silently fold its
    output into incompatible carried state (the reference raises on
    mismatched restart indexes/keys, ``aggstream.py:360``). The
    ``filter`` is deliberately excluded — refining a key's DNF filter
    changes which future rows flow in, not the meaning of the state
    already accumulated."""

    import datetime

    def desc(v) -> str:
        if v is None or isinstance(v, (str, int, float, bool)):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(desc(x) for x in v) + "]"
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return repr(str(v))  # stable value repr for edge lists
        # custom binners / callables / anything else: type identity
        # only — default reprs embed memory addresses, and a binner's
        # parameters live in binner_state, carried separately
        return f"<{type(v).__name__}>"

    agg = ",".join(
        f"{k}:{cfg.agg[k][0]}/{cfg.agg[k][1]}" for k in sorted(cfg.agg)
    )
    return (
        f"ordered_on={ordered_on};bin_by={desc(cfg.bin_by)};"
        f"snap_by={desc(cfg.snap_by)};agg={agg};bin_col={cfg.bin_col};"
        f"snap_col={cfg.snap_col};origin={desc(cfg.origin)};"
        f"offset={desc(cfg.offset)}"
    )


@dataclass
class _KeyState:
    restart_index: Any = None       # max ordered_on fully processed
    bin_acc: pd.DataFrame | None = None   # 1-row open-bin accumulator
    post_buffer: dict = field(default_factory=dict)
    bin_buffer: list = field(default_factory=list)   # unflushed bin frames
    snap_buffer: list = field(default_factory=list)  # unflushed snap frames
    rows_so_far: int = 0            # row-count bins: global rank offset
    binner_state: Any = None        # custom BinBy carried state


def _combine_bins(frames: list[pd.DataFrame], agg: dict, bin_col: str) -> pd.DataFrame:
    """Fold chronologically-ordered per-chunk bin frames into one:
    first = first non-null, last = last non-null, min/max elementwise,
    sum with null-preservation (no 0-for-empty: NULL_DICT semantics,
    reference ``cumsegagg.py:42``)."""
    frames = [f for f in frames if f is not None and len(f)]
    if not frames:
        return pd.DataFrame()
    both = pd.concat(frames, ignore_index=True)
    spec: dict[str, Any] = {}
    for out, (_c, func) in agg.items():
        if func in _PANDAS_AGG:
            spec[out] = (out, _PANDAS_AGG[func])
        else:  # sum
            spec[out] = (out, lambda s: s.sum(min_count=1))
    # extra columns (e.g. the row-count bin's first-ts label) carry
    # the first non-null value — a continued bin keeps its original
    # label from the earlier chunk
    for c in both.columns:
        if c != bin_col and c not in spec:
            spec[c] = (c, "first")
    combined = both.groupby(bin_col, sort=True).agg(**spec).reset_index()
    # restore integer dtypes as nullable Int64 (reference nullable-int
    # rule, cumsegagg.py:521-530)
    for c in combined.columns:
        src = both[c]
        if pd.api.types.is_integer_dtype(src) and not pd.api.types.is_integer_dtype(
            combined[c]
        ):
            combined[c] = combined[c].astype("Int64")
    return combined


def _fold_snapshots(
    snap_frames: list[pd.DataFrame],
    bin_frames: list[pd.DataFrame],
    acc0: pd.DataFrame | None,
    agg: dict,
    bin_col: str,
    snap_col: str,
) -> pd.DataFrame:
    """Stitch per-chunk snapshot frames: each chunk's cumulative
    intra-bin values are combined with the open-bin accumulator as of
    the previous chunks (pass-through accumulator semantics,
    reference ``jcumsegagg.py:403-408``)."""
    out_frames: list[pd.DataFrame] = []
    acc = acc0
    for snaps, bins in zip(snap_frames, bin_frames):
        if snaps is None or not len(snaps):
            continue
        s = snaps.copy()
        if acc is not None and len(acc):
            acc_row = acc.iloc[-1]
            mask = s[bin_col] == acc_row[bin_col]
            if mask.any():
                for out, (_c, func) in agg.items():
                    a = acc_row[out]
                    if pd.isna(a):
                        continue
                    cur = s.loc[mask, out]
                    if func == "sum":
                        s.loc[mask, out] = cur.fillna(0) + a
                    elif func == "min":
                        s.loc[mask, out] = np.fmin(cur.astype(float), a)
                    elif func == "max":
                        s.loc[mask, out] = np.fmax(cur.astype(float), a)
                    elif func == "first":
                        s.loc[mask, out] = a
                    elif func == "last":
                        s.loc[mask, out] = cur.where(cur.notna(), a)
        out_frames.append(s)
        acc = _combine_bins([acc, bins], agg, bin_col)
    if not out_frames:
        return pd.DataFrame()
    folded = pd.concat(out_frames, ignore_index=True)
    # later chunks re-emit quiet instants of the same (bin, snap):
    # last write wins
    return folded.drop_duplicates(subset=[bin_col, snap_col], keep="last").sort_values(
        [bin_col, snap_col], ignore_index=True
    )


class AggStream:
    """Incremental multi-key segmented aggregation with restart.

    Usage::

        stream = AggStream(spark, ordered_on="ts", keys={
            "hourly": KeyConfig(path=..., agg={...}, bin_by="1h"),
        })
        stream.agg(seed_chunks)              # incremental
        stream.agg(more_chunks)              # resumes seamlessly
        # process restart: a fresh AggStream re-reads state from the
        # datasets' kv metadata and continues identically.
    """

    def __init__(
        self,
        spark: SparkSession,
        *,
        ordered_on: str,
        keys: dict[str, KeyConfig],
        pre: Callable | None = None,
        max_buffered_bins: int = 100_000,
    ):
        self.spark = spark
        self.ordered_on = ordered_on
        self.keys = keys
        self.pre = pre
        self.pre_buffer: dict = {}
        self.max_buffered_bins = max_buffered_bins
        self.state: dict[str, _KeyState] = {}
        self.seed_remainder: pd.DataFrame | None = None
        # two keys writing the same dataset would interleave
        # incompatible accumulators (reference refuses shared keys,
        # test_aggstream_init.py "not possible to have key")
        paths = [cfg.path for cfg in keys.values()] + [
            cfg.snap_path for cfg in keys.values() if cfg.snap_path
        ]
        if len(set(paths)) != len(paths):
            raise ValueError(
                f"AggStream keys share a dataset path: {sorted(paths)}"
            )
        for name, cfg in keys.items():
            st = _KeyState()
            ds = OrderedDataset(spark, cfg.path)
            meta = ds.key_value_metadata.get(_META_KEY)
            if meta is None and ds.exists and ds.n_rows > 0:
                # existing data that AggStream did not produce: merging
                # aggregation output into it would corrupt both
                # (reference: "provided 'agg_res' not output of a
                # streamagg", test_exception_not_key_of_streamagg_results)
                raise ValueError(
                    f"AggStream key {name!r}: dataset at {cfg.path} exists "
                    f"but was not written by AggStream (no carried state); "
                    f"refusing to merge aggregation output into it"
                )
            if meta:
                want = _config_fingerprint(ordered_on, cfg)
                have = meta.get("config")
                if have is not None and have != want:
                    raise ValueError(
                        f"AggStream key {name!r}: restart config does not "
                        f"match the state recorded at {cfg.path}:\n"
                        f"  recorded: {have}\n  restart:  {want}\n"
                        f"Resuming with a different bin/agg layout would "
                        f"corrupt the carried accumulator; delete the "
                        f"dataset or restore the original config."
                    )
                st.restart_index = meta.get("restart_index")
                st.bin_acc = meta.get("bin_acc")
                st.post_buffer = meta.get("post_buffer", {})
                st.rows_so_far = meta.get("rows_so_far", 0)
                st.binner_state = meta.get("binner_state")
                self.pre_buffer = meta.get("pre_buffer", self.pre_buffer)
            self.state[name] = st

    # ------------------------------------------------------------------
    def agg(
        self,
        seed: Iterable[DataFrame] | DataFrame,
        *,
        trim_start: bool = True,
        discard_last: bool = True,
        final_write: bool = True,
    ) -> None:
        """Consume seed chunks (reference ``agg``,
        ``aggstream.py:1383-1526``).

        ``trim_start``: drop rows already processed (ordered_on <=
        restart index). ``discard_last``: hold back the trailing rows
        sharing each chunk's max ordered_on — they re-enter with the
        next chunk (completeness gate, ``aggstream.py:566-569``).
        """
        if isinstance(seed, DataFrame):
            seed = [seed]
        for chunk in seed:
            try:
                self._process_chunk(
                    chunk, trim_start=trim_start, discard_last=discard_last
                )
            except SeedPreException:
                # flush the completed prefix + restart state before
                # propagating (see SeedPreException docstring)
                self._flush()
                raise
            n_buf = max(
                (sum(len(f) for f in st.bin_buffer) for st in self.state.values()),
                default=0,
            )
            if n_buf >= self.max_buffered_bins:
                self._flush()
        if final_write:
            self._flush()

    # ------------------------------------------------------------------
    def _process_chunk(self, chunk: DataFrame, *, trim_start: bool, discard_last: bool):
        o = F.col(self.ordered_on)
        if self.pre is not None:
            try:
                chunk = self.pre(chunk, self.pre_buffer)
            except Exception as exc:
                raise SeedPreException(
                    f"pre hook failed on seed chunk: {exc}"
                ) from exc

        # prepend the previous chunk's held-back remainder
        if self.seed_remainder is not None and len(self.seed_remainder):
            rem = self.spark.createDataFrame(self.seed_remainder)
            chunk = rem.unionByName(chunk)
            self.seed_remainder = None

        # Global trim is only safe at the min watermark when EVERY key
        # has one: a key with no restart index (new key, or its kv
        # write lagged a crash) still needs the early rows — keys that
        # are ahead skip them via the per-key trim in
        # _agg_chunk_all_keys instead.
        indexes = [st.restart_index for st in self.state.values()]
        restart = (
            None
            if not indexes or any(ix is None for ix in indexes)
            else min(indexes)
        )
        if trim_start and restart is not None:
            chunk = chunk.filter(o > F.lit(restart))

        # persist BEFORE the driver probes: the bounds agg, the
        # discard_last remainder pull and every key's filter+agg all
        # consume this same chunk — caching here collapses what was
        # one source re-scan per probe into a single materialization
        base = chunk = chunk.persist()
        try:
            self._process_cached_chunk(
                chunk, o, restart, trim_start=trim_start, discard_last=discard_last
            )
        finally:
            base.unpersist()

    def _process_cached_chunk(
        self, chunk, o, restart, *, trim_start: bool, discard_last: bool
    ):
        bounds = chunk.agg(
            F.min(self.ordered_on).alias("mn"), F.max(self.ordered_on).alias("mx")
        ).collect()[0]
        if bounds["mn"] is None:
            return  # chunk fully trimmed (FIXTURES F2 tail-chunk case)
        if restart is not None and bounds["mn"] < restart:
            raise ValueError(
                f"seed chunk starts at {bounds['mn']} before restart index "
                f"{restart}: seed is not ordered across chunks"
            )
        chunk_max = bounds["mx"]

        rem_fut = None
        if discard_last:
            # hold back trailing rows sharing the max ordered_on —
            # a possibly-incomplete group (reference rationale,
            # aggstream.py:1429-1448); they re-enter next chunk. The
            # pull is submitted as a CONCURRENT action (guide §2.6):
            # it reads the same persisted chunk as the per-key agg
            # jobs below and nothing depends on its result until the
            # next chunk, so it overlaps them instead of serializing
            # one more job floor ahead of them.
            rem_df = chunk.filter(o == F.lit(chunk_max))
            chunk = chunk.filter(o < F.lit(chunk_max))
            if bounds["mn"] == chunk_max:
                self.seed_remainder = rem_df.toPandas()
                return  # whole chunk held back
            from concurrent.futures import ThreadPoolExecutor

            _rem_pool = ThreadPoolExecutor(max_workers=1)
            rem_fut = _rem_pool.submit(rem_df.toPandas)
            _rem_pool.shutdown(wait=False)
            # Watermark: any value w with processed_max <= w < chunk_max
            # is equivalent to the exact processed max — no row exists in
            # (processed_max, chunk_max), every future row is >= chunk_max,
            # and both the `> watermark` trim and snapshot finality only
            # compare against it. For timestamp/integer streams the
            # predecessor of chunk_max is exact and saves a full second
            # scan of the chunk; other types fall back to the scan.
            import datetime as _dt

            if isinstance(chunk_max, (_dt.datetime, pd.Timestamp)):
                processed_max = pd.Timestamp(chunk_max) - pd.Timedelta(
                    microseconds=1
                )
            elif isinstance(chunk_max, (int, np.integer)):
                processed_max = chunk_max - 1
            else:
                processed_max = chunk.agg(
                    F.max(self.ordered_on).alias("mx")
                ).collect()[0]["mx"]
        else:
            processed_max = chunk_max

        # one cached chunk feeds every key's pipeline (reference
        # fan-out, aggstream.py:1486-1499) — the discard_last filter
        # above is a narrow view over the persisted base, so the N
        # filter+agg jobs still read the cache, not the source
        try:
            self._agg_chunk_all_keys(
                chunk,
                processed_max,
                trim_start=trim_start,
                global_restart=restart if trim_start else None,
            )
        finally:
            # resolve the concurrent remainder pull even when a key's
            # agg failed mid-chunk: the completed prefix + restart
            # state flush (SeedPreException contract) must not leave a
            # dangling Spark action on the unpersisted chunk
            if rem_fut is not None:
                self.seed_remainder = rem_fut.result()

    def _agg_chunk_all_keys(
        self, chunk: DataFrame, processed_max, *, trim_start=True, global_restart=None
    ) -> None:
        """Per-key filter+agg fan-out over the cached chunk.

        Structured as three phases so the independent per-key Spark
        ACTIONS overlap (guide §2.6 — the scheduler happily runs them
        together; they were only sequential because this loop called
        ``toPandas`` one key at a time, paying one scheduler floor per
        key per chunk):

        1. per key, BUILD the aggregation plan(s) and a ``finish``
           closure holding exactly the state updates the old
           sequential body did;
        2. execute every collected plan concurrently;
        3. apply the ``finish`` closures in key order (state updates
           stay deterministic and single-threaded).
        """
        actions: list[tuple] = []  # (dataframes, finish(results))
        self._plan_chunk_all_keys(
            chunk, processed_max, actions,
            trim_start=trim_start, global_restart=global_restart,
        )
        if not actions:
            return
        plans = [df for dfs, _fin in actions for df in dfs]
        if len(plans) == 1:
            results = [plans[0].toPandas()]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(4, len(plans))) as pool:
                results = list(pool.map(lambda d: d.toPandas(), plans))
        i = 0
        for dfs, fin in actions:
            fin(*results[i : i + len(dfs)])
            i += len(dfs)

    def _plan_chunk_all_keys(
        self, chunk, processed_max, actions, *, trim_start, global_restart
    ) -> None:
        o = F.col(self.ordered_on)
        for name, cfg in self.keys.items():
            st = self.state[name]
            filtered = dnf_filter(chunk, cfg.filter)
            # Per-key trim: the chunk is only trimmed to the GLOBAL
            # watermark (min across keys, or nothing when a key has no
            # restart index yet), so a key whose kv write lagged (e.g.
            # post returned empty -> flush skipped) or a newly added
            # key would force the OTHER keys to re-aggregate rows
            # already folded into their persisted bin_acc — sums would
            # double-count.  Each key ahead of the applied global trim
            # resumes from its own watermark instead (the reference
            # raises on mismatched restart indexes, aggstream.py:360;
            # per-key trim preserves its no-double-count invariant
            # while letting the lagged key catch up).
            if (
                trim_start
                and st.restart_index is not None
                and (global_restart is None or st.restart_index > global_restart)
            ):
                filtered = filtered.filter(o > F.lit(st.restart_index))
            if isinstance(cfg.bin_by, int):
                # row-count bins (reference by_x_rows): global bin id
                # continues across chunks via the persisted row count
                from oups_spark.operators.segment import add_row_count_bins

                if cfg.snap_by is not None:
                    raise ValueError("snapshots require a time-grid bin_by")
                binned = add_row_count_bins(
                    filtered, self.ordered_on, cfg.bin_by,
                    tiebreak=cfg.tiebreak, bin_col=cfg.bin_col,
                    rank_offset=st.rows_so_far,
                )
                order_key = F.struct(self.ordered_on, *(cfg.tiebreak or []))
                from oups_spark.operators.segment import _agg_exprs

                plan = (
                    binned.groupBy(cfg.bin_col)
                    .agg(
                        F.min(self.ordered_on).alias("bin_label"),
                        F.count(F.lit(1)).alias("__n"),
                        *_agg_exprs(cfg.agg, order_key),
                    )
                    .orderBy(cfg.bin_col)
                )

                def fin_rows(agged, st=st):
                    st.rows_so_far += int(agged["__n"].sum())
                    st.bin_buffer.append(agged.drop(columns="__n"))
                    st.restart_index = self._advance(
                        st.restart_index, processed_max
                    )

                actions.append(([plan], fin_rows))
                continue
            if isinstance(
                cfg.bin_by, (list, tuple, np.ndarray, pd.Series, pd.Index)
            ):
                # explicit edge grid (reference by_scale Series in the
                # streamed engine, segmentby.py:225-236): the grid is
                # a plan constant, so no carried binner state is
                # needed — each chunk aggregates into the same labeled
                # chunks and _combine_bins folds them across chunk
                # boundaries and restarts (a bin straddling chunks
                # combines exactly like a time bin would)
                if cfg.snap_by is not None:
                    raise ValueError("snapshots require a time-grid bin_by")
                if isinstance(cfg.bin_by, tuple):
                    edge_spec, ends = cfg.bin_by, list(cfg.bin_by[1])
                else:
                    edge_spec = list(cfg.bin_by)
                    ends = edge_spec
                plan = segment_agg(
                    filtered,
                    self.ordered_on,
                    cfg.agg,
                    bin_by=edge_spec,
                    tiebreak=cfg.tiebreak,
                    bin_col=cfg.bin_col,
                )

                def fin_edges(agged, st=st, cfg=cfg, ends=ends):
                    # segment_agg_edges materializes EVERY chunk as a
                    # row (nulls for empty) — but re-emitting a
                    # completed bin as all-null would overwrite its
                    # flushed value via the keep-last merge. Keep (a)
                    # bins this chunk put data in, and (b) empty bins
                    # that became FINAL now (end <= watermark, not
                    # final before): each empty bin materializes
                    # exactly once; trailing bins past the stream's
                    # watermark stay unwritten until they close.
                    has_data = agged[list(cfg.agg)].notna().any(axis=1)
                    ends_s = pd.Series(ends)
                    final_now = ends_s <= processed_max
                    if st.restart_index is not None:
                        final_now &= ends_s > st.restart_index
                    st.bin_buffer.append(
                        agged[(has_data | final_now).to_numpy()]
                    )
                    st.restart_index = self._advance(
                        st.restart_index, processed_max
                    )

                actions.append(([plan], fin_edges))
                continue
            if not isinstance(cfg.bin_by, str):
                # custom BinBy object (reference bin_by callable,
                # segmentby.py:735-800): distributed assignment with
                # the carried state persisted in kv like rows_so_far
                from oups_spark.operators.binby import assign_custom_bins

                if cfg.snap_by is not None:
                    raise ValueError("snapshots require a time-grid bin_by")
                order_key = F.struct(self.ordered_on, *(cfg.tiebreak or []))
                from oups_spark.operators.segment import _agg_exprs

                initial = (
                    st.binner_state
                    if st.binner_state is not None
                    else cfg.bin_by.initial_state()
                )
                binned, new_state = assign_custom_bins(
                    filtered, self.ordered_on, cfg.bin_by,
                    tiebreak=cfg.tiebreak, bin_col=cfg.bin_col,
                    initial_state=initial,
                )
                plan = (
                    binned.groupBy(cfg.bin_col)
                    .agg(
                        F.min(self.ordered_on).alias("bin_label"),
                        *_agg_exprs(cfg.agg, order_key),
                    )
                    .orderBy(cfg.bin_col)
                )

                def fin_custom(agged, st=st, new_state=new_state):
                    st.binner_state = new_state
                    st.bin_buffer.append(agged)
                    st.restart_index = self._advance(
                        st.restart_index, processed_max
                    )

                actions.append(([plan], fin_custom))
                continue
            plans = [
                segment_agg(
                    filtered,
                    self.ordered_on,
                    cfg.agg,
                    bin_by=cfg.bin_by,
                    tiebreak=cfg.tiebreak,
                    bin_col=cfg.bin_col,
                    origin=cfg.origin,
                    offset=cfg.offset,
                )
            ]
            if cfg.snap_by is not None:
                plans.append(
                    snapshot_agg(
                        filtered,
                        self.ordered_on,
                        cfg.agg,
                        bin_by=cfg.bin_by,
                        snap_by=cfg.snap_by,
                        tiebreak=cfg.tiebreak,
                        origin=cfg.origin,
                        offset=cfg.offset,
                        bin_col=cfg.bin_col,
                        snap_col=cfg.snap_col,
                    )
                )

            def fin_time(agged, snaps=None, st=st, cfg=cfg):
                st.bin_buffer.append(agged)
                if snaps is not None:
                    # A snapshot instant s <= previous restart index
                    # is FINAL: under closed-left/right alike, rows
                    # arriving later (ts > restart) are never visible
                    # at s. This chunk's regenerated quiet instants
                    # before its own data would otherwise overwrite
                    # those correct values with the bin-total
                    # accumulator.
                    if st.restart_index is not None:
                        snaps = snaps[snaps[cfg.snap_col] > st.restart_index]
                    st.snap_buffer.append(snaps)
                st.restart_index = self._advance(
                    st.restart_index, processed_max
                )

            actions.append((plans, fin_time))

    @staticmethod
    def _advance(current, new):
        """Watermarks only move forward: a chunk entirely within a
        key's already-processed range must not regress its restart
        index (the per-key trim above makes such chunks no-ops)."""
        return new if current is None or new > current else current

    # ------------------------------------------------------------------
    def _flush_frame(self, pdf: pd.DataFrame):
        """The flush payload for the store write: the stitched frames
        are already driver-local pandas, so convert them straight to
        the Arrow table Spark's own pandas→JVM→Arrow round trip would
        produce (``pandas_to_spark_arrow``) and hand THAT to
        ``write`` — the store's probe then runs with zero Spark jobs
        per flush (guide §1.2: the old shape paid one collect job per
        sink per flush just to round-trip driver-built rows through
        the JVM). Frames with dtypes outside the audited mapping
        (e.g. a ``post`` hook emitting exotic columns) fall back to
        the classic ``createDataFrame`` path — identical semantics,
        one job."""
        from oups_spark.store.dataset import pandas_to_spark_arrow

        tz = self.spark.conf.get("spark.sql.session.timeZone", "UTC")
        tbl = pandas_to_spark_arrow(pdf, tz)
        return tbl if tbl is not None else self.spark.createDataFrame(pdf)

    def _flush(self) -> None:
        for name, cfg in self.keys.items():
            st = self.state[name]
            if not st.bin_buffer:
                continue  # nothing new since last flush
            combined = _combine_bins(
                [st.bin_acc, *st.bin_buffer], cfg.agg, cfg.bin_col
            )
            if not len(combined):
                continue
            snaps_folded = None
            if cfg.snap_by is not None and st.snap_buffer:
                snaps_folded = _fold_snapshots(
                    st.snap_buffer, st.bin_buffer, st.bin_acc, cfg.agg,
                    cfg.bin_col, cfg.snap_col,
                )

            bin_out, snap_out = combined, snaps_folded
            if cfg.post is not None:
                res = (
                    cfg.post(st.post_buffer, combined, snaps_folded)
                    if cfg.snap_by is not None
                    else cfg.post(st.post_buffer, combined)
                )
                if res is not None:
                    if isinstance(res, tuple):
                        bin_out, snap_out = res
                    else:
                        bin_out = res

            meta = {
                "restart_index": st.restart_index,
                "bin_acc": combined.iloc[[-1]],
                "post_buffer": st.post_buffer,
                "pre_buffer": self.pre_buffer,
                "rows_so_far": st.rows_so_far,
                "binner_state": st.binner_state,
                "config": _config_fingerprint(self.ordered_on, cfg),
            }
            # Dual-sink crash atomicity (T8): the two sinks are two
            # separate commits, and restart state (restart_index +
            # accumulator) lives in the BINS dataset's metadata alone
            # — so the snaps commit must land FIRST (WAL ordering:
            # data before the cursor). A crash between the commits
            # then leaves snaps AHEAD of the recorded restart_index;
            # the re-invocation reprocesses that window (seed trim is
            # driven by the bins metadata) and the deterministic
            # recomputation re-emits identical snap rows, which the
            # keep-last merge on (snap, bin) absorbs. The reverse
            # order would advance the cursor with the snaps missing —
            # the window's rows are trimmed on restart and those
            # snapshots are lost for good
            # (test_dual_sink_crash_between_commits_converges).
            if snap_out is not None and len(snap_out) and cfg.snap_path:
                sds = OrderedDataset(self.spark, cfg.snap_path)
                sds.write(
                    df=self._flush_frame(snap_out),
                    ordered_on=cfg.snap_col,
                    duplicates_on=[cfg.bin_col],
                    row_group_target_size=cfg.row_group_target_size,
                    key_value_metadata={_META_KEY: {"restart_index": st.restart_index}},
                    validate_monotonic=False,
                )
            if bin_out is not None and len(bin_out):
                ds = OrderedDataset(self.spark, cfg.path)
                ds.write(
                    df=self._flush_frame(bin_out),
                    ordered_on=cfg.bin_col,
                    duplicates_on=[],  # dedup on bin label (ordered_on)
                    row_group_target_size=cfg.row_group_target_size,
                    key_value_metadata={_META_KEY: meta},
                    validate_monotonic=False,  # sorted by construction
                )
            st.bin_acc = combined.iloc[[-1]]
            st.bin_buffer = []
            st.snap_buffer = []
