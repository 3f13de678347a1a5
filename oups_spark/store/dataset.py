"""OrderedDataset: a manifest-backed ordered parquet dataset with
rewrite-minimal merge writes.

Re-expresses the reference's core sink — ordered merge/update write
with keep-last dedup and row-group size control (reference:
``oups/store/ordered_parquet_dataset/write/write.py:78-271`` and the
OAR merge strategies) — as a single Spark DataFrame plan per write:

    overlap file selection (manifest min/max, the OAR analysis
    collapsed to file granularity)
    → read ONLY overlapping files, union with the new batch under an
      explicit source-rank (old=0, new=1) + in-batch position
    → keep-last window dedup on ``duplicates_on ∪ {ordered_on}``
      (tiebreak: src_rank desc, position desc — the reference's
      "stable sort, new after old" rule made explicit, reference
      ``iter_merge_split_data.py:112-119``)
    → ``repartitionByRange(ordered_on)`` + ``sortWithinPartitions``
      + ``maxRecordsPerFile`` for row-count targets, or a
      period-column ``partitionBy`` for time-period targets
    → atomic manifest swap; untouched files are never rewritten.

Scale posture: the only data ever moved is (overlapping files + new
batch); the shuffle is a range-repartition of exactly that data; the
manifest prunes before any Spark job is launched, so an append to a
100 TB dataset touches one file.
"""

from __future__ import annotations

import functools
import os
import shutil
import urllib.parse
import uuid
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import StructType

from oups_spark.functions.dates import floor_ts, floor_ts_scalar
from oups_spark.store.manifest import (
    FileEntry,
    Manifest,
    ManifestConflictError,
)

# Reference default: 6_345_000 rows ≈ 290 MB for 6 numeric columns
# (reference: write.py:32,107-111). Same order of magnitude as a
# healthy parquet file at cluster scale.
DEFAULT_ROW_GROUP_TARGET_SIZE = 6_345_000
# A file is "off target" below 80% of target (reference:
# n_rows_strategy.py:33,136).
ON_TARGET_SCALE_FACTOR = 0.8

# batch + overlap row bound under which a merge write runs
# driver-side with pyarrow (one Spark collect job) instead of the
# distributed merge job train — the frequent-small-flush latency path
_DRIVER_MERGE_MAX_ROWS = 100_000
# ...and the BYTE bound on the collected Arrow table: the row cap does
# not bound bytes when the payload is wide text (100k multi-KB
# documents is multi-GB), so the auto gate also estimates bytes —
# fixed-width from the schema, string columns measured with one cheap
# octet_length agg, old files from their on-disk size — and only takes
# the driver path under this budget.
_DRIVER_MERGE_MAX_BYTES = 128 << 20
# snappy-parquet -> in-memory Arrow inflation assumed for old files
_PARQUET_INFLATION = 4

_SRC = "__oups_src"
_FIDX = "__oups_fidx"
_FNAME = "__oups_fname"
_POS = "__oups_pos"
_ZCOL = "__oups_zorder"  # transient Morton-curve layout key
# manifest kv key remembering write(bloom_cols=...) so later appends
# keep indexing (plain name: dunder-keyed kv dicts read as codec tags)
_BLOOM_COLS_KV = "oups.bloom_cols"
_PERIOD = "__oups_period"
# DML rewrite: source-file id carrying each surviving row back to its
# (single) replacement file
_FID = "__oups_fid"


class OrderedDataset:
    """Handle on one ordered dataset directory (may not exist yet)."""

    def __init__(
        self, spark: SparkSession, path: str, *, backend=None,
        retain_versions: bool = False,
        deletion_grace_s: float | None = None,
    ):
        # backend: optional ManifestBackend routing manifest commits
        # (e.g. ObjectStoreBackend conditional-put); None = POSIX rename
        #
        # retain_versions: keep an immutable manifest snapshot per
        # commit and DEFER physical deletion of replaced data files,
        # enabling `read(as_of=<generation>)` time travel until
        # `vacuum()` reclaims space. POSIX-path mechanism — on object
        # stores, bucket versioning snapshots the manifest object per
        # commit already, so the engine-level copies are refused to
        # avoid a second, divergent history.
        if retain_versions and backend is not None:
            raise ValueError(
                "retain_versions uses filesystem manifest snapshots; "
                "with an object-store backend use bucket versioning"
            )
        # deletion_grace_s: READER ISOLATION under concurrent writers.
        # A reader's scan resolves manifest entries to file paths
        # lazily; a concurrent commit that replaced those files would
        # otherwise delete them while the scan is still running
        # (FileNotFound mid-job — the reference cannot hit this only
        # because it holds the dataset lock for the whole read,
        # ``base.py:240-255``). Replaced files are therefore
        # TOMBSTONED in the manifest and physically deleted by a later
        # commit (or vacuum) once older than this grace window. A
        # reader is exposed only if its scan outlives the window
        # across a subsequent commit. 0 = delete immediately (the
        # pre-round-10 single-writer posture). Default from
        # $OUPS_DELETION_GRACE_S, else 60 s.
        if deletion_grace_s is None:
            deletion_grace_s = float(
                os.environ.get("OUPS_DELETION_GRACE_S", "60")
            )
        self.spark = spark
        self.path = os.path.abspath(path)
        self.backend = backend
        self.retain_versions = retain_versions
        self.deletion_grace_s = deletion_grace_s
        self._manifest = Manifest.load(self.path, backend)
        # concurrency instrumentation: how often a lost manifest CAS
        # was resolved by a commit REBASE (winner's changes disjoint
        # from ours — manifest merged, no recompute) vs a full merge
        # re-run (ranges overlapped: overlap analysis/dedup were
        # computed against a superseded manifest and must re-run)
        self.conflict_rebases = 0
        self.conflict_reruns = 0
        # True once the most recent commit attempt's CAS landed —
        # cleanup handlers that delete staged data files on failure
        # must skip the deletion when this is set (see _commit)
        self._commit_landed = False

    # ------------------------------------------------------------- state
    @property
    def exists(self) -> bool:
        return self._manifest is not None

    @property
    def manifest(self) -> Manifest | None:
        return self._manifest

    @property
    def ordered_on(self) -> str | None:
        return self._manifest.ordered_on if self._manifest else None

    @property
    def key_value_metadata(self) -> dict:
        return dict(self._manifest.kv) if self._manifest else {}

    @property
    def n_files(self) -> int:
        return len(self._manifest.files) if self._manifest else 0

    @property
    def n_rows(self) -> int:
        return self._manifest.n_rows if self._manifest else 0

    def file_paths(self) -> list[str]:
        if not self._manifest:
            return []
        return [os.path.join(self.path, f.name) for f in self._manifest.files]

    def schema(self) -> StructType | None:
        if self._manifest and self._manifest.schema_json:
            return StructType.fromJson(__import__("json").loads(self._manifest.schema_json))
        return None

    # ------------------------------------------------------------- read
    def read_arrow(
        self,
        *,
        max_rows: int | None = None,
        max_bytes: int | None = None,
    ):
        """The live rows as ONE pyarrow Table in manifest order —
        driver-side parquet reads, no Spark job. For driver-sized
        state tables (sketch registers, small incremental folds) this
        replaces a full scan+shuffle plan per maintenance step.

        Conservative: returns ``None`` (caller falls back to the
        distributed ``read()``) when the dataset is over the
        row/byte caps, stores flattened cmidx columns, or carries
        files whose schemas cannot be unified under the manifest
        schema — a ``None`` is never wrong, only slower."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not self.exists:
            return None
        man = self._manifest
        if man.cmidx:
            return None
        row_cap = max_rows if max_rows is not None else _DRIVER_MERGE_MAX_ROWS
        byte_cap = max_bytes if max_bytes is not None else _DRIVER_MERGE_MAX_BYTES
        if sum(e.n_rows for e in man.files) > row_cap:
            return None
        if self._old_files_bytes(man.files) > byte_cap:
            return None
        want_names = None
        if man.schema_json:
            want_names = {
                f["name"]
                for f in __import__("json").loads(man.schema_json)["fields"]
            }
        schema = None
        tables = []
        total = 0
        for e in man.files:
            try:
                t = pq.read_table(os.path.join(self.path, e.name))
                if schema is None:
                    if want_names is not None and set(t.schema.names) != want_names:
                        # evolved dataset: read() would project missing
                        # columns as NULL — leave that to the Spark path
                        return None
                    schema = t.schema
                else:
                    t = t.select(schema.names).cast(schema)
            except (
                OSError,
                KeyError,
                pa.ArrowInvalid,
                pa.ArrowNotImplementedError,
            ):
                return None  # schema drift / missing file: fall back
            total += t.nbytes
            if total > 2 * byte_cap:
                return None  # decoded far larger than on-disk estimate
            tables.append(t)
        if not tables:
            return None
        return pa.concat_tables(tables)

    def read(
        self,
        start=None,
        end_excl=None,
        columns: list[str] | None = None,
        filters=None,
        ordered: bool = False,
        as_of: int | None = None,
        unflatten: bool = True,
    ) -> DataFrame:
        """Scan, with manifest file pruning for ``[start, end_excl)``.

        File pruning happens driver-side from manifest stats (the
        reference's row-group slicing, ``base.py:297-330``); the range
        predicate is also applied so parquet footer pruning and
        row-level filtering finish the job.

        ``as_of``: TIME TRAVEL — read the dataset exactly as of an
        earlier commit generation (``versions()`` lists them;
        requires the dataset to be written with
        ``retain_versions=True``). Reproducible-training contract: a
        pinned generation always returns the same rows until
        ``vacuum`` reclaims it, after which it raises — never a
        silent partial read.

        Datasets written with tuple (column-MultiIndex) names store
        FLAT columns: ``columns``/``filters``/``start`` address the
        flattened names and leaf values; ``unflatten`` (default True)
        rebuilds the struct columns at the end from the manifest's
        mapping.
        """
        if as_of is not None:
            from oups_spark.store.manifest import load_snapshot

            man = load_snapshot(self.path, as_of)
        else:
            if not self.exists:
                raise FileNotFoundError(f"no ordered dataset at {self.path}")
            man = self._manifest
        # [start, end) file selection — vectorized (Arrow compute, only
        # survivors materialized) on parquet-sidecar-backed manifests
        entries = man.files_in_range(start, end_excl)
        if filters:
            # data-skipping on ANY filtered column from the per-file
            # stats recorded at write time (Delta/Iceberg file-stats
            # model) — pruning happens before a single scan task is
            # planned; files without stats are conservatively kept
            from oups_spark.functions.filters import dnf_file_can_match

            entries = [
                e for e in entries
                if dnf_file_can_match(e.cols, filters, blooms=e.blooms)
            ]
        if not entries:
            schema_json = man.schema_json
            if schema_json is None:
                raise ValueError("empty dataset with no recorded schema")
            schema = StructType.fromJson(__import__("json").loads(schema_json))
            df = self.spark.createDataFrame([], schema)
        else:
            reader = self.spark.read
            if man.schema_json:
                # explicit manifest schema: (a) files written before a
                # schema evolution read back NULL for later columns,
                # (b) no footer schema-inference job on the scan
                reader = reader.schema(
                    StructType.fromJson(
                        __import__("json").loads(man.schema_json)
                    )
                )
            df = reader.parquet(
                *[os.path.join(self.path, e.name) for e in entries]
            )
        o = F.col(man.ordered_on)
        if start is not None:
            df = df.filter(o >= F.lit(start))
        if end_excl is not None:
            df = df.filter(o < F.lit(end_excl))
        if filters:
            from oups_spark.functions.filters import dnf_filter

            df = dnf_filter(df, filters)
        if columns:
            df = df.select(*columns)
        if ordered:
            df = df.orderBy(man.ordered_on)
        if unflatten and man.cmidx:
            # dataset written with tuple (column-MultiIndex) names:
            # rebuild the struct columns the writer flattened; filters
            # and pruning above ran on the stored flat names
            from oups_spark.functions.fills import unflatten_struct_columns

            df = unflatten_struct_columns(df, man.cmidx)
        return df

    # ------------------------------------------------------------- write
    def write(
        self,
        df: DataFrame | None = None,
        *,
        ordered_on: str | None = None,
        duplicates_on: list[str] | str | None = None,
        row_group_target_size: int | str = DEFAULT_ROW_GROUP_TARGET_SIZE,
        max_n_off_target_rgs: int | None = None,
        key_value_metadata: dict | None = None,
        validate_monotonic: bool = True,
        known_stats: tuple | None = None,
        evolve_schema: bool = False,
        conflict_retries: int = 0,
        use_driver_merge: bool | None = None,
        bloom_cols: list[str] | None = None,
    ) -> None:
        """Ordered merge write with optimistic-concurrency retry.

        ``bloom_cols``: optional int/long/string columns to index
        with a per-file Bloom filter (``store/bloom.py``) — point
        lookups (``==`` / ``in`` filters) on these columns then prune
        files at read time even though [min, max] stats cannot
        (clustered-but-unordered columns). Costs one extra bounded
        pass over the NEW files; per-write opt-in and STICKY — later
        appends, DML rewrites and ``compact`` (plain or z-order)
        re-index their new files; files written before the setting
        degrade to "cannot skip".

        ``use_driver_merge``: None (default) = automatic — small
        row-count-target writes take the driver-side pyarrow merge
        path; False = force the distributed path (used by tests that
        must exercise it, and by callers whose batches are wide
        enough that the row cap is not a byte cap).

        ``conflict_retries``: on a manifest CAS conflict (another
        writer committed between this writer's manifest read and its
        commit), the commit first attempts a REBASE (``_try_rebase``):
        when the winner's file changes are range-disjoint from
        everything this write read or wrote, the already-computed
        merge is re-applied onto the winner's manifest — no Spark
        re-run, counted in ``conflict_rebases``. Otherwise reload the
        manifest and RE-RUN the whole write up to this many times
        (counted in ``conflict_reruns``). The full re-run is required
        for correctness when ranges overlap: the overlap analysis,
        keep-last dedup and file split were all computed against the
        superseded manifest. Data files staged by the failed attempt
        are removed before retrying (they were never referenced).
        Default 0 = raise, caller decides (a successful rebase never
        raises and consumes no retry).

        ``ordered_on`` (and entries of ``duplicates_on``) may be a
        TUPLE of names — the reference's column-MultiIndex form
        (``write.py:98-100``): the tuple names a field path inside
        struct columns. The dataset then stores every struct column
        flattened (``conform_cmidx`` semantics,
        ``parquet_adapter.py:45-85``) with the name mapping in the
        manifest, and ``read`` rebuilds the structs.
        """
        # A pyarrow.Table batch (driver-built flushes, e.g. AggStream's
        # stitched bin frames): the table IS the collected batch, so
        # the probe job that would otherwise collect it is skipped —
        # the common small flush then runs with ZERO Spark jobs. The
        # Spark DataFrame twin is still constructed (driver-side local
        # relation, no job) for schema checks and as the distributed
        # fallback when the batch or its overlap outgrows the caps.
        batch_tbl = None
        if df is not None and not isinstance(df, DataFrame):
            batch_tbl = df
            df = self.spark.createDataFrame(batch_tbl)
        attempt = 0
        while True:
            # conform INSIDE the retry loop: a conflict reloads the
            # manifest, and the cmidx merge must re-run against the
            # winning writer's mapping or this commit would overwrite
            # entries that writer just added
            cdf, c_on, c_dup, cmidx = self._conform_cmidx(
                df, ordered_on, duplicates_on
            )
            # bloom_cols is STICKY: an explicit list persists in the
            # manifest kv, and later writes that omit it keep indexing
            # their new files (a silently-unindexed append would make
            # reads stop pruning without anyone noticing). Pass [] to
            # clear. Resolved inside the retry loop — a conflict
            # reload may carry another writer's setting.
            kv = key_value_metadata
            eff_bloom = bloom_cols
            if bloom_cols is not None:
                kv = {**(kv or {}), _BLOOM_COLS_KV: list(bloom_cols)}
            elif self._manifest is not None:
                eff_bloom = self._manifest.kv.get(_BLOOM_COLS_KV)
            try:
                return self._write_attempt(
                    cdf,
                    ordered_on=c_on,
                    duplicates_on=c_dup,
                    cmidx=cmidx,
                    row_group_target_size=row_group_target_size,
                    max_n_off_target_rgs=max_n_off_target_rgs,
                    key_value_metadata=kv,
                    validate_monotonic=validate_monotonic,
                    known_stats=known_stats,
                    evolve_schema=evolve_schema,
                    use_driver_merge=use_driver_merge,
                    bloom_cols=eff_bloom,
                    batch_tbl=batch_tbl if cdf is df else None,
                )
            except ManifestConflictError:
                if attempt >= conflict_retries:
                    raise
                attempt += 1
                self.conflict_reruns += 1
                self._manifest = Manifest.load(self.path, self.backend)

    _CMIDX_SEP = "_"

    def _conform_cmidx(self, df, ordered_on, duplicates_on):
        """Normalize tuple column names (the reference's MultiIndex
        form) and flatten struct columns when cmidx mode is engaged —
        by a tuple ``ordered_on`` on first write, or by the stored
        mapping on later ones. Plain-named datasets pass through
        untouched (struct columns then persist as parquet nested
        groups, the Spark-idiomatic default)."""
        stored = self._manifest.cmidx if self._manifest else None
        has_tuple_dup = isinstance(duplicates_on, tuple) or (
            isinstance(duplicates_on, list)
            and any(isinstance(d, tuple) for d in duplicates_on)
        )
        if not (isinstance(ordered_on, tuple) or stored or has_tuple_dup):
            return df, ordered_on, duplicates_on, None
        sep = self._CMIDX_SEP
        mapping: dict[str, list[str]] = {}
        if df is not None and any(
            f.dataType.typeName() == "struct" for f in df.schema.fields
        ):
            from oups_spark.functions.fills import flatten_struct_columns

            df, mapping = flatten_struct_columns(
                df, sep=sep, return_mapping=True
            )
        for flat, levels in (stored or {}).items():
            if flat in mapping and mapping[flat] != list(levels):
                raise ValueError(
                    f"column {flat!r} maps to path {mapping[flat]} in this "
                    f"batch but {list(levels)} in the dataset"
                )
        if isinstance(ordered_on, tuple):
            ordered_on = sep.join(ordered_on)
        if duplicates_on is not None:
            if isinstance(duplicates_on, tuple):
                duplicates_on = sep.join(duplicates_on)
            elif isinstance(duplicates_on, list):
                duplicates_on = [
                    sep.join(d) if isinstance(d, tuple) else d
                    for d in duplicates_on
                ]
        return df, ordered_on, duplicates_on, {**(stored or {}), **mapping}

    def _write_attempt(
        self,
        df: DataFrame | None = None,
        *,
        ordered_on: str | None = None,
        duplicates_on: list[str] | str | None = None,
        cmidx: dict[str, list[str]] | None = None,
        row_group_target_size: int | str = DEFAULT_ROW_GROUP_TARGET_SIZE,
        max_n_off_target_rgs: int | None = None,
        key_value_metadata: dict | None = None,
        validate_monotonic: bool = True,
        known_stats: tuple | None = None,
        evolve_schema: bool = False,
        use_driver_merge: bool | None = None,
        bloom_cols: list[str] | None = None,
        batch_tbl=None,
    ) -> None:
        """Ordered merge write (see module docstring for the plan).

        ``batch_tbl``: optional pyarrow.Table that IS the batch's
        collected data (``df`` is its local-relation twin) — the
        bounds/collect probe jobs are skipped entirely.

        ``key_value_metadata``: dict merged into the manifest kv;
        a ``None`` value removes the key (reference semantics,
        ``base.py:600-649``).

        ``known_stats``: optional ``(min, max, n_rows)`` of the new
        batch's ordering column, when the producer already knows them
        (e.g. a driver-built frame) — skips the bounds job. Only
        honored with ``validate_monotonic=False``.

        ``evolve_schema``: SCHEMA EVOLUTION (beyond reference — the
        reference is fixed-schema-on-first-write, SURVEY §1.3). When
        True, a batch may add columns (existing rows read back NULL
        for them) or omit existing ones (the batch's rows carry
        NULL); same-named columns must keep their type. The manifest
        records the evolved union schema and ``read`` projects every
        file through it, so on-disk files are never rewritten just
        for a schema change. When False (default), a column-set
        mismatch raises — the reference's posture.
        """
        if self._manifest is None:
            if df is not None and ordered_on is None:
                raise ValueError("ordered_on required on first write")
        else:
            if ordered_on is not None and ordered_on != self._manifest.ordered_on:
                raise ValueError(
                    f"ordered_on is immutable: dataset uses "
                    f"{self._manifest.ordered_on!r}, got {ordered_on!r}"
                )
            ordered_on = self._manifest.ordered_on

        if df is None:
            self._update_kv_only(ordered_on, key_value_metadata)
            return

        if ordered_on not in df.columns:
            raise ValueError(f"ordered_on column {ordered_on!r} not in DataFrame")

        target_schema = None
        if self._manifest is not None and self._manifest.schema_json:
            old_schema = self.schema()
            old_by = {f.name: f for f in old_schema.fields}
            new_by = {f.name: f for f in df.schema.fields}
            for c in set(new_by) & set(old_by):
                # a same-named column must keep its type in ALL cases:
                # without this, a non-overlapping append could land a
                # differently-typed file that only explodes at read time
                if old_by[c].dataType != new_by[c].dataType:
                    raise ValueError(
                        f"schema evolution cannot change column {c!r}: "
                        f"{old_by[c].dataType} -> {new_by[c].dataType}"
                    )
            if set(new_by) != set(old_by):
                if not evolve_schema:
                    raise ValueError(
                        f"batch columns {sorted(new_by)} != dataset columns "
                        f"{sorted(old_by)}; pass evolve_schema=True to evolve"
                    )
                target_schema = StructType(
                    list(old_schema.fields)
                    + [f for f in df.schema.fields if f.name not in old_by]
                )

        new = (
            df.withColumn(_POS, F.monotonically_increasing_id())
            .withColumn(_SRC, F.lit(1))
            .withColumn(_FIDX, F.lit(0))
        )
        # SINGLE-JOB SMALL-BATCH PATH (round-14, guide §1.2: fewer
        # passes / fewer jobs): when the caller skips the monotonic
        # check and supplies no stats, the bounds agg and the
        # driver-merge collect are FUSED — one Arrow collect (row-limit
        # guarded, so an oversized batch just falls back) yields the
        # data AND its exact stats/bytes, replacing the bounds job +
        # the collect job with a single job. This is the latency shape
        # per-micro-batch flushes pay 3x per sink; at 100 TB the seed
        # stays distributed (big batches blow the row cap and take the
        # classic path, at the cost of one bounded CollectLimit probe).
        probe_tbl = None
        if (
            validate_monotonic is False
            and known_stats is None
            and use_driver_merge is not False
            and isinstance(row_group_target_size, int)
            and target_schema is None
            and not any(
                t in f.dataType.simpleString()
                for f in df.schema.fields
                for t in ("binary", "array", "map", "struct")
            )
        ):
            if batch_tbl is not None:
                # the batch is already on the driver: no probe job
                probe_tbl = batch_tbl
            else:
                try:
                    probe_tbl = df.limit(_DRIVER_MERGE_MAX_ROWS + 1).toArrow()
                except Exception:  # noqa: BLE001 — maxResultSize etc.
                    probe_tbl = None
            if (
                probe_tbl is not None
                and probe_tbl.num_rows > _DRIVER_MERGE_MAX_ROWS
            ):
                probe_tbl = None  # oversized: classic path (stats agg)
        # string-payload bytes of the new batch ride along in the SAME
        # job as the bounds/monotonic pass (zero extra jobs) — the
        # driver-merge byte gate needs them and a separate agg would
        # re-scan the batch. None = not measured (known_stats path).
        str_cols = [
            f.name for f in df.schema.fields
            if f.dataType.simpleString() == "string"
        ]
        str_bytes: int | None = None
        if probe_tbl is not None:
            import pyarrow.compute as pc

            n_new = probe_tbl.num_rows
            if n_new == 0:
                if self._manifest is None and not key_value_metadata:
                    # nothing to create: an empty batch must not leave
                    # a schema-less dataset behind (sinks relied on
                    # their former isEmpty guard for exactly this)
                    return
                self._update_kv_only(ordered_on, key_value_metadata)
                return
            col = probe_tbl.column(ordered_on)
            df_min = _norm_tz(pc.min(col).as_py())
            df_max = _norm_tz(pc.max(col).as_py())
        elif validate_monotonic:
            # one distributed pass yields the order check AND the
            # batch bounds — no second scan of the new data
            df_min, df_max, n_new, str_bytes = self._check_monotonic(
                new, ordered_on, str_cols
            )
        elif known_stats is not None:
            df_min, df_max, n_new = known_stats
        elif batch_tbl is not None and not validate_monotonic:
            # oversized driver-built batch: exact stats straight from
            # the table — no Spark stats job on the local relation
            import pyarrow.compute as pc

            n_new = batch_tbl.num_rows
            if n_new == 0:
                self._update_kv_only(ordered_on, key_value_metadata)
                return
            col = batch_tbl.column(ordered_on)
            df_min = _norm_tz(pc.min(col).as_py())
            df_max = _norm_tz(pc.max(col).as_py())
            str_bytes = sum(
                batch_tbl.column(c).nbytes for c in str_cols
            )
        else:
            stats = new.agg(
                F.min(ordered_on).alias("mn"),
                F.max(ordered_on).alias("mx"),
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.octet_length(F.coalesce(F.col(c), F.lit("")))
                    ).alias(f"__sb{i}")
                    for i, c in enumerate(str_cols)
                ],
            ).collect()[0]
            df_min, df_max, n_new = stats["mn"], stats["mx"], stats["n"]
            str_bytes = sum(
                int(stats[f"__sb{i}"] or 0) for i in range(len(str_cols))
            )
        if n_new == 0:
            self._update_kv_only(ordered_on, key_value_metadata)
            return
        # df_min may be None (Spark) or NaT/NaN (pandas summaries)
        if df_min is None or df_min != df_min or (self.exists and any(
            e.min is None or e.max is None for e in self._manifest.files
        )):
            raise ValueError("null values in ordered_on are not allowed")

        old_entries = self._manifest.files if self._manifest else []
        replaced = self._select_overlap(
            old_entries, df_min, df_max, row_group_target_size, max_n_off_target_rgs
        )
        replaced_names = {e.name for e in replaced}
        kept = [e for e in old_entries if e.name not in replaced_names]

        # SMALL-BATCH DRIVER FAST PATH: batch + overlapping files are
        # small (row count known by now from known_stats, the
        # monotonic check, or the bounds job), so the whole merge runs
        # driver-side with pyarrow — ONE Spark job (the arrow collect)
        # instead of the merge/sample/write/cache job train. This is
        # the latency shape frequent incremental flushes need even at
        # 100 TB: the SEED processing stays distributed; only the
        # small flush avoids the ~0.5 s-per-job floor. Semantics are
        # identical (same overlap selection upstream, same keep-last
        # tiebreak, same footer-stats manifest entries via
        # _footer_stats); any arrow incompatibility falls back to the
        # Spark path below. Binary/array/map/struct columns opt out
        # (the ROW cap does not bound their bytes); string columns are
        # allowed but measured — the estimated collected size must fit
        # _DRIVER_MERGE_MAX_BYTES.
        n_old = sum(e.n_rows for e in replaced)
        if use_driver_merge is None:
            if probe_tbl is not None:
                # the batch is already collected: gate on its ACTUAL
                # Arrow bytes (better than the schema estimate) plus
                # the old files' footer-declared decoded size
                use_driver_merge = (
                    n_new + n_old <= _DRIVER_MERGE_MAX_ROWS
                    and probe_tbl.nbytes + self._old_files_bytes(replaced)
                    <= _DRIVER_MERGE_MAX_BYTES
                )
            else:
                use_driver_merge = (
                    isinstance(row_group_target_size, int)
                    and target_schema is None
                    and n_new + n_old <= _DRIVER_MERGE_MAX_ROWS
                    and not any(
                        any(
                            t in f.dataType.simpleString()
                            for t in ("binary", "array", "map", "struct")
                        )
                        for f in df.schema.fields
                    )
                    and self._estimate_merge_bytes(df, n_new, replaced, str_bytes)
                    <= _DRIVER_MERGE_MAX_BYTES
                )
        if use_driver_merge and isinstance(row_group_target_size, int):
            new_entries = self._merge_write_driver(
                df, replaced, ordered_on, duplicates_on, row_group_target_size,
                new_tbl=probe_tbl,
            )
            if new_entries is not None:
                self._attach_blooms(new_entries, bloom_cols, target_schema or df.schema)
                self._commit(
                    ordered_on, df, target_schema, kept, replaced_names,
                    new_entries, key_value_metadata, cmidx,
                )
                return

        merged = new
        if replaced:
            # Dataset order for the old side comes from the MANIFEST
            # file index (Spark orders scan splits by size, so raw
            # monotonically_increasing_id would not reflect it): the
            # per-file rank is looked up from input_file_name, and the
            # in-file id only breaks ties within one file.
            # Read through the MANIFEST schema (like read()): replaced
            # files can mix pre- and post-evolution schemas, and a
            # bare parquet read takes ONE file's footer schema —
            # silently nulling evolved columns out of the rewrite.
            old_reader = self.spark.read
            if self._manifest is not None and self._manifest.schema_json:
                old_reader = old_reader.schema(
                    StructType.fromJson(
                        __import__("json").loads(self._manifest.schema_json)
                    )
                )
            old = _with_file_rank(
                self.spark,
                old_reader.parquet(
                    *[os.path.join(self.path, e.name) for e in replaced]
                )
                .withColumn(_POS, F.monotonically_increasing_id())
                .withColumn(_SRC, F.lit(0)),
                replaced,
            )
            # allowMissingColumns: under schema evolution either side
            # may lack columns the other has — absent values are NULL
            merged = old.unionByName(new, allowMissingColumns=True)

        if duplicates_on is not None:
            merged = self._dedup_keep_last(merged, ordered_on, duplicates_on)

        new_entries = self._write_files(
            merged,
            ordered_on,
            row_group_target_size,
            n_old + n_new,
            # the range partitioner's sample pass re-executes its child;
            # cache iff that child contains the dedup window (re-scanning
            # raw parquet twice is cheaper than materializing it)
            cache=duplicates_on is not None,
        )

        self._attach_blooms(new_entries, bloom_cols, target_schema or df.schema)
        self._commit(
            ordered_on, df, target_schema, kept, replaced_names,
            new_entries, key_value_metadata, cmidx,
        )

    def _attach_blooms(self, new_entries, bloom_cols, schema) -> None:
        """Index the just-written files' ``bloom_cols`` values (one
        bounded Spark job over the NEW files only) and attach the
        bitsets to their manifest entries — committed atomically with
        the data change by the caller's ``_commit``."""
        if not bloom_cols or not new_entries:
            return
        from oups_spark.store.bloom import build_file_blooms

        data_schema = StructType(
            [f for f in schema.fields if not f.name.startswith("__oups_")]
        )
        by_file = build_file_blooms(
            self.spark,
            [os.path.join(self.path, e.name) for e in new_entries],
            data_schema,
            bloom_cols,
        )
        for e in new_entries:
            if e.name in by_file:
                e.blooms = by_file[e.name]

    def _commit(
        self, ordered_on, df, target_schema, kept, replaced_names,
        new_entries, key_value_metadata, cmidx=None,
    ) -> None:
        # build the CANDIDATE manifest as a copy: a failed commit
        # (e.g. CAS conflict) must not leave this handle's in-memory
        # manifest referencing files that were cleaned up — the
        # handle state changes only on successful commit
        if self._manifest is None:
            man = Manifest(ordered_on=ordered_on)
        else:
            b = self._manifest
            man = Manifest(
                ordered_on=ordered_on,
                files=list(b.files),
                kv=dict(b.kv),
                schema_json=b.schema_json,
                generation=b.generation,
                cmidx=b.cmidx,
                tombstones=list(b.tombstones),
                token=b.token,
            )
        man.ordered_on = ordered_on
        if cmidx:
            man.cmidx = cmidx
        man.files = kept + new_entries
        man.schema_json = (target_schema or df.schema).json()
        _merge_kv(man.kv, key_value_metadata)
        expired = self._stage_tombstones(man, replaced_names)
        self._commit_landed = False
        try:
            man.save(self.path, self.backend, snapshot=self.retain_versions)
        except ManifestConflictError:
            # REBASE fast path (Delta-style conflict resolution): when
            # the winning commit's file changes are range-disjoint
            # from everything this write read or wrote, our merge
            # result is still valid — re-apply it onto the winner's
            # manifest instead of recomputing the whole merge
            if self._try_rebase(
                ordered_on, df, target_schema,
                replaced_names, new_entries, key_value_metadata, cmidx,
            ):
                return
            # the staged files of THIS attempt were moved in but never
            # referenced by any committed manifest — remove them so a
            # retry (or abandonment) leaves no orphans
            for e in new_entries:
                p = os.path.join(self.path, e.name)
                if os.path.exists(p):
                    os.remove(p)
            raise
        except BaseException:
            if man.last_commit_landed:
                # POST-commit failure (e.g. the time-travel snapshot
                # write): the CAS accepted this manifest, so the new
                # files are referenced — adopt the committed state and
                # propagate WITHOUT deleting data files. Outer cleanup
                # handlers key off self._commit_landed for the same
                # reason (a delete here would be permanent data loss).
                self._commit_landed = True
                self._manifest = man
            raise
        self._commit_landed = True
        self._manifest = man
        self._remove_files(expired)

    def _try_rebase(
        self, ordered_on, df, target_schema,
        replaced_names, new_entries, key_value_metadata, cmidx,
    ) -> bool:
        """Attempt a commit rebase after a lost manifest CAS.

        Correctness argument: the failed write's overlap analysis,
        keep-last dedup and file split were computed against the base
        manifest this handle had loaded. They remain valid against the
        WINNER's manifest iff the winner's changes could not have
        participated in them, i.e. iff
        - every file our merge consumed (``replaced_names``) is still
          present, untouched, in the winner's manifest, and
        - every file the winner added or removed is strictly
          range-disjoint from the ``ordered_on`` span our write
          touched (replaced + new files) — INCLUSIVE boundaries,
          since a winner file merely touching our span could carry
          duplicate-key rows the dedup needed to see, and
        - the winner changed neither the schema, nor the cmidx
          mapping, nor the sticky bloom-column setting this write's
          plan was resolved against.
        When all hold, the rebased manifest is the winner's files
        minus ours replaced plus ours added, with our kv merged on
        top — exactly what re-running the merge against the winner's
        manifest would produce, at zero Spark-job cost. Any doubt
        returns False and the caller falls back to the full re-run
        (``conflict_retries``). A third writer racing the rebase's
        own CAS also falls back.
        """
        base = self._manifest
        if base is None:
            return False  # concurrent creation: nothing safe to rebase onto
        latest = Manifest.load(self.path, self.backend)
        if (
            latest is None
            or latest.ordered_on != ordered_on
            or latest.schema_json != base.schema_json
            or latest.cmidx != base.cmidx
            or latest.kv.get(_BLOOM_COLS_KV) != base.kv.get(_BLOOM_COLS_KV)
        ):
            return False
        replaced = set(replaced_names)
        latest_names = {f.name for f in latest.files}
        if not replaced <= latest_names:
            return False  # the winner rewrote files our merge consumed
        base_by_name = {f.name: f for f in base.files}
        touched = [f for f in latest.files if f.name not in base_by_name]
        touched += [
            f for f in base.files if f.name not in latest_names
        ]
        ours = list(new_entries) + [
            base_by_name[n] for n in replaced if n in base_by_name
        ]
        if ours and touched:
            lo = min(e.min for e in ours)
            hi = max(e.max for e in ours)
            if any(not (f.max < lo or f.min > hi) for f in touched):
                return False
        rebased = Manifest(
            ordered_on=ordered_on,
            files=[f for f in latest.files if f.name not in replaced]
            + list(new_entries),
            kv=dict(latest.kv),
            schema_json=(target_schema or df.schema).json(),
            generation=latest.generation,
            cmidx=cmidx or latest.cmidx,
            tombstones=list(latest.tombstones),
            token=latest.token,
        )
        _merge_kv(rebased.kv, key_value_metadata)
        expired = self._stage_tombstones(rebased, replaced_names)
        try:
            rebased.save(self.path, self.backend, snapshot=self.retain_versions)
        except ManifestConflictError:
            return False
        except BaseException:
            if rebased.last_commit_landed:
                # same post-commit contract as _commit: the rebase CAS
                # landed, so the staged files are referenced — adopt
                # and propagate, never delete
                self._commit_landed = True
                self._manifest = rebased
            raise
        self._commit_landed = True
        self._manifest = rebased
        self._remove_files(expired)
        self.conflict_rebases += 1
        return True

    def _stage_tombstones(self, man, replaced_names) -> list[str]:
        """Move ``replaced_names`` onto the candidate manifest's
        tombstone ledger and sweep entries older than the grace
        window. Returns the file names whose physical deletion is due
        AFTER the commit lands (deleting before would reintroduce the
        race for the files the previous commit tombstoned). With
        ``retain_versions`` the snapshot machinery owns old files
        (``vacuum`` reclaims them) and the ledger stays empty."""
        if self.retain_versions:
            return []
        import time

        now = time.time()
        pending = list(man.tombstones) + [
            {"name": n, "ts": now} for n in replaced_names
        ]
        expired = [t["name"] for t in pending
                   if now - t["ts"] >= self.deletion_grace_s]
        man.tombstones = [t for t in pending
                          if now - t["ts"] < self.deletion_grace_s]
        return expired

    def _remove_files(self, names) -> None:
        for name in names:
            p = os.path.join(self.path, name)
            if os.path.exists(p):
                os.remove(p)

    # ----------------------------------------------------------- helpers
    def _update_kv_only(self, ordered_on, key_value_metadata) -> None:
        if not key_value_metadata:
            if self._manifest is not None:
                # nothing to change on an existing dataset: skip the
                # redundant manifest rewrite (an empty micro-batch
                # would otherwise pay a full commit per batch)
                return
            # nothing to create either: an empty batch with no kv must
            # not leave a schema-less dataset behind (the probe path
            # has always guarded this; the stats/monotonic paths now
            # match, so sinks need no isEmpty pre-probe)
            return
        man = self._manifest or Manifest(ordered_on=ordered_on or "")
        _merge_kv(man.kv, key_value_metadata)
        os.makedirs(self.path, exist_ok=True)
        try:
            man.save(self.path, self.backend)
        except ManifestConflictError:
            # restore committed state (the in-place kv merge above is
            # now stale); write()'s retry loop re-applies it on top of
            # the winning writer's manifest
            self._manifest = Manifest.load(self.path, self.backend)
            raise
        self._manifest = man

    _FIXED_WIDTHS = {
        "boolean": 1, "byte": 1, "short": 2, "int": 4, "date": 4,
        "float": 4, "long": 8, "double": 8, "timestamp": 8,
        "timestamp_ntz": 8,
    }

    def _estimate_merge_bytes(
        self, df: DataFrame, n_new: int, replaced, str_bytes: int | None
    ) -> int:
        """Estimated in-memory Arrow bytes of the driver-side merge.

        New batch: fixed-width columns priced from the schema; string
        columns use ``str_bytes`` — measured for free inside the
        bounds/monotonic pass (``_check_monotonic`` / the stats agg),
        never with an extra job. When strings are present but were NOT
        measured (``known_stats`` writes, where the producer skipped
        the bounds job entirely), one bounded agg job measures them
        here — the only path that pays an extra job, and only for
        string-bearing known-stats batches. Old files: the parquet
        FOOTER's total_uncompressed_size (a local metadata read —
        exact even for highly compressible text, where on-disk size ×
        a fixed inflation factor underestimates by 10-50×), falling
        back to on-disk size × ``_PARQUET_INFLATION``; if neither
        works the estimate is ∞ (stay distributed).
        """
        fixed = 0
        str_cols = []
        for f in df.schema.fields:
            s = f.dataType.simpleString()
            if s == "string":
                str_cols.append(f.name)
            else:
                fixed += self._FIXED_WIDTHS.get(s.split("(")[0], 16)
        new_bytes = fixed * n_new
        if str_cols:
            if str_bytes is None:
                row = df.agg(
                    *[
                        F.sum(F.octet_length(F.coalesce(F.col(c), F.lit("")))).alias(c)
                        for c in str_cols
                    ]
                ).collect()[0]
                str_bytes = sum(int(v or 0) for v in row)
            new_bytes += str_bytes
        return new_bytes + self._old_files_bytes(replaced)

    def _old_files_bytes(self, replaced) -> int:
        """Estimated decoded bytes of the overlapping files: the
        parquet FOOTER's total_uncompressed_size (a local metadata
        read), falling back to on-disk size × ``_PARQUET_INFLATION``;
        ∞ when neither works (stay distributed)."""
        old_bytes = 0
        for e in replaced:
            p = os.path.join(self.path, e.name)
            try:
                import pyarrow.parquet as pq

                md = pq.ParquetFile(p).metadata
                old_bytes += sum(
                    md.row_group(g).column(c).total_uncompressed_size
                    for g in range(md.num_row_groups)
                    for c in range(md.num_columns)
                )
            except Exception:  # noqa: BLE001 — unreadable footer
                try:
                    old_bytes += (
                        os.path.getsize(p) * _PARQUET_INFLATION
                    )
                except OSError:
                    return 1 << 62
        return old_bytes

    def _check_monotonic(self, new: DataFrame, ordered_on: str, str_cols=()):
        """Reject unsorted input (reference: ``write.py:182-185``) and
        return the batch bounds ``(min, max, n_rows, str_bytes)``.

        Fully distributed: each Arrow batch of the narrow
        (ordered_on, position[, per-row string bytes]) projection
        reports (first/last position, first/last value, row count,
        locally-sorted flag, summed string bytes); the driver stitches
        the tiny summaries in position order and checks the boundaries
        — no global sort, no single-partition window — and the same
        summaries yield min/max/count plus the string payload size the
        driver-merge byte gate needs, so the write path never scans
        the new data a second time for stats. Disable with
        ``validate_monotonic=False`` when the producer guarantees
        order.
        """
        from pyspark.sql.types import BooleanType, LongType, StructField, StructType

        sb = sum(
            (F.octet_length(F.coalesce(F.col(c), F.lit(""))).cast("long")
             for c in str_cols),
            F.lit(0).cast("long"),
        )
        proj = new.select(
            F.col(ordered_on).alias("v"), F.col(_POS).alias("p"), sb.alias("sb")
        )
        val_type = proj.schema["v"].dataType
        out_schema = StructType(
            [
                StructField("first_p", LongType()),
                StructField("last_p", LongType()),
                StructField("first_v", val_type),
                StructField("last_v", val_type),
                StructField("n", LongType()),
                StructField("ok", BooleanType()),
                StructField("sb", LongType()),
            ]
        )

        def summarize(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                pdf = pdf.sort_values("p", ignore_index=True)
                yield pd.DataFrame(
                    {
                        "first_p": [pdf["p"].iloc[0]],
                        "last_p": [pdf["p"].iloc[-1]],
                        "first_v": [pdf["v"].iloc[0]],
                        "last_v": [pdf["v"].iloc[-1]],
                        "n": [len(pdf)],
                        "ok": [bool(pdf["v"].is_monotonic_increasing)],
                        "sb": [int(pdf["sb"].sum())],
                    }
                )

        parts = sorted(
            proj.mapInPandas(summarize, out_schema).collect(),
            key=lambda r: r["first_p"],
        )
        if not parts:
            return None, None, 0, 0
        for prev, cur in zip(parts, parts[1:]):
            if prev["last_v"] > cur["first_v"]:
                raise ValueError(f"column {ordered_on!r} is not ordered")
        if any(not r["ok"] for r in parts):
            raise ValueError(f"column {ordered_on!r} is not ordered")
        return (
            parts[0]["first_v"],
            parts[-1]["last_v"],
            sum(r["n"] for r in parts),
            sum(r["sb"] for r in parts),
        )

    def _select_overlap(
        self,
        entries: list[FileEntry],
        df_min,
        df_max,
        target,
        max_n_off_target_rgs: int | None,
    ) -> list[FileEntry]:
        """Pick files to rewrite: those overlapping [df_min, df_max]
        (inclusive — equal boundary values must merge so keep-last
        dedup sees them, reference ``merge_split_strategies/base.py:279-288``),
        plus adjacent off-target runs when they exceed
        ``max_n_off_target_rgs`` (coalescing, reference
        ``base.py:505-633``)."""
        overlap_idx = [
            i for i, e in enumerate(entries) if e.max >= df_min and e.min <= df_max
        ]
        selected = set(overlap_idx)
        if max_n_off_target_rgs is not None and entries:
            flags = _off_target_flags(entries, target)

            def off(i):
                return flags[i]

            lo = min(overlap_idx) if overlap_idx else len(entries)
            hi = max(overlap_idx) if overlap_idx else len(entries) - 1
            left_run = []
            for i in range(lo - 1, -1, -1):
                if off(i):
                    left_run.append(i)
                else:
                    break
            right_run = []
            for i in range(hi + 1, len(entries)):
                if off(i):
                    right_run.append(i)
                else:
                    break
            if len(left_run) >= max_n_off_target_rgs:
                selected.update(left_run)
            if len(right_run) >= max_n_off_target_rgs:
                selected.update(right_run)
        return [entries[i] for i in sorted(selected)]

    def _dedup_keep_last(
        self, merged: DataFrame, ordered_on: str, duplicates_on
    ) -> DataFrame:
        """Keep-last dedup on ``duplicates_on ∪ {ordered_on}``.

        "Last" = later physical position, new data after old
        (reference: ``write.py:35-75,199-203``;
        ``iter_merge_split_data.py:112-119``). Spark has no physical
        row order, so the tiebreaker is explicit:
        (src_rank desc, in-batch position desc).
        """
        if isinstance(duplicates_on, str):
            duplicates_on = [duplicates_on]
        subset = list(duplicates_on)
        if ordered_on not in subset:
            subset.append(ordered_on)
        w = Window.partitionBy(*subset).orderBy(
            F.desc(_SRC), F.desc(_FIDX), F.desc(_POS)
        )
        return (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _merge_write_driver(
        self, df, replaced, ordered_on, duplicates_on, target: int,
        new_tbl=None,
    ) -> list[FileEntry] | None:
        """Driver-side pyarrow merge for small batches: collect the
        batch as Arrow (type-exact — pandas would widen nullable ints
        to float), read the overlapping files with pyarrow, replay the
        keep-last tiebreak on key columns only (the data itself never
        round-trips through pandas), and write size-capped chunks into
        the dataset. File stats come from the SAME ``_footer_stats``
        reader the Spark path uses, so manifest entries are
        indistinguishable. Returns None when the files cannot be
        unified under the batch's Arrow schema (caller falls back to
        the distributed path).

        HARD byte cap, independent of the auto gate's estimate: old
        files are decoded batch-at-a-time and ACTUAL in-memory bytes
        accumulate against 2× the gate budget — bail to the
        distributed path the moment they exceed it. The estimate can
        be fooled (parquet's footer "uncompressed" size is
        post-dictionary-encoding, so heavily repeated strings decode
        far larger); the cap cannot, and it bounds peak driver memory
        to budget + one record batch."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        if new_tbl is None:
            new_tbl = df.toArrow()
        # relax nullability: a batch built from literals arrives with
        # non-nullable fields, but the DATASET schema is nullable —
        # casting old files (which may hold NULLs) to the stricter
        # schema would fail, and the stored schema must never tighten
        # just because one batch happened to be dense
        relaxed = pa.schema([f.with_nullable(True) for f in new_tbl.schema])
        new_tbl = new_tbl.cast(relaxed)
        hard_cap = 2 * _DRIVER_MERGE_MAX_BYTES
        actual = new_tbl.nbytes
        if actual > hard_cap:
            return None
        try:
            tables = []
            for e in replaced:
                pf = pq.ParquetFile(os.path.join(self.path, e.name))
                batches = []
                for rb in pf.iter_batches(batch_size=16384):
                    actual += rb.nbytes
                    if actual > hard_cap:
                        return None  # decoded larger than estimated
                    batches.append(rb)
                t = pa.Table.from_batches(batches, schema=pf.schema_arrow)
                t = t.select(new_tbl.schema.names)
                tables.append(t.cast(relaxed))
            merged = (
                pa.concat_tables(tables + [new_tbl]) if tables else new_tbl
            )
        except (KeyError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None  # schema drift (e.g. pre-evolution files)

        # concat order IS ascending (src, file_rank, pos): old files in
        # manifest order then the new batch — the same total order the
        # Spark path encodes in (_SRC, _FIDX, _POS)
        subset = None
        if duplicates_on is not None:
            subset = list(
                [duplicates_on] if isinstance(duplicates_on, str) else duplicates_on
            )
            if ordered_on not in subset:
                subset.append(ordered_on)
        import pandas as pd

        keys = merged.select(
            sorted(set((subset or []) + [ordered_on]))
        ).to_pandas(types_mapper=pd.ArrowDtype)
        if subset is not None:
            idx = np.flatnonzero(
                ~keys.duplicated(subset=subset, keep="last").to_numpy()
            )
        else:
            idx = np.arange(len(keys))
        # final layout order: ordered_on, ties in concat order
        # (= the Spark path's sort by ordered_on, _SRC, _FIDX, _POS)
        order = idx[
            np.argsort(keys[ordered_on].take(idx).to_numpy(), kind="stable")
        ]
        merged = merged.take(pa.array(order))
        return self._stage_arrow_chunks(merged, ordered_on, target)

    def _stage_arrow_chunks(
        self, merged, ordered_on: str, target: int
    ) -> list[FileEntry]:
        """Write an already-ordered Arrow table into balanced
        size-capped dataset files and return their manifest entries
        (same ``_footer_stats`` reader as the distributed path, so the
        entries are indistinguishable). Shared tail of the driver-side
        merge and compact fast paths."""
        import pyarrow.parquet as pq

        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex[:12]}")
        os.makedirs(staging, exist_ok=True)
        try:
            n = merged.num_rows
            # BALANCED chunk sizes, mirroring the distributed path's
            # repartitionByRange(ceil(n/target)): fixed target-row
            # slices would leave a 1-row tail file on target*k+1 rows,
            # and repeated small flushes accumulate off-target
            # fragments that later force coalescing rewrites.
            n_files = max(1, -(-n // target))
            base_rows, extra = divmod(n, n_files)
            slices, off = [], 0
            for j in range(n_files):
                ln = base_rows + (1 if j < extra else 0)
                slices.append((j, off, ln))
                off += ln
            for j, off, ln in slices:
                pq.write_table(
                    merged.slice(off, ln),
                    os.path.join(staging, f"part-{j:05d}.parquet"),
                    compression="snappy",
                )
            stats = _footer_stats(staging, ordered_on)
            if stats is None:
                # untrusted footer stats (e.g. string ordering column):
                # compute exact bounds from the in-memory chunks
                import pyarrow.compute as pc

                from datetime import timezone

                def _norm(v):
                    # align with _footer_stats: naive UTC timestamps
                    if hasattr(v, "tzinfo") and v.tzinfo is not None:
                        return v.astimezone(timezone.utc).replace(tzinfo=None)
                    return v

                stats = []
                for j, off, ln in slices:
                    chunk = merged.slice(off, ln)
                    col = chunk.column(ordered_on)
                    stats.append(
                        (
                            os.path.join(staging, f"part-{j:05d}.parquet"),
                            chunk.num_rows,
                            _norm(pc.min(col).as_py()),
                            _norm(pc.max(col).as_py()),
                            None,
                        )
                    )
            return self._finalize_staged(stats)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    def _compact_run_driver(
        self, run: list[FileEntry], ordered_on: str, target: int
    ) -> list[FileEntry] | None:
        """Driver-side pyarrow coalesce of one off-target run.

        Files in a run are already globally ordered (manifest order =
        ascending bounds; rows within a file sorted by ``ordered_on``
        — equal boundary values never split across files thanks to the
        inclusive overlap selection on write), so the rewrite is a
        plain ordered concat + rechunk: no sort, no dedup. Requires
        every file to carry the IDENTICAL Arrow schema (compact must
        not silently null evolved columns — mixed-schema runs take the
        distributed path, which projects through the manifest schema);
        bails to the distributed path when decoded bytes exceed the
        same hard cap as the driver merge."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        hard_cap = 2 * _DRIVER_MERGE_MAX_BYTES
        actual = 0
        tables = []
        schema = None
        try:
            for e in run:
                pf = pq.ParquetFile(os.path.join(self.path, e.name))
                if schema is None:
                    schema = pf.schema_arrow
                elif not pf.schema_arrow.equals(schema):
                    return None  # mixed pre/post-evolution schemas
                batches = []
                for rb in pf.iter_batches(batch_size=16384):
                    actual += rb.nbytes
                    if actual > hard_cap:
                        return None
                    batches.append(rb)
                tables.append(pa.Table.from_batches(batches, schema=schema))
            merged = pa.concat_tables(tables)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, OSError):
            return None
        return self._stage_arrow_chunks(merged, ordered_on, target)

    def _finalize_staged(self, stats) -> list[FileEntry]:
        """Move staged files into the dataset under fresh opaque names
        (manifest order = ascending bounds) and build their entries."""
        entries = []
        for src, n, mn, mx, cols in sorted(stats, key=lambda t: (t[2], t[3])):
            name = f"file_{uuid.uuid4().hex}.parquet"
            os.replace(src, os.path.join(self.path, name))
            entries.append(
                FileEntry(name=name, n_rows=n, min=mn, max=mx, cols=cols)
            )
        return entries

    def _write_files(
        self,
        merged: DataFrame,
        ordered_on: str,
        target,
        approx_rows: int,
        cache: bool = False,
        cluster_col: str | None = None,
    ) -> list[FileEntry]:
        """Write merged data into size-controlled files, return stats.

        ``cluster_col``: optional alternative LAYOUT key (a column
        already on ``merged``, e.g. a Morton curve) — files are
        range-partitioned and sorted on it instead of ``ordered_on``
        and it is dropped before writing. Per-file stats still record
        the ordering column's [min, max] (ranges may then overlap,
        which the store tolerates) plus every column's bounds for the
        data-skipping index. Row-count targets only.

        Row-count target: ``repartitionByRange`` into
        ``ceil(rows/target)`` splits + ``maxRecordsPerFile`` cap.
        Period target (e.g. ``'1D'``): one file per period via a
        derived period column (reference's TimePeriod strategy,
        ``time_period_strategy.py``).

        ``cache=True`` persists ``merged`` so the range partitioner's
        sample pass and the write pass execute the (expensive) child
        plan once — used when the child contains the keep-last window.
        Per-file stats come from the parquet footers driver-side (no
        second Spark scan of the written data); a Spark scan remains as
        the fallback for ordering columns whose footer stats are
        unreliable (binary/string truncation).
        """
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex[:12]}")
        os.makedirs(staging, exist_ok=True)
        # µs timestamps for THIS write (INT96 carries no footer
        # min/max stats); the session's own setting is restored after
        ts_conf = "spark.sql.parquet.outputTimestampType"
        prev_ts_conf = ts_set = None
        try:
            prev_ts_conf = self.spark.conf.get(ts_conf, None)
            self.spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
            ts_set = True
        except Exception:  # noqa: BLE001 - conf locked by a custom session
            pass
        try:
            if cache:
                from pyspark import StorageLevel

                merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
            if isinstance(target, int):
                n_out = max(1, -(-approx_rows // target))
                layout_key = cluster_col or ordered_on
                if n_out == 1:
                    # one output split: the range partitioner would
                    # only add its child-re-executing sample pass
                    out = merged.coalesce(1)
                else:
                    out = merged.repartitionByRange(n_out, F.col(layout_key))
                sort_cols = (
                    [cluster_col, ordered_on] if cluster_col else [ordered_on]
                )
                out = out.sortWithinPartitions(
                    *sort_cols, _SRC, _FIDX, _POS
                ).drop(_SRC, _FIDX, _POS)
                if cluster_col:
                    out = out.drop(cluster_col)
                (
                    out.write.option("maxRecordsPerFile", target)
                    .mode("overwrite")
                    .parquet(staging)
                )
            else:
                out = (
                    merged.withColumn(_PERIOD, floor_ts(F.col(ordered_on), target))
                    .repartition(F.col(_PERIOD))
                    .sortWithinPartitions(_PERIOD, ordered_on, _SRC, _FIDX, _POS)
                    .drop(_SRC, _FIDX, _POS)
                )
                out.write.partitionBy(_PERIOD).mode("overwrite").parquet(staging)

            # Per-file stats from the parquet footers (driver-side
            # metadata reads over the files of THIS write only); the
            # Spark scan is the fallback when footer stats are
            # unreliable for the ordering column.
            stats = _footer_stats(staging, ordered_on)
            if stats is None:
                rows = (
                    self.spark.read.parquet(staging)
                    .groupBy(F.input_file_name().alias("f"))
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.min(ordered_on).alias("mn"),
                        F.max(ordered_on).alias("mx"),
                    )
                    .collect()
                )
                # input_file_name() yields a URI: strip scheme and
                # percent-decoding (Spark also escapes ':' etc. in
                # partition dir names on disk — one decode recovers
                # the on-disk path).
                stats = [
                    (
                        urllib.parse.unquote(urllib.parse.urlparse(r["f"]).path),
                        r["n"],
                        r["mn"],
                        r["mx"],
                        None,
                    )
                    for r in rows
                ]
            return self._finalize_staged(stats)
        finally:
            if cache:
                merged.unpersist()
            shutil.rmtree(staging, ignore_errors=True)
            try:
                if ts_set and prev_ts_conf is not None:
                    self.spark.conf.set(ts_conf, prev_ts_conf)
                elif ts_set:
                    self.spark.conf.unset(ts_conf)
            except Exception:  # noqa: BLE001
                pass

    # ---------------------------------------------------------- compact
    def compact(
        self,
        *,
        row_group_target_size: int | str = DEFAULT_ROW_GROUP_TARGET_SIZE,
        zorder_by: list[str] | None = None,
        scope=None,
        conflict_retries: int = 0,
    ) -> int:
        """Coalesce runs of off-target files without new data — the
        reference's off-target coalescing as a standalone maintenance
        op (Delta's OPTIMIZE equivalent). Returns the number of files
        rewritten; on-target files are never rewritten.

        Row-count target: off-target = undersized (< 80% of target);
        only contiguous runs of 2+ such files are touched.
        Period target (e.g. ``'1D'``): off-target = the file shares
        its period with another file or spans several periods
        (reference one-file-per-period rule,
        ``time_period_strategy.py:166-199``); a run of 1 is rewritten
        when that lone file straddles periods (the rewrite splits it).

        ``zorder_by``: IN-PLACE RE-CLUSTERING (Delta ``OPTIMIZE
        ZORDER BY`` equivalent; beyond reference) — rewrite EVERY
        file along the Morton curve over the named columns
        (equi-depth rank buckets, bit-interleaved, range-partitioned
        into row-count-targeted files), through the same
        tombstone/CAS/rebase commit as every other write: readers see
        either the old layout or the new one, ``as_of`` time travel
        keeps resolving the pre-compact generation, and a concurrent
        writer's commit triggers reload-and-re-run (bounded by
        ``conflict_retries``; the re-run re-clusters the winner's
        files too, so no rows are lost). At 100 TB this is the weekly
        maintenance pass: clustering degrades under ordered appends
        and DML, and the per-file [min, max] the manifest records on
        every column is only as tight as the layout. File ranges on
        the ordering column widen/overlap after re-clustering — the
        store tolerates overlap (``read`` sorts; range reads stay
        correct, just less pruned), which is the explicit trade for
        tight multi-column boxes. Returns the number of files
        rewritten. Row-count targets only; sticky ``bloom_cols``
        re-index the rewritten files (one bounded pass), so equality
        skipping survives the re-clustering.

        ``scope``: optional DNF filter bounding the re-clustering to
        the FILES whose stats can match it (same skipping index the
        reads use; conservative — a stats-less file is in scope) —
        the incremental OPTIMIZE shape: at 100 TB a weekly pass never
        rewrites the whole table, it re-clusters the region recent
        appends and DML degraded (e.g. ``[("ts", ">=", <last week>)]``).
        File-granular: every row of an in-scope file is re-clustered
        (the curve is a LAYOUT, so moving whole files keeps
        out-of-scope bytes untouched); the sketch pass sizes the
        curve's buckets from the in-scope rows only.
        """
        if zorder_by is not None:
            attempt = 0
            while True:
                try:
                    return self._compact_zorder_attempt(
                        zorder_by, row_group_target_size, scope
                    )
                except ManifestConflictError:
                    if attempt >= conflict_retries:
                        raise
                    attempt += 1
                    self.conflict_reruns += 1
                    self._manifest = Manifest.load(self.path, self.backend)
        if not self.exists or not self._manifest.files:
            return 0
        files = self._manifest.files
        off = _off_target_flags(files, row_group_target_size)
        period_target = not isinstance(row_group_target_size, int)

        def qualifies(run: list[FileEntry]) -> bool:
            if len(run) > 1:
                return True
            if period_target and run:
                e = run[0]
                return floor_ts_scalar(
                    e.min, row_group_target_size
                ) != floor_ts_scalar(e.max, row_group_target_size)
            return False

        runs: list[list[FileEntry]] = []
        cur: list[FileEntry] = []
        for e, is_off in zip(files, off):
            if is_off:
                cur.append(e)
            else:
                if qualifies(cur):
                    runs.append(cur)
                cur = []
        if qualifies(cur):
            runs.append(cur)
        if not runs:
            return 0
        ordered_on = self._manifest.ordered_on
        # read runs through the MANIFEST schema, exactly like read():
        # a run can mix pre- and post-evolution files, and a bare
        # parquet read would take ONE file's footer schema — silently
        # dropping (nulling) evolved columns from the rewrite. The
        # explicit schema projects every file through the union,
        # missing columns as NULL, so compact never changes what a
        # read returns.
        reader = self.spark.read
        if self._manifest.schema_json:
            reader = reader.schema(
                StructType.fromJson(
                    __import__("json").loads(self._manifest.schema_json)
                )
            )
        rewritten = 0
        all_new: list = []
        for run in runs:
            # DRIVER FAST PATH: a small homogeneous-schema run
            # coalesces driver-side with pyarrow — zero Spark jobs for
            # the exact workload compact exists for (many tiny flush
            # files). Same gates as the driver merge write (row cap +
            # actual-bytes hard cap); mixed-schema or big runs fall
            # through to the distributed rewrite below.
            new_entries = (
                self._compact_run_driver(run, ordered_on, row_group_target_size)
                if isinstance(row_group_target_size, int)
                and sum(e.n_rows for e in run) <= _DRIVER_MERGE_MAX_ROWS
                else None
            )
            if new_entries is None:
                merged = _with_file_rank(
                    self.spark,
                    reader.parquet(
                        *[os.path.join(self.path, e.name) for e in run]
                    )
                    .withColumn(_POS, F.monotonically_increasing_id())
                    .withColumn(_SRC, F.lit(0)),
                    run,
                )
                new_entries = self._write_files(
                    merged, ordered_on, row_group_target_size,
                    sum(e.n_rows for e in run),
                )
            names = {e.name for e in run}
            self._manifest.files = [
                e for e in self._manifest.files if e.name not in names
            ] + new_entries
            all_new.extend(new_entries)
            rewritten += len(run)
        if self._manifest.schema_json:
            # sticky bloom_cols re-index the coalesced files (one
            # bounded pass over the new files only)
            self._attach_blooms(
                all_new,
                self._manifest.kv.get(_BLOOM_COLS_KV),
                StructType.fromJson(
                    __import__("json").loads(self._manifest.schema_json)
                ),
            )
        expired = self._stage_tombstones(
            self._manifest, [e.name for run in runs for e in run]
        )
        try:
            self._manifest.save(
                self.path, self.backend, snapshot=self.retain_versions
            )
        except ManifestConflictError:
            # same contract as _commit: staged rewrites were never
            # referenced — remove them and restore the handle to the
            # committed state so the caller can reload-and-retry
            for e in all_new:
                p = os.path.join(self.path, e.name)
                if os.path.exists(p):
                    os.remove(p)
            self._manifest = Manifest.load(self.path, self.backend)
            raise
        self._remove_files(expired)
        return rewritten

    def _compact_zorder_attempt(
        self, zorder_by: list[str], target, scope=None
    ) -> int:
        """One optimistic attempt of ``compact(zorder_by=...)`` — see
        :meth:`compact`. Reads the in-scope live files through the
        manifest schema, lays the rows along the Morton curve
        (``store/zorder.py`` — one approx-percentile sketch pass, then
        map-side bucket fold + interleave, all JVM expressions), and
        swaps that file subset in one manifest commit."""
        from oups_spark.functions.filters import dnf_file_can_match
        from oups_spark.store.zorder import zorder_column

        if not isinstance(target, int):
            raise ValueError(
                "compact(zorder_by=...) needs a row-count target (a "
                "period target would re-impose the single-column layout "
                "the re-clustering replaces)"
            )
        if not self.exists or not self._manifest.files:
            return 0
        man = self._manifest
        ordered_on = man.ordered_on
        schema = self.schema()
        known = {f.name for f in schema.fields} if schema is not None else set()
        missing = [c for c in zorder_by if c not in known]
        if missing:
            raise ValueError(f"zorder_by columns absent from dataset: {missing}")
        old = list(man.files)
        if scope is not None:
            # incremental OPTIMIZE: bound the rewrite to files whose
            # stats can match the scope (driver-side, conservative)
            old = [
                e for e in old
                if dnf_file_can_match(
                    {ordered_on: (e.min, e.max), **(e.cols or {})},
                    scope,
                    blooms=e.blooms,
                )
            ]
            if not old:
                return 0
        # DRIVER FAST PATH (round 15): a driver-sized rewrite scope —
        # the frequent shape for incremental OPTIMIZE over recent
        # appends, and the whole table at bench SF — re-clusters with
        # numpy/pyarrow: exact equi-depth buckets, the same Morton
        # spread, one take() and N small file writes, ZERO Spark jobs
        # for what was a sketch job + range-sample job + a write job
        # with one task per output file. The curve is a LAYOUT: rows
        # are preserved bit-for-bit (same reader, same writer as the
        # driver compact path), only their file assignment differs,
        # so readers see identical data either way. Row/byte-gated
        # with the distributed rewrite below as the 100 TB path.
        new_entries = None
        driver_cap = int(
            os.environ.get(
                "OUPS_ZORDER_DRIVER_MAX_ROWS", str(_DRIVER_MERGE_MAX_ROWS)
            )
        )
        if (
            sum(e.n_rows for e in old) <= driver_cap
            and self._old_files_bytes(old) <= _DRIVER_MERGE_MAX_BYTES
        ):
            new_entries = self._zorder_rewrite_driver(
                old, ordered_on, target, zorder_by
            )
        if new_entries is None:
            reader = self.spark.read
            if man.schema_json:
                reader = reader.schema(
                    StructType.fromJson(
                        __import__("json").loads(man.schema_json)
                    )
                )
            df = reader.parquet(
                *[os.path.join(self.path, e.name) for e in old]
            )
            # the rewrite input is consumed THREE times (percentile
            # sketch, range-partitioner sample, write) — persist it when
            # it fits a bounded budget so the file set is scanned once
            # (guide §5: reuse justifies the cache; MEMORY_AND_DISK spills
            # rather than OOMs). Oversized scopes stay uncached — at
            # 100 TB an incremental OPTIMIZE bounds `old` via `scope=`.
            cache_cap = int(
                os.environ.get("OUPS_COMPACT_CACHE_MAX_BYTES", str(4 << 30))
            )
            cached = None
            if self._old_files_bytes(old) <= cache_cap:
                from pyspark import StorageLevel

                cached = df = df.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                z = zorder_column(df, zorder_by)
                merged = _with_file_rank(
                    self.spark,
                    df.withColumn(_POS, F.monotonically_increasing_id())
                    .withColumn(_SRC, F.lit(0))
                    .withColumn(_ZCOL, z),
                    old,
                )
                total = sum(e.n_rows for e in old)
                new_entries = self._write_files(
                    merged, ordered_on, target, total, cluster_col=_ZCOL
                )
            finally:
                if cached is not None:
                    cached.unpersist()
        # sticky bloom_cols re-index the replacements (one bounded
        # pass over the new files) — re-clustering must not silently
        # degrade equality skipping
        self._attach_blooms(
            new_entries, man.kv.get(_BLOOM_COLS_KV), schema
        )
        # explicit reset: self._manifest may carry last_commit_landed
        # = True from an earlier successful save on the same instance;
        # the handler below must not mistake a pre-save failure here
        # for a post-commit one
        self._manifest.last_commit_landed = False
        try:
            names = {e.name for e in old}
            self._manifest.files = [
                e for e in self._manifest.files if e.name not in names
            ] + new_entries
            expired = self._stage_tombstones(
                self._manifest, [e.name for e in old]
            )
            self._manifest.save(
                self.path, self.backend, snapshot=self.retain_versions
            )
        except BaseException:
            if self._manifest.last_commit_landed:
                # POST-commit failure (the CAS accepted this rewrite,
                # then e.g. the snapshot write raised): the committed
                # manifest references the replacement files — deleting
                # them would destroy the whole re-clustered table.
                # The in-memory manifest already matches the committed
                # state (save assigns token/generation before the
                # snapshot write), so just propagate.
                raise
            # PRE-commit failure: finalized rewrites were never
            # referenced by a committed manifest — remove them on ANY
            # failure (a conflict, but also disk-full / transient I/O:
            # this path rewrites the WHOLE table, so a leak here is
            # table-sized) and reload so the handle's in-memory
            # manifest matches the committed one; compact()'s retry
            # loop re-runs on conflicts
            for e in new_entries:
                p = os.path.join(self.path, e.name)
                if os.path.exists(p):
                    os.remove(p)
            self._manifest = Manifest.load(self.path, self.backend)
            raise
        self._remove_files(expired)
        return len(old)

    def _zorder_rewrite_driver(
        self, old: list[FileEntry], ordered_on: str, target: int,
        zorder_by: list[str],
    ) -> list[FileEntry] | None:
        """Driver-side twin of the distributed z-order rewrite: read
        the in-scope files with pyarrow, bucket each clustered column
        on exact equi-depth quantiles (the approx-percentile sketch's
        only job is balancing the curve; with the rows in hand the
        exact quantiles are strictly better), Morton-spread and OR the
        bucket indices (the same ``_spread`` mapping the JVM
        expression uses), then sort by (z nulls-first, ordered_on,
        position) — the distributed path's
        ``repartitionByRange(__z) + sortWithinPartitions(__z,
        ordered_on, ...)`` total order — and stage size-balanced
        files through the same ``_stage_arrow_chunks``/footer-stats
        tail as the driver compact path. Returns None on any schema
        surprise (caller runs the distributed rewrite)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from oups_spark.store.zorder import _ZBITS

        hard_cap = 2 * _DRIVER_MERGE_MAX_BYTES
        tables = []
        total = 0
        schema = None
        try:
            for e in old:
                t = pq.read_table(os.path.join(self.path, e.name))
                if schema is None:
                    schema = t.schema
                else:
                    t = t.select(schema.names).cast(schema)
                total += t.nbytes
                if total > hard_cap:
                    return None
                tables.append(t)
            tbl = pa.concat_tables(tables)
        except (KeyError, OSError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None
        n_rows = tbl.num_rows
        if n_rows == 0:
            return None

        n_buckets = 2 ** _ZBITS
        pcts = [i / (n_buckets - 1) for i in range(1, n_buckets - 1)]
        n_cols = len(zorder_by)
        z = np.zeros(n_rows, dtype=np.int64)
        z_null = np.zeros(n_rows, dtype=bool)
        for j, c in enumerate(zorder_by):
            try:
                col = pc.cast(tbl.column(c), pa.float64())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return None
            v = col.to_numpy(zero_copy_only=False)  # nulls -> nan
            isnan = np.isnan(v)
            vals = v[~isnan]
            bounds = (
                np.unique(np.quantile(vals, pcts))
                if len(vals)
                else np.array([0.0])
            )
            # bucket index = #bounds <= v, as the CASE tree counts it
            idx = np.searchsorted(bounds, np.nan_to_num(v), side="right")
            # spread bit i of column j to position i*n + j — the same
            # mapping zorder._spread precomputes into the JVM CASE
            # tree's leaf literals
            spread = np.zeros(n_rows, dtype=np.int64)
            for i in range(_ZBITS):
                spread |= ((idx >> i) & 1) << (i * n_cols + j)
            z |= spread
            z_null |= isnan
        # total order: z ascending with nulls FIRST (Spark's
        # asc_nulls_first), then ordered_on, then original position
        sort_tbl = pa.table(
            {
                "__z": pa.array(
                    np.where(z_null, None, z), type=pa.int64()
                ),
                "__o": tbl.column(ordered_on),
                "__p": pa.array(np.arange(n_rows, dtype=np.int64)),
            }
        )
        order = pc.sort_indices(
            sort_tbl,
            sort_keys=[
                ("__z", "ascending"),
                ("__o", "ascending"),
                ("__p", "ascending"),
            ],
            null_placement="at_start",
        )
        return self._stage_arrow_chunks(tbl.take(order), ordered_on, target)

    # ------------------------------------------------------------- DML
    def delete_where(
        self, filters, *, conflict_retries: int = 0
    ) -> int:
        """Row-level DELETE with bounded rewrite (Delta-style
        copy-on-write; beyond reference — the reference store has no
        row-level DML).

        Plan: (1) prune candidate files DRIVER-side from per-file
        [min, max] stats + blooms (the same skipping index
        ``read(filters=)`` uses, with the ordering column's own
        bounds included), (2) one scan of the candidates finds which
        files truly contain matches and how many rows, (3) one job
        rewrites ONLY those files — each source file's surviving
        rows land in exactly one replacement file, so entries stay
        range-disjoint with untouched neighbors and the cost is
        ∝ matching files, never dataset size. A file whose every
        row matches is dropped with no replacement. The commit goes
        through the same tombstone/CAS/rebase path as ``write``;
        sticky ``bloom_cols`` re-index the replacement files.

        ``filters`` is required — refuse an implicit full-table
        delete (drop the dataset with ``delete()`` instead).

        Returns the number of rows deleted.
        """
        return self._dml(filters, None, conflict_retries)

    def update_where(
        self, filters, assignments: dict, *, conflict_retries: int = 0
    ) -> int:
        """Row-level UPDATE: set ``assignments`` (``{col: Column or
        literal}``, evaluated against the PRE-update row) on rows
        matching the DNF ``filters``; same bounded-rewrite plan and
        commit path as :meth:`delete_where`. Assigning the ordering
        column is rejected (it would invalidate file ranges — that
        reshape is a delete + write). Values are cast to the
        column's existing type, so the dataset schema never drifts.

        Returns the number of rows updated.
        """
        if not assignments:
            raise ValueError("update_where needs at least one assignment")
        return self._dml(filters, assignments, conflict_retries)

    _MERGE_IN_KEYS_CAP = 2048

    def merge_into(
        self,
        source: DataFrame,
        on: list[str] | str,
        *,
        when_matched_update: dict | str | None = None,
        when_matched_delete=False,
        when_not_matched_insert: bool = True,
        when_not_matched_by_source_update: dict | None = None,
        when_not_matched_by_source_delete=False,
        by_source_scope=None,
        evolve_schema: bool = False,
        row_group_target_size: int = DEFAULT_ROW_GROUP_TARGET_SIZE,
        conflict_retries: int = 0,
    ) -> dict:
        """MERGE INTO: conditional upsert + delete as ONE atomic
        commit (beyond reference — the reference's closest shape is
        keep-last dedup on the write path,
        ``iter_merge_split_data.py:113-119``; this is the Delta/SQL
        ``WHEN MATCHED ... WHEN NOT MATCHED ... WHEN NOT MATCHED BY
        SOURCE ...`` lakehouse op).

        ``on``: equi-join key column(s), present on both sides. The
        source must be UNIQUE on them and carry no NULL keys (the
        multiple-matches case SQL MERGE rejects).

        ``when_matched_update``: ``{target_col: value}`` applied to
        matched target rows. A Column value is an expression over the
        matched pair — reference source columns as ``F.col("s.<col>")``
        and target columns as ``F.col("t.<col>")`` (bare names work
        when unambiguous); any other value is a literal (the
        ``update_where`` rule). The dict sentinel ``"source"`` sets
        every common non-key column from the source row. The ordering
        column cannot be assigned (same rule as ``update_where``).

        ``when_matched_delete``: ``True`` deletes every matched row;
        a Column / expression string deletes matched rows satisfying
        it (evaluated before the update, like a ``WHEN MATCHED AND
        <cond> THEN DELETE`` clause listed first).

        ``when_not_matched_insert``: insert source rows with no match,
        projected onto the target schema (absent target columns read
        NULL; extra source columns are dropped — they remain available
        to the update expressions — unless ``evolve_schema=True``).

        ``evolve_schema``: Delta-style automatic schema evolution —
        source columns absent from the target EXTEND the dataset
        schema (existing rows read back NULL, the store's
        metadata-only evolution model; same-typed collisions are
        always enforced). Inserts carry the new columns and update
        clauses may assign them.

        ``when_not_matched_by_source_update`` / ``_delete``: the SQL
        2023 / Delta clause family for TARGET rows with no source
        match — the full-snapshot sync shape (source = the complete
        current state of a scope; target rows the snapshot no longer
        contains are deleted or flagged). There is no source row, so
        update values reference target columns only and the delete
        condition is a Column over ``t.``/bare target names (``True``
        = every not-matched row in scope). By SQL semantics these
        clauses consider the WHOLE target, which no key pruning can
        bound — so ``by_source_scope`` (a DNF filter over target
        columns) both prunes the scanned files driver-side AND gates
        the clauses row-level (a row outside the scope is never
        touched, keeping semantics independent of file layout). Pass
        no scope only when a full-table sweep is intended. Delete is
        evaluated before update, mirroring the matched side. Counts
        fold into the returned ``updated``/``deleted`` totals
        (Delta's top-level metrics convention).

        Plan (cost ∝ matched files + insert volume + scoped files,
        never unscoped table size):
        (1) one source pass collects count/uniqueness/per-key bounds;
        (2) candidate target files are pruned DRIVER-side from the
        manifest's per-file [min, max] stats on every key column —
        and per-file Blooms, when the source's distinct key set is
        small enough to collect; (3) one scan of the candidates joined
        to the source finds the files truly holding matches and the
        delete/update split; (4) those files are rewritten
        copy-on-write (one replacement per source file, the
        ``delete_where`` shape); (5) not-matched source rows are
        anti-joined against the candidates only (pruning is
        conservative, so no other file can hold a matching key) and
        written as NEW size-controlled files — they may overlap
        existing files' ordering ranges, which the store tolerates
        (``read(ordered=True)`` sorts; a later ``compact`` or
        overlapping ``write`` re-merges), exactly Delta's MERGE file
        shape; (6) replacements + inserts commit in ONE
        tombstone/CAS/rebase manifest swap.

        Returns ``{"updated": n, "deleted": n, "inserted": n}``.
        """
        attempt = 0
        while True:
            try:
                return self._merge_into_attempt(
                    source, on,
                    when_matched_update=when_matched_update,
                    when_matched_delete=when_matched_delete,
                    when_not_matched_insert=when_not_matched_insert,
                    nbs_update=when_not_matched_by_source_update,
                    nbs_delete=when_not_matched_by_source_delete,
                    by_source_scope=by_source_scope,
                    evolve_schema=evolve_schema,
                    row_group_target_size=row_group_target_size,
                )
            except ManifestConflictError:
                if attempt >= conflict_retries:
                    raise
                attempt += 1
                self.conflict_reruns += 1
                self._manifest = Manifest.load(self.path, self.backend)

    def _merge_into_attempt(
        self,
        source: DataFrame,
        on,
        *,
        when_matched_update,
        when_matched_delete,
        when_not_matched_insert,
        nbs_update=None,
        nbs_delete=False,
        by_source_scope=None,
        evolve_schema=False,
        row_group_target_size=DEFAULT_ROW_GROUP_TARGET_SIZE,
    ) -> dict:
        from pyspark.sql import Column

        from oups_spark.functions.filters import (
            dnf_condition,
            dnf_file_can_match,
        )

        on = [on] if isinstance(on, str) else list(on)
        if not on:
            raise ValueError("merge_into needs at least one key column")
        if (
            when_matched_update is None
            and not when_matched_delete
            and not when_not_matched_insert
            and nbs_update is None
            and not nbs_delete
        ):
            raise ValueError("merge_into with no clauses is a no-op")
        if not self.exists:
            raise FileNotFoundError(f"no ordered dataset at {self.path}")
        man = self._manifest
        o = man.ordered_on
        schema = self.schema()
        if schema is None:
            raise ValueError("dataset has no recorded schema")
        tcols = {f.name: f for f in schema.fields}
        missing_t = [c for c in on if c not in tcols]
        missing_s = [c for c in on if c not in source.columns]
        if missing_t or missing_s:
            raise ValueError(
                f"merge keys absent from target {missing_t} / source {missing_s}"
            )
        if when_not_matched_insert and o not in source.columns:
            raise ValueError(
                f"when_not_matched_insert needs the ordering column {o!r} "
                "in the source"
            )
        # same-named columns must keep their type (the write path's
        # rule — a differently-typed file would explode at read time)
        src_by = {f.name: f for f in source.schema.fields}
        for c in set(src_by) & set(tcols):
            if src_by[c].dataType != tcols[c].dataType:
                raise ValueError(
                    f"merge source cannot change column {c!r}: "
                    f"{tcols[c].dataType} -> {src_by[c].dataType}"
                )
        if evolve_schema:
            # Delta-style automatic schema evolution: source columns
            # absent from the target extend the schema (existing rows
            # read back NULL — the store's metadata-only evolution
            # model, no file rewritten just for the schema change);
            # inserts carry them, and update clauses may assign them
            new_fields = [
                f for f in source.schema.fields if f.name not in tcols
            ]
            if new_fields:
                schema = StructType(list(schema.fields) + new_fields)
                tcols = {f.name: f for f in schema.fields}

        # normalize the matched clauses
        def _cond(v):
            if v is None or v is False:
                return None
            if v is True:
                return F.lit(True)
            return F.expr(v) if isinstance(v, str) else v

        delcond = _cond(when_matched_delete)
        if when_matched_update == "source":
            when_matched_update = {
                c: F.col(f"s.{c}")
                for c in source.columns
                if c in tcols and c not in on and c != o
            }
            if not when_matched_update:
                raise ValueError(
                    "when_matched_update='source': no common non-key "
                    "columns to set"
                )
        upd = None
        if when_matched_update is not None:
            if o in when_matched_update:
                raise ValueError(
                    f"merge_into cannot assign the ordering column {o!r}"
                )
            unknown = set(when_matched_update) - set(tcols)
            if unknown:
                raise ValueError(
                    f"unknown columns in when_matched_update: {sorted(unknown)}"
                )
            # non-Column values are LITERALS (update_where's rule);
            # expressions over s./t. come in as Columns (F.col/F.expr)
            upd = {
                c: (v if isinstance(v, Column) else F.lit(v))
                for c, v in when_matched_update.items()
            }

        # normalize the not-matched-by-source clauses
        nbs_delcond = _cond(nbs_delete)
        nbs_upd = None
        if nbs_update is not None:
            if o in nbs_update:
                raise ValueError(
                    f"merge_into cannot assign the ordering column {o!r}"
                )
            unknown = set(nbs_update) - set(tcols)
            if unknown:
                raise ValueError(
                    "unknown columns in when_not_matched_by_source_update: "
                    f"{sorted(unknown)}"
                )
            nbs_upd = {
                c: (v if isinstance(v, Column) else F.lit(v))
                for c, v in nbs_update.items()
            }
        want_nbs = nbs_delcond is not None or nbs_upd is not None
        # the scope gates the clauses ROW-level (so semantics never
        # depend on file layout) and prunes the scanned files below;
        # columns are t.-prefixed — on the joined frame a bare name
        # shared with the source would be ambiguous
        scope_cond = (
            dnf_condition(
                [
                    [(f"t.{c}", op, v) for c, op, v in grp]
                    for grp in (
                        by_source_scope
                        if by_source_scope
                        and isinstance(by_source_scope[0], list)
                        else [by_source_scope]
                    )
                ]
            )
            if by_source_scope
            else F.lit(True)
        )

        # (1) one source pass: count, key uniqueness, per-key bounds.
        # SINGLE-JOB SMALL-SOURCE PATH (round-14, guide §1.2): a
        # row/byte-capped Arrow probe collects the source ONCE — the
        # stats, the uniqueness check, the IN-filter key set and
        # (below) the whole driver-side merge all derive from that one
        # CollectLimit job, replacing the stats agg + distinct collect,
        # and every later pass joins against the collected rows as a
        # LOCAL relation instead of re-executing a computed source
        # under each broadcast. Oversized sources fall back to the
        # distributed stats pass at the cost of the bounded probe.
        probe_tbl = None
        if not any(
            t in f.dataType.simpleString()
            for f in source.schema.fields
            for t in ("binary", "array", "map", "struct")
        ):
            try:
                probe_tbl = source.limit(
                    _DRIVER_MERGE_MAX_ROWS + 1
                ).toArrow()
            except Exception:  # noqa: BLE001 — maxResultSize etc.
                probe_tbl = None
            if probe_tbl is not None and (
                probe_tbl.num_rows > _DRIVER_MERGE_MAX_ROWS
                or probe_tbl.nbytes > _DRIVER_MERGE_MAX_BYTES
            ):
                probe_tbl = None
        if probe_tbl is not None:
            import pyarrow.compute as pc

            n_src = probe_tbl.num_rows
            kcols = {c: probe_tbl.column(c) for c in on}
            n_null = sum(col.null_count for col in kcols.values())
            smn, smx = {}, {}
            for c, col in kcols.items():
                mm = pc.min_max(col)
                smn[c] = _norm_tz(mm["min"].as_py())
                smx[c] = _norm_tz(mm["max"].as_py())
            if len(on) == 1:
                nd = int(pc.count_distinct(kcols[on[0]]).as_py())
            else:
                nd = len(set(zip(*[col.to_pylist() for col in kcols.values()])))
        else:
            sstats = source.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(*[F.col(c) for c in on]).alias("nd"),
                F.sum(
                    F.when(
                        functools.reduce(
                            lambda a, b: a | b, [F.col(c).isNull() for c in on]
                        ),
                        1,
                    ).otherwise(0)
                ).alias("nnull"),
                *[
                    e
                    for c in on
                    for e in (
                        F.min(c).alias(f"__mn_{c}"),
                        F.max(c).alias(f"__mx_{c}"),
                    )
                ],
            ).collect()[0]
            n_src = int(sstats["n"])
            n_null = int(sstats["nnull"] or 0)
            nd = int(sstats["nd"])
            smn = {c: sstats[f"__mn_{c}"] for c in on}
            smx = {c: sstats[f"__mx_{c}"] for c in on}
        zeros = {"updated": 0, "deleted": 0, "inserted": 0}
        want_nbs_early = (
            nbs_delete is not None and nbs_delete is not False
        ) or nbs_update is not None
        if n_src == 0 and not want_nbs_early:
            # an EMPTY source still drives the not-matched-by-source
            # clauses (a full-snapshot sync of an emptied scope), so
            # only short-circuit without them
            return zeros
        if n_null:
            raise ValueError("merge source has NULL values in the merge keys")
        if nd < n_src:
            raise ValueError(
                "merge source is not unique on the merge keys "
                f"({n_src} rows, {nd} distinct keys)"
            )

        # (2) driver-side candidate pruning: per-key [min, max] overlap
        # on every key column; a small distinct key set upgrades to an
        # IN filter, which also engages the per-file Blooms
        cands: list[FileEntry] = []
        if n_src:
            filters = [
                [
                    c_op
                    for c in on
                    for c_op in (
                        (c, ">=", smn[c]),
                        (c, "<=", smx[c]),
                    )
                ]
            ]
            if len(on) == 1 and nd <= self._MERGE_IN_KEYS_CAP:
                if probe_tbl is not None:
                    import pyarrow.compute as pc

                    keys = [
                        _norm_tz(v)
                        for v in pc.unique(
                            probe_tbl.column(on[0])
                        ).to_pylist()
                    ]
                else:
                    keys = [
                        r[0]
                        for r in source.select(on[0]).distinct().collect()
                    ]
                filters = [[(on[0], "in", keys)]]
            # wide-manifest fast path: an Arrow-lazy file list
            # pre-prunes on the key-column [min, max] ranges in
            # vectorized compute, materializing only survivors — the
            # candidate set (and the Python exact filter below, which
            # adds the IN/bloom precision) is then pinned by the
            # source's key span, never the manifest width
            pre = man.files
            prune_keys = getattr(pre, "prune_key_range", None)
            if prune_keys is not None:
                pre = prune_keys(
                    {c: (smn[c], smx[c]) for c in on},
                    ordered_on=o,
                )
            cands = [
                e for e in pre
                if dnf_file_can_match(
                    {o: (e.min, e.max), **(e.cols or {})}, filters,
                    blooms=e.blooms,
                )
            ]
        reader = self.spark.read.schema(schema)
        basename = F.substring_index(F.input_file_name(), "/", -1)
        key_cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(f"t.{c}") == F.col(f"s.{c}") for c in on],
        )
        cand_paths = [os.path.join(self.path, e.name) for e in cands]
        # a CDC-sized source joins broadcast on every pass (hit scan,
        # rewrite, anti-join) — declared explicitly so the plan never
        # depends on AQE's runtime size estimate of a computed source.
        # A probed source becomes a LOCAL relation: the broadcast then
        # materializes driver-side with no job and no re-execution of
        # the source plan per consuming pass (guide §2.1).
        local_src = None
        if probe_tbl is not None:
            local_src = self.spark.createDataFrame(
                probe_tbl, schema=source.schema
            )
        src_hinted = (
            F.broadcast(local_src)
            if local_src is not None
            else (
                F.broadcast(source)
                if n_src <= _DRIVER_MERGE_MAX_ROWS
                else source
            )
        )

        # files the not-matched-by-source clauses must consider:
        # scope-pruned driver-side (every file when no scope is given —
        # the SQL whole-target semantics, opted into explicitly)
        nbs_cands: list[FileEntry] = []
        if want_nbs:
            nbs_cands = [
                e for e in man.files
                if dnf_file_can_match(
                    {o: (e.min, e.max), **(e.cols or {})},
                    by_source_scope,
                    blooms=e.blooms,
                )
            ]

        # DRIVER-SIDE MERGE FAST PATH: source probed AND candidates
        # small — the rest of the merge costs ONE more Spark job
        # (see _merge_into_driver); None falls through to the
        # distributed path below, which still reuses the local source
        if probe_tbl is not None:
            res = self._merge_into_driver(
                probe_tbl, local_src, on, schema, reader, key_cond,
                basename, o=o, man=man,
                cands=cands, nbs_cands=nbs_cands,
                upd=upd, delcond=delcond,
                nbs_upd=nbs_upd, nbs_delcond=nbs_delcond,
                scope_cond=scope_cond,
                when_not_matched_insert=when_not_matched_insert,
                row_group_target_size=row_group_target_size,
            )
            if res is not None:
                return res

        # (3) which candidates REALLY hold affected rows, and the
        # per-clause split — ONE scan over the union of both
        # candidate sets (a matching row can only live in `cands`:
        # the key pruning is conservative)
        n_del = n_upd = n_nbs_del = n_nbs_upd = 0
        touched: list[FileEntry] = []
        want_matched = delcond is not None or upd is not None
        scan_by_name = {e.name: e for e in (cands if want_matched else [])}
        for e in nbs_cands:
            scan_by_name.setdefault(e.name, e)
        if scan_by_name:
            matched = F.col(f"s.{on[0]}").isNotNull()
            dflag = matched & (
                F.coalesce(delcond, F.lit(False))
                if delcond is not None
                else F.lit(False)
            )
            in_scope = ~matched & scope_cond
            nbs_dflag = in_scope & (
                F.coalesce(nbs_delcond, F.lit(False))
                if nbs_delcond is not None
                else F.lit(False)
            )
            nbs_uflag = (
                in_scope & ~nbs_dflag
                if nbs_upd is not None
                else F.lit(False)
            )
            cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
            hits = {
                r["__f"]: r
                for r in (
                    reader.parquet(
                        *[
                            os.path.join(self.path, n)
                            for n in scan_by_name
                        ]
                    )
                    .withColumn("__f", basename)
                    .alias("t")
                    .join(src_hinted.alias("s"), key_cond, "left")
                    .groupBy("__f")
                    .agg(
                        cnt(matched).alias("n_m"),
                        cnt(dflag).alias("n_dm"),
                        cnt(nbs_dflag).alias("n_nd"),
                        cnt(nbs_uflag).alias("n_nu"),
                    )
                    .collect()
                )
            }

            def _hit(r) -> bool:
                return bool(
                    (want_matched and r["n_m"])
                    or r["n_nd"]
                    or r["n_nu"]
                )

            touched = [
                e
                for e in scan_by_name.values()
                if e.name in hits and _hit(hits[e.name])
            ]
            hit_rows = [hits[e.name] for e in touched]
            n_matched = sum(int(r["n_m"]) for r in hit_rows)
            n_del = sum(int(r["n_dm"]) for r in hit_rows)
            n_upd = (n_matched - n_del) if upd is not None else 0
            n_nbs_del = sum(int(r["n_nd"]) for r in hit_rows)
            n_nbs_upd = sum(int(r["n_nu"]) for r in hit_rows)

        # (4) copy-on-write rewrite of the truly-affected files
        rewritten: list[FileEntry] = []
        if touched:
            fid_map = F.create_map(
                *[
                    lit
                    for i, e in enumerate(touched)
                    for lit in (F.lit(e.name), F.lit(i))
                ]
            )
            tgt = (
                reader.parquet(
                    *[os.path.join(self.path, e.name) for e in touched]
                )
                .withColumn(_FID, fid_map[basename])
                .withColumn(_POS, F.monotonically_increasing_id())
            )
            j = tgt.alias("t").join(src_hinted.alias("s"), key_cond, "left")
            # source keys are non-null (validated), so a non-null key
            # on the s side IS the match indicator
            matched = F.col(f"s.{on[0]}").isNotNull()
            in_scope = ~matched & scope_cond
            drop = F.lit(False)
            if delcond is not None:
                drop = drop | (matched & F.coalesce(delcond, F.lit(False)))
            if nbs_delcond is not None:
                drop = drop | (
                    in_scope & F.coalesce(nbs_delcond, F.lit(False))
                )
            sel = []
            for fld in schema.fields:
                tcol = F.col(f"t.{fld.name}")
                expr = tcol
                if nbs_upd is not None and fld.name in nbs_upd:
                    expr = F.when(
                        in_scope, nbs_upd[fld.name].cast(fld.dataType)
                    ).otherwise(expr)
                if upd is not None and fld.name in upd:
                    expr = F.when(
                        matched, upd[fld.name].cast(fld.dataType)
                    ).otherwise(expr)
                sel.append(expr.alias(fld.name))
            out = j.filter(~drop).select(*sel, F.col(_FID), F.col(_POS))
            rewritten = self._stage_cow_rewrite(out, len(touched), o)

        # (5) not-matched source rows -> NEW files (anti-join against
        # the candidates only: pruning is conservative, no other file
        # can hold a matching key). Steps 5-6 run under a cleanup
        # guard: the step-4 replacement files are already FINALIZED
        # into the dataset dir but referenced by no manifest until the
        # commit lands, so any failure here (the null-ordered_on
        # raise, an insert-write error) must delete them — and any
        # finalized inserts — or every failed/retried merge leaks
        # orphan data files (no read impact, reads are
        # manifest-driven; disk only). A CAS conflict inside _commit
        # already cleans its new entries (idempotent: exists-guarded),
        # and a successful rebase returns normally, keeping its files.
        inserts: list[FileEntry] = []
        n_ins = 0
        self._commit_landed = False
        try:
            if when_not_matched_insert:
                ins = source.alias("s")
                if cands:
                    ins = ins.join(
                        reader.parquet(*cand_paths).select(*on).alias("t"),
                        key_cond,
                        "left_anti",
                    )
                istats = ins.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.when(F.col(o).isNull(), 1).otherwise(0)
                    ).alias("nnull"),
                ).collect()[0]
                n_ins = int(istats["n"])
                if n_ins and int(istats["nnull"] or 0):
                    raise ValueError(
                        "null values in ordered_on are not allowed"
                    )
                if n_ins:
                    proj = ins.select(
                        *[
                            (
                                F.col(f.name).cast(f.dataType)
                                if f.name in source.columns
                                else F.lit(None).cast(f.dataType)
                            ).alias(f.name)
                            for f in schema.fields
                        ]
                    ).withColumns(
                        {
                            _POS: F.monotonically_increasing_id(),
                            _SRC: F.lit(1),
                            _FIDX: F.lit(0),
                        }
                    )
                    inserts = self._write_files(
                        proj, o, row_group_target_size, n_ins
                    )

            # counts fold the by-source clauses into the totals (Delta's
            # top-level metrics convention)
            result = {
                "updated": n_upd + n_nbs_upd,
                "deleted": n_del + n_nbs_del,
                "inserted": n_ins,
            }
            if not touched and not inserts:
                return result

            # (6) ONE commit: replacements + inserts in a single
            # tombstone/CAS/rebase manifest swap
            new_entries = rewritten + inserts
            self._attach_blooms(
                new_entries, man.kv.get(_BLOOM_COLS_KV), schema
            )
            replaced = {e.name for e in touched}
            self._commit(
                o,
                df=None,
                target_schema=schema,
                kept=[e for e in man.files if e.name not in replaced],
                replaced_names=sorted(replaced),
                new_entries=new_entries,
                key_value_metadata=None,
                cmidx=man.cmidx,
            )
        except BaseException:
            if self._commit_landed:
                # the manifest CAS landed before the failure (e.g. a
                # post-commit snapshot write or expired-file deletion
                # raised): the committed manifest references the
                # rewrites + inserts — deleting them would be
                # PERMANENT DATA LOSS, so propagate untouched
                raise
            for e in rewritten + inserts:
                p = os.path.join(self.path, e.name)
                if os.path.exists(p):
                    os.remove(p)
            raise
        return result

    def _merge_into_driver(
        self, probe_tbl, local_src, on, schema, reader, key_cond,
        basename, *, o, man, cands, nbs_cands, upd, delcond,
        nbs_upd, nbs_delcond, scope_cond, when_not_matched_insert,
        row_group_target_size,
    ) -> dict | None:
        """Driver-side MERGE fast path (round-14, guide §1.2/§2.1):
        with the deduped source already collected by the Arrow probe
        and the candidate files small (manifest row/byte gates plus a
        hard cap on the actually-collected bytes), the whole merge
        runs off ONE more Spark job: the candidates are scanned once,
        left-joined to the local-relation source with the SAME
        matched/scope/drop flags and update projections as the
        distributed path (all Column expressions evaluate in Spark —
        nothing is re-implemented), and the flagged result comes back
        as Arrow. Touched-file detection, counts, the per-file
        copy-on-write replacements, the anti-join inserts (probe rows
        whose key matched nothing in the scan) and the manifest
        commit are then driver-side pyarrow/fs work. A steady-state
        CDC micro-batch costs 2 jobs (probe + scan) instead of the
        stats/keys/hit-scan/rewrite/istats/insert train whose every
        broadcast re-executed the computed source. Returns None to
        fall back to the distributed path (period row-group targets,
        nested target columns, oversized candidate set): at 100 TB
        the big merges keep the classic plan, exactly like the write
        path's driver merge."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if not isinstance(row_group_target_size, int):
            return None
        if any(
            t in f.dataType.simpleString()
            for f in schema.fields
            for t in ("binary", "array", "map", "struct")
        ):
            return None
        want_matched = delcond is not None or upd is not None
        scan: dict[str, FileEntry] = {
            e.name: e
            for e in (
                cands if (want_matched or when_not_matched_insert) else []
            )
        }
        for e in nbs_cands:
            scan.setdefault(e.name, e)
        entries = list(scan.values())
        if entries and (
            sum(e.n_rows for e in entries) + probe_tbl.num_rows
            > _DRIVER_MERGE_MAX_ROWS
            or self._old_files_bytes(entries) + probe_tbl.nbytes
            > _DRIVER_MERGE_MAX_BYTES
        ):
            return None

        F_M, F_DM, F_ND, F_NU = (
            "__oups_m", "__oups_dm", "__oups_nd", "__oups_nu"
        )
        key_echo = [f"__oups_k{i}" for i in range(len(on))]
        res_tbl = None
        if entries:
            matched = F.col(f"s.{on[0]}").isNotNull()
            in_scope = ~matched & scope_cond
            dflag = matched & (
                F.coalesce(delcond, F.lit(False))
                if delcond is not None
                else F.lit(False)
            )
            nbs_dflag = in_scope & (
                F.coalesce(nbs_delcond, F.lit(False))
                if nbs_delcond is not None
                else F.lit(False)
            )
            nbs_uflag = (
                in_scope & ~nbs_dflag
                if nbs_upd is not None
                else F.lit(False)
            )
            fid_map = F.create_map(
                *[
                    lit
                    for i, e in enumerate(entries)
                    for lit in (F.lit(e.name), F.lit(i))
                ]
            )
            tgt = (
                reader.parquet(
                    *[os.path.join(self.path, e.name) for e in entries]
                )
                .withColumn(_FID, fid_map[basename])
                .withColumn(_POS, F.monotonically_increasing_id())
            )
            j = tgt.alias("t").join(
                F.broadcast(local_src).alias("s"), key_cond, "left"
            )
            sel = []
            for fld in schema.fields:
                expr = F.col(f"t.{fld.name}")
                if nbs_upd is not None and fld.name in nbs_upd:
                    expr = F.when(
                        in_scope, nbs_upd[fld.name].cast(fld.dataType)
                    ).otherwise(expr)
                if upd is not None and fld.name in upd:
                    expr = F.when(
                        matched, upd[fld.name].cast(fld.dataType)
                    ).otherwise(expr)
                sel.append(expr.alias(fld.name))
            out = j.select(
                *sel,
                F.col(_FID),
                F.col(_POS),
                matched.alias(F_M),
                dflag.alias(F_DM),
                nbs_dflag.alias(F_ND),
                nbs_uflag.alias(F_NU),
                *[
                    F.when(matched, F.col(f"s.{c}")).alias(k)
                    for c, k in zip(on, key_echo)
                ],
            )
            res_tbl = out.toArrow()
            if res_tbl.nbytes > 2 * _DRIVER_MERGE_MAX_BYTES:
                return None  # decoded far larger than the footer gate

        # touched files + per-clause counts (the distributed path's
        # hit-scan aggregate, replayed on the collected flags)
        n_del = n_upd = n_nbs_del = n_nbs_upd = 0
        touched: list[FileEntry] = []
        keep_tbl = None
        if res_tbl is not None and res_tbl.num_rows:
            nf = len(entries)
            fid = res_tbl.column(_FID).to_numpy(zero_copy_only=False)
            bm = (
                res_tbl.column(F_M)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            bdm = (
                res_tbl.column(F_DM)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            bnd = (
                res_tbl.column(F_ND)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            bnu = (
                res_tbl.column(F_NU)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            n_m_f = np.bincount(fid[bm], minlength=nf)
            n_dm_f = np.bincount(fid[bdm], minlength=nf)
            n_nd_f = np.bincount(fid[bnd], minlength=nf)
            n_nu_f = np.bincount(fid[bnu], minlength=nf)
            hit = (
                ((n_m_f > 0) if want_matched else np.zeros(nf, bool))
                | (n_nd_f > 0)
                | (n_nu_f > 0)
            )
            touched = [entries[i] for i in np.flatnonzero(hit)]
            n_matched = int(n_m_f[hit].sum())
            n_del = int(n_dm_f[hit].sum())
            n_upd = (n_matched - n_del) if upd is not None else 0
            n_nbs_del = int(n_nd_f[hit].sum())
            n_nbs_upd = int(n_nu_f[hit].sum())
            if touched:
                keep = ~(bdm | bnd) & hit[fid]
                keep_tbl = res_tbl.filter(pa.array(keep)).sort_by(
                    [
                        (_FID, "ascending"),
                        (o, "ascending"),
                        (_POS, "ascending"),
                    ]
                )

        # inserts: probe rows whose key matched nothing in the scan
        # (pruning is conservative — no unscanned candidate can hold
        # a matching key), projected onto the target schema
        ins_tbl = None
        n_ins = 0
        if when_not_matched_insert:
            ins_src = probe_tbl
            if res_tbl is not None and cands and probe_tbl.num_rows:
                if len(on) == 1:
                    mk = res_tbl.column(key_echo[0]).drop_null()
                    mask = pc.invert(
                        pc.is_in(probe_tbl.column(on[0]), value_set=mk)
                    )
                    ins_src = probe_tbl.filter(mask)
                else:
                    mset = set()
                    klists = [
                        res_tbl.column(k).to_pylist() for k in key_echo
                    ]
                    mflags = res_tbl.column(F_M).to_pylist()
                    for vals in zip(*klists, mflags):
                        if vals[-1]:
                            mset.add(vals[:-1])
                    plists = [
                        probe_tbl.column(c).to_pylist() for c in on
                    ]
                    mask = pa.array(
                        [t not in mset for t in zip(*plists)]
                    )
                    ins_src = probe_tbl.filter(mask)
            n_ins = ins_src.num_rows
            if n_ins:
                # target-schema arrow types come from Spark itself:
                # the scan result when there was one, the converted
                # schema otherwise
                if res_tbl is not None:
                    tmap = {
                        f.name: f.type for f in res_tbl.schema
                    }
                else:
                    try:
                        from pyspark.sql.pandas.types import (
                            to_arrow_schema,
                        )

                        tmap = {
                            f.name: f.type
                            for f in to_arrow_schema(schema)
                        }
                    except Exception:  # noqa: BLE001
                        return None
                arrays, fields = [], []
                for fld in schema.fields:
                    t = tmap[fld.name]
                    if fld.name in ins_src.schema.names:
                        arr = ins_src.column(fld.name)
                        if arr.type != t:
                            arr = arr.cast(t)
                    else:
                        arr = pa.nulls(n_ins, type=t)
                    arrays.append(arr)
                    fields.append(pa.field(fld.name, t, nullable=True))
                ins_tbl = pa.table(
                    dict(zip([f.name for f in fields], arrays)),
                    schema=pa.schema(fields),
                ).sort_by([(o, "ascending")])

        # stage the copy-on-write replacements (one file per touched
        # source file; a file whose every row dropped writes nothing)
        rewritten: list[FileEntry] = []
        if keep_tbl is not None and touched:
            staging = os.path.join(
                self.path, f".staging-{uuid.uuid4().hex[:12]}"
            )
            os.makedirs(staging, exist_ok=True)
            try:
                data_names = [f.name for f in schema.fields]
                kfid = keep_tbl.column(_FID).to_numpy(
                    zero_copy_only=False
                )
                bounds = np.searchsorted(
                    kfid,
                    np.arange(len(entries) + 1),
                    side="left",
                )
                for i in range(len(entries)):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    if hi <= lo:
                        continue
                    pq.write_table(
                        keep_tbl.slice(lo, hi - lo).select(data_names),
                        os.path.join(staging, f"part-{i:05d}.parquet"),
                        compression="snappy",
                    )
                stats = _footer_stats(staging, o)
                if stats is None:
                    stats = []
                    for i in range(len(entries)):
                        lo, hi = int(bounds[i]), int(bounds[i + 1])
                        if hi <= lo:
                            continue
                        chunk = keep_tbl.slice(lo, hi - lo)
                        col = chunk.column(o)
                        stats.append(
                            (
                                os.path.join(
                                    staging, f"part-{i:05d}.parquet"
                                ),
                                chunk.num_rows,
                                _norm_tz(pc.min(col).as_py()),
                                _norm_tz(pc.max(col).as_py()),
                                None,
                            )
                        )
                rewritten = self._finalize_staged(stats)
            finally:
                shutil.rmtree(staging, ignore_errors=True)

        # (5)+(6) of the distributed path: inserts, then ONE commit —
        # same cleanup guard (files are finalized but unreferenced
        # until the commit lands)
        inserts: list[FileEntry] = []
        self._commit_landed = False
        try:
            if ins_tbl is not None:
                if ins_tbl.column(o).null_count:
                    raise ValueError(
                        "null values in ordered_on are not allowed"
                    )
                inserts = self._stage_arrow_chunks(
                    ins_tbl, o, row_group_target_size
                )
            result = {
                "updated": n_upd + n_nbs_upd,
                "deleted": n_del + n_nbs_del,
                "inserted": n_ins,
            }
            if not touched and not inserts:
                return result
            new_entries = rewritten + inserts
            self._attach_blooms(
                new_entries, man.kv.get(_BLOOM_COLS_KV), schema
            )
            replaced = {e.name for e in touched}
            self._commit(
                o,
                df=None,
                target_schema=schema,
                kept=[e for e in man.files if e.name not in replaced],
                replaced_names=sorted(replaced),
                new_entries=new_entries,
                key_value_metadata=None,
                cmidx=man.cmidx,
            )
        except BaseException:
            if self._commit_landed:
                raise
            for e in rewritten + inserts:
                p = os.path.join(self.path, e.name)
                if os.path.exists(p):
                    os.remove(p)
            raise
        return result

    def _dml(self, filters, assignments, conflict_retries: int) -> int:
        attempt = 0
        while True:
            try:
                return self._rewrite_where(filters, assignments)
            except ManifestConflictError:
                if attempt >= conflict_retries:
                    raise
                attempt += 1
                self.conflict_reruns += 1
                self._manifest = Manifest.load(self.path, self.backend)

    def _rewrite_where(self, filters, assignments) -> int:
        from pyspark.sql import Column

        from oups_spark.functions.filters import (
            dnf_condition,
            dnf_file_can_match,
        )

        if not self.exists:
            raise FileNotFoundError(f"no ordered dataset at {self.path}")
        if not filters:
            raise ValueError(
                "row-level DML requires explicit filters; to drop the "
                "whole dataset use delete()"
            )
        man = self._manifest
        o = man.ordered_on
        if assignments and o in assignments:
            raise ValueError(
                f"update_where cannot assign the ordering column {o!r}"
            )
        schema = self.schema()
        if schema is None:
            raise ValueError("dataset has no recorded schema")
        if assignments:
            known = {f.name for f in schema.fields}
            unknown = set(assignments) - known
            if unknown:
                raise ValueError(f"unknown columns in assignments: {sorted(unknown)}")
        # (1) driver-side file pruning, ordering-column bounds included
        cands = [
            e for e in man.files
            if dnf_file_can_match(
                {o: (e.min, e.max), **(e.cols or {})}, filters,
                blooms=e.blooms,
            )
        ]
        if not cands:
            return 0
        reader = self.spark.read.schema(schema)
        pred = dnf_condition(filters)
        basename = F.substring_index(F.input_file_name(), "/", -1)

        # DRIVER-SIDE DML FAST PATH (round-14, guide §1.2): small
        # candidate sets run the whole DELETE/UPDATE off ONE Spark job
        # — the hit-count scan and the copy-on-write rewrite fuse into
        # a single scan that returns the post-update rows plus a match
        # flag as Arrow; touched-file detection, counts and the
        # per-file replacements are then driver-side pyarrow work.
        # Oversized candidate sets fall through to the classic
        # two-job plan (the 100-TB shape).
        res = self._rewrite_where_driver(
            cands, schema, man, o, reader, pred, basename, assignments
        )
        if res is not None:
            return res

        # (2) which candidates REALLY match (stats/bloom pruning is
        # conservative): one agg over the candidate files only
        hits = {
            r["__f"]: r["n"]
            for r in (
                reader.parquet(
                    *[os.path.join(self.path, e.name) for e in cands]
                )
                .filter(pred)
                .groupBy(basename.alias("__f"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        }
        if not hits:
            return 0
        touched = [e for e in cands if e.name in hits]
        n_affected = int(sum(hits.values()))
        if assignments is None and all(
            hits.get(e.name) == e.n_rows for e in touched
        ):
            # every row of every touched file is deleted: no rewrite
            # job at all, the files just leave the manifest
            replaced = {e.name for e in touched}
            self._commit(
                o, df=None, target_schema=schema,
                kept=[e for e in man.files if e.name not in replaced],
                replaced_names=sorted(replaced), new_entries=[],
                key_value_metadata=None, cmidx=man.cmidx,
            )
            return n_affected
        # (3) rewrite the touched files, one replacement per source
        # file: the fid hash-repartition puts each file's rows in one
        # partition, partitionBy splits collisions back apart, and
        # (fid, ordered_on, pos) sorting preserves the original stable
        # order for rows with equal ordering values
        fid_map = F.create_map(
            *[
                lit
                for i, e in enumerate(touched)
                for lit in (F.lit(e.name), F.lit(i))
            ]
        )
        df = (
            reader.parquet(
                *[os.path.join(self.path, e.name) for e in touched]
            )
            .withColumn(_FID, fid_map[basename])
            .withColumn(_POS, F.monotonically_increasing_id())
        )
        if assignments is None:
            # SQL DELETE semantics: remove only pred=TRUE rows. A NULL
            # predicate (null column values, or pre-schema-evolution
            # rows reading an evolved column as NULL) is NOT a match —
            # keep the row, consistent with the hit-count scan above
            # and with update_where's when(pred, ...).otherwise(...).
            out = df.filter(~F.coalesce(pred, F.lit(False)))
        else:
            sel = []
            for fld in schema.fields:
                if fld.name in assignments:
                    v = assignments[fld.name]
                    vcol = v if isinstance(v, Column) else F.lit(v)
                    sel.append(
                        F.when(pred, vcol.cast(fld.dataType))
                        .otherwise(F.col(fld.name))
                        .alias(fld.name)
                    )
                else:
                    sel.append(F.col(fld.name))
            # one select: every assignment and the predicate see the
            # PRE-update values, whatever columns they share
            out = df.select(*sel, F.col(_FID), F.col(_POS))
        new_entries = self._stage_cow_rewrite(out, len(touched), o)
        self._attach_blooms(
            new_entries, man.kv.get(_BLOOM_COLS_KV), schema
        )
        replaced = {e.name for e in touched}
        self._commit(
            o,
            df=None,
            target_schema=schema,
            kept=[e for e in man.files if e.name not in replaced],
            replaced_names=sorted(replaced),
            new_entries=new_entries,
            key_value_metadata=None,
            cmidx=man.cmidx,
        )
        return n_affected

    def _rewrite_where_driver(
        self, cands, schema, man, o, reader, pred, basename, assignments
    ) -> int | None:
        """Driver-side DELETE/UPDATE fast path (round-14, guide
        §1.2): when the candidate files fit the driver-merge gates,
        ONE scan job evaluates the predicate and the assignment
        projections in Spark (nothing re-implemented) and returns the
        flagged post-update rows as Arrow; per-file hit counts, the
        full-file-delete shortcut, the copy-on-write replacements and
        the commit are then driver-side pyarrow/fs work. Replaces the
        hit-count agg + distributed rewrite (2 jobs + shuffle) per
        DML statement. Returns None to fall back (complex column
        types, oversized candidates, Arrow collect failure)."""
        from pyspark.sql import Column

        if any(
            t in f.dataType.simpleString()
            for f in schema.fields
            for t in ("binary", "array", "map", "struct")
        ):
            return None
        if (
            sum(e.n_rows for e in cands) > _DRIVER_MERGE_MAX_ROWS
            or self._old_files_bytes(cands) > _DRIVER_MERGE_MAX_BYTES
        ):
            return None
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        MATCH = "__oups_match"
        fid_map = F.create_map(
            *[
                lit
                for i, e in enumerate(cands)
                for lit in (F.lit(e.name), F.lit(i))
            ]
        )
        df = (
            reader.parquet(
                *[os.path.join(self.path, e.name) for e in cands]
            )
            .withColumn(_FID, fid_map[basename])
            .withColumn(_POS, F.monotonically_increasing_id())
        )
        # NULL predicate is NOT a match (SQL DML semantics), same
        # coalesce the distributed paths apply
        flag = F.coalesce(pred, F.lit(False))
        if assignments is None:
            sel = [F.col(f.name) for f in schema.fields]
        else:
            sel = []
            for fld in schema.fields:
                if fld.name in assignments:
                    v = assignments[fld.name]
                    vcol = v if isinstance(v, Column) else F.lit(v)
                    sel.append(
                        F.when(pred, vcol.cast(fld.dataType))
                        .otherwise(F.col(fld.name))
                        .alias(fld.name)
                    )
                else:
                    sel.append(F.col(fld.name))
        try:
            tbl = df.select(
                *sel, F.col(_FID), F.col(_POS), flag.alias(MATCH)
            ).toArrow()
        except Exception:  # noqa: BLE001 — maxResultSize etc.
            return None
        if tbl.nbytes > 2 * _DRIVER_MERGE_MAX_BYTES:
            return None  # decoded far larger than the footer gate

        nf = len(cands)
        fid = tbl.column(_FID).to_numpy(zero_copy_only=False)
        bm = tbl.column(MATCH).to_numpy(zero_copy_only=False).astype(bool)
        n_m_f = np.bincount(fid[bm], minlength=nf)
        hit = n_m_f > 0
        n_affected = int(n_m_f.sum())
        if not n_affected:
            return 0
        touched = [cands[i] for i in np.flatnonzero(hit)]
        replaced = {e.name for e in touched}
        if assignments is None and all(
            int(n_m_f[i]) == cands[i].n_rows for i in np.flatnonzero(hit)
        ):
            # every row of every touched file is deleted: no rewrite,
            # the files just leave the manifest
            self._commit(
                o, df=None, target_schema=schema,
                kept=[e for e in man.files if e.name not in replaced],
                replaced_names=sorted(replaced), new_entries=[],
                key_value_metadata=None, cmidx=man.cmidx,
            )
            return n_affected

        # keep = rows of touched files only (others stay on disk
        # untouched); DELETE drops matches, UPDATE keeps every row
        # with the post-update values already projected by the scan
        keep = hit[fid] & (~bm if assignments is None else True)
        keep_tbl = tbl.filter(pa.array(keep)).sort_by(
            [(_FID, "ascending"), (o, "ascending"), (_POS, "ascending")]
        )
        data_names = [f.name for f in schema.fields]
        rewritten: list[FileEntry] = []
        staging = os.path.join(
            self.path, f".staging-{uuid.uuid4().hex[:12]}"
        )
        os.makedirs(staging, exist_ok=True)
        try:
            kfid = keep_tbl.column(_FID).to_numpy(zero_copy_only=False)
            bounds = np.searchsorted(
                kfid, np.arange(nf + 1), side="left"
            )
            for i in range(nf):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                if hi <= lo:
                    continue
                pq.write_table(
                    keep_tbl.slice(lo, hi - lo).select(data_names),
                    os.path.join(staging, f"part-{i:05d}.parquet"),
                    compression="snappy",
                )
            stats = _footer_stats(staging, o)
            if stats is None:
                stats = []
                for i in range(nf):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    if hi <= lo:
                        continue
                    chunk = keep_tbl.slice(lo, hi - lo)
                    col = chunk.column(o)
                    stats.append(
                        (
                            os.path.join(staging, f"part-{i:05d}.parquet"),
                            chunk.num_rows,
                            _norm_tz(pc.min(col).as_py()),
                            _norm_tz(pc.max(col).as_py()),
                            None,
                        )
                    )
            rewritten = self._finalize_staged(stats)
        finally:
            shutil.rmtree(staging, ignore_errors=True)

        self._commit_landed = False
        try:
            self._attach_blooms(
                rewritten, man.kv.get(_BLOOM_COLS_KV), schema
            )
            self._commit(
                o,
                df=None,
                target_schema=schema,
                kept=[e for e in man.files if e.name not in replaced],
                replaced_names=sorted(replaced),
                new_entries=rewritten,
                key_value_metadata=None,
                cmidx=man.cmidx,
            )
        except BaseException:
            if self._commit_landed:
                raise
            for e in rewritten:
                p = os.path.join(self.path, e.name)
                if os.path.exists(p):
                    os.remove(p)
            raise
        return n_affected

    def _stage_cow_rewrite(self, out, n_files: int, o: str) -> list[FileEntry]:
        """Stage a copy-on-write rewrite: ``out`` carries ``_FID``
        (0..n_files-1, one replacement file per source file) and
        ``_POS`` (stable order among equal ordering values); each fid
        lands in exactly one partition, is sorted ``(ordered_on,
        pos)``, and becomes one staged file — a fid whose every row
        was dropped simply writes nothing. Returns the finalized
        manifest entries (files already moved into the dataset under
        fresh opaque names; an aborted commit removes them)."""
        staging = os.path.join(self.path, f".staging-{uuid.uuid4().hex[:12]}")
        os.makedirs(staging, exist_ok=True)
        ts_conf = "spark.sql.parquet.outputTimestampType"
        prev_ts_conf = ts_set = None
        try:
            prev_ts_conf = self.spark.conf.get(ts_conf, None)
            self.spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
            ts_set = True
        except Exception:  # noqa: BLE001 - conf locked by a custom session
            pass
        try:
            (
                out.repartition(n_files, F.col(_FID))
                .sortWithinPartitions(_FID, o, _POS)
                .drop(_POS)
                .write.partitionBy(_FID)
                .mode("overwrite")
                .parquet(staging)
            )
            stats = _footer_stats(staging, o)
            if stats is None:
                rows = (
                    self.spark.read.parquet(staging)
                    .groupBy(F.input_file_name().alias("f"))
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.min(o).alias("mn"),
                        F.max(o).alias("mx"),
                    )
                    .collect()
                )
                stats = [
                    (
                        urllib.parse.unquote(
                            urllib.parse.urlparse(r["f"]).path
                        ),
                        r["n"], r["mn"], r["mx"], None,
                    )
                    for r in rows
                ]
            return self._finalize_staged(stats)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
            try:
                if ts_set and prev_ts_conf is not None:
                    self.spark.conf.set(ts_conf, prev_ts_conf)
                elif ts_set:
                    self.spark.conf.unset(ts_conf)
            except Exception:  # noqa: BLE001
                pass

    # ------------------------------------------------------ time travel
    def versions(self) -> list[int]:
        """Generations available for ``read(as_of=...)`` (ascending).
        Non-empty only for datasets written with
        ``retain_versions=True`` (or after snapshots were created out
        of band); see ``vacuum`` for reclaiming old ones."""
        from oups_spark.store.manifest import list_snapshots

        return list_snapshots(self.path)

    def vacuum(self, keep_last: int = 1) -> int:
        """Reclaim storage from time travel: keep the newest
        ``keep_last`` snapshot generations, drop older snapshot
        manifests, and delete data files referenced by NO retained
        snapshot and not by the current manifest. Returns the number
        of data files deleted.

        Mirrors Delta's VACUUM at manifest granularity: time travel
        to a vacuumed generation raises (its snapshot is gone), never
        silently reads partial data.

        Also reclaims TOMBSTONED files (replaced data kept for the
        ``deletion_grace_s`` reader-isolation window) regardless of
        age — vacuum is the explicit "no readers in flight" signal.
        """
        from oups_spark.store.manifest import drop_snapshot, load_snapshot

        gens = self.versions()
        keep = gens[-keep_last:] if keep_last > 0 else []
        live: set[str] = {e.name for e in (self._manifest.files if self._manifest else [])}
        for g in keep:
            live |= {e.name for e in load_snapshot(self.path, g).files}
        removed = 0
        for g in gens:
            if g not in keep:
                drop_snapshot(self.path, g)
        try:
            names = os.listdir(self.path)
        except FileNotFoundError:
            return 0
        for n in names:
            if n.endswith(".parquet") and n not in live:
                os.remove(os.path.join(self.path, n))
                removed += 1
        return removed

    # ----------------------------------------------------------- delete
    def delete(self) -> None:
        """Drop the dataset directory (reference: ``base.py:405-438``);
        on object-store backends also delete the dataset's manifest
        objects (head + sidecars), so membership checks and discovery
        stop seeing it."""
        if self.backend is not None and hasattr(self.backend, "_list"):
            try:
                for k in self.backend._list(self.path + "/"):
                    self.backend._delete(k)
            except NotImplementedError:
                pass  # lifecycle rules own reclamation on such stores
        shutil.rmtree(self.path, ignore_errors=True)
        self._manifest = None


def _norm_tz(v):
    """pyarrow returns tz-aware UTC for isAdjustedToUTC timestamps;
    Spark collect (session TZ = UTC) returns naive — align."""
    from datetime import timezone

    if hasattr(v, "tzinfo") and v.tzinfo is not None:
        return v.astimezone(timezone.utc).replace(tzinfo=None)
    return v


def _footer_stats(
    staging: str, ordered_on: str
) -> list[tuple[str, int, Any, Any]] | None:
    """Per-file ``(path, n_rows, min, max)`` of the ordering column
    from the parquet footers — metadata-only reads, no Spark job.

    Scope is the staging dir of ONE write (the files just written),
    so the driver-side walk is bounded by the write size, not the
    dataset size. Returns ``None`` (caller falls back to a Spark
    scan) when stats can't be trusted: binary/string physical types
    (parquet min/max may be truncated), INT96 (no stats at all), or
    any row group missing stats."""
    import pyarrow.parquet as pq
    from datetime import timezone

    def norm(v):
        # pyarrow returns tz-aware UTC for isAdjustedToUTC timestamps;
        # Spark collect (session TZ = UTC) returns naive — align.
        if hasattr(v, "tzinfo") and v.tzinfo is not None:
            return v.astimezone(timezone.utc).replace(tzinfo=None)
        return v

    out: list[tuple[str, int, Any, Any, dict | None]] = []
    for root, _dirs, names in os.walk(staging):
        for nm in names:
            if not nm.endswith(".parquet"):
                continue
            p = os.path.join(root, nm)
            md = pq.read_metadata(p)
            if md.num_rows == 0:
                continue
            sch = md.schema
            idx = next(
                (
                    i
                    for i in range(md.num_columns)
                    if sch.column(i).path == ordered_on
                ),
                None,
            )
            if idx is None:
                return None
            if sch.column(idx).physical_type in (
                "BYTE_ARRAY",
                "FIXED_LEN_BYTE_ARRAY",
                "INT96",
            ):
                return None
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mins.append(norm(st.min))
                maxs.append(norm(st.max))
            # Per-column [min, max] BOUNDS for the data-skipping index
            # (every other flat column with trustworthy stats).
            # Strings are included: parquet statistics are bounds by
            # spec (a truncated max is rounded UP), which is exactly
            # what pruning needs; INT96 carries no stats; nested
            # leaves (dotted paths) are not filterable columns here.
            cols: dict[str, tuple] = {}
            for i in range(md.num_columns):
                c = sch.column(i)
                if i == idx or "." in c.path or c.physical_type == "INT96":
                    continue
                cmins, cmaxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(i).statistics
                    if st is None or not st.has_min_max:
                        cmins = []
                        break
                    cmins.append(norm(st.min))
                    cmaxs.append(norm(st.max))
                if cmins:
                    cols[c.path] = (min(cmins), max(cmaxs))
            out.append((p, md.num_rows, min(mins), max(maxs), cols or None))
    return out


def _with_file_rank(
    spark: SparkSession, df: DataFrame, entries: list[FileEntry]
) -> DataFrame:
    """Attach the manifest-order rank (``_FIDX``) of each row's source
    file: the dataset-order component of the old-side keep-last
    tiebreak (the in-file monotonic id only orders rows WITHIN one
    file).

    Implemented as a broadcast hash join on the file basename — O(1)
    per row and a compact codegen plan, vs the O(n_files)-per-row
    ``create_map`` literal probe it replaces (which also produced an
    expression whose Janino compile time grew with file count)."""
    ranks = spark.createDataFrame(
        [(e.name, i) for i, e in enumerate(entries)],
        f"{_FNAME} string, {_FIDX} int",
    )
    name = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return (
        df.withColumn(_FNAME, name)
        .join(F.broadcast(ranks), _FNAME, "left")
        .drop(_FNAME)
        .withColumn(_FIDX, F.coalesce(F.col(_FIDX), F.lit(-1)))
    )


def _off_target_flags(entries: list[FileEntry], target) -> list[bool]:
    """Which files violate the size target (driver-side manifest
    arithmetic, no Spark job).

    Row-count target: n_rows < 80% of target (reference
    ``n_rows_strategy.py:33,136``).  Period target: a file is ON
    target iff it fits entirely inside one period AND is the only
    file whose span touches that period (reference one-file-per-period
    rule, ``time_period_strategy.py:166-199``)."""
    if isinstance(target, int):
        return [e.n_rows < ON_TARGET_SCALE_FACTOR * target for e in entries]
    from collections import Counter

    spans = [
        (floor_ts_scalar(e.min, target), floor_ts_scalar(e.max, target))
        for e in entries
    ]
    touched = Counter()
    for pmin, pmax in spans:
        touched[pmin] += 1
        if pmax != pmin:
            touched[pmax] += 1
    return [
        pmin != pmax or touched[pmin] > 1 for pmin, pmax in spans
    ]


def pandas_to_spark_arrow(pdf, session_tz: str):
    """Driver-side twin of ``spark.createDataFrame(pdf).toArrow()``:
    the Arrow table Spark would produce for this pandas frame, built
    with NO JVM round trip. Returns ``None`` whenever any dtype falls
    outside the audited mapping below — the caller then takes the
    classic ``createDataFrame`` path, so a ``None`` is never wrong,
    only slower. Equivalence to the round trip is pinned in
    tests/test_arrow_write.py.

    Only valid under a UTC session time zone: Spark interprets naive
    pandas timestamps as SESSION-zone wall clock, while Arrow's
    naive→tz cast assumes UTC — the two agree exactly when the
    session zone is UTC (which ``ensure_session_confs`` guarantees
    for every query session)."""
    import pyarrow as pa

    if session_tz not in ("UTC", "Etc/UTC"):
        return None
    try:
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        return None
    fields = []
    for f in tbl.schema:
        t = f.type
        if pa.types.is_timestamp(t):
            if t.tz not in (None, "UTC", "Etc/UTC"):
                return None
            t = pa.timestamp("us", tz="UTC")
        elif pa.types.is_large_string(t):
            t = pa.string()
        elif not (
            (pa.types.is_integer(t) and not pa.types.is_unsigned_integer(t))
            or pa.types.is_floating(t)
            or pa.types.is_boolean(t)
            or pa.types.is_string(t)
            or pa.types.is_date32(t)
        ):
            return None
        # createDataFrame(pandas) always records nullable fields
        fields.append(pa.field(f.name, t, nullable=True))
    try:
        # safe cast: sub-microsecond timestamps or overflow raise and
        # fall back rather than silently diverging from Spark
        return tbl.cast(pa.schema(fields))
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None


def _merge_kv(kv: dict, update: dict | None) -> None:
    """Add/update keys; a None value removes the key (reference
    ``base.py:600-649`` semantics)."""
    if not update:
        return
    for k, v in update.items():
        if v is None:
            kv.pop(k, None)
        else:
            kv[k] = v
