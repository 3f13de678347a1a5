"""Dataset manifest: the sidecar that makes a parquet directory an
*ordered* dataset.

Replaces the reference's ``_opdmd`` metadata file (reference:
``oups/store/ordered_parquet_dataset/ordered_parquet_dataset/base.py:58-62,600-649``):
records ``ordered_on``, one entry per data file with
``(n_rows, min, max)`` of the ordering column, the dataset schema,
and user/system key-value metadata (e.g. AggStream restart state).

Stored as JSON with an atomic tmp-file + ``os.replace`` swap so a
reader never observes a half-written manifest. At 100 TB (~100k
files of ~1 GB) the file list is a few MB of JSON — still fine to
load driver-side; beyond that the natural upgrade is a parquet
manifest or a Delta transaction log, which this module isolates the
rest of the engine from.

FILESYSTEM CONTRACT: the commit protocol is pluggable via
:class:`ManifestBackend`. The default :class:`PosixRenameBackend`
relies on an atomic, overwriting rename — a guarantee POSIX
filesystems and HDFS provide but object stores (S3) do NOT — plus a
``flock``-guarded generation compare-and-swap so two local writers
serialize instead of last-writer-wins. For
object stores, :class:`ObjectStoreBackend` routes ``save`` through a
CONDITIONAL PUT (put-if-match on the manifest object's generation /
ETag, put-if-absent for creation) — a stale writer raises
:class:`ManifestConflictError` instead of silently clobbering a
concurrent commit. Everything else in this module is
backend-agnostic since readers only ever GET the one manifest
object; :class:`InMemoryObjectStore` is the in-tree mock that
exercises the conditional-put path (swap in an S3/GCS client by
implementing the same three methods). The swap contract itself
(reader sees old-or-new, never partial; crashed writers leave only
ignorable ``.tmp`` debris) is pinned by
``tests/test_store_catalog.py::test_manifest_swap_contract`` against
BOTH backends.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

MANIFEST_NAME = "_oups_manifest.json"

# Payloads above this size are gzip-compressed on commit (JSON file
# lists compress ~10x, so a 100k-file dataset's manifest drops from
# ~40 MB to ~4 MB — both the object-store PUT/GET and the driver
# parse stay snappy at lakehouse file counts). Readers sniff the gzip
# magic, so compressed and plain manifests interoperate freely and
# old datasets need no migration. Monkeypatch-able for tests.
GZIP_MIN_BYTES = 256 * 1024
_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_compress(data: bytes) -> bytes:
    if len(data) <= GZIP_MIN_BYTES:
        return data
    import gzip

    # mtime=0: deterministic bytes, so identical payloads commit
    # identical objects (useful for dedup'ing object stores)
    return gzip.compress(data, mtime=0)


def _plain(data: bytes) -> bytes:
    if data[:2] == _GZIP_MAGIC:
        import gzip

        return gzip.decompress(data)
    return data


class ManifestConflictError(RuntimeError):
    """A conditional manifest commit lost a race: the manifest changed
    (or appeared) since this writer read it. The writer must re-read,
    re-apply its change on top, and retry."""


class ManifestBackend:
    """Storage backend for the single manifest object of a dataset.

    ``read`` returns ``(payload_bytes, token)`` or ``None`` when the
    manifest does not exist; ``commit`` atomically publishes new
    bytes. ``token`` is backend-defined (an ETag / generation);
    backends that support conditional writes MUST reject a commit
    whose ``expect_token`` no longer matches the stored object.
    """

    def read(self, dirpath: str):  # -> tuple[bytes, Any] | None
        raise NotImplementedError

    def commit(self, dirpath: str, data: bytes, *, expect_token) -> Any:
        raise NotImplementedError


class PosixRenameBackend(ManifestBackend):
    """Atomic tmp-file + ``os.replace`` swap (POSIX / HDFS), with a
    ``flock``-guarded compare-and-swap on commit.

    Readers never take the lock — the atomic rename already gives
    them old-or-new visibility. Writers serialize through an
    advisory ``fcntl.flock`` on a sidecar lock file for the
    read-check-swap window only: the commit re-reads the manifest
    under the lock and requires its generation to equal the token
    this writer read earlier (absence, for creation), raising
    :class:`ManifestConflictError` otherwise. Two concurrent local
    writers therefore both land (one retries via
    ``conflict_retries``) instead of one silently clobbering the
    other — the concurrency posture the reference gets from holding
    a ``flufl.lock`` for the dataset lifetime
    (``oups/store/ordered_parquet_dataset/ordered_parquet_dataset/base.py:240-255``),
    except held only for the microseconds of the swap and
    crash-safe (the kernel drops a dead writer's flock; a stale
    flufl lock must time out). Advisory-lock caveat: like all
    flock schemes this serializes only processes on one host/mount —
    cross-host coordination belongs to :class:`ObjectStoreBackend`.
    """

    @staticmethod
    def _gen_of(data: bytes) -> int:
        return json.loads(_plain(data)).get("generation", 0)

    def read(self, dirpath: str):
        path = os.path.join(dirpath, MANIFEST_NAME)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as fh:
            data = fh.read()
        return data, self._gen_of(data)

    def commit(self, dirpath: str, data: bytes, *, expect_token) -> Any:
        import fcntl

        path = os.path.join(dirpath, MANIFEST_NAME)
        lock_path = path + ".lock"
        with open(lock_path, "a+b") as lock_fh:
            fcntl.flock(lock_fh, fcntl.LOCK_EX)
            # no explicit unlock: closing the fd releases the flock,
            # and the kernel releases it if the process dies mid-swap
            if os.path.exists(path):
                with open(path, "rb") as fh:
                    current = self._gen_of(fh.read())
            else:
                current = None
            if current != expect_token:
                raise ManifestConflictError(
                    f"manifest at {path} changed since read (expected "
                    f"generation {expect_token}, found {current})"
                )
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
        return self._gen_of(data)


class ObjectStoreBackend(ManifestBackend):
    """Conditional-put commit protocol for object stores (S3 / GCS):

    - creation  = put-if-absent  (S3 ``If-None-Match: *``),
    - overwrite = put-if-match on the generation read earlier
      (S3 ``If-Match: <etag>`` / GCS ``ifGenerationMatch``).

    A stale writer — one whose read token no longer matches — gets
    :class:`ManifestConflictError` instead of clobbering a concurrent
    commit, which upgrades the store's concurrency posture from
    last-writer-wins to optimistic CAS. Subclasses supply the three
    primitive object operations; :class:`InMemoryObjectStore` is the
    reference implementation the contract tests run against.
    """

    def _get(self, key: str):  # -> tuple[bytes, Any] | None
        raise NotImplementedError

    def _put_if_absent(self, key: str, data: bytes) -> Any:
        raise NotImplementedError

    def _put_if_match(self, key: str, data: bytes, token) -> Any:
        raise NotImplementedError

    # optional primitives (S3 LIST / DELETE) — only needed by the
    # sidecar GC of :class:`ObjectStoreParquetBackend`; backends that
    # don't implement them simply accumulate superseded sidecars
    # until an external lifecycle rule reclaims them
    def _list(self, prefix: str) -> list[str]:
        raise NotImplementedError

    def _delete(self, key: str) -> None:
        raise NotImplementedError

    @staticmethod
    def _key(dirpath: str) -> str:
        return os.path.join(dirpath, MANIFEST_NAME)

    def read(self, dirpath: str):
        return self._get(self._key(dirpath))

    def commit(self, dirpath: str, data: bytes, *, expect_token) -> Any:
        if expect_token is None:
            return self._put_if_absent(self._key(dirpath), data)
        return self._put_if_match(self._key(dirpath), data, expect_token)


class InMemoryObjectStore(ObjectStoreBackend):
    """Dict-backed mock with monotone generation tokens — the
    conditional-put semantics of S3/GCS without a network."""

    def __init__(self):
        self._objects: dict[str, tuple[bytes, int]] = {}

    def _get(self, key: str):
        hit = self._objects.get(key)
        return None if hit is None else hit

    def _put_if_absent(self, key: str, data: bytes) -> Any:
        if key in self._objects:
            raise ManifestConflictError(
                f"manifest already exists at {key}: concurrent creation"
            )
        self._objects[key] = (data, 1)
        return 1

    def _put_if_match(self, key: str, data: bytes, token) -> Any:
        hit = self._objects.get(key)
        if hit is None or hit[1] != token:
            raise ManifestConflictError(
                f"manifest at {key} changed since read (expected generation "
                f"{token}, found {hit[1] if hit else 'absent'})"
            )
        self._objects[key] = (data, token + 1)
        return token + 1

    def _list(self, prefix: str) -> list[str]:
        return sorted(k for k in self._objects if k.startswith(prefix))

    def _delete(self, key: str) -> None:
        self._objects.pop(key, None)

class _ParquetFilesCodec:
    """Typed-parquet (de)serialization of ``FileEntry`` lists — the
    sidecar layout shared by the posix and object-store
    split-manifest backends: name, n_rows, the ordering-column
    min/max in their natural type (timestamp[ns] at full nanosecond
    fidelity), per-column skip stats as typed
    ``c_min:<col>``/``c_max:<col>`` pairs, blooms as a JSON-string
    column. No per-entry JSON encode/decode anywhere."""

    _FILES_PREFIX = MANIFEST_NAME[: -len(".json")] + ".files.g"

    # -- typed columns for stats values --------------------------------
    @staticmethod
    def _typed_array(values):
        """pyarrow array for decoded stats values, or None when the
        values don't fit a single clean type (then the JSON-string
        fallback column is used)."""
        import pyarrow as pa

        present = [v for v in values if v is not None]
        if not present:
            return pa.array(values, type=pa.string())
        if all(isinstance(v, datetime) for v in present):
            if any(v.tzinfo is not None for v in present):
                return None
            return pa.array(values, type=pa.timestamp("ns"))
        if any(isinstance(v, bool) for v in present):
            return None  # bool min/max is exotic; keep tagged JSON
        if all(isinstance(v, int) for v in present):
            return pa.array(values, type=pa.int64())
        if all(isinstance(v, (int, float)) for v in present):
            return pa.array([None if v is None else float(v) for v in values],
                            type=pa.float64())
        if all(isinstance(v, str) for v in present):
            return pa.array(values, type=pa.string())
        return None

    def _files_to_parquet_bytes(self, files: list[FileEntry]) -> bytes:
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrays: dict[str, Any] = {
            "name": pa.array([f.name for f in files], type=pa.string()),
            "n_rows": pa.array([f.n_rows for f in files], type=pa.int64()),
        }
        for stat in ("min", "max"):
            vals = [getattr(f, stat) for f in files]
            arr = self._typed_array(vals)
            if arr is not None:
                arrays[stat] = arr
            else:
                arrays[stat + "_json"] = pa.array(
                    [json.dumps(_enc_tree(v)) for v in vals],
                    type=pa.string(),
                )
        # per-column skip stats as typed pairs; any column whose
        # values defy clean typing demotes ALL cols to the JSON
        # fallback (rare: mixed-type stats within one dataset)
        col_names = sorted({c for f in files if f.cols for c in f.cols})
        col_arrays: dict[str, Any] = {}
        for c in col_names:
            for side, pick in (("c_min:", 0), ("c_max:", 1)):
                vals = [
                    f.cols[c][pick] if f.cols and c in f.cols else None
                    for f in files
                ]
                arr = self._typed_array(vals)
                if arr is None:
                    col_arrays = None
                    break
                col_arrays[side + c] = arr
            if col_arrays is None:
                break
        if col_arrays is not None:
            arrays.update(col_arrays)
        elif col_names:
            arrays["cols_json"] = pa.array(
                [
                    None if f.cols is None
                    else json.dumps({
                        c: [_enc_tree(lo), _enc_tree(hi)]
                        for c, (lo, hi) in f.cols.items()
                    })
                    for f in files
                ],
                type=pa.string(),
            )
        blooms = [f.blooms for f in files]
        if any(b is not None for b in blooms):
            arrays["blooms_json"] = pa.array(
                [None if b is None else json.dumps(b) for b in blooms],
                type=pa.string(),
            )
        # zstd: ~4x smaller sidecars than snappy on stats columns
        # (monotone timestamps delta-encode well), negligible cpu
        sink = pa.BufferOutputStream()
        pq.write_table(pa.table(arrays), sink, compression="zstd")
        return sink.getvalue().to_pybytes()

    @classmethod
    def _stat_values(cls, table, col: str) -> list:
        import pyarrow.types as pat

        import pandas as pd

        column = table.column(col)
        if pat.is_timestamp(column.type):
            # to_pandas keeps pd.Timestamp at ns fidelity; NaT -> None
            # (nulls appear for per-column stats absent on some files)
            return [None if v is pd.NaT else v for v in column.to_pandas()]
        return column.to_pylist()

    @classmethod
    def _files_from_parquet_bytes(cls, data: bytes) -> list[FileEntry]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        return cls._files_from_table(pq.read_table(pa.BufferReader(data)))

    @classmethod
    def _files_from_table(cls, table) -> list[FileEntry]:
        have = set(table.column_names)
        names = table.column("name").to_pylist()
        n_rows = table.column("n_rows").to_pylist()
        stats = {}
        for stat in ("min", "max"):
            if stat in have:
                stats[stat] = cls._stat_values(table, stat)
            else:
                stats[stat] = [
                    _dec_tree(json.loads(v))
                    for v in table.column(stat + "_json").to_pylist()
                ]
        col_stats = []  # [(col, mins, maxs)]
        for cn in have:
            if cn.startswith("c_min:"):
                c = cn[len("c_min:"):]
                if ("c_max:" + c) not in have:
                    # half-populated pair (possible after delta-chain
                    # concat with schema promotion): an unusable stat
                    # — drop it rather than KeyError; readers treat a
                    # missing stat conservatively
                    continue
                col_stats.append((
                    c,
                    cls._stat_values(table, "c_min:" + c),
                    cls._stat_values(table, "c_max:" + c),
                ))
        cols_json = (
            table.column("cols_json").to_pylist()
            if "cols_json" in have else None
        )
        blooms = (
            table.column("blooms_json").to_pylist()
            if "blooms_json" in have else None
        )
        out = []
        for i, name in enumerate(names):
            cols = None
            if col_stats:
                cols = {
                    c: (mins[i], maxs[i])
                    for c, mins, maxs in col_stats
                    if mins[i] is not None or maxs[i] is not None
                } or None
            elif cols_json is not None and cols_json[i] is not None:
                cols = {
                    c: (_dec_tree(lo), _dec_tree(hi))
                    for c, (lo, hi) in json.loads(cols_json[i]).items()
                }
            out.append(FileEntry(
                name=name,
                n_rows=int(n_rows[i]),
                min=stats["min"][i],
                max=stats["max"][i],
                cols=cols,
                blooms=(
                    json.loads(blooms[i])
                    if blooms is not None and blooms[i] is not None
                    else None
                ),
            ))
        return out


class ArrowFileList:
    """Lazy Arrow-backed sequence of :class:`FileEntry` — what the
    parquet-sidecar backends hand to ``Manifest.files``.

    At ~1M files the dominant load cost is materializing a million
    Python ``FileEntry`` objects (~10 s), not the parquet read
    (~0.5 s). This view defers that: iteration/indexing materializes
    (once, cached) for the write paths that genuinely walk every
    entry, while :meth:`prune_range` answers the READ path's
    ``[start, end)`` file selection with vectorized Arrow compute and
    materializes ONLY the survivors — a point read on a million-file
    table touches a handful of Python objects. ``Manifest.save``
    converts to a plain list before mutating/sorting, so writers are
    unaffected.
    """

    def __init__(self, table, codec: type):
        self._table = table
        self._codec = codec
        self._materialized: list[FileEntry] | None = None

    # -- sequence protocol (materializes, cached) ----------------------
    def _all(self) -> list[FileEntry]:
        if self._materialized is None:
            self._materialized = self._codec._files_from_table(self._table)
        return self._materialized

    def __len__(self) -> int:
        return (
            self._table.num_rows
            if self._materialized is None
            else len(self._materialized)
        )

    def __iter__(self):
        return iter(self._all())

    def __getitem__(self, i):
        return self._all()[i]

    def __eq__(self, other):
        try:
            other_items = list(other)
        except TypeError:
            return NotImplemented
        return list(self) == other_items

    def __repr__(self) -> str:
        state = "lazy" if self._materialized is None else "materialized"
        return f"<ArrowFileList n={len(self)} {state}>"

    # -- mutation (materializes; the Arrow table is no longer
    #    authoritative afterwards, so the fast paths below fall back) --
    def append(self, entry: FileEntry) -> None:
        self._all().append(entry)

    def extend(self, entries) -> None:
        self._all().extend(entries)

    # -- vectorized fast paths -----------------------------------------
    @property
    def total_rows(self) -> int:
        if self._materialized is not None:
            return sum(f.n_rows for f in self._materialized)
        import pyarrow.compute as pc

        return int(pc.sum(self._table.column("n_rows")).as_py() or 0)

    def prune_range(self, start=None, end_excl=None) -> list[FileEntry]:
        """Entries whose ``[min, max]`` intersects ``[start,
        end_excl)``, materializing only the survivors. Falls back to
        the Python filter when the list was already materialized (or
        mutated), or when the ordering stats live in the
        JSON-fallback columns (mixed-type stats)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        t = self._table
        if start is None and end_excl is None:
            return self._all()
        if (
            self._materialized is not None
            or "min" not in t.column_names
            or "max" not in t.column_names
        ):
            return [
                e for e in self._all()
                if (start is None or e.max >= start)
                and (end_excl is None or e.min < end_excl)
            ]
        mask = None
        if start is not None:
            mask = pc.greater_equal(
                t.column("max"),
                pa.scalar(start, type=t.column("max").type),
            )
        if end_excl is not None:
            m2 = pc.less(
                t.column("min"),
                pa.scalar(end_excl, type=t.column("min").type),
            )
            mask = m2 if mask is None else pc.and_(mask, m2)
        return self._codec._files_from_table(t.filter(mask))

    def prune_key_range(self, bounds: dict, *, ordered_on: str | None = None) -> list[FileEntry]:
        """Vectorized pre-prune on PER-COLUMN skip stats: entries
        whose typed ``c_min:<col>``/``c_max:<col>`` sidecar stats can
        intersect every ``{col: (lo, hi)}`` range — the wide-manifest
        fast path for ``merge_into``'s candidate selection, so a CDC
        merge against a 100k-file manifest prunes in Arrow compute
        and materializes only survivors, instead of building 100k
        ``FileEntry`` objects to reject in Python. Conservative:
        entries with missing/untyped stats for a column are KEPT, and
        columns with no typed stats at all cannot prune. Falls back
        to full materialization when the list was already
        materialized (the caller's exact filter re-checks every
        survivor anyway).

        ``ordered_on``: the manifest's ordering column, whose bounds
        live in the top-level ``min``/``max`` sidecar columns (never
        ``c_min:*`` — ``_footer_stats`` excludes it from the skip
        stats) — without it a merge keyed ON the ordering column (the
        CDC state-table layout) could not prune at all."""
        import pyarrow as pa
        import pyarrow.compute as pc

        t = self._table
        if self._materialized is not None or not bounds:
            return self._all()
        mask = None
        for c, (lo, hi) in bounds.items():
            if c == ordered_on:
                cmin_name, cmax_name = "min", "max"
            else:
                cmin_name, cmax_name = f"c_min:{c}", f"c_max:{c}"
            if (
                cmin_name not in t.column_names
                or cmax_name not in t.column_names  # half-populated
                # stats are possible after delta-chain concat with
                # schema promotion — never KeyError on the twin
                or lo is None
                or hi is None
            ):
                continue
            cmin, cmax = t.column(cmin_name), t.column(cmax_name)
            try:
                inter = pc.and_kleene(
                    pc.greater_equal(cmax, pa.scalar(lo, type=cmax.type)),
                    pc.less_equal(cmin, pa.scalar(hi, type=cmin.type)),
                )
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                continue  # incomparable scalar: cannot prune on this col
            keep = pc.or_kleene(pc.is_null(cmin), inter)
            mask = keep if mask is None else pc.and_(mask, keep)
        if mask is None:
            return self._all()
        # keep-on-unknown: a null mask slot (e.g. cmin non-null but
        # cmax null — kleene leaves the slot null, and Table.filter
        # DROPS null rows) must KEEP the entry, or a file whose
        # matched keys the merge then misses gets its rows silently
        # re-inserted as duplicates
        return self._codec._files_from_table(
            t.filter(pc.fill_null(mask, True))
        )


class _LazyNames:
    """Deferred chain name-set (round-14 lazy fresh-load): building a
    frozenset of 1M Python strings costs ~1.4 s — the dominant cost
    of a delta-log fresh load — and only the WRITER's next delta
    commit needs it. The thunk resolves from the COMMITTED sidecars
    (never from a caller-visible entry list, which the caller mutates
    between commits), so late resolution is mutation-proof."""

    __slots__ = ("_thunk", "_names")

    def __init__(self, thunk):
        self._thunk = thunk
        self._names: frozenset | None = None

    def get(self) -> frozenset:
        if self._names is None:
            self._names = self._thunk()
            self._thunk = None
        return self._names


class ChainFileList(ArrowFileList):
    """Delta-chain manifest view with DEFERRED reconstruction
    (round-14): a fresh reader handle pays only the head read —
    sidecar reads, the removed-name filter, concat and the (min, max)
    sort all run on FIRST USE of the file list (then cache). Closes
    the measured 1M-entry fresh-load gap vs the full-sidecar backend
    (1.6 s eager → ~0 ms; first use ≈ the full backend's one-time
    sidecar read). Delta's own lazy checkpoint-read path is the
    model.

    Staleness posture unchanged, just moved to first use: a handle
    that waits past the chain's GC grace before first touching files
    fails LOUDLY on the missing sidecar (same contract as an eagerly
    stale reader).

    Every public entry point resolves first, so the inherited
    vectorized paths (``prune_range`` / ``prune_key_range`` /
    ``total_rows``) and the sequence protocol behave exactly like the
    eager :class:`ArrowFileList` afterwards — including the rare
    mixed-encoding fallback, which materializes Python entries
    instead of a table."""

    def __init__(self, backend, dirpath: str, ref: str, deltas: list):
        self._backend = backend
        self._dirpath = dirpath
        self._ref = ref
        self._deltas = [dict(d) for d in deltas]
        self._codec = type(backend)
        self._table = None
        self._materialized: list[FileEntry] | None = None

    def _resolve(self) -> None:
        if self._table is None and self._materialized is None:
            files = self._backend._resolve_chain(
                self._dirpath, self._ref, self._deltas
            )
            if isinstance(files, ArrowFileList):
                self._table = files._table
            else:  # mixed-encoding fallback: already-decoded entries
                self._materialized = files

    # resolve-first delegation: parent methods consult _materialized
    # and _table in orders that assume a settled state
    def _all(self) -> list[FileEntry]:
        self._resolve()
        return super()._all()

    def __len__(self) -> int:
        self._resolve()
        return super().__len__()

    @property
    def total_rows(self) -> int:
        self._resolve()
        return ArrowFileList.total_rows.fget(self)

    def prune_range(self, start=None, end_excl=None) -> list[FileEntry]:
        self._resolve()
        return super().prune_range(start, end_excl)

    def prune_key_range(self, bounds: dict, *, ordered_on: str | None = None) -> list[FileEntry]:
        self._resolve()
        return super().prune_key_range(bounds, ordered_on=ordered_on)


class ParquetManifestBackend(PosixRenameBackend, _ParquetFilesCodec):
    """Manifest head as small JSON + file entries as a PARQUET
    sidecar (``_ParquetFilesCodec`` layout) — the documented upgrade
    path for lakehouse file counts (Delta/Iceberg store file stats
    the same way).

    Why: the JSON manifest inlines every file entry, so at 100k files
    both the load and — worse — the generation check inside the
    commit flock parse megabytes of JSON; at 1M files (10 PB at 10 GB
    files) it is a wall. Here the head committed through the
    inherited flock CAS holds only ``ordered_on`` / ``generation`` /
    ``kv`` / schema / tombstones plus a ``files_ref`` pointer. The
    CAS cost becomes independent of file count; the file list loads
    as one vectorized parquet read (the split
    ``read_split``/``commit_split`` fast path ``Manifest`` prefers
    when a backend provides it).

    Commit protocol (same generation-CAS contract as the JSON
    backend, pinned by the shared swap/CAS/hammer tests):
    1. write the entries parquet under a UNIQUE name
       (``_oups_manifest.files.g<generation>.<nonce>.parquet`` — the
       nonce prevents two same-generation racers from clobbering
       each other's object before the CAS decides),
    2. flock-CAS the head pointing at it (inherited
       :meth:`PosixRenameBackend.commit`); a loser removes its
       orphan parquet and raises :class:`ManifestConflictError`,
    3. sweep superseded entry objects older than ``gc_grace_s``
       (kept briefly so a reader that loaded the PREVIOUS head can
       still resolve its ``files_ref`` — same isolation posture as
       the data-file tombstone grace window).

    Interop: reading a dataset last committed by the JSON backend
    works as-is (inline ``files``, no ``files_ref``) and the next
    commit upgrades it; a JSON-backend reader on a parquet-backend
    dataset fails LOUDLY (missing ``files`` key), never silently
    empty. Time-travel snapshots are unaffected — they are written
    from the full inline payload before the backend splits it.
    On object stores use :class:`ObjectStoreParquetBackend` — same
    layout over conditional puts.
    """

    gc_grace_s = 300.0

    def _files_to_parquet(self, files: list[FileEntry], path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(self._files_to_parquet_bytes(files))
        os.replace(tmp, path)

    @classmethod
    def _files_from_parquet(cls, path: str) -> ArrowFileList:
        import pyarrow.parquet as pq

        return ArrowFileList(pq.read_table(path), cls)

    # -- split contract (Manifest's fast path) -------------------------
    def read_split(self, dirpath: str):
        """-> (head_payload_dict, list[FileEntry], token) | None."""
        hit = super().read(dirpath)
        if hit is None:
            return None
        data, token = hit
        payload = json.loads(_plain(data))
        self._reject_delta_chain(dirpath, payload)
        ref = payload.pop("files_ref", None)
        if ref is None:  # legacy inline-JSON manifest
            files = [FileEntry.from_json(d) for d in payload.pop("files")]
            return payload, files, token
        files = self._files_from_parquet(os.path.join(dirpath, ref))
        return payload, files, token

    @staticmethod
    def _reject_delta_chain(dirpath: str, payload: dict) -> None:
        # reader-feature guard (Delta's reader-version idea): a head
        # carrying an unfolded delta chain is unreadable here — the
        # base checkpoint alone is a STALE view, and committing from
        # it would silently drop every entry added since. Fail loudly
        # instead of losing data.
        if payload.get("deltas"):
            raise ValueError(
                f"manifest at {dirpath} carries a delta-log chain "
                f"({len(payload['deltas'])} deltas); read it with "
                "DeltaLogParquetBackend / DeltaLogObjectStoreBackend "
                "(or fold the chain with a checkpoint commit) — a "
                "base-checkpoint-only view would be stale"
            )

    def commit_split(
        self, dirpath: str, head: dict, files: list[FileEntry],
        *, expect_token,
    ) -> Any:
        import uuid

        gen = head.get("generation", 0)
        ref = f"{self._FILES_PREFIX}{gen:08d}.{uuid.uuid4().hex[:12]}.parquet"
        ref_path = os.path.join(dirpath, ref)
        self._files_to_parquet(files, ref_path)
        head = {**head, "files_ref": ref}
        data = _maybe_compress(json.dumps(head).encode())
        try:
            token = super().commit(dirpath, data, expect_token=expect_token)
        except ManifestConflictError:
            if os.path.exists(ref_path):  # never referenced by any head
                os.remove(ref_path)
            raise
        self._sweep(dirpath, keep=ref)
        return token

    # -- bytes contract (interface parity; Manifest uses the split
    #    path, so these only serve generic byte-level callers) --------
    def read(self, dirpath: str):
        hit = self.read_split(dirpath)
        if hit is None:
            return None
        payload, files, token = hit
        payload = dict(payload)
        payload["files"] = [f.to_json() for f in files]
        return json.dumps(payload).encode(), token

    def commit(self, dirpath: str, data: bytes, *, expect_token) -> Any:
        payload = json.loads(_plain(data))
        files = [FileEntry.from_json(d) for d in payload.pop("files", [])]
        return self.commit_split(
            dirpath, payload, files, expect_token=expect_token
        )

    def _sweep(self, dirpath: str, *, keep: str) -> None:
        import time

        now = time.time()
        for n in os.listdir(dirpath):
            if n == keep or not (
                n.startswith(self._FILES_PREFIX) and n.endswith(".parquet")
            ):
                continue
            p = os.path.join(dirpath, n)
            try:
                if now - os.path.getmtime(p) >= self.gc_grace_s:
                    os.remove(p)
            except FileNotFoundError:
                continue  # concurrent sweeper got it first


class _DeltaLogMixin:
    """DELTA-ENCODED manifest commits — O(changed entries) commit I/O
    instead of a full sidecar rewrite per commit (the one remaining
    manifest-width-proportional write cost, measured at ~5–6 s per
    commit at 1M entries in SCALE.md's round-13 probe). The
    Delta-Lake log architecture proper: actions per commit, periodic
    checkpoints — here with the actions themselves typed parquet.

    Layout: the head (same CAS as the transport parent) points at a
    BASE checkpoint sidecar (``files_ref``) plus an ordered chain
    ``deltas: [{"ref": <adds sidecar|null>, "removed": [names]} ...]``
    — each commit writes ONLY its added entries as a parquet object
    and lists its removed names inline in the head (both bounded by
    the commit's touched files, never table width). Readers
    reconstruct vectorized: one global removed-name filter is EXACT
    because data-file names are uuid-fresh and never reused (a name
    can never be re-added after removal), then concat with schema
    promotion and a typed sort on (min, max) restores the manifest
    order invariant.

    The writer proves its delta against the true predecessor via the
    CAS itself: the delta is computed vs the name-set this handle
    last read/committed (cached per dirpath), and the head commit
    carries ``expect_token`` from that same state — so the CAS
    succeeds only when that state IS the committed predecessor. Any
    doubt (foreign token, no cache) and every ``checkpoint_interval``
    commits, the chain folds into a fresh full checkpoint;
    correctness never depends on the fast path.

    Transport primitives supplied by the concrete class:
    ``_head_read`` / ``_head_commit`` (the CAS), ``_sidecar_table``
    / ``_sidecar_write`` / ``_sidecar_drop``, ``_chain_sweep``.
    """

    checkpoint_interval = 20

    def __init__(self):
        # dirpath -> (token, frozenset(names), base_ref, deltas_payload)
        self._seen: dict[str, tuple] = {}
        # dirpath -> the PREVIOUS commit's reachable refs: kept for one
        # extra commit so a reader that loaded the previous head can
        # still resolve its chain (the keep_generations=2 posture; the
        # POSIX twin additionally has its mtime grace window)
        self._prev_keep: dict[str, set] = {}
        # dirpath -> refs THIS instance released at its previous
        # commit: the only objects the object-store sweep may delete
        # (deleting by listing would race a concurrent writer's
        # staged-but-not-yet-CASed sidecar)
        self._pending_drop: dict[str, set] = {}

    # -- read ----------------------------------------------------------
    def read_split(self, dirpath: str):
        hit = self._head_read(dirpath)
        if hit is None:
            return None
        data, token = hit
        payload = json.loads(_plain(data))
        ref = payload.pop("files_ref", None)
        deltas = payload.pop("deltas", [])
        if ref is None:  # legacy inline-JSON manifest
            files = [FileEntry.from_json(d) for d in payload.pop("files")]
            return payload, files, token
        # LAZY fresh load (round-14): chain reconstruction and the
        # name-set both defer — a reader handle pays only this head
        # read. The name-set thunk re-reads name COLUMNS from the
        # committed sidecars rather than borrowing the ChainFileList,
        # so a caller mutating the returned list between commits can
        # never corrupt the next delta computation.
        files = ChainFileList(self, dirpath, ref, deltas)
        self._seen[dirpath] = (
            token,
            _LazyNames(lambda: self._chain_names(dirpath, ref, deltas)),
            ref,
            deltas,
        )
        return payload, files, token

    def _sidecar_names(self, dirpath: str, ref: str) -> list:
        """Just the ``name`` column of one sidecar — overridable with
        a column-pruned read where the transport supports it."""
        return self._sidecar_table(dirpath, ref).column("name").to_pylist()

    def _chain_names(self, dirpath: str, ref: str, deltas: list) -> frozenset:
        """Name-set of a committed chain, resolved from the sidecars
        (mutation-proof — see read_split). Data-file names are
        uuid-fresh and never reused, so one global removed filter is
        exact, same as _resolve_chain."""
        names = set(self._sidecar_names(dirpath, ref))
        for d in deltas:
            if d.get("ref"):
                names.update(self._sidecar_names(dirpath, d["ref"]))
        for d in deltas:
            names.difference_update(d.get("removed", []))
        return frozenset(names)

    def _resolve_chain(self, dirpath: str, ref: str, deltas: list):
        import pyarrow as pa
        import pyarrow.compute as pc

        tables = [self._sidecar_table(dirpath, ref)]
        removed: set = set()
        for d in deltas:
            if d.get("ref"):
                tables.append(self._sidecar_table(dirpath, d["ref"]))
            removed.update(d.get("removed", []))
        if removed:
            rm = pa.array(sorted(removed), type=pa.string())
            tables = [
                t.filter(
                    pc.invert(pc.is_in(t.column("name"), value_set=rm))
                )
                for t in tables
            ]
        # heterogeneous skip-stat encodings across the chain (one
        # sidecar typed c_min:*, another demoted to cols_json — e.g. a
        # post-schema-evolution column whose type defies clean typing)
        # cannot concat losslessly: _files_from_table's typed branch
        # would silently null the cols_json rows' stats. Decode each
        # self-consistent sidecar separately and merge in Python —
        # rare, and only this path pays the materialization.
        # EMPTY sidecars (a checkpoint of an emptied dataset, or a
        # filter that dropped every row) carry untyped stats columns —
        # they contribute no entries, so drop them before concat
        # (keeping one only when everything is empty, for the names
        # pass below)
        non_empty = [t for t in tables if t.num_rows]
        tables = non_empty or tables[:1]
        has_json = any(
            "cols_json" in t.column_names or "min_json" in t.column_names
            for t in tables
        )
        has_typed = any(
            "min" in t.column_names
            or any(c.startswith("c_min:") for c in t.column_names)
            for t in tables
        )
        if has_json and has_typed and len(tables) > 1:
            entries = [e for t in tables for e in self._files_from_table(t)]
            entries.sort(key=lambda f: (f.min, f.max))
            return entries
        table = (
            pa.concat_tables(tables, promote_options="default")
            if len(tables) > 1
            else tables[0]
        )
        if "min" in table.column_names and "max" in table.column_names:
            table = table.take(
                pc.sort_indices(
                    table,
                    sort_keys=[("min", "ascending"), ("max", "ascending")],
                )
            )
            return ArrowFileList(table, type(self))
        # mixed-type (JSON-fallback) ordering stats: materialize and
        # sort in Python — rare, and the exact filter above still ran
        entries = self._files_from_table(table)
        entries.sort(key=lambda f: (f.min, f.max))
        return entries

    # -- commit --------------------------------------------------------
    def commit_split(
        self, dirpath: str, head: dict, files: list[FileEntry],
        *, expect_token,
    ) -> Any:
        import uuid

        gen = head.get("generation", 0)
        seen = self._seen.get(dirpath)
        nonce = uuid.uuid4().hex[:12]
        if (
            seen is not None
            and seen[0] == expect_token
            and len(seen[3]) + 1 < self.checkpoint_interval
            and isinstance(seen[1], _LazyNames)
        ):
            # the delta path is about to need the predecessor's
            # name-set, which (round-14 lazy posture) resolves from
            # sidecars AT COMMIT time. If a foreign writer committed
            # and its sweep reclaimed our chain in between, that read
            # fails — and pre-lazy code could not hit this (names
            # were captured at read time). Treat it as an unprovable
            # predecessor: fall through to the FULL CHECKPOINT
            # attempt, whose CAS then loses with the
            # ManifestConflictError callers' retry loops expect.
            try:
                seen = (seen[0], seen[1].get(), seen[2], seen[3])
                self._seen[dirpath] = seen  # cache the resolution
            except (FileNotFoundError, OSError):
                seen = None
        if (
            seen is None
            or seen[0] != expect_token
            or len(seen[3]) + 1 >= self.checkpoint_interval
        ):
            # FULL CHECKPOINT: no provable predecessor, or the chain
            # is due for folding
            ref = f"{self._FILES_PREFIX}{gen:08d}.{nonce}.parquet"
            self._sidecar_write(dirpath, ref, files)
            new_head = {**head, "files_ref": ref}
            keep = {ref}
            new_deltas: list = []
            staged = ref
            # name-set for the NEXT delta commit: defer to a sidecar
            # re-read (round-14 lazy posture — a 1M-entry checkpoint
            # commit must not pay a 1.4 s frozenset it may never
            # need). The thunk binds the committed ref, so later
            # caller mutations of `files` cannot leak in.
            ckpt_ref = ref
            next_names = _LazyNames(
                lambda: frozenset(self._sidecar_names(dirpath, ckpt_ref))
            )
            # the REPLACED head's chain (known from this instance's
            # last read/commit of this dirpath) must survive this
            # commit's sweep one extra commit: a reader that loaded
            # that head just before our CAS may still be mid-chain-
            # resolve, and when the chain is a FOREIGN writer's (not
            # in our _prev_keep) its BASE checkpoint is typically far
            # older than gc_grace_s — without this it is deleted
            # immediately, failing that reader systematically
            # (ADVICE r13). Mirrors the two-phase posture used for
            # this instance's own released refs.
            replaced_chain = (
                {seen[2]} | {d["ref"] for d in seen[3] if d.get("ref")}
                if seen is not None and seen[2]
                else set()
            )
        else:
            _tok, prev_names, base_ref, deltas = seen
            cur_names = {f.name for f in files}
            added = [f for f in files if f.name not in prev_names]
            removed = sorted(prev_names - cur_names)
            if added:
                ref = f"{self._FILES_PREFIX}{gen:08d}.{nonce}.delta.parquet"
                self._sidecar_write(dirpath, ref, added)
                staged = ref
            else:
                ref = None  # removal-only / head-only commit
                staged = None
            new_deltas = list(deltas) + (
                [{"ref": ref, "removed": removed}]
                if (added or removed)
                else []
            )
            new_head = {**head, "files_ref": base_ref, "deltas": new_deltas}
            keep = {base_ref} | {
                d["ref"] for d in new_deltas if d.get("ref")
            }
            ref = base_ref
            replaced_chain = set()  # delta commit: keep covers the chain
            next_names = frozenset(cur_names)  # already computed here
        data = _maybe_compress(json.dumps(new_head).encode())
        try:
            token = self._head_commit(dirpath, data, expect_token)
        except ManifestConflictError:
            if staged is not None:  # never referenced by any head
                self._sidecar_drop(dirpath, staged)
            raise
        self._seen[dirpath] = (token, next_names, ref, new_deltas)
        # two-phase reclamation: refs released by THIS commit are only
        # deleted at the NEXT one (a reader on the just-replaced head
        # can still resolve its chain), and only refs this instance
        # itself released are ever dropped — never a listing sweep,
        # which could delete a concurrent writer's staged sidecar
        # between its put and its head CAS
        released = (
            self._prev_keep.get(dirpath, set()) | replaced_chain
        ) - keep
        drop_now = self._pending_drop.get(dirpath, set()) - keep
        self._chain_sweep(
            dirpath,
            keep=keep | released,
            drop=drop_now,
        )
        self._pending_drop[dirpath] = released
        self._prev_keep[dirpath] = keep
        return token


class DeltaLogParquetBackend(_DeltaLogMixin, ParquetManifestBackend):
    """Delta-log manifest on POSIX (flock-CAS head, sidecars as local
    parquet files) — see :class:`_DeltaLogMixin` for the protocol and
    SCALE.md for the measured commit-cost table."""

    # -- transport primitives -------------------------------------
    def _head_read(self, dirpath: str):
        return PosixRenameBackend.read(self, dirpath)

    def _head_commit(self, dirpath: str, data: bytes, expect_token) -> Any:
        return PosixRenameBackend.commit(
            self, dirpath, data, expect_token=expect_token
        )

    def _sidecar_table(self, dirpath: str, ref: str):
        import pyarrow.parquet as pq

        return pq.read_table(os.path.join(dirpath, ref))

    def _sidecar_names(self, dirpath: str, ref: str) -> list:
        import pyarrow.parquet as pq

        # column-pruned read: the name-set resolver never needs stats
        return pq.read_table(
            os.path.join(dirpath, ref), columns=["name"]
        ).column("name").to_pylist()

    def _sidecar_write(self, dirpath: str, ref: str, files) -> None:
        self._files_to_parquet(files, os.path.join(dirpath, ref))

    def _sidecar_drop(self, dirpath: str, ref: str) -> None:
        p = os.path.join(dirpath, ref)
        if os.path.exists(p):
            os.remove(p)

    def _chain_sweep(self, dirpath: str, *, keep: set, drop: set = frozenset()) -> None:
        import time

        now = time.time()
        for n in os.listdir(dirpath):
            if n in keep or not (
                n.startswith(self._FILES_PREFIX) and n.endswith(".parquet")
            ):
                continue
            p = os.path.join(dirpath, n)
            try:
                if now - os.path.getmtime(p) >= self.gc_grace_s:
                    os.remove(p)
            except FileNotFoundError:
                continue  # concurrent sweeper got it first


class ObjectStoreParquetBackend(ObjectStoreBackend, _ParquetFilesCodec):
    """Split-layout manifest on an OBJECT STORE: the same typed
    parquet sidecar as :class:`ParquetManifestBackend`, with the head
    committed through :class:`ObjectStoreBackend`'s conditional-put
    CAS. The sidecar is an immutable nonce-named object written with
    put-if-absent BEFORE the head CAS decides; a loser deletes its
    orphan (where the store implements ``_delete``).

    Sidecar GC is by GENERATION — keep the newest
    ``keep_generations`` — rather than mtime: object stores carry no
    trustworthy local clock. A reader that loaded the previous head
    can still resolve its ref; a reader ≥ ``keep_generations``
    commits stale between its head GET and sidecar GET fails LOUDLY
    (missing object), never silently empty. Stores without
    LIST/DELETE primitives skip the sweep and leave reclamation to a
    bucket lifecycle rule.
    """

    keep_generations = 2

    def read_split(self, dirpath: str):
        """-> (head_payload_dict, list[FileEntry], token) | None."""
        hit = self._get(self._key(dirpath))
        if hit is None:
            return None
        data, token = hit
        payload = json.loads(_plain(data))
        ParquetManifestBackend._reject_delta_chain(dirpath, payload)
        ref = payload.pop("files_ref", None)
        if ref is None:  # manifest committed by the inline-JSON backend
            files = [FileEntry.from_json(d) for d in payload.pop("files")]
            return payload, files, token
        sidecar = self._get(os.path.join(dirpath, ref))
        if sidecar is None:
            raise FileNotFoundError(
                f"manifest sidecar {ref} missing under {dirpath} "
                "(reader stale past the sidecar GC window?)"
            )
        import pyarrow as pa
        import pyarrow.parquet as pq

        files = ArrowFileList(
            pq.read_table(pa.BufferReader(sidecar[0])), type(self)
        )
        return payload, files, token

    def commit_split(
        self, dirpath: str, head: dict, files: list[FileEntry],
        *, expect_token,
    ) -> Any:
        import uuid

        gen = head.get("generation", 0)
        ref = f"{self._FILES_PREFIX}{gen:08d}.{uuid.uuid4().hex[:12]}.parquet"
        ref_key = os.path.join(dirpath, ref)
        self._put_if_absent(ref_key, self._files_to_parquet_bytes(files))
        head = {**head, "files_ref": ref}
        data = _maybe_compress(json.dumps(head).encode())
        try:
            token = super().commit(dirpath, data, expect_token=expect_token)
        except ManifestConflictError:
            try:
                self._delete(ref_key)  # never referenced by any head
            except NotImplementedError:
                pass
            raise
        self._sweep(dirpath, gen)
        return token

    # bytes contract (interface parity; Manifest uses the split path)
    def read(self, dirpath: str):
        hit = self.read_split(dirpath)
        if hit is None:
            return None
        payload, files, token = hit
        payload = dict(payload)
        payload["files"] = [f.to_json() for f in files]
        return json.dumps(payload).encode(), token

    def commit(self, dirpath: str, data: bytes, *, expect_token) -> Any:
        payload = json.loads(_plain(data))
        files = [FileEntry.from_json(d) for d in payload.pop("files", [])]
        return self.commit_split(
            dirpath, payload, files, expect_token=expect_token
        )

    def _sweep(self, dirpath: str, current_gen: int) -> None:
        prefix = os.path.join(dirpath, self._FILES_PREFIX)
        try:
            keys = self._list(prefix)
        except NotImplementedError:
            return
        cutoff = current_gen - self.keep_generations
        for k in keys:
            try:
                g = int(k[len(prefix):].split(".", 1)[0])
            except ValueError:
                continue
            if g <= cutoff:
                try:
                    self._delete(k)
                except NotImplementedError:
                    return


class DeltaLogObjectStoreBackend(_DeltaLogMixin, ObjectStoreParquetBackend):
    """Delta-log manifest on an OBJECT STORE (conditional-put head,
    sidecars as immutable put-if-absent objects) — same chain
    protocol as the POSIX twin (:class:`_DeltaLogMixin`), composed
    with S3/GCS CAS semantics. The sweep is reachability-based (keep
    every ref in the current head's chain) rather than
    generation-based: a chain's BASE checkpoint legitimately carries
    an old generation and must survive any number of delta commits.
    Stores without LIST/DELETE primitives skip the sweep and leave
    reclamation to a bucket lifecycle rule."""

    def __init__(self):
        _DeltaLogMixin.__init__(self)

    # -- transport primitives -------------------------------------
    def _head_read(self, dirpath: str):
        return self._get(self._key(dirpath))

    def _head_commit(self, dirpath: str, data: bytes, expect_token) -> Any:
        return ObjectStoreBackend.commit(
            self, dirpath, data, expect_token=expect_token
        )

    def _sidecar_table(self, dirpath: str, ref: str):
        import pyarrow as pa
        import pyarrow.parquet as pq

        hit = self._get(os.path.join(dirpath, ref))
        if hit is None:
            raise FileNotFoundError(
                f"manifest sidecar {ref} missing under {dirpath} "
                "(reader stale past the sidecar GC window?)"
            )
        return pq.read_table(pa.BufferReader(hit[0]))

    def _sidecar_write(self, dirpath: str, ref: str, files) -> None:
        self._put_if_absent(
            os.path.join(dirpath, ref), self._files_to_parquet_bytes(files)
        )

    def _sidecar_drop(self, dirpath: str, ref: str) -> None:
        try:
            self._delete(os.path.join(dirpath, ref))
        except NotImplementedError:
            pass

    def _chain_sweep(self, dirpath: str, *, keep: set, drop: set = frozenset()) -> None:
        # delete ONLY the refs this instance released two commits ago
        # (see _DeltaLogMixin two-phase reclamation) — a listing sweep
        # would race a concurrent writer's staged-but-uncommitted
        # sidecar. Other writers' superseded objects fall to the
        # bucket lifecycle rule, like stores without LIST/DELETE.
        for r in drop:
            if r in keep:
                continue
            try:
                self._delete(os.path.join(dirpath, r))
            except NotImplementedError:
                return


class InMemoryDeltaLogObjectStore(DeltaLogObjectStoreBackend, InMemoryObjectStore):
    """Dict-backed mock of the delta-log object-store backend."""

    def __init__(self):
        DeltaLogObjectStoreBackend.__init__(self)
        InMemoryObjectStore.__init__(self)


class InMemoryParquetObjectStore(ObjectStoreParquetBackend, InMemoryObjectStore):
    """Dict-backed mock of the split-layout object-store backend —
    the contract tests' reference implementation (conditional-put
    head + immutable parquet sidecars, no network)."""


# Only explicitly tagged types round-trip through kv metadata — a
# manifest read from a shared dataset directory must never execute
# code on the driver, so there is deliberately NO pickle fallback
# (an unknown tag raises instead of deserializing).
_TAGS = ("__ts__", "__pdts__", "__pqdf__")


def _enc(v: Any) -> Any:
    import numpy as np
    import pandas as pd

    if isinstance(v, (bool, int, float, str)) or v is None:
        return v
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, pd.Timestamp):
        # pandas parses its own isoformat back at full (ns) precision
        return {"__pdts__": v.isoformat()}
    if isinstance(v, datetime):
        return {"__ts__": v.isoformat()}
    if isinstance(v, pd.DataFrame):
        import io

        buf = io.BytesIO()
        v.to_parquet(buf)  # parquet: dtype-faithful and code-free
        return {"__pqdf__": base64.b64encode(buf.getvalue()).decode()}
    raise TypeError(
        f"kv metadata value of type {type(v).__name__} is not "
        "serializable: use JSON-safe scalars, timestamps, or small "
        "pandas DataFrames (nested dicts/lists of these are fine)"
    )


def _dec(v: dict) -> Any:
    import pandas as pd

    if "__pdts__" in v:
        return pd.Timestamp(v["__pdts__"])
    if "__ts__" in v:
        return datetime.fromisoformat(v["__ts__"])
    if "__pqdf__" in v:
        import io

        return pd.read_parquet(io.BytesIO(base64.b64decode(v["__pqdf__"])))
    raise ValueError(f"unknown kv metadata tag in {sorted(v)}")


def _is_tagged(v: dict) -> bool:
    return any(t in v for t in _TAGS) or any(
        k.startswith("__") and k.endswith("__") for k in v
    )


def _enc_tree(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _enc_tree(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_enc_tree(x) for x in v]
    return _enc(v)


def _dec_tree(v: Any) -> Any:
    if isinstance(v, dict):
        if _is_tagged(v):
            return _dec(v)
        return {k: _dec_tree(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_dec_tree(x) for x in v]
    return v


@dataclass
class FileEntry:
    """Stats of one data file (≈ one row group in reference terms).

    ``cols``: optional per-column ``{name: [min, max]}`` footer stats
    beyond the ordering column — the data-skipping index
    (Delta/Iceberg file-stats model). Absent for files written before
    the feature or via the Spark-scan stats fallback; pruning
    degrades gracefully to "cannot skip".
    """

    name: str  # path relative to the dataset directory
    n_rows: int
    min: Any  # ordered_on min
    max: Any  # ordered_on max
    cols: dict | None = None
    # optional per-column Bloom filters for equality-predicate data
    # skipping: {col: {"m": bits, "k": hashes, "b64": bitset}} —
    # written by write(bloom_cols=[...]), probed by read(filters=...)
    # (see store/bloom.py); absence degrades to "cannot skip"
    blooms: dict | None = None

    def to_json(self) -> dict:
        d = {"name": self.name, "n_rows": self.n_rows,
             "min": _enc(self.min), "max": _enc(self.max)}
        if self.cols:
            d["cols"] = {
                c: [_enc(lo), _enc(hi)] for c, (lo, hi) in self.cols.items()
            }
        if self.blooms:
            d["blooms"] = self.blooms
        return d

    @classmethod
    def from_json(cls, d: dict) -> FileEntry:
        cols = d.get("cols")
        return cls(name=d["name"], n_rows=d["n_rows"],
                   min=_dec_tree(d["min"]), max=_dec_tree(d["max"]),
                   cols={
                       c: (_dec_tree(lo), _dec_tree(hi))
                       for c, (lo, hi) in cols.items()
                   } if cols else None,
                   blooms=d.get("blooms"))


_DEFAULT_BACKEND = PosixRenameBackend()


@dataclass
class Manifest:
    ordered_on: str
    files: list[FileEntry] = field(default_factory=list)
    kv: dict[str, Any] = field(default_factory=dict)
    schema_json: str | None = None  # Spark StructType json of the dataset
    # column-MultiIndex mapping (reference: tuple column names /
    # ``conform_cmidx``): {flat_column_name: [level, level, ...]} for
    # datasets written with tuple ``ordered_on`` — ``read`` uses it to
    # rebuild the struct columns the writer flattened
    cmidx: dict[str, list[str]] | None = None
    # monotone commit counter: incremented by every save(); the key of
    # time-travel snapshots (see snapshot_* helpers)
    generation: int = 0
    # deferred-deletion ledger: files no longer referenced by this
    # generation but kept on disk for a grace window so a reader whose
    # scan resolved paths from a superseded manifest is not yanked
    # mid-job (reader/writer isolation — the reference instead holds
    # the dataset lock for the whole read, ``base.py:240-255``).
    # Entries are ``{"name": <file>, "ts": <unix seconds>}``; the
    # write path sweeps entries older than its grace window.
    tombstones: list = field(default_factory=list)
    # backend commit token of the version this instance was loaded
    # from (None = freshly created / posix backend) — save() passes
    # it as the conditional-put precondition, making read-modify-
    # write optimistic CAS on backends that support it
    token: Any = field(default=None, compare=False, repr=False)
    # True iff the most recent save() got its backend CAS accepted —
    # distinguishes post-commit failures (snapshot write, expired-file
    # deletion) from pre-commit ones in callers' cleanup handlers.
    # Reset to False at the top of every save().
    last_commit_landed: bool = field(default=False, compare=False, repr=False)

    @property
    def n_rows(self) -> int:
        if isinstance(self.files, ArrowFileList):
            return self.files.total_rows  # vectorized, no materialization
        return sum(f.n_rows for f in self.files)

    def files_in_range(self, start=None, end_excl=None) -> list[FileEntry]:
        """Entries whose ``[min, max]`` span intersects
        ``[start, end_excl)`` — THE read-path file selection. On an
        Arrow-backed lazy list (parquet-sidecar backends) the
        selection runs vectorized and materializes only survivors, so
        a pruned read of a million-file dataset touches a handful of
        Python objects."""
        if isinstance(self.files, ArrowFileList):
            return self.files.prune_range(start, end_excl)
        entries = self.files
        if start is not None:
            entries = [e for e in entries if e.max >= start]
        if end_excl is not None:
            entries = [e for e in entries if e.min < end_excl]
        return list(entries)

    def sort_files(self) -> None:
        if not isinstance(self.files, list):
            self.files = list(self.files)
        self.files.sort(key=lambda f: (f.min, f.max))

    def _head_payload(self) -> dict:
        payload = {
            "version": 1,
            "ordered_on": self.ordered_on,
            "generation": self.generation,
            "kv": _enc_tree(self.kv),
            "schema_json": self.schema_json,
        }
        if self.cmidx:
            payload["cmidx"] = self.cmidx
        if self.tombstones:
            payload["tombstones"] = self.tombstones
        return payload

    def _payload(self) -> bytes:
        payload = self._head_payload()
        payload["files"] = [f.to_json() for f in self.files]
        return json.dumps(payload).encode()

    def save(
        self,
        dirpath: str,
        backend: ManifestBackend | None = None,
        *,
        snapshot: bool = False,
    ) -> None:
        backend = backend or _DEFAULT_BACKEND
        # post-commit failure discrimination: a caller whose cleanup
        # handler deletes staged data files MUST NOT do so once the
        # CAS has landed (the committed manifest references them) —
        # this flag is False until the backend commit returns, so
        # handlers can tell pre-commit failures (clean up) from
        # post-commit ones like a snapshot-write error (propagate,
        # never touch data files)
        self.last_commit_landed = False
        self.sort_files()
        self.generation += 1
        try:
            if hasattr(backend, "commit_split"):
                # split fast path (parquet sidecar backends): entries
                # go typed, never through per-entry JSON tagging
                self.token = backend.commit_split(
                    dirpath, self._head_payload(), self.files,
                    expect_token=self.token,
                )
            else:
                data = _maybe_compress(self._payload())
                self.token = backend.commit(
                    dirpath, data, expect_token=self.token
                )
        except ManifestConflictError:
            # a failed commit must not leave this instance claiming a
            # generation that never landed — callers retry with it
            self.generation -= 1
            raise
        self.last_commit_landed = True
        if snapshot:
            # snapshots are always the full inline payload, whatever
            # the backend's live layout — load_snapshot stays
            # backend-free and old generations never dangle on a
            # swept sidecar
            write_snapshot(
                dirpath, self.generation, _maybe_compress(self._payload())
            )

    @classmethod
    def _from_head(cls, payload: dict, token: Any = None) -> Manifest:
        return cls(
            ordered_on=payload["ordered_on"],
            files=[],
            kv=_dec_tree(payload.get("kv", {})),
            schema_json=payload.get("schema_json"),
            generation=payload.get("generation", 0),
            cmidx=payload.get("cmidx"),
            tombstones=payload.get("tombstones", []),
            token=token,
        )

    @classmethod
    def _from_payload(cls, data: bytes, token: Any = None) -> Manifest:
        payload = json.loads(_plain(data))
        man = cls._from_head(payload, token)
        man.files = [FileEntry.from_json(d) for d in payload["files"]]
        return man

    @classmethod
    def load(
        cls, dirpath: str, backend: ManifestBackend | None = None
    ) -> Manifest | None:
        backend = backend or _DEFAULT_BACKEND
        if hasattr(backend, "read_split"):
            hit = backend.read_split(dirpath)
            if hit is None:
                return None
            head, files, token = hit
            man = cls._from_head(head, token)
            man.files = files
            return man
        hit = backend.read(dirpath)
        if hit is None:
            return None
        data, token = hit
        return cls._from_payload(data, token)


# ------------------------------------------------- time-travel snapshots
# Immutable per-generation manifest copies (`_oups_manifest.v%08d.json`)
# power `OrderedDataset.read(as_of=...)`. POSIX-path mechanism only: on
# object stores, bucket versioning already snapshots the single manifest
# object per commit, so the engine-level copies would be redundant.
_SNAP_PREFIX = MANIFEST_NAME[: -len(".json")] + ".v"


def snapshot_name(generation: int) -> str:
    return f"{_SNAP_PREFIX}{generation:08d}.json"


def write_snapshot(dirpath: str, generation: int, data: bytes) -> None:
    path = os.path.join(dirpath, snapshot_name(generation))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def list_snapshots(dirpath: str) -> list[int]:
    """Available snapshot generations, ascending."""
    out = []
    try:
        names = os.listdir(dirpath)
    except FileNotFoundError:
        return []
    for n in names:
        if n.startswith(_SNAP_PREFIX) and n.endswith(".json"):
            try:
                out.append(int(n[len(_SNAP_PREFIX) : -len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def load_snapshot(dirpath: str, generation: int) -> Manifest:
    path = os.path.join(dirpath, snapshot_name(generation))
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no manifest snapshot for generation {generation} at {dirpath} "
            f"(available: {list_snapshots(dirpath)})"
        )
    with open(path, "rb") as fh:
        return Manifest._from_payload(fh.read())


def drop_snapshot(dirpath: str, generation: int) -> None:
    p = os.path.join(dirpath, snapshot_name(generation))
    if os.path.exists(p):
        os.remove(p)
