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

    @property
    def n_rows(self) -> int:
        return sum(f.n_rows for f in self.files)

    def sort_files(self) -> None:
        self.files.sort(key=lambda f: (f.min, f.max))

    def _payload(self) -> bytes:
        payload = {
            "version": 1,
            "ordered_on": self.ordered_on,
            "generation": self.generation,
            "files": [f.to_json() for f in self.files],
            "kv": _enc_tree(self.kv),
            "schema_json": self.schema_json,
        }
        if self.cmidx:
            payload["cmidx"] = self.cmidx
        if self.tombstones:
            payload["tombstones"] = self.tombstones
        return json.dumps(payload).encode()

    def save(
        self,
        dirpath: str,
        backend: ManifestBackend | None = None,
        *,
        snapshot: bool = False,
    ) -> None:
        backend = backend or _DEFAULT_BACKEND
        self.sort_files()
        self.generation += 1
        data = _maybe_compress(self._payload())
        try:
            self.token = backend.commit(dirpath, data, expect_token=self.token)
        except ManifestConflictError:
            # a failed commit must not leave this instance claiming a
            # generation that never landed — callers retry with it
            self.generation -= 1
            raise
        if snapshot:
            write_snapshot(dirpath, self.generation, data)

    @classmethod
    def _from_payload(cls, data: bytes, token: Any = None) -> Manifest:
        payload = json.loads(_plain(data))
        return cls(
            ordered_on=payload["ordered_on"],
            files=[FileEntry.from_json(d) for d in payload["files"]],
            kv=_dec_tree(payload.get("kv", {})),
            schema_json=payload.get("schema_json"),
            generation=payload.get("generation", 0),
            cmidx=payload.get("cmidx"),
            tombstones=payload.get("tombstones", []),
            token=token,
        )

    @classmethod
    def load(
        cls, dirpath: str, backend: ManifestBackend | None = None
    ) -> Manifest | None:
        backend = backend or _DEFAULT_BACKEND
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
