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

FILESYSTEM CONTRACT: the commit protocol relies on an atomic,
overwriting rename — a guarantee POSIX filesystems and HDFS provide
but object stores (S3) do NOT. On an object store, ``save`` must be
routed through a conditional-put (put-if-match on the manifest
object's ETag / generation) instead of rename; everything else in
this module is backend-agnostic since readers only ever GET the one
manifest object. All swap logic is confined to :meth:`Manifest.save`
precisely so that swap-out is a one-method change. The swap contract
itself (reader sees old-or-new, never partial; crashed writers leave
only ignorable ``.tmp`` debris) is pinned by
``tests/test_store_catalog.py::test_manifest_swap_contract``.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass, field
from datetime import datetime
from typing import Any

MANIFEST_NAME = "_oups_manifest.json"

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
    """Stats of one data file (≈ one row group in reference terms)."""

    name: str  # path relative to the dataset directory
    n_rows: int
    min: Any  # ordered_on min
    max: Any  # ordered_on max

    def to_json(self) -> dict:
        return {"name": self.name, "n_rows": self.n_rows,
                "min": _enc(self.min), "max": _enc(self.max)}

    @classmethod
    def from_json(cls, d: dict) -> FileEntry:
        return cls(name=d["name"], n_rows=d["n_rows"],
                   min=_dec_tree(d["min"]), max=_dec_tree(d["max"]))


@dataclass
class Manifest:
    ordered_on: str
    files: list[FileEntry] = field(default_factory=list)
    kv: dict[str, Any] = field(default_factory=dict)
    schema_json: str | None = None  # Spark StructType json of the dataset

    @property
    def n_rows(self) -> int:
        return sum(f.n_rows for f in self.files)

    def sort_files(self) -> None:
        self.files.sort(key=lambda f: (f.min, f.max))

    def save(self, dirpath: str) -> None:
        self.sort_files()
        payload = {
            "version": 1,
            "ordered_on": self.ordered_on,
            "files": [f.to_json() for f in self.files],
            "kv": _enc_tree(self.kv),
            "schema_json": self.schema_json,
        }
        tmp = os.path.join(dirpath, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, os.path.join(dirpath, MANIFEST_NAME))

    @classmethod
    def load(cls, dirpath: str) -> Manifest | None:
        path = os.path.join(dirpath, MANIFEST_NAME)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            payload = json.load(fh)
        return cls(
            ordered_on=payload["ordered_on"],
            files=[FileEntry.from_json(d) for d in payload["files"]],
            kv=_dec_tree(payload.get("kv", {})),
            schema_json=payload.get("schema_json"),
        )
