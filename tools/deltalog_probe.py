#!/usr/bin/env python
"""Delta-log metadata probe (round 15, VERDICT r14 ask #8).

Re-measures the SCALE.md delta-log table against the lazy fresh-load
that landed in round 14's inherited commits: 1M manifest entries,
chain = checkpoint + 2 deltas, comparing the full parquet sidecar
backend against the delta-log backend on

- fresh ``Manifest.load`` (head read only when lazy),
- load + FIRST pruned range selection (pays reconstruction),
- a subsequent point-prune (cached),
- an incremental commit on the fresh handle (+3/-1 entries).

No Spark needed — manifest arithmetic is driver-side by design.
Usage: python tools/deltalog_probe.py [n_entries]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from oups_spark.store.manifest import (
        DeltaLogParquetBackend,
        FileEntry,
        Manifest,
        ParquetManifestBackend,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    def build(dirpath, backend):
        man = Manifest(ordered_on="ts")
        man.files = [
            FileEntry(name=f"file_{i:07d}.parquet", n_rows=100,
                      min=i * 100, max=i * 100 + 99)
            for i in range(n)
        ]
        man.save(dirpath, backend)
        # two incremental commits -> a 2-delta chain on the log backend
        for j in range(2):
            man.files = man.files[1:] + [
                FileEntry(name=f"extra_{j}.parquet", n_rows=100,
                          min=(n + j) * 100, max=(n + j) * 100 + 99)
            ]
            man.save(dirpath, backend)
        return man

    results = {}
    for label, mk in (
        ("full parquet sidecar", ParquetManifestBackend),
        ("delta log", DeltaLogParquetBackend),
    ):
        d = tempfile.mkdtemp(prefix=f"dlp_{label.split()[0]}_")
        try:
            w = mk()
            build(d, w)

            b2 = mk()  # fresh handle: another process's reader/writer
            t0 = time.time()
            m2 = Manifest.load(d, b2)
            t_load = time.time() - t0

            t0 = time.time()
            sel = m2.files_in_range(500 * 100, 600 * 100)
            t_first = time.time() - t0
            assert len(list(sel)) > 0

            t0 = time.time()
            m2.files_in_range(700 * 100, 701 * 100)
            t_point = time.time() - t0

            m2.files = list(m2.files)[1:] + [
                FileEntry(name="probe_commit.parquet", n_rows=1,
                          min=10**12, max=10**12)
            ]
            t0 = time.time()
            m2.save(d, b2)
            t_commit = time.time() - t0

            # steady state: a second commit on the now-warm handle
            m2.files = list(m2.files)[1:] + [
                FileEntry(name="probe_commit2.parquet", n_rows=1,
                          min=10**12 + 1, max=10**12 + 1)
            ]
            t0 = time.time()
            m2.save(d, b2)
            t_commit2 = time.time() - t0
            results[label] = (t_load, t_first, t_point, t_commit, t_commit2)
            print(
                f"{label:<22} fresh_load={t_load:7.3f}s "
                f"first_prune={t_first:7.3f}s point_prune={t_point * 1e3:6.1f}ms "
                f"incr_commit_fresh={t_commit:7.3f}s "
                f"incr_commit_warm={t_commit2:7.3f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
