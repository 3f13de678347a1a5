"""Per-process scratch roots for store/stream driver queries.

Store and AggStream queries materialize real datasets on disk before
reading them back. Round 5 showed that a SHARED scratch path makes
those queries non-reentrant: the driver's correctness check, bench.py,
and pytest can run the same query concurrently in separate processes,
and one process's ``rmtree`` deletes a parquet file another process is
mid-scan on. Every process therefore gets its own root,
``.scratch/pid<pid>/``, removed best-effort at interpreter exit; stale
roots from crashed processes are swept opportunistically (a pid that
no longer exists cannot be mid-scan).
"""

from __future__ import annotations

import atexit
import os
import shutil

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)

_PID_ROOT = os.path.join(_SCRATCH, f"pid{os.getpid()}")
_registered = False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _sweep_stale() -> None:
    """Remove pid roots whose owning process is gone (best-effort)."""
    try:
        entries = os.listdir(_SCRATCH)
    except OSError:
        return
    for entry in entries:
        if not entry.startswith("pid"):
            continue
        try:
            pid = int(entry[3:])
        except ValueError:
            continue
        if pid != os.getpid() and not _pid_alive(pid):
            shutil.rmtree(os.path.join(_SCRATCH, entry), ignore_errors=True)


def _cleanup() -> None:
    shutil.rmtree(_PID_ROOT, ignore_errors=True)


def fresh(name: str) -> str:
    """Return an empty per-process scratch dir for query ``name``."""
    global _registered
    if not _registered:
        _registered = True
        atexit.register(_cleanup)
        _sweep_stale()
    d = os.path.join(_PID_ROOT, f"query_{name}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d
