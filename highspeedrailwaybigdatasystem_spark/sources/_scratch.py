"""Scratch-directory management for sink/round-trip operators.

All intermediate writes live under ``<repo>/_scratch`` (gitignored) so
nothing outside the repo is touched. Paths are namespaced per PROCESS
(``p<pid>``): two concurrent harnesses (e.g. pytest and tools/mirror.py in
parallel) previously raced on the same staging dirs — one deleting a
directory the other's Spark job was mid-scan on — which produced a
spurious 1-op failure under concurrent runs. Per-process namespacing makes
every harness instance self-contained. Stale ``p<pid>`` dirs from dead
processes are reaped lazily on first use (staged stream sources copy
corpus-sized parquet per run, so without reaping repeated harness/bench
runs would grow ``_scratch`` unboundedly).
"""

from __future__ import annotations

import os
import shutil

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", os.path.join(_REPO_ROOT, "_scratch"))

_reaped = False


def _reap_dead_process_dirs() -> None:
    """Delete ``p<pid>`` dirs whose owning process is no longer alive.

    ``os.kill(pid, 0)`` probes liveness without signaling. Races are
    benign: a dir is only removed when its pid is dead, and two
    concurrent reapers at worst both attempt the same rmtree
    (``ignore_errors`` absorbs the loser).
    """
    global _reaped
    if _reaped:
        return
    _reaped = True
    try:
        entries = os.listdir(SCRATCH_ROOT)
    except FileNotFoundError:
        return
    for entry in entries:
        if not (entry.startswith("p") and entry[1:].isdigit()):
            continue
        pid = int(entry[1:])
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(SCRATCH_ROOT, entry), ignore_errors=True)
        except PermissionError:
            pass  # pid exists but owned by another user: leave it


def scratch_dir(name: str) -> str:
    """Return (and create the parent of) a per-operator, per-process
    scratch path."""
    _reap_dead_process_dirs()
    root = os.path.join(SCRATCH_ROOT, f"p{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, name)
