"""Scratch-directory management for sink/round-trip operators.

All intermediate writes live under ``<repo>/_scratch`` (gitignored) so
nothing outside the repo is touched. Paths are namespaced per PROCESS
(``p<pid>``): two concurrent harnesses (e.g. pytest and tools/mirror.py in
parallel) previously raced on the same staging dirs — one deleting a
directory the other's Spark job was mid-scan on — which produced a
spurious 1-op failure under concurrent runs. Per-process namespacing makes
every harness instance self-contained; stale ``p*`` dirs are bounded by
run count and live under the gitignored root.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", os.path.join(_REPO_ROOT, "_scratch"))


def scratch_dir(name: str) -> str:
    """Return (and create the parent of) a per-operator, per-process
    scratch path."""
    root = os.path.join(SCRATCH_ROOT, f"p{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, name)
