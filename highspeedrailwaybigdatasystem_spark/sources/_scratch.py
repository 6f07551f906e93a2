"""Scratch-directory management for sink/round-trip operators.

All intermediate writes live under ``<repo>/_scratch`` (gitignored) so
nothing outside the repo is touched.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", os.path.join(_REPO_ROOT, "_scratch"))


def scratch_dir(name: str) -> str:
    """Return (and create the parent of) a per-operator scratch path."""
    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    return os.path.join(SCRATCH_ROOT, name)
