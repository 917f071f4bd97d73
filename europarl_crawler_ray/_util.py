"""Small shared utilities."""

from __future__ import annotations

import os


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker_runtime_env() -> dict:
    """Runtime env ensuring Ray workers can import this package even when
    the driver process was started outside the repo root (workers unpickle
    actors/functions by module reference)."""
    root = repo_root()
    existing = os.environ.get("PYTHONPATH", "")
    path = root if root in existing.split(":") else ":".join(p for p in (root, existing) if p)
    return {"env_vars": {"PYTHONPATH": path}}
