"""Small shared utilities."""

from __future__ import annotations

import os
import shutil


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def atomic_write_parquet(ds, final_dir: str, keep_existing_if_empty: bool = False) -> int:
    """Write a Dataset to ``final_dir`` atomically (tmp dir + rename).

    Ray's ``write_parquet`` APPENDS files into an existing directory, so a
    re-run of an uncommitted partition would duplicate rows without this.
    Returns the row count written. With ``keep_existing_if_empty``, an
    empty result does NOT replace an existing non-empty directory (guards
    a resume race where a restored dedup state filters out every row of a
    partition that is already durable on disk).
    """
    tmp = final_dir + "__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    # Ray's write_parquet creates NO directory for a zero-row dataset —
    # an empty crawl window (e.g. horizon < start) must commit an empty
    # dir, not crash on the missing tmp path
    os.makedirs(tmp, exist_ok=True)
    import pyarrow.dataset as pads

    rows = pads.dataset(tmp).count_rows()
    if keep_existing_if_empty and rows == 0 and os.path.isdir(final_dir):
        existing = pads.dataset(final_dir).count_rows()
        if existing > 0:
            shutil.rmtree(tmp, ignore_errors=True)
            return existing
    os.makedirs(os.path.dirname(final_dir) or ".", exist_ok=True)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp, final_dir)
    return rows
