"""Sink surface: file writers with DataX writeMode parity.

Reference semantics (SURVEY.md §2.4):

- **txtfilewriter / hdfswriter writeMode** ``truncate | append | nonConflict``
  (``/root/reference/txtfilewriter/.../TxtFileWriter.java:94-192``;
  ``hdfswriter/.../HdfsWriter.java:149-187``): truncate clears the target
  dir, append adds new files under a unique prefix, nonConflict errors if
  anything is already there.
- The exactly-once **two-phase** lake sink (staging + manifest) lives in
  ``manifest.py``/``merge.py`` — this module is the simpler file-drop
  surface for CSV/JSON/Parquet exports.
"""

from __future__ import annotations

import glob
import os
import shutil


class WriteModeError(RuntimeError):
    pass


def _prepare_dir(path: str, write_mode: str) -> None:
    os.makedirs(path, exist_ok=True)
    existing = [p for p in glob.glob(os.path.join(path, "*")) if not p.endswith(".tmp")]
    if write_mode == "truncate":
        for p in existing:
            if os.path.isdir(p):
                shutil.rmtree(p)
            else:
                os.remove(p)
    elif write_mode == "nonConflict":
        if existing:
            raise WriteModeError(
                f"nonConflict: target {path} already contains {len(existing)} entries"
            )
    elif write_mode != "append":
        raise ValueError(f"unknown writeMode {write_mode!r}")


def write_files(
    ds,
    path: str,
    fmt: str = "parquet",
    write_mode: str = "append",
    **kwargs,
) -> str:
    """Write a Dataset to a directory of files with DataX writeMode
    semantics.  Returns the output dir."""
    _prepare_dir(path, write_mode)
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "csv":
        ds.write_csv(path, **kwargs)
    elif fmt == "json":
        ds.write_json(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return path
