"""Split-file handling: the N x 7 artifact-path table contract.

The reference persists a numpy array of shape (N, 7) with per-frame relative
paths ordered [im.jpg, radar.npy, radar_filtered.npy, mseg.npy, im_uv.npy,
rad_vel.npy, gt.npy] (dataloader.py:64-96, scripts/create_a_split_file.py).
We read/write the identical format so reference-prepared data is
interchangeable.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import List, Sequence

import numpy as np

ARTIFACT_SUFFIXES = (
    "_im.jpg",
    "_radar.npy",
    "_radar_filtered.npy",
    "_mseg.npy",
    "_im_uv.npy",
    "_rad_vel.npy",
    "_gt.npy",
)


def load_split(path: str | Path) -> np.ndarray:
    """Load an (N, 7) path table (dataloader.py:52-61)."""
    files = np.load(Path(path), allow_pickle=True)
    if files.ndim != 2 or files.shape[1] != len(ARTIFACT_SUFFIXES):
        raise ValueError(
            f"split file {path} has shape {files.shape}, expected (N, 7)"
        )
    return files


def save_split(rows: Sequence[Sequence[str]], path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.array([list(r) for r in rows])
    if arr.ndim != 2 or arr.shape[1] != len(ARTIFACT_SUFFIXES):
        raise ValueError(f"rows must be (N, 7), got {arr.shape}")
    np.save(path, arr)
    return path if path.suffix == ".npy" else path.with_suffix(path.suffix + ".npy")


def build_split_from_dir(dir_data: str | Path) -> np.ndarray:
    """Glob the 7 artifact types and zip sorted lists into the (N, 7) table
    (create_a_split_file.py:40-67 / dataloader.py:128-150). Raises if the
    per-type counts disagree."""
    dir_data = str(dir_data)
    if not dir_data.endswith(os.sep):
        dir_data += os.sep
    lists: List[List[str]] = []
    for suffix in ARTIFACT_SUFFIXES:
        found = sorted(glob.glob(dir_data + "*" + suffix))
        lists.append(found)
    counts = {s: len(l) for s, l in zip(ARTIFACT_SUFFIXES, lists)}
    n = counts[ARTIFACT_SUFFIXES[0]]
    if n == 0:
        raise FileNotFoundError(f"no '*_im.jpg' artifacts under {dir_data}")
    missing = {s: c for s, c in counts.items() if c < n}
    if missing:
        raise ValueError(
            f"artifact count mismatch: {n} images but {missing}"
        )
    return np.array(list(zip(*[l[:n] for l in lists])))


def rebase_split(split: np.ndarray, new_dir: str | Path) -> np.ndarray:
    """Rewrite the directory component of every path (reference
    create_new_split_file, dataloader.py:101-123)."""
    new_dir = Path(new_dir)
    return np.array(
        [[str(new_dir / Path(p).name) for p in row] for row in split]
    )


def split_ranges(n_total: int, train_val: Sequence[int]):
    """Index ranges for train/val/test given the (train, val) sizes; test is
    the remainder (dataloader.py:36-46, args.py:137)."""
    tr, va = train_val
    return (
        range(0, tr),
        range(tr, tr + va),
        range(tr + va, n_total),
    )
