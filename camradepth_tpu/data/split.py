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


def validate_split(
    rows: np.ndarray,
    image_dimension: Sequence[int] = (416, 800),
    limit: int = 0,
    decode_images: bool = True,
) -> dict:
    """Check a split table's artifacts against the contract the loader
    assumes (data/channels.py assemble_frame docstring; reference
    dataloader.py:225-289). The reference builds the table by zipping
    independently-globbed sorted lists (create_a_split_file.py:40-67),
    so a single missing artifact silently SHIFTS every later row's
    columns — exactly the failure mode the per-row stem check catches.

    Per row: all 7 files exist; the 7 basenames share one frame stem;
    each .npy loads (mmap) with the expected rank/shape/dtype family;
    gt depth is non-negative; the image decodes to (H, W, 3) uint8.

    Returns {"checked": n, "ok": bool, "errors": [(row, message), ...]}
    (errors capped at 50). ``limit``: check only the first N rows
    (0 = all). ``decode_images=False`` skips the jpg decode for speed.
    """
    h, w = image_dimension
    errors: List[tuple] = []
    n = len(rows) if limit <= 0 else min(limit, len(rows))

    def err(i, msg):
        if len(errors) < 50:
            errors.append((i, msg))

    # (column, expected ndim, trailing-channel count or None, dtype kind)
    npy_specs = {
        1: ("_radar.npy", 3, 3, "f"),
        2: ("_radar_filtered.npy", 2, None, "f"),
        3: ("_mseg.npy", 2, None, "iu"),
        4: ("_im_uv.npy", 3, 2, "f"),
        5: ("_rad_vel.npy", 2, None, "f"),
        6: ("_gt.npy", 3, 3, "f"),
    }
    for i in range(n):
        row = rows[i]
        stems = set()
        missing = False
        for c, p in enumerate(row):
            p = str(p)
            name = os.path.basename(p)
            suffix = ARTIFACT_SUFFIXES[c]
            if not name.endswith(suffix):
                err(i, f"col {c}: {name!r} does not end with {suffix!r}")
            else:
                stems.add(name[: -len(suffix)])
            if not os.path.exists(p):
                err(i, f"col {c}: missing file {p}")
                missing = True
        if len(stems) > 1:
            err(i, f"misaligned row: frame stems differ {sorted(stems)} "
                   "(a missing artifact shifted the sorted-glob zip)")
        if missing:
            continue
        for c, (suffix, ndim, ch, kind) in npy_specs.items():
            try:
                a = np.load(str(row[c]), mmap_mode="r")
            except Exception as e:
                err(i, f"col {c} ({suffix}): unreadable — {e}")
                continue
            if a.ndim != ndim or (ch and a.shape[-1] != ch):
                err(i, f"col {c} ({suffix}): shape {a.shape}, expected "
                       f"ndim {ndim}" + (f" x{ch}ch" if ch else ""))
                continue
            if a.dtype.kind not in kind:
                err(i, f"col {c} ({suffix}): dtype {a.dtype}, expected "
                       f"kind in {kind!r}")
                continue
            if c != 3 and a.shape[:2] != (h, w):
                err(i, f"col {c} ({suffix}): spatial {a.shape[:2]}, "
                       f"expected {(h, w)}")
            if c == 3 and a.shape[1] != w:
                # mseg may be taller (loader crops rows to h) but the
                # width must match
                err(i, f"col 3 (_mseg.npy): width {a.shape[1]} != {w}")
            if c == 6 and float(a[..., 0].min()) < 0:
                err(i, "col 6 (_gt.npy): negative depth values")
        if decode_images:
            try:
                import cv2

                img = cv2.imread(str(row[0]))
                if img is None:
                    err(i, f"col 0: cv2 cannot decode {row[0]}")
                elif img.shape[2] != 3:
                    err(i, f"col 0: image shape {img.shape}")
            except ImportError:
                pass
    return {"checked": n, "ok": not errors, "errors": errors}


def split_ranges(n_total: int, train_val: Sequence[int]):
    """Index ranges for train/val/test given the (train, val) sizes; test is
    the remainder (dataloader.py:36-46, args.py:137)."""
    tr, va = train_val
    return (
        range(0, tr),
        range(tr, tr + va),
        range(tr + va, n_total),
    )
