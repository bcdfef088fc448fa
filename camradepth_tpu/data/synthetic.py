"""Synthetic nuScenes-like artifact generator.

Writes a miniature ``prepared_data/`` directory with the reference's
per-frame artifact contract (%05d_im.jpg, _radar.npy, _radar_filtered.npy,
_mseg.npy, _im_uv.npy, _rad_vel.npy, _gt.npy — SURVEY.md §3.4) plus a split
table, so the data pipeline, trainer and eval harness can be exercised
end-to-end without the nuScenes dataset. Statistics mimic the real data:
sparse radar (~0.1% fill), semi-dense accumulated-lidar GT (~25% fill),
21-class seg labels with 255 ignore.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from camradepth_tpu.data.split import ARTIFACT_SUFFIXES, save_split

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def generate(
    out_dir: str | Path,
    num_frames: int = 8,
    hw=(416, 800),
    seed: int = 0,
    rain_every: int = 4,
) -> Path:
    """Create artifacts + ``synthetic_split.npy``; returns the split path."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    h, w = hw
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(num_frames):
        # "rain" in the filename drives the edge/sunny metric split
        # (runner.py:468-471).
        stem = f"{i:05d}_rain" if rain_every and i % rain_every == rain_every - 1 \
            else f"{i:05d}"

        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        im_path = out_dir / f"{stem}_im.jpg"
        if cv2 is not None:
            cv2.imwrite(str(im_path), img)
        else:  # pragma: no cover
            raise RuntimeError("cv2 required to write synthetic jpgs")

        # GT: semi-dense depth + uv flow channels (H, W, 3).
        gt = np.zeros((h, w, 3), np.float32)
        gt_mask = rng.uniform(size=(h, w)) < 0.25
        gt[..., 0] = np.where(gt_mask, rng.uniform(1, 120, (h, w)), 0.0)
        gt[..., 1:] = rng.normal(0, 0.1, (h, w, 2)) * gt_mask[..., None]
        np.save(out_dir / f"{stem}_gt.npy", gt)

        # Radar: very sparse depth + uv (H, W, 3).
        radar = np.zeros((h, w, 3), np.float32)
        r_mask = rng.uniform(size=(h, w)) < 1e-3
        radar[..., 0] = np.where(r_mask, rng.uniform(1, 100, (h, w)), 0.0)
        radar[..., 1:] = rng.normal(0, 0.1, (h, w, 2)) * r_mask[..., None]
        np.save(out_dir / f"{stem}_radar.npy", radar)
        np.save(out_dir / f"{stem}_radar_filtered.npy",
                radar[..., 0] * (rng.uniform(size=(h, w)) < 0.5))
        np.save(out_dir / f"{stem}_rad_vel.npy",
                (r_mask & (rng.uniform(size=(h, w)) < 0.3)).astype(np.float32))

        # Seg labels: 21 classes + scattered 255 ignore.
        seg = rng.integers(0, 21, (h, w)).astype(np.int64)
        seg[rng.uniform(size=(h, w)) < 0.05] = 255
        np.save(out_dir / f"{stem}_mseg.npy", seg)

        np.save(out_dir / f"{stem}_im_uv.npy",
                rng.normal(0, 0.2, (h, w, 2)).astype(np.float32))

        rows.append([str(out_dir / f"{stem}{s}") if s != "_im.jpg"
                     else str(im_path) for s in ARTIFACT_SUFFIXES])

    split_path = out_dir / "synthetic_split.npy"
    save_split(rows, split_path)
    return split_path
