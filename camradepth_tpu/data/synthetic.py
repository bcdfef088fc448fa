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


def _scene(rng, h, w, n_objects: int = 14):
    """A LEARNABLE synthetic scene: layered rectangles whose image
    appearance encodes their depth (closer = brighter, class-tinted),
    so a depth net can genuinely fit image -> depth. Returns
    (img_u8 [H,W,3], depth [H,W] metres, cls [H,W] int64, flow [H,W,2])
    with flow ~ parallax = k / depth (what RAFT-derived uv channels
    look like on real drives)."""
    # background: a ground-plane-ish vertical depth ramp, far at the top
    ramp = np.linspace(90.0, 25.0, h, dtype=np.float32)[:, None]
    depth = np.broadcast_to(ramp, (h, w)).copy()
    cls = np.zeros((h, w), np.int64)
    # paint far -> near so nearer objects occlude
    ds = np.sort(rng.uniform(3.0, 70.0, n_objects))[::-1]
    for d in ds:
        scale = np.clip(18.0 / (d + 6.0), 0.06, 0.9)
        oh = max(2, int(h * scale * rng.uniform(0.5, 1.0)))
        ow = max(2, int(w * scale * rng.uniform(0.5, 1.5)))
        y0 = int(rng.uniform(0, max(1, h - oh)))
        x0 = int(rng.uniform(0, max(1, w - ow)))
        depth[y0:y0 + oh, x0:x0 + ow] = d
        # class identity correlates with depth band (20 fg classes)
        cls[y0:y0 + oh, x0:x0 + ow] = 1 + min(19, int(d / 3.6))
    # appearance: brightness is a deterministic function of depth,
    # hue of class — the invertible signal the net can learn
    bright = 235.0 * (4.0 / (4.0 + depth))  # near ~220, far ~10
    tint = (cls[..., None] * np.array([37, 73, 11])) % 64
    img = np.clip(
        bright[..., None] + tint + rng.normal(0, 4.0, (h, w, 3)), 0, 255
    ).astype(np.uint8)
    flow = np.stack(
        [36.0 / depth + rng.normal(0, 0.02, (h, w)).astype(np.float32),
         9.0 / depth + rng.normal(0, 0.02, (h, w)).astype(np.float32)],
        axis=-1,
    ).astype(np.float32)
    return img, depth, cls, flow


def generate(
    out_dir: str | Path,
    num_frames: int = 8,
    hw=(416, 800),
    seed: int = 0,
    rain_every: int = 4,
    scene: bool = False,
) -> Path:
    """Create artifacts + ``synthetic_split.npy``; returns the split path.

    ``scene=False`` (unit-test default) fills every artifact with
    contract-shaped noise. ``scene=True`` renders layered-rectangle
    scenes where image appearance deterministically encodes depth —
    radar/lidar/flow/seg all sampled from ONE consistent world — so
    real training runs on this data have a learnable objective and a
    meaningful loss curve (used by the round-4 on-TPU product-loop
    evidence: train -> test -> distill)."""
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

        if scene:
            img, scene_depth, scene_cls, scene_flow = _scene(rng, h, w)
        else:
            img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        im_path = out_dir / f"{stem}_im.jpg"
        if cv2 is not None:
            cv2.imwrite(str(im_path), img)
        else:  # pragma: no cover
            raise RuntimeError("cv2 required to write synthetic jpgs")

        # GT: semi-dense depth + uv flow channels (H, W, 3).
        gt = np.zeros((h, w, 3), np.float32)
        gt_mask = rng.uniform(size=(h, w)) < 0.25
        if scene:
            gt[..., 0] = np.where(gt_mask, scene_depth, 0.0)
            gt[..., 1:] = scene_flow * gt_mask[..., None]
        else:
            gt[..., 0] = np.where(gt_mask, rng.uniform(1, 120, (h, w)), 0.0)
            gt[..., 1:] = rng.normal(0, 0.1, (h, w, 2)) * gt_mask[..., None]
        np.save(out_dir / f"{stem}_gt.npy", gt)

        # Radar: very sparse depth + uv (H, W, 3).
        radar = np.zeros((h, w, 3), np.float32)
        r_mask = rng.uniform(size=(h, w)) < 1e-3
        if scene:
            radar[..., 0] = np.where(
                r_mask,
                scene_depth + rng.normal(0, 0.5, (h, w)).astype(np.float32),
                0.0,
            )
            radar[..., 1:] = scene_flow * r_mask[..., None]
        else:
            radar[..., 0] = np.where(r_mask, rng.uniform(1, 100, (h, w)), 0.0)
            radar[..., 1:] = rng.normal(0, 0.1, (h, w, 2)) * r_mask[..., None]
        np.save(out_dir / f"{stem}_radar.npy", radar)
        np.save(out_dir / f"{stem}_radar_filtered.npy",
                radar[..., 0] * (rng.uniform(size=(h, w)) < 0.5))
        np.save(out_dir / f"{stem}_rad_vel.npy",
                (r_mask & (rng.uniform(size=(h, w)) < 0.3)).astype(np.float32))

        # Seg labels: 21 classes + scattered 255 ignore.
        if scene:
            seg = scene_cls.copy()
        else:
            seg = rng.integers(0, 21, (h, w)).astype(np.int64)
        seg[rng.uniform(size=(h, w)) < 0.05] = 255
        np.save(out_dir / f"{stem}_mseg.npy", seg)

        np.save(
            out_dir / f"{stem}_im_uv.npy",
            scene_flow if scene
            else rng.normal(0, 0.2, (h, w, 2)).astype(np.float32),
        )

        rows.append([str(out_dir / f"{stem}{s}") if s != "_im.jpg"
                     else str(im_path) for s in ARTIFACT_SUFFIXES])

    split_path = out_dir / "synthetic_split.npy"
    save_split(rows, split_path)
    return split_path
