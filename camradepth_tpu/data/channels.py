"""Per-frame channel assembly: artifact arrays -> model feature stack.

Host-side numpy re-implementation of the reference dataset's __getitem__
transforms (/root/reference/src/data/dataloader.py:197-333), producing the
exact tensor contract (values, channel order, quirks included):

  feature[..., 0:3]  image: BGR (cv2 order), /255, ImageNet-normalized with
                     RGB-ordered stats — the reference normalizes cv2's BGR
                     without conversion (dataloader.py:225-232); preserved
                     for weight round-trip parity.
  feature[..., 3:4]  radar inverse... NO: radar depth clip[0,100]/100
                     (dataloader.py:303-310 — *not* inverted, unlike GT)
  feature[..., 4:6]  radar uv flow (normalized camera coords)
  feature[..., 6:7]  radar moving-object mask (rad_vel)

  gt depth: clip[0,100] then inverse-encoded (100-d)/100 on valid pixels
  (dataloader.py:240-245); the 3-level min-pool pyramid is computed
  on-device inside the jitted step (camradepth_tpu.ops.pooling).

Layout is NHWC (channels-last) for TPU convs; the reference is NCHW.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from camradepth_tpu.config import (
    DataConfig,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def normalize_image(image_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC (BGR, cv2 order) -> float32 normalized (quirk preserved:
    RGB-ordered ImageNet stats applied to BGR channels)."""
    x = image_u8.astype(np.float32) / 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (x - mean) / std


def encode_inverse_depth(depth: np.ndarray, max_depth: float = 100.0
                         ) -> np.ndarray:
    """GT depth -> normalized inverse encoding: 0 stays 0 (invalid), valid d
    becomes (max-clip(d))/max (dataloader.py:240-245)."""
    d = np.clip(depth, 0, max_depth)
    out = np.where(d > 0, (max_depth - d) / max_depth, 0.0)
    return out.astype(np.float32)


def decode_inverse_depth(encoded: np.ndarray, max_depth: float = 100.0
                         ) -> np.ndarray:
    """Inverse of :func:`encode_inverse_depth` on valid pixels."""
    return np.where(encoded > 0, max_depth - encoded * max_depth, 0.0)


def resize_order0(img: np.ndarray, shape: tuple) -> np.ndarray:
    """Order-0 (nearest) resize with skimage's coordinate convention
    (resize -> warp: in_coord = (out + 0.5) * in/out - 0.5, then nearest).
    Replaces skimage.transform.resize(..., order=0, preserve_range=True,
    anti_aliasing=False) used for the seg GT (dataloader.py:265-268)."""
    h_in, w_in = img.shape[:2]
    h_out, w_out = shape
    rows = (np.arange(h_out) + 0.5) * (h_in / h_out) - 0.5
    cols = (np.arange(w_out) + 0.5) * (w_in / w_out) - 0.5
    # spline order 0 == round-half-up to the nearest sample, clipped
    ri = np.clip(np.floor(rows + 0.5).astype(np.int64), 0, h_in - 1)
    ci = np.clip(np.floor(cols + 0.5).astype(np.int64), 0, w_in - 1)
    return img[np.ix_(ri, ci)]


def assemble_frame(
    arrays: Dict[str, np.ndarray],
    cfg: DataConfig,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Build one training/eval example from raw artifact arrays.

    Args:
      arrays: {"image": HxWx3 uint8 BGR (already resized to
               cfg.image_dimension), "radar": HxWx3 (depth,u,v),
               "radar_filtered": HxW, "mseg": H'xW int labels,
               "im_uv": HxWx2, "rad_vel": HxW, "gt": HxWx3 (depth,u,v)}
      cfg: DataConfig with the channel flags.
      rng: numpy Generator for the sparse-lidar mask mode.
    Returns:
      {"features": HxWxC float32, "gt_depth": HxW float32 (inverse-encoded),
       "seg": HxW int32, "seg_inter": H/2xW/2 int32}
    """
    h, w = cfg.image_dimension
    feats = [normalize_image(arrays["image"])]

    gt = arrays["gt"]
    gt_depth_raw = gt[..., 0]
    gt_depth = encode_inverse_depth(gt_depth_raw, cfg.max_depth)

    if cfg.sparse_lidar:
        # Randomly sparsified lidar as input (dataloader.py:273-289).
        rng = rng or np.random.default_rng()
        mask = rng.choice([0, 1], size=gt_depth_raw.shape, p=cfg.lidar_ratio)
        sparse = np.clip(gt_depth_raw * mask, 0, 100.0) / 100.0
        feats.append(sparse[..., None].astype(np.float32))
        if cfg.sparse_depth_uv:
            feats.append((gt[..., 1:3] * mask[..., None]).astype(np.float32))
    elif cfg.filtered_radar:
        filt = np.clip(arrays["radar_filtered"], 0, 100.0) / 100.0
        feats.append(filt[..., None].astype(np.float32))
    else:
        radar = arrays["radar"]
        rd = np.clip(radar[..., 0], 0, cfg.max_depth) / cfg.max_depth
        feats.append(rd[..., None].astype(np.float32))
        if cfg.sparse_depth_uv:
            feats.append(radar[..., 1:3].astype(np.float32))
        if cfg.rad_vel:
            feats.append(arrays["rad_vel"][..., None].astype(np.float32))
        if cfg.im_uv:
            feats.append(arrays["im_uv"].astype(np.float32))

    features = np.concatenate(feats, axis=-1)

    mseg = arrays["mseg"][: h, :]
    seg = resize_order0(mseg, (h, w)).astype(np.int32)
    seg_inter = resize_order0(mseg, (h // 2, w // 2)).astype(np.int32)

    return {
        "features": features.astype(np.float32),
        "gt_depth": gt_depth,
        "seg": seg,
        "seg_inter": seg_inter,
    }
