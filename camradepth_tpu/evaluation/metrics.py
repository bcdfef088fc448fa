"""Test-split metric computation.

Re-implements the reference test harness math (runner.py:394-519) as a
jitted, batched computation. CRITICAL parity notes (SURVEY.md defects):

- All depth metrics are computed in *inverse-depth* space: pred/gt are
  ``max_depth * (1 - d/max_depth)`` (runner.py:442-465). MAE/RMSE are
  invariant under the affine flip but REL is relative to (100 - d).
- The second band applies ``gt[gt < max_distances[1]] = 0`` in inverse
  space (runner.py:477), i.e. it *keeps* inverse >= 50 <=> true depth
  <= 50 m.
- Frames with no valid pixels in a band are skipped (NaN here,
  nanmean-aggregated), mirroring the reference's ``continue``.

Additionally provides true-depth-space metrics at configurable caps
(50/70/80 m north-star, BASELINE.md) — computed from the decoded depth.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def _frame_stats(err_abs, err_sq, rel, valid):
    """Per-frame masked means over pixel axes. Returns NaN when empty."""
    n = jnp.sum(valid, axis=(1, 2))
    safe_n = jnp.maximum(n, 1.0)
    mae = jnp.sum(err_abs * valid, axis=(1, 2)) / safe_n
    rmse = jnp.sqrt(jnp.sum(err_sq * valid, axis=(1, 2)) / safe_n)
    rel_m = jnp.sum(rel * valid, axis=(1, 2)) / safe_n
    nan = jnp.float32(jnp.nan)
    empty = n == 0
    return (
        jnp.where(empty, nan, mae),
        jnp.where(empty, nan, rmse),
        jnp.where(empty, nan, rel_m),
        n,
    )


def depth_metrics_inverse(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    max_depth: float = 100.0,
    max_distances: Sequence[float] = (100.0, 50.0),
) -> Dict[str, jnp.ndarray]:
    """Reference-parity metrics in inverse space.

    Args:
      pred: [B, H, W] network output in [0, 1] (clipped here).
      gt:   [B, H, W] inverse-encoded GT in [0, 1], 0 = invalid.
    Returns per-frame arrays [B] for each band: mae_k/rmse_k/rel_k with the
    band cap in the key, NaN for empty frames.
    """
    pred_m = jnp.clip(pred, 0.0, 1.0) * max_depth
    gt_m = gt * max_depth

    out: Dict[str, jnp.ndarray] = {}
    # Band 0: drop gt above cap0 (no-op at cap 100), keep valid.
    gt0 = jnp.where(gt_m > max_distances[0], 0.0, gt_m)
    valid = (gt0 > 0).astype(jnp.float32)
    err = pred_m - gt0
    rel = jnp.abs(err) / jnp.where(gt0 > 0, gt0, 1.0)
    mae, rmse, relm, n = _frame_stats(jnp.abs(err), err * err, rel, valid)
    cap0 = int(max_distances[0])
    out[f"mae_{cap0}"] = mae
    out[f"rmse_{cap0}"] = rmse
    out[f"rel_{cap0}"] = relm
    out[f"n_{cap0}"] = n

    # Band 1: additionally zero gt below cap1 IN INVERSE SPACE.
    gt1 = jnp.where(gt0 < max_distances[1], 0.0, gt0)
    valid1 = (gt1 > 0).astype(jnp.float32)
    err1 = pred_m - gt1
    rel1 = jnp.abs(err1) / jnp.where(gt1 > 0, gt1, 1.0)
    mae, rmse, relm, n = _frame_stats(
        jnp.abs(err1), err1 * err1, rel1, valid1
    )
    cap1 = int(max_distances[1])
    out[f"mae_{cap1}"] = mae
    out[f"rmse_{cap1}"] = rmse
    out[f"rel_{cap1}"] = relm
    out[f"n_{cap1}"] = n
    return out


def depth_metrics_true(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    max_depth: float = 100.0,
    caps: Sequence[float] = (50.0, 70.0, 80.0),
) -> Dict[str, jnp.ndarray]:
    """True-depth-space metrics at distance caps (north-star extension):
    decode d = max_depth - inv, evaluate |pred_d - gt_d| on valid pixels
    with gt_d <= cap."""
    pred_inv = jnp.clip(pred, 0.0, 1.0) * max_depth
    gt_inv = gt * max_depth
    gt_d = jnp.where(gt_inv > 0, max_depth - gt_inv, 0.0)
    pred_d = max_depth - pred_inv
    out: Dict[str, jnp.ndarray] = {}
    for cap in caps:
        valid = ((gt_d > 0) & (gt_d <= cap)).astype(jnp.float32)
        err = pred_d - gt_d
        rel = jnp.abs(err) / jnp.where(gt_d > 0, gt_d, 1.0)
        mae, rmse, relm, n = _frame_stats(
            jnp.abs(err), err * err, rel, valid
        )
        out[f"true_mae_{int(cap)}"] = mae
        out[f"true_rmse_{int(cap)}"] = rmse
        out[f"true_rel_{int(cap)}"] = relm
    return out


def jaccard_index(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Per-frame macro IoU over present classes (torchmetrics JaccardIndex
    with ignore_index, runner.py:433-437).

    Args:
      logits: [B, H, W, num_classes]
      target: [B, H, W] int labels
    Returns [B] mean IoU (NaN if no class present).
    """
    return jaccard_index_labels(
        jnp.argmax(logits, axis=-1), target, num_classes, ignore_index
    )


def jaccard_index_labels(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """:func:`jaccard_index` on already-argmaxed label maps [B, H, W]
    (the StableHLO serving artifact emits labels, not logits)."""
    valid = target != ignore_index
    t = jnp.where(valid, target, 0)

    def one_frame(p, t, v):
        idx = t * num_classes + p
        cm = jnp.zeros((num_classes * num_classes,), jnp.float32).at[idx].add(
            v.astype(jnp.float32).ravel()
        )
        cm = cm.reshape(num_classes, num_classes)
        tp = jnp.diag(cm)
        fp = jnp.sum(cm, axis=0) - tp
        fn = jnp.sum(cm, axis=1) - tp
        denom = tp + fp + fn
        iou = tp / jnp.maximum(denom, 1.0)
        present = denom > 0
        k = jnp.sum(present)
        return jnp.where(
            k > 0,
            jnp.sum(jnp.where(present, iou, 0.0)) / jnp.maximum(k, 1),
            jnp.nan,
        )

    return jax.vmap(
        lambda p, t, v: one_frame(p.ravel(), t.ravel(), v)
    )(pred, t, valid)
