"""Masked depth/segmentation losses.

JAX re-implementations of /root/reference/src/utils/loss_funcs.py. The
reference masks by boolean indexing (``diff[target > 0]``), which is a
dynamic shape — here every loss is a fixed-shape masked mean
(sum(mask*f)/sum(mask)), identical numerics, jit/pjit friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.sum(mask)
    return jnp.sum(values * mask) / jnp.maximum(denom, 1.0)


def masked_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
                     beta: float = 1.0) -> jnp.ndarray:
    """SmoothL1 over target>0 pixels (loss_funcs.py:77-91; torch default
    beta=1)."""
    mask = (target > 0).astype(jnp.float32)
    diff = jnp.abs(target - pred)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _masked_mean(loss, mask)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE over target>0 pixels (loss_funcs.py:36-46)."""
    mask = (target > 0).astype(jnp.float32)
    return _masked_mean(jnp.square(target - pred), mask)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mask = (target > 0).astype(jnp.float32)
    return _masked_mean(jnp.abs(target - pred), mask)


def masked_rmse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(masked_mse(pred, target))


def masked_huber(pred: jnp.ndarray, target: jnp.ndarray,
                 delta: float = 1.0) -> jnp.ndarray:
    mask = (target > 0).astype(jnp.float32)
    diff = jnp.abs(target - pred)
    loss = jnp.where(diff < delta, 0.5 * diff * diff,
                     delta * (diff - 0.5 * delta))
    return _masked_mean(loss, mask)


def masked_berhu(pred: jnp.ndarray, target: jnp.ndarray,
                 thresh: float = 0.2) -> jnp.ndarray:
    """Reverse-Huber with data-dependent delta = thresh * max|err| over valid
    pixels (loss_funcs.py:130-154)."""
    mask = target > 0
    diff = jnp.abs(target - pred) * mask
    delta = thresh * jnp.max(diff)
    # Reference's threshold() construction: strict inequalities, and the L1
    # part is ZERO above delta (not clamped) while the L2 part is diff^2/2d
    # above delta and zero below.
    l1_part = jnp.where(diff < delta, diff, 0.0)
    l2_part = jnp.where(
        diff > delta,
        diff * diff / (2.0 * jnp.maximum(delta, 1e-12)),
        0.0,
    )
    return _masked_mean(l1_part + l2_part, mask.astype(jnp.float32))


def masked_focal_ce(logits: jnp.ndarray, target: jnp.ndarray,
                    gamma: float = 2.0, ignore_index: int = 255) -> jnp.ndarray:
    """Focal loss as in the reference (loss_funcs.py:14-34): CE with
    ignore_index=255, mean-reduced FIRST, then the scalar focal transform
    (1-exp(-ce))**gamma * ce — a *scalar* focal weighting, not per-pixel.
    Preserved exactly (SURVEY.md defect note).

    Args:
      logits: [B, H, W, num_classes] (NHWC class-last).
      target: [B, H, W] int labels, 255 = ignore.
    """
    num_classes = logits.shape[-1]
    valid = (target != ignore_index) & (target >= 0) & (target < num_classes)
    safe_t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    ce = _masked_mean(nll, valid.astype(jnp.float32))
    pt = jnp.exp(-ce)
    return (1.0 - pt) ** gamma * ce


def smoothness_loss(pred_depth: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware smoothness (loss_funcs.py:157-179). NHWC:
    pred_depth [B,H,W,1], image [B,H,W,C]."""
    image = image.astype(jnp.float32)
    depth_mean = jnp.mean(pred_depth, axis=(1, 2), keepdims=True)
    d = pred_depth / (depth_mean + 1e-7)
    gdx = jnp.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
    gdy = jnp.abs(d[:, :-1, :, :] - d[:, 1:, :, :])
    gix = jnp.mean(jnp.abs(image[:, :, :-1, :] - image[:, :, 1:, :]), -1,
                   keepdims=True)
    giy = jnp.mean(jnp.abs(image[:, :-1, :, :] - image[:, 1:, :, :]), -1,
                   keepdims=True)
    gdx = gdx * jnp.exp(-gix)
    gdy = gdy * jnp.exp(-giy)
    return jnp.mean(gdx) + jnp.mean(gdy)


def multitask_loss(pred: dict, gt: dict, cfg) -> tuple[jnp.ndarray, dict]:
    """Deep-supervised multi-task objective (runner.py:197-215).

    weights [1,1,1,0.2,0.2] over [depth_final, depth_stage4, depth_stage3,
    seg_final, seg_inter], normalized by their sum.

    Args:
      pred: model output dict (NHWC).
      gt: {"depth": [B,H,W], "depth_stage4": [B,H/2,W/2],
           "depth_stage3": [B,H/4,W/4], "seg": [B,H,W] int,
           "seg_inter": [B,H/2,W/2] int}
      cfg: ExperimentConfig.
    """
    w = cfg.train.loss_weights
    depth_final = pred["depth"]["final_depth"][..., 0]
    inter = pred["depth"]["intermediate_depths"]
    d4, d3 = inter[3][..., 0], inter[2][..., 0]

    l_final = masked_smooth_l1(depth_final, gt["depth"])
    l_d4 = masked_smooth_l1(d4, gt["depth_stage4"])
    l_d3 = masked_smooth_l1(d3, gt["depth_stage3"])

    sup = 1.0 if cfg.model.supervised_seg else 0.0
    if cfg.model.supervised_seg and pred["seg"]["final_seg"] is not None:
        l_seg = masked_focal_ce(pred["seg"]["final_seg"], gt["seg"]) * sup
        # Reference-exact default: the reference model always returns
        # intermediate_seg=None (CamRaDepth.py:171), so its loss_seg_inter
        # is 0 in every run (runner.py:198) — w[4] only inflates the
        # denominator. cfg.train.seg_inter_loss=True enables the real
        # stage-4 supervision our model's logits make possible.
        l_seg_i = (
            masked_focal_ce(pred["seg"]["intermediate_seg"], gt["seg_inter"])
            * sup
            if cfg.train.seg_inter_loss
            and pred["seg"]["intermediate_seg"] is not None
            else jnp.float32(0.0)
        )
    else:
        l_seg = jnp.float32(0.0)
        l_seg_i = jnp.float32(0.0)

    total = (
        w[0] * l_final + w[1] * l_d4 + w[2] * l_d3 + w[3] * l_seg + w[4] * l_seg_i
    ) / sum(w)
    rmse = jnp.sqrt(masked_mse(depth_final, gt["depth"])) * cfg.data.max_depth
    metrics = {
        "loss": total,
        "loss_depth_final": l_final,
        "loss_depth_stage4": l_d4,
        "loss_depth_stage3": l_d3,
        "loss_seg_final": l_seg,
        "loss_seg_inter": l_seg_i,
        "rmse_m": rmse,
    }
    return total, metrics
