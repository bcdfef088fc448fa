"""Pyramidal Lucas-Kanade optical flow (jitted, batched).

The reference computes im->im_next flow with an external RAFT-kitti
checkpoint (scripts/cal_flow.py, component #15). RAFT remains the
recommended pluggable estimator for full-fidelity GT occlusion filtering;
this module provides a self-contained JAX fallback so the offline pipeline
runs end-to-end with zero external model dependencies: classic
coarse-to-fine Lucas-Kanade with iterative warping — fully vectorized,
one jit for the whole pyramid.

Usage: ``stages.compute_flow(out_dir, idx, flow_estimator=lk_flow)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _to_gray(im: jnp.ndarray) -> jnp.ndarray:
    if im.ndim == 3 and im.shape[-1] == 3:
        return im @ jnp.asarray([0.299, 0.587, 0.114], im.dtype)
    return im[..., 0] if im.ndim == 3 else im


def _avgpool2(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape
    x = x[: h - h % 2, : w - w % 2]
    return x.reshape(h // 2, 2, w // 2, 2).mean((1, 3))


def _box(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Box filter via separable cumulative sums (window 2r+1, edge pad)."""
    k = 2 * r + 1
    pad = jnp.pad(x, ((r, r), (r, r)), mode="edge")
    c = jnp.cumsum(pad, axis=0)
    c = jnp.concatenate([c[k - 1: k], c[k:] - c[: -k]], axis=0)
    c2 = jnp.cumsum(c, axis=1)
    out = jnp.concatenate([c2[:, k - 1: k], c2[:, k:] - c2[:, : -k]], axis=1)
    return out / (k * k)


def _warp(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    h, w = im.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=im.dtype),
                          jnp.arange(w, dtype=im.dtype), indexing="ij")
    xs = jnp.clip(xx + flow[..., 0], 0, w - 1)
    ys = jnp.clip(yy + flow[..., 1], 0, h - 1)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = xs - x0
    fy = ys - y0
    v00 = im[y0, x0]
    v01 = im[y0, x1]
    v10 = im[y1, x0]
    v11 = im[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _lk_level(i1, i2, flow, radius: int, iters: int, reg: float = 1e-6):
    gy, gx = jnp.gradient(i1)

    def body(flow, _):
        w2 = _warp(i2, flow)
        it = w2 - i1
        # Tikhonov-regularized 2x2 normal equations (keeps low-texture
        # regions stable without a hard determinant gate)
        ixx = _box(gx * gx, radius) + reg
        iyy = _box(gy * gy, radius) + reg
        ixy = _box(gx * gy, radius)
        ixt = _box(gx * it, radius)
        iyt = _box(gy * it, radius)
        det = ixx * iyy - ixy * ixy
        inv_det = 1.0 / det
        du = -(iyy * ixt - ixy * iyt) * inv_det
        dv = -(ixx * iyt - ixy * ixt) * inv_det
        upd = jnp.stack([du, dv], -1)
        upd = jnp.clip(upd, -radius, radius)
        return flow + upd, None

    flow, _ = jax.lax.scan(body, flow, None, length=iters)
    return flow


@functools.partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def _lk_pyramid(g1, g2, levels: int, radius: int, iters: int):
    pyr1 = [g1]
    pyr2 = [g2]
    for _ in range(levels - 1):
        pyr1.append(_avgpool2(pyr1[-1]))
        pyr2.append(_avgpool2(pyr2[-1]))
    flow = jnp.zeros((*pyr1[-1].shape, 2), g1.dtype)
    for lvl in range(levels - 1, -1, -1):
        if lvl < levels - 1:
            th, tw = pyr1[lvl].shape
            flow = (
                jax.image.resize(flow, (th, tw, 2), "bilinear") * 2.0
            )
        flow = _lk_level(pyr1[lvl], pyr2[lvl], flow, radius, iters)
    return flow


def lk_flow(im1: np.ndarray, im2: np.ndarray, levels: int = 4,
            radius: int = 7, iters: int = 3) -> np.ndarray:
    """Estimate per-pixel flow im1 -> im2. Accepts HxWx3 uint8/float or
    HxW gray; returns [H, W, 2] float32 (dx, dy)."""
    g1 = _to_gray(jnp.asarray(im1, jnp.float32) / 255.0)
    g2 = _to_gray(jnp.asarray(im2, jnp.float32) / 255.0)
    return np.asarray(_lk_pyramid(g1, g2, levels, radius, iters),
                      np.float32)
