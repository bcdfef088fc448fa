"""Pooling ops: the GT inverse-depth min-pool pyramid.

The reference builds deep-supervision depth targets by min-pooling the
sparse inverse-depth GT with a 0->255 sentinel so empty pixels are ignored
(/root/reference/src/data/dataloader.py:213-222: ``x[x==0]=255; x=-maxpool3x3s2p1(-x);
x[x==255]=0``). Here the same contract is a single ``lax.reduce_window`` min
with +inf padding — one fused VPU pass, batchable on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = 255.0


def minpool_sparse(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 min-pool treating 0 as "no data".

    Args:
      x: [..., H, W] sparse map with 0 = invalid; valid values must be
         < 255 (normalized inverse depth lies in (0, 1]).
    Returns:
      [..., ceil(H/2), ceil(W/2)] min-pooled map with 0 where the window had
      no valid pixel.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    filled = jnp.where(xf == 0, _SENTINEL, xf)
    window = (1,) * (x.ndim - 2) + (3, 3)
    strides = (1,) * (x.ndim - 2) + (2, 2)
    padding = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    pooled = jax.lax.reduce_window(
        filled, jnp.inf, jax.lax.min, window, strides, padding
    )
    return jnp.where(pooled == _SENTINEL, 0.0, pooled).astype(orig_dtype)


def minpool_pyramid(x: jnp.ndarray, levels: int = 3) -> tuple:
    """The 3-level deep-supervision pyramid (dataloader.py:255-257).

    Returns maps at 1/2, 1/4, 1/8 resolution (reference naming: stage_3,
    stage_2, stage_1 targets — consumed as gt for the 208x400 and 104x200
    intermediate depth heads)."""
    out = []
    cur = x
    for _ in range(levels):
        cur = minpool_sparse(cur)
        out.append(cur)
    return tuple(out)
