"""Bicubic x2 upsampling with PyTorch semantics, as an XLA-friendly op.

The reference decoder upsamples every stage with
``nn.Upsample(scale_factor=2, mode='bicubic')`` (align_corners=False,
/root/reference/src/utils/utils.py:241). PyTorch's bicubic uses the
Catmull-Rom-style cubic convolution kernel with a = -0.75 and border
replication; ``jax.image.resize`` uses a = -0.5 ("Keys") and reflect-style
edges, which differs enough to break weight round-trip parity.

For an exact x2 scale with align_corners=False the source coordinate of
output pixel ``o`` is ``(o + 0.5)/2 - 0.5``, so there are exactly two filter
phases with static 4-tap weights:

  even outputs (o=2k): taps (k-2, k-1, k, k+1), weights W(1.75),W(0.75),W(0.25),W(1.25)
  odd  outputs (o=2k+1): taps (k-1, k, k+1, k+2), weights W(1.25),W(0.25),W(0.75),W(1.75)

with W the a=-0.75 cubic kernel. We implement the resize separably as four
shifted adds per axis on edge-clamped slices — pure elementwise VPU work
that XLA fuses with the surrounding decoder convs; no gathers, no dynamic
shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _cubic_w(x: float, a: float = -0.75) -> float:
    x = abs(x)
    if x <= 1.0:
        return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0
    if x < 2.0:
        return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a
    return 0.0


# Static per-phase weights (sum to 1 exactly in float64).
_W_EVEN = np.array([_cubic_w(1.75), _cubic_w(0.75), _cubic_w(0.25),
                    _cubic_w(1.25)], dtype=np.float64)
_W_ODD = _W_EVEN[::-1].copy()
# Tap offsets relative to k for each phase.
_OFF_EVEN = (-2, -1, 0, 1)
_OFF_ODD = (-1, 0, 1, 2)


def _shifted(x: jnp.ndarray, axis: int, off: int) -> jnp.ndarray:
    """x indexed at clip(k + off, 0, n-1) along ``axis`` — implemented with
    static slices + edge padding so XLA sees only pads/concats."""
    n = x.shape[axis]
    if off == 0:
        return x
    idx = [slice(None)] * x.ndim
    if off > 0:
        # drop first `off`, replicate last element `off` times
        idx[axis] = slice(off, n)
        body = x[tuple(idx)]
        idx[axis] = slice(n - 1, n)
        edge = x[tuple(idx)]
        reps = [1] * x.ndim
        reps[axis] = off
        return jnp.concatenate([body, jnp.tile(edge, reps)], axis=axis)
    off = -off
    idx[axis] = slice(0, n - off)
    body = x[tuple(idx)]
    idx[axis] = slice(0, 1)
    edge = x[tuple(idx)]
    reps = [1] * x.ndim
    reps[axis] = off
    return jnp.concatenate([jnp.tile(edge, reps), body], axis=axis)


def _upsample_axis_x2(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Doubles ``axis`` with the two-phase cubic filter."""
    dtype = x.dtype
    w_even = _W_EVEN.astype(np.float32)
    w_odd = _W_ODD.astype(np.float32)
    xf = x.astype(jnp.float32)
    even = sum(w_even[i] * _shifted(xf, axis, _OFF_EVEN[i]) for i in range(4))
    odd = sum(w_odd[i] * _shifted(xf, axis, _OFF_ODD[i]) for i in range(4))
    # Interleave even/odd along a new minor axis then collapse.
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape).astype(dtype)


def upsample_bicubic_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Bicubic x2 upsample over the two spatial axes of an NHWC (or HWC/HW)
    array, matching ``torch.nn.Upsample(scale_factor=2, mode='bicubic',
    align_corners=False)`` to float tolerance.

    Args:
      x: [..., H, W, C] (channels-last; the two axes doubled are -3 and -2)
         or [H, W] when 2-D.
    """
    if x.ndim == 2:
        return _upsample_axis_x2(_upsample_axis_x2(x, 0), 1)
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    return _upsample_axis_x2(_upsample_axis_x2(x, h_axis), w_axis)
