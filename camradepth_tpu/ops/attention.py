"""Softmax-free "max-pool attention" core (DEST / Simplified attention).

The reference op (/root/reference/src/models/simplified_attention.py:90-108)
computes, for tokens x in [B, C, N] with spatially-reduced keys in [B, C, M]:

    q = W_q x                         # per-token 1x1 conv
    k = W_k x_sr                      # keys from the sr-conv+GN path
    attn[b,h,n] = max_m (q_bhn . k_bhm) * d^-0.5
    v[b,h,:]    = mean_n x[b,:,n]     # ONE global token, identical per head
    out[b,:,n]  = W_p (sum_h attn[b,h,n]) * v[b,:]

Because v is a single mean vector shared across heads, the pre-projection
output is rank-1: an outer product of the per-token head-summed max score
s[b,n] with the channel mean vbar[b,c]. We exploit that algebraic structure
directly — the [B,h,N,M] score tensor reduces to s:[B,N] on the fly and the
O(N*C) value matmul disappears entirely.

This module holds the plain-XLA implementation; the fused Pallas kernel
lives in :mod:`camradepth_tpu.ops.attention_pallas` and computes the same
``maxpool_attention_scores`` contract blockwise without materializing
scores in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _scores_and_argmax(q, k, num_heads: int, scale: float):
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    qh = q.reshape(b, n, num_heads, d)
    kh = k.reshape(b, m, num_heads, d)
    # [B, h, N, M] scores; M is small (N / sr^2), XLA keeps this tile-local.
    # precision=HIGHEST keeps fp32 inputs at full MXU precision (bf16 inputs
    # are unaffected); without it the TPU MXU truncates fp32 -> bf16.
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", qh, kh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    smax = jnp.max(scores * jnp.float32(scale), axis=-1)  # [B, h, N]
    amax = jnp.argmax(scores, axis=-1)  # [B, h, N]
    return jnp.sum(smax, axis=1), amax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def maxpool_attention_scores(
    q: jnp.ndarray, k: jnp.ndarray, num_heads: int, scale: float
) -> jnp.ndarray:
    """Head-summed max-pooled attention scores.

    Args:
      q: [B, N, C] query tokens (already projected).
      k: [B, M, C] key tokens (already projected).
      num_heads: head count h; C must be divisible by h.
      scale: score scale, reference uses (C/h) ** -0.5.
    Returns:
      s: [B, N] with s[b,n] = sum_h max_m <q_bnh, k_bmh> * scale.

    custom_vjp: autodiff of the max would keep the [B,h,N,M] score tensor
    as a residual (216 MB fp32 for stage 1 at 416x800) — instead only the
    argmax indices are saved and the backward is a pure gather for dq and
    a scatter-add for dk, with no NxM tensor in either direction.
    """
    s, _ = _scores_and_argmax(q, k, num_heads, scale)
    return s


def _scores_fwd(q, k, num_heads, scale):
    s, amax = _scores_and_argmax(q, k, num_heads, scale)
    return s, (q, k, amax)


def _scores_bwd(num_heads, scale, res, g):
    q, k, amax = res
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    qh = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)  # [B,h,N,d]
    kh = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)  # [B,h,M,d]
    gs = (g[:, None, :] * jnp.float32(scale)).astype(jnp.float32)  # [B,h,N]
    # dq[b,h,n,:] = gs[b,h,n] * k[b,h,amax[b,h,n],:]  (gather)
    k_sel = jnp.take_along_axis(kh, amax[..., None], axis=2)  # [B,h,N,d]
    dq = (gs[..., None] * k_sel).transpose(0, 2, 1, 3).reshape(b, n, c)
    # dk[b,h,m,:] = sum_{n: amax=m} gs[b,h,n] * q[b,h,n,:]  (scatter-add)
    contrib = gs[..., None] * qh.astype(jnp.float32)  # [B,h,N,d]
    dk = jnp.zeros((b, num_heads, m, d), jnp.float32)
    bidx = jnp.arange(b)[:, None, None]
    hidx = jnp.arange(num_heads)[None, :, None]
    dk = dk.at[bidx, hidx, amax].add(contrib)
    dk = dk.transpose(0, 2, 1, 3).reshape(b, m, c)
    return dq.astype(q.dtype), dk.astype(k.dtype)


maxpool_attention_scores.defvjp(_scores_fwd, _scores_bwd)


def maxpool_attention(
    x: jnp.ndarray,
    q: jnp.ndarray,
    k: jnp.ndarray,
    num_heads: int,
    scale: float,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Full pre-projection attention output (rank-1 form).

    Args:
      x: [B, N, C] input tokens (the value path: vbar = mean_n x).
      q: [B, N, C] projected queries.
      k: [B, M, C] projected keys.
    Returns:
      [B, N, C] = s[b,n] * vbar[b,c].
    """
    if use_pallas:
        from camradepth_tpu.ops.attention_pallas import (
            maxpool_attention_scores_pallas,
        )
        s = maxpool_attention_scores_pallas(q, k, num_heads, scale)
    else:
        s = maxpool_attention_scores(q, k, num_heads, scale)
    vbar = jnp.mean(x.astype(jnp.float32), axis=1, keepdims=True)  # [B,1,C]
    return (s[:, :, None] * vbar).astype(x.dtype)
