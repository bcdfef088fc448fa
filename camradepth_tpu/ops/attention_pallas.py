"""Fused Pallas TPU kernel for max-pool attention scores.

Computes s[b,n] = sum_h max_m <q_bnh, k_bmh> * scale (the contract of
camradepth_tpu.ops.attention.maxpool_attention_scores) without ever
materializing the [B, h, N, M] score tensor in HBM: each grid step streams a
[BN, d] query tile through the MXU against the head's key block and reduces
the [BN, M] scores to a running per-token max in VMEM.

At the flagship resolution (416x800) stage 1 has N=20,800 tokens and M=325
keys — the reference materializes B*h*N*M scores (~27 MB/frame/head fp32)
through global memory (simplified_attention.py:104-105); here the score
tile never leaves VMEM.

Grid layout: (B, N/BN, h) with heads innermost so the [1, BN] output block
stays resident in VMEM across the head accumulation. The head dim d is the
lane axis of q/k blocks; Mosaic zero-pads d to 128 lanes and zeros
contribute nothing to the dot products, while the key-count axis M is
masked explicitly with an iota before the max so block padding can never
win the reduction.

Differentiable via custom_vjp: the backward recomputes scores with the
plain-XLA einsum (flash-style recompute) and routes the cotangent through
argmax — cheap because M is tiny.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camradepth_tpu.ops.attention import maxpool_attention_scores

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, out_ref, *, m_actual: int, scale: float,
            num_heads: int):
    h = pl.program_id(2)
    # q block: [BN, d]; k block: [M_pad, d].
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BN, M_pad]
    m_pad = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < m_actual, scores, _NEG_INF)
    smax = jnp.max(scores * jnp.float32(scale), axis=-1)  # [BN]

    @pl.when(h == 0)
    def _():
        out_ref[0, 0, :] = smax

    @pl.when(h > 0)
    def _():
        out_ref[0, 0, :] = out_ref[0, 0, :] + smax


def _scores_fwd_impl(q, k, num_heads: int, scale: float,
                     block_n: int = 512) -> jnp.ndarray:
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    # [B, h, N, d] / [B, h, M, d]: head-major so each grid step reads a
    # contiguous (token, d) tile.
    qh = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    grid = (b, pl.cdiv(n, block_n), num_heads)
    out = pl.pallas_call(
        functools.partial(
            _kernel, m_actual=m, scale=scale, num_heads=num_heads
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_n, d),
                lambda bi, i, h: (bi, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, m, d),
                lambda bi, i, h: (bi, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            # Singleton sublane axis keeps the (sublane, lane) block dims
            # legal for any batch size (sublane block == array dim 1).
            (1, 1, block_n), lambda bi, i, h: (bi, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh)
    return out[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def maxpool_attention_scores_pallas(q, k, num_heads: int, scale: float):
    """Pallas-fused drop-in for maxpool_attention_scores (TPU only; falls
    back to the XLA path on other backends)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return maxpool_attention_scores(q, k, num_heads, scale)
    return _scores_fwd_impl(q, k, num_heads, scale)


def _fwd(q, k, num_heads, scale):
    s = maxpool_attention_scores_pallas(q, k, num_heads, scale)
    return s, (q, k)


def _bwd(num_heads, scale, res, g):
    q, k = res
    # Recompute scores in XLA and push the cotangent through max via
    # one-hot argmax (ties: torch.max picks the first max index; one_hot of
    # argmax matches that).
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    qh = q.reshape(b, n, num_heads, d).astype(jnp.float32)
    kh = k.reshape(b, m, num_heads, d).astype(jnp.float32)
    scores = jnp.einsum(
        "bnhd,bmhd->bhnm", qh, kh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    amax = jnp.argmax(scores, axis=-1)  # [B,h,N]
    sel = jax.nn.one_hot(amax, m, dtype=jnp.float32)  # [B,h,N,M]
    gs = g[:, None, :, None] * sel * jnp.float32(scale)  # d s / d scores
    dq = jnp.einsum("bhnm,bmhd->bnhd", gs, kh).reshape(b, n, c)
    dk = jnp.einsum("bhnm,bnhd->bmhd", gs, qh).reshape(b, m, c)
    return dq.astype(q.dtype), dk.astype(k.dtype)


maxpool_attention_scores_pallas.defvjp(_fwd, _bwd)
