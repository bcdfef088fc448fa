"""Fused 3x3-conv + GroupNorm-stats Pallas kernel for the decoder SRB.

The decoder's ShortResBlock stages dominate inference (5.6 of 10
ms/frame at 416x800, reference utils.py:103-135). XLA runs each conv at
43-70% of the v5e MXU peak and materializes a separate full-resolution
GroupNorm-apply+GELU pass between convs (~0.5 ms/frame). This kernel:

- reads each *raw* (pre-GN) source stripe from HBM (manual halo DMA for
  128-aligned channel counts; pipelined neighbor-blocks for small
  unaligned skips, since HBM DMA lane extents must be 128-multiples),
  applies its GroupNorm affine + GELU on load (bf16, exactly like
  ops/groupnorm.py's folded scale/shift), and packs the channel-concat
  of all sources into one flat VMEM staging buffer with a one-column
  zero pad between rows;
- computes the 3x3 SAME conv as nine MXU matmuls over static
  flat-offset slices of that buffer (the zero pad column makes a +-1
  flat shift equal a SAME-padded column shift), accumulating all taps
  in fp32 — the same accumulation semantics as the XLA conv;
- writes the raw output zero-padded to a 128-multiple channel count so
  the next fused conv can read it with aligned DMA, and emits
  per-stripe fp32 channel sums / sums-of-squares of the raw output, so
  the next stage's GroupNorm needs no extra pass over the image — a
  tiny [B, n_h, N] XLA reduction finishes the statistics.

Inference-only: the training path keeps the autodiff-able XLA graph
(bench / serving / eval run `deterministic=True`).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 8  # leading flat pad so every tap slice start is non-negative


class Source(NamedTuple):
    """One channel-concat member of a fused conv's input.

    ``x`` is raw (pre-GroupNorm) when ``scale``/``shift`` are set: the
    kernel applies ``gelu(x * scale + shift)`` on load (bf16, the same
    folded form as ops/groupnorm.py). With scale=None the source is
    consumed as-is (already-activated skips, raw images).

    ``valid``: number of meaningful channels when ``x`` carries zero
    padding up to a 128-multiple (the padded-output contract of this
    same kernel). None means all channels are valid.
    """

    x: jnp.ndarray                       # [B, H, W, C]
    scale: Optional[jnp.ndarray] = None  # [B, C_valid] folded GN scale
    shift: Optional[jnp.ndarray] = None  # [B, C_valid] folded GN shift
    gelu: bool = False
    valid: Optional[int] = None


def _apply_source(v, scale_row, shift_row, gelu):
    """bf16 affine + GELU, bit-matching the XLA GroupNorm path
    (groupnorm.py casts the folded scale/shift to the activation dtype
    before applying; gelu_for_dtype uses the tanh form in bf16)."""
    if scale_row is not None:
        v = v * scale_row + shift_row
    if gelu:
        v = nn.gelu(v, approximate=v.dtype == jnp.bfloat16)
    return v


def _round_up(x, m):
    return (x + m - 1) // m * m


def _conv_kernel(*refs, th, n_h, w, n_out, npad, meta, kpad):
    """meta: per-source dict(c=array C, valid=int, dma=bool,
    affine=bool, gelu=bool). refs order: per source (x_any | prev, cur,
    nxt) [, scale, shift] ..., v [9,KPAD,NPAD], outs (out, sum, sqsum),
    scratch (in_bufs for DMA sources ..., xn, sems)."""
    it = iter(range(len(refs)))
    src_refs, affs = [], []
    for m in meta:
        if m["dma"]:
            src_refs.append((refs[next(it)],))
        else:
            src_refs.append(
                (refs[next(it)], refs[next(it)], refs[next(it)])
            )
        if m["affine"]:
            affs.append((refs[next(it)], refs[next(it)]))
        else:
            affs.append(None)
    v_ref = refs[next(it)]
    out_ref = refs[next(it)]
    sum_ref = refs[next(it)]
    sq_ref = refs[next(it)]
    in_bufs = {}
    for s, m in enumerate(meta):
        if m["dma"]:
            in_bufs[s] = refs[next(it)]
    xn_ref = refs[next(it)]
    in_sems = refs[next(it)]

    bi = pl.program_id(0)
    i = pl.program_id(1)
    wb = w + 2
    rows = th + 2
    e = th * wb

    # --- halo input DMA (rows i*TH-1 .. i*TH+TH, edge-clipped) -------
    def in_cases(idx):
        return [
            (idx * th - 1, rows, 0,
             jnp.logical_and(idx > 0, idx < n_h - 1)),
            (0, th + 1, 1, idx == 0),
            (idx * th - 1, th + 1, 0,
             jnp.logical_and(idx == n_h - 1, idx > 0)),
        ]

    def in_dma(s, src, nrows, dst):
        return pltpu.make_async_copy(
            src_refs[s][0].at[bi, pl.ds(src, nrows)],
            in_bufs[s].at[pl.ds(dst, nrows)],
            in_sems.at[s],
        )

    for s, m in enumerate(meta):
        if not m["dma"]:
            continue
        for a, b, c, cond in in_cases(i):
            pl.when(cond)(
                lambda s=s, a=a, b=b, c=c: in_dma(s, a, b, c).start()
            )
    # Zero the whole staging buffer once; pad columns/lanes and the
    # inter-row pad then stay zero for the rest of the run.
    @pl.when(jnp.logical_and(bi == 0, i == 0))
    def _():
        xn_ref[:] = jnp.zeros_like(xn_ref)

    for s, m in enumerate(meta):
        if not m["dma"]:
            continue
        for a, b, c, cond in in_cases(i):
            pl.when(cond)(
                lambda s=s, a=a, b=b, c=c: in_dma(s, a, b, c).wait()
            )

    # --- normalize + concat into the flat staging buffer -------------
    koff = 0
    for s, m in enumerate(meta):
        valid = m["valid"]
        if m["dma"]:
            v = in_bufs[s][:]                    # [rows, W, C]
        else:
            prev, cur, nxt = src_refs[s]
            top = jnp.where(
                i == 0,
                jnp.zeros_like(prev[0, th - 1 :]),
                prev[0, th - 1 :],
            )
            bot = jnp.where(
                i == n_h - 1,
                jnp.zeros_like(nxt[0, :1]),
                nxt[0, :1],
            )
            v = jnp.concatenate([top, cur[0], bot], axis=0)
        if valid != v.shape[-1]:
            v = v[..., :valid]
        if affs[s] is not None:
            sc = affs[s][0][0, 0].astype(v.dtype)
            sh = affs[s][1][0, 0].astype(v.dtype)
            v = _apply_source(v, sc, sh, m["gelu"])
        elif m["gelu"]:
            v = _apply_source(v, None, None, True)
        for r in range(rows):
            xn_ref[
                pl.ds(_PAD + r * wb + 1, w), pl.ds(koff, valid)
            ] = v[r]
        koff += valid

    # SAME padding: the halo row beyond the image edge is zero *after*
    # normalization (the conv pads the normalized tensor).
    @pl.when(i == 0)
    def _():
        xn_ref[pl.ds(_PAD, wb)] = jnp.zeros((wb, kpad), xn_ref.dtype)

    @pl.when(i == n_h - 1)
    def _():
        xn_ref[pl.ds(_PAD + (rows - 1) * wb, wb)] = jnp.zeros(
            (wb, kpad), xn_ref.dtype
        )

    # --- nine tap matmuls over static flat-offset slices -------------
    # out flat k = t*WB + (w'+1); tap (di,dj) reads
    # xn[_PAD + k + di*WB + (dj-1)] with di,dj in 0..2 here. Chunked
    # two image rows at a time to bound the fp32 accumulator VMEM.
    rows_per_chunk = 2
    e2 = rows_per_chunk * wb
    stat_s = jnp.zeros((npad,), jnp.float32)
    stat_q = jnp.zeros((npad,), jnp.float32)
    for ci in range(th // rows_per_chunk):
        acc = jnp.zeros((e2, npad), jnp.float32)
        for di in range(3):
            for dj in range(3):
                start = _PAD + ci * e2 + di * wb + dj - 1
                acc = acc + jax.lax.dot_general(
                    xn_ref[pl.ds(start, e2)],
                    v_ref[di * 3 + dj],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        out = acc.reshape(rows_per_chunk, wb, npad)[:, 1 : w + 1]
        out_ref[0, ci * rows_per_chunk : (ci + 1) * rows_per_chunk] = (
            out.astype(out_ref.dtype)
        )
        # Raw-output GroupNorm statistics (fp32; the N padding lanes
        # are zero because their weight columns are zero).
        of = out.reshape(rows_per_chunk * w, npad)
        stat_s = stat_s + jnp.sum(of, axis=0)
        stat_q = stat_q + jnp.sum(of * of, axis=0)
    sum_ref[0, 0, 0] = stat_s
    sq_ref[0, 0, 0] = stat_q


def _pack_weights(weights: jnp.ndarray, kpad: int, npad: int, dt):
    """HWIO [3,3,K,N] -> [9, KPAD, NPAD] in the activation dtype with
    zero K/N padding (the XLA conv likewise casts weights to the input
    dtype; zero N columns make the output's channel padding zero)."""
    _, _, k, n = weights.shape
    v = weights.astype(dt).reshape(9, k, n)
    return jnp.pad(v, ((0, 0), (0, kpad - k), (0, npad - n)))


@functools.partial(jax.jit, static_argnames=("meta", "th", "interpret"))
def _conv_fused_call(
    arrays: Tuple[jnp.ndarray, ...],
    weights: jnp.ndarray,
    meta: Tuple[Tuple[Tuple[str, object], ...], ...],
    th: int,
    interpret: bool,
):
    meta = [dict(m) for m in meta]
    b, h, w, _ = arrays[0].shape
    n_out = weights.shape[-1]
    npad = _round_up(n_out, 128)
    n_h = h // th
    kpad = _round_up(sum(m["valid"] for m in meta), 128)
    wb = w + 2
    rows = th + 2
    dt = arrays[0].dtype

    v = _pack_weights(weights, kpad, npad, dt)

    in_specs = []
    for m in meta:
        c = m["c"]
        if m["dma"]:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        else:
            for off in (-1, 0, 1):
                in_specs.append(
                    pl.BlockSpec(
                        (1, th, w, c),
                        (lambda o: lambda bi, i: (
                            bi, jnp.clip(i + o, 0, n_h - 1), 0, 0
                        ))(off),
                        memory_space=pltpu.VMEM,
                    )
                )
        if m["affine"]:
            for _ in range(2):
                in_specs.append(
                    # [B, 1, C] with a singleton sublane axis keeps the
                    # (sublane, lane) block dims legal for any C.
                    pl.BlockSpec(
                        (1, 1, m["valid"]),
                        lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
    in_specs.append(
        pl.BlockSpec(
            (9, kpad, npad), lambda bi, i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )

    out_shapes = (
        jax.ShapeDtypeStruct((b, h, w, npad), dt),
        # Singleton third axis keeps the (sublane, lane) block dims
        # legal for any n_h (block dim == array dim).
        jax.ShapeDtypeStruct((b, n_h, 1, npad), jnp.float32),
        jax.ShapeDtypeStruct((b, n_h, 1, npad), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, th, w, npad), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, npad), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, npad), lambda bi, i: (bi, i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    scratch = [
        pltpu.VMEM((rows, w, m["c"]), dt) for m in meta if m["dma"]
    ]
    scratch.append(pltpu.VMEM((rows * wb + 2 * _PAD, kpad), dt))
    scratch.append(pltpu.SemaphoreType.DMA((len(meta),)))

    kernel = functools.partial(
        _conv_kernel, th=th, n_h=n_h, w=w, n_out=n_out, npad=npad,
        meta=meta, kpad=kpad,
    )
    raw, sums, sqs = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*arrays, v)
    return (
        raw,
        sums.sum(axis=(1, 2))[:, :n_out],
        sqs.sum(axis=(1, 2))[:, :n_out],
    )


def conv3x3_fused(
    sources: Sequence[Source],
    weights: jnp.ndarray,
    *,
    th: int = 2,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SAME 3x3 conv over the channel-concat of ``sources`` (each
    optionally GroupNorm-affine+GELU'd on load), returning ``(raw
    [B,H,W,ceil128(N)] in the input dtype — channels beyond N are
    zero — channel_sum [B,N] fp32, channel_sqsum [B,N] fp32)`` of the
    raw output.

    TPU Pallas fast path; falls back to the XLA reference off-TPU or
    for unsupported shapes (the fallback honors the same padded-output
    contract). Weights are HWIO ``[3,3,K,N]`` with K = sum of valid
    source channels, bias-free (reference ConvLayer, utils.py:201-228).
    """
    _, h, w, _ = sources[0].x.shape
    ok = (
        (jax.default_backend() in ("tpu", "axon") or interpret)
        and h % th == 0
        and h >= 2 * th
        and w % 8 == 0
    )
    if not ok:
        return _reference_padded(sources, weights)
    arrays: List[jnp.ndarray] = []
    meta = []
    for s in sources:
        c = s.x.shape[-1]
        valid = c if s.valid is None else s.valid
        dma = c % 128 == 0
        if dma:
            arrays.append(s.x)
        else:
            if s.scale is not None:
                raise ValueError(
                    "affine sources must have 128-aligned channels "
                    "(kernel outputs are padded; pad upstream)"
                )
            arrays.extend([s.x, s.x, s.x])
        meta.append(
            dict(c=c, valid=valid, dma=dma,
                 affine=s.scale is not None, gelu=bool(s.gelu))
        )
        if s.scale is not None:
            arrays.append(s.scale.astype(jnp.float32)[:, None, :])
            arrays.append(s.shift.astype(jnp.float32)[:, None, :])
    meta_t = tuple(tuple(sorted(m.items())) for m in meta)
    return _conv_fused_call(tuple(arrays), weights, meta_t, th,
                            interpret)


def conv3x3_reference(
    sources: Sequence[Source], weights: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-XLA reference with identical semantics (unpadded output)."""
    parts = []
    for s in sources:
        v = s.x
        if s.valid is not None and s.valid != v.shape[-1]:
            v = v[..., : s.valid]
        if s.scale is not None:
            sc = s.scale.astype(v.dtype)[:, None, None, :]
            sh = s.shift.astype(v.dtype)[:, None, None, :]
            v = v * sc + sh
        if s.gelu:
            v = nn.gelu(v, approximate=v.dtype == jnp.bfloat16)
        parts.append(v)
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
    raw = jax.lax.conv_general_dilated(
        x, weights.astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    f = raw.astype(jnp.float32)
    return raw, f.sum(axis=(1, 2)), (f * f).sum(axis=(1, 2))


def _reference_padded(sources, weights):
    raw, s, q = conv3x3_reference(sources, weights)
    n = raw.shape[-1]
    npad = _round_up(n, 128)
    if npad != n:
        raw = jnp.pad(raw, ((0, 0),) * 3 + ((0, npad - n),))
    return raw, s, q


def gn_affine_from_stats(
    ch_sum: jnp.ndarray,
    ch_sqsum: jnp.ndarray,
    count: int,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Folded per-(batch, channel) GroupNorm scale/shift from raw-output
    channel statistics (count = H*W elements per channel). Matches
    ops/groupnorm.py's torch-semantics math in fp32."""
    b, c = ch_sum.shape
    gsize = c // num_groups
    gs = ch_sum.reshape(b, num_groups, gsize).sum(-1)
    gq = ch_sqsum.reshape(b, num_groups, gsize).sum(-1)
    n = count * gsize
    mean = gs / n
    var = jnp.maximum(gq / n - mean * mean, 0.0)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))            # [B, G]
    inv = jnp.repeat(inv, gsize, axis=-1)                # [B, C]
    mean = jnp.repeat(mean, gsize, axis=-1)
    scale = inv * gamma[None].astype(jnp.float32)
    shift = beta[None].astype(jnp.float32) - mean * scale
    return scale, shift
