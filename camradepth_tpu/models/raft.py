"""TPU-native RAFT optical flow (clean-room, checkpoint-compatible).

The reference pipeline computes im->im_next flow with the external
torch RAFT ("RAFT: Recurrent All-Pairs Field Transforms for Optical
Flow", Teed & Deng, ECCV 2020) via scripts/cal_flow.py:18-93. This is
a from-scratch JAX/Flax implementation of the raft-large architecture
so the flow stage can run natively on TPU:

- all-pairs correlation built once as one [N, N] matmul (MXU) and
  average-pooled into a 4-level pyramid;
- the iterative lookup/GRU refinement runs under ``lax.scan`` with
  static shapes — the (2r+1)^2 neighborhood sample is a gather-free
  bilinear interpolation via one-hot matmuls over the pooled grids
  (map_coordinates-style gathers scatter poorly on TPU);
- convex upsampling (softmax-weighted 3x3 combination at 8x) expressed
  with reshape/einsum only.

``load_torch_raft_state_dict`` maps the official checkpoints
(raft-things.pth / raft-kitti.pth, keys ``module.fnet...`` etc.) onto
the Flax parameter tree, so the same weights the reference uses drop
in. BatchNorm runs in inference mode from the checkpoint's running
statistics (the dataprep stage only ever runs the net frozen).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# Norm layers (inference semantics)
# ---------------------------------------------------------------------------


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d default (affine=False) eval semantics:
    per-(sample, channel) spatial statistics, no running stats, and NO
    learnable scale/bias — the official RAFT encoders construct
    ``nn.InstanceNorm2d(planes)`` with the affine default, so official
    raft-things/raft-kitti checkpoints contain no ``fnet.norm*`` keys.
    A parameterless module here keeps the Flax tree in one-to-one
    correspondence with those checkpoints."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d eval semantics from checkpoint running statistics."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones,
                         (self.features,), jnp.float32)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


def _norm(kind: str, features: int, name: str):
    if kind == "instance":
        return InstanceNorm(features, name=name)
    if kind == "batch":
        return FrozenBatchNorm(features, name=name)
    if kind == "none":
        return lambda x: x
    raise ValueError(kind)


def _conv(features, kernel, stride=1, name=None, padding=None):
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(padding, padding)] * 2, name=name,
    )


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


class ResidualBlock(nn.Module):
    features: int
    norm: str
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_norm(self.norm, self.features, "norm1")(
            _conv(self.features, 3, self.stride, "conv1")(x)))
        y = nn.relu(_norm(self.norm, self.features, "norm2")(
            _conv(self.features, 3, 1, "conv2")(y)))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _norm(self.norm, self.features, "norm3")(
                _conv(self.features, 1, self.stride, "downsample")(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """fnet/cnet: 1/8-resolution 256-channel features
    (raft-large BasicEncoder)."""

    output_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_norm(self.norm, 64, "norm1")(
            _conv(64, 7, 2, "conv1")(x)))
        for i, (dim, stride) in enumerate(
            ((64, 1), (96, 2), (128, 2))
        ):
            x = ResidualBlock(dim, self.norm, stride,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, self.norm, 1,
                              name=f"layer{i + 1}_1")(x)
        return _conv(self.output_dim, 1, 1, "conv2")(x)


# ---------------------------------------------------------------------------
# Correlation pyramid + lookup
# ---------------------------------------------------------------------------


def corr_pyramid(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4
) -> Sequence[jnp.ndarray]:
    """All-pairs correlation [B, H*W, H/2^l, W/2^l] per pyramid level.

    One [N, C] @ [C, N] MXU matmul, then 2x average pools over the
    *target* spatial axes (RAFT's CorrBlock)."""
    b, h, w, c = fmap1.shape
    n = h * w
    f1 = fmap1.reshape(b, n, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, n, c).astype(jnp.float32)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2) / jnp.sqrt(
        jnp.float32(c)
    )
    corr = corr.reshape(b, n, h, w)
    pyr = [corr]
    for _ in range(num_levels - 1):
        corr = _avg_pool2(corr)
        pyr.append(corr)
    return pyr


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool over the last two axes of
    [B, N, H, W]; odd trailing rows/cols are dropped (torch
    avg_pool2d floor semantics)."""
    b, n, h, w = x.shape
    x = x[:, :, : h // 2 * 2, : w // 2 * 2]
    x = x.reshape(b, n, h // 2, 2, w // 2, 2)
    return x.mean(axis=(3, 5))


def _bilinear_axis_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Dense one-hot bilinear weights [..., size] for 1-D coordinates.

    Exactly zero-padding bilinear semantics (RAFT's grid_sample with
    zero padding): a coordinate at distance d from an in-range index
    contributes weight max(0, 1-|d|), and out-of-range taps contribute
    nothing."""
    idx = jnp.arange(size, dtype=jnp.float32)
    d = 1.0 - jnp.abs(coords[..., None] - idx)
    return jnp.clip(d, 0.0, 1.0)


def lookup_corr(
    pyr: Sequence[jnp.ndarray], flow: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Sample each pyramid level on a (2r+1)^2 grid centred at
    coords0 + flow. Returns [B, H, W, L*(2r+1)^2].

    TPU-native sampling: instead of gathers, each level's [H_l, W_l]
    map is contracted with dense one-hot bilinear weights along H then
    W — two einsums that land on the MXU."""
    b, n, h, w = pyr[0].shape[0], pyr[0].shape[1], *pyr[0].shape[2:]
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cx = xs[None] + flow[..., 0]
    cy = ys[None] + flow[..., 1]
    r = radius
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    outs = []
    for lvl, corr in enumerate(pyr):
        hl, wl = corr.shape[2], corr.shape[3]
        scale = 2.0 ** lvl
        # Neighborhood coordinates in level space: [B,H,W,2r+1]
        lx = cx[..., None] / scale + offs
        ly = cy[..., None] / scale + offs
        wxs = _bilinear_axis_weights(lx, wl)   # [B,H,W,2r+1,WL]
        wys = _bilinear_axis_weights(ly, hl)   # [B,H,W,2r+1,HL]
        cv = corr.reshape(b, h, w, hl, wl)
        # contract W then H; output taps ordered [x-tap (j) outer,
        # y-tap (i) inner] to match the official CorrBlock's flattened
        # channel order: its delta = stack(meshgrid(dy, dx)) combined
        # with bilinear_sampler's (x, y) coordinate split makes the
        # OUTER neighborhood index vary the x offset, so convc1's
        # checkpoint weights expect x-major channels.
        t = jnp.einsum("bhwyx,bhwjx->bhwyj", cv, wxs)
        s = jnp.einsum("bhwyj,bhwiy->bhwji", t, wys)
        outs.append(s.reshape(b, h, w, (2 * r + 1) ** 2))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Update block
# ---------------------------------------------------------------------------


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(_conv(256, 1, 1, "convc1")(corr))
        c = nn.relu(_conv(192, 3, 1, "convc2")(c))
        f = nn.relu(_conv(128, 7, 1, "convf1")(flow))
        f = nn.relu(_conv(64, 3, 1, "convf2")(f))
        out = nn.relu(_conv(126, 3, 1, "conv")(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for suffix, kern in (("1", (1, 5)), ("2", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            pad = [(k // 2, k // 2) for k in kern]
            conv = functools.partial(
                nn.Conv, self.hidden, kern, padding=pad
            )
            z = nn.sigmoid(conv(name=f"convz{suffix}")(hx))
            r = nn.sigmoid(conv(name=f"convr{suffix}")(hx))
            q = nn.tanh(
                conv(name=f"convq{suffix}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        return _conv(2, 3, 1, "conv2")(
            nn.relu(_conv(256, 3, 1, "conv1")(h)))


class BasicUpdateBlock(nn.Module):
    """One refinement iteration, shaped for nn.scan: carry is
    (hidden, flow, mask); context and the correlation pyramid are
    broadcast inputs."""

    radius: int = 4

    @nn.compact
    def __call__(self, carry, context, pyr):
        h, flow, _ = carry
        corr = lookup_corr(pyr, flow, self.radius)
        m = MotionEncoder(name="encoder")(flow, corr)
        inp = jnp.concatenate([context, m], axis=-1)
        h = SepConvGRU(name="gru")(h, inp)
        delta = FlowHead(name="flow_head")(h)
        mask = _conv(64 * 9, 1, 1, "mask_conv2")(
            nn.relu(_conv(256, 3, 1, "mask_conv1")(h))
        ) * 0.25
        return (h, flow + delta, mask), None


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """8x convex upsampling: per output pixel a softmax-weighted
    combination of the coarse flow's 3x3 neighborhood."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    fp = jnp.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B,H,W,9,2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, neigh)
    # out[b, 8i+u, 8j+v, c] = up[b, i, j, u, v, c]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class RAFT(nn.Module):
    """raft-large. ``__call__(im1, im2)`` takes [B,H,W,3] RGB in
    0..255 (the official input convention), H and W multiples of 8,
    and returns the final upsampled flow [B,H,W,2]."""

    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4

    @nn.compact
    def __call__(self, im1, im2):
        im1 = 2.0 * (im1 / 255.0) - 1.0
        im2 = 2.0 * (im2 / 255.0) - 1.0
        fnet = BasicEncoder(256, "instance", name="fnet")
        fmap1 = fnet(im1)
        fmap2 = fnet(im2)
        pyr = corr_pyramid(
            fmap1.astype(jnp.float32), fmap2.astype(jnp.float32),
            self.corr_levels,
        )
        cnet = BasicEncoder(256, "batch", name="cnet")(im1)
        h = nn.tanh(cnet[..., :128])
        context = nn.relu(cnet[..., 128:])

        b, h8, w8, _ = fmap1.shape
        flow = jnp.zeros((b, h8, w8, 2), jnp.float32)
        mask0 = jnp.zeros((b, h8, w8, 64 * 9), jnp.float32)

        Loop = nn.scan(
            BasicUpdateBlock,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast),
            length=self.iters,
        )
        (h_final, flow, mask), _ = Loop(
            radius=self.corr_radius, name="update_block"
        )((h, flow, mask0), context, tuple(pyr))
        return convex_upsample(flow, mask)


# ---------------------------------------------------------------------------
# Official-checkpoint loading
# ---------------------------------------------------------------------------


def _enc_map(prefix: str, norms: bool) -> Dict[str, Tuple[str, ...]]:
    """torch name -> flax path for a BasicEncoder submodule.

    ``norms=False`` for the instance-norm fnet: its norm layers are
    parameterless (InstanceNorm2d affine=False), so official checkpoints
    carry no keys for them and the Flax tree has no matching nodes."""
    m = {
        f"{prefix}.conv1": (prefix, "conv1"),
        f"{prefix}.conv2": (prefix, "conv2"),
    }
    if norms:
        m[f"{prefix}.norm1"] = (prefix, "norm1")
    for layer in (1, 2, 3):
        for blk in (0, 1):
            t = f"{prefix}.layer{layer}.{blk}"
            f = f"layer{layer}_{blk}"
            m[f"{t}.conv1"] = (prefix, f, "conv1")
            m[f"{t}.conv2"] = (prefix, f, "conv2")
            m[f"{t}.downsample.0"] = (prefix, f, "downsample")
            if norms:
                m[f"{t}.norm1"] = (prefix, f, "norm1")
                m[f"{t}.norm2"] = (prefix, f, "norm2")
                m[f"{t}.norm3"] = (prefix, f, "norm3")
                m[f"{t}.downsample.1"] = (prefix, f, "norm3")
    return m


def _upd_map() -> Dict[str, Tuple[str, ...]]:
    u = "update_block"
    m = {}
    for k in ("convc1", "convc2", "convf1", "convf2", "conv"):
        m[f"{u}.encoder.{k}"] = (u, "encoder", k)
    for k in ("convz1", "convr1", "convq1", "convz2", "convr2",
              "convq2"):
        m[f"{u}.gru.{k}"] = (u, "gru", k)
    m[f"{u}.flow_head.conv1"] = (u, "flow_head", "conv1")
    m[f"{u}.flow_head.conv2"] = (u, "flow_head", "conv2")
    m[f"{u}.mask.0"] = (u, "mask_conv1")
    m[f"{u}.mask.2"] = (u, "mask_conv2")
    return m


def load_torch_raft_state_dict(state: Dict[str, Any]) -> Dict:
    """Map an official RAFT checkpoint state_dict (torch tensors or
    numpy arrays; 'module.'-prefixed keys as saved by DataParallel)
    onto the RAFT module's Flax parameter tree."""
    state = {
        (k[7:] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state.items()
    }
    mapping = {}
    mapping.update(_enc_map("fnet", norms=False))
    mapping.update(_enc_map("cnet", norms=True))
    mapping.update(_upd_map())

    params: Dict = {}

    def put(path, leaf, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = jnp.asarray(value)

    for tname, path in mapping.items():
        wkey = f"{tname}.weight"
        if wkey not in state:
            continue
        w = state[wkey]
        if w.ndim == 4:  # conv OIHW -> HWIO
            put(path, "kernel", w.transpose(2, 3, 1, 0))
            if f"{tname}.bias" in state:
                put(path, "bias", state[f"{tname}.bias"])
        elif w.ndim == 1:  # norm affine
            put(path, "scale", w)
            put(path, "bias", state[f"{tname}.bias"])
            if f"{tname}.running_mean" in state:
                put(path, "mean", state[f"{tname}.running_mean"])
                put(path, "var", state[f"{tname}.running_var"])
    return params


def raft_flow_fn(
    params: Dict, iters: int = 20
) -> "callable":
    """jittable (im1, im2) -> flow closure over loaded params."""
    model = RAFT(iters=iters)

    @jax.jit
    def run(im1, im2):
        return model.apply({"params": params}, im1, im2)

    return run
