"""Convolutional building blocks (NHWC, Flax linen).

TPU-native re-design of the reference blocks in
/root/reference/src/utils/utils.py: ``ConvLayer`` (:201-228), ``ShortResBlock``
(:103-135), ``Decoder`` (:231-257), ``Depth_Activation`` (:274-289) and
``Seg_Block`` (:87-100). Layout is channels-last so convs tile directly onto
the MXU; normalization runs in float32 while convs/activations run in the
configured compute dtype (bf16 by default), replacing the reference's CUDA
AMP autocast.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from camradepth_tpu.ops.resize import upsample_bicubic_x2

Dtype = Any

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
torch_default_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# kaiming_normal(mode=fan_out, nonlinearity=relu): N(0, sqrt(2/fan_out))
kaiming_out_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
trunc002_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu_for_dtype(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching torch nn.GELU (exact erf) in fp32; the tanh form in
    bf16. The tanh approximation's max error (~3e-4 absolute) is ~100x
    below bf16 resolution, while erf costs ~1.6x a full HBM round-trip on
    the VPU (measured 1.01 vs 0.63 ms/frame at 416x800x96 on v5e) — so in
    bf16 the forms are numerically indistinguishable and the cheap one
    wins. fp32 (parity/golden tests) keeps exact erf."""
    approximate = x.dtype == jnp.bfloat16
    return nn.gelu(x, approximate=approximate)


def _uniform_fan_in_bias(fan_in: int):
    """torch's default conv bias init: U(+-1/sqrt(fan_in))."""
    limit = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class GroupNorm(nn.Module):
    """GroupNorm matching torch semantics: groups = C // divisor, eps 1e-5,
    fp32 statistics over bf16 activations via the fused bandwidth-optimal
    kernel (reference: nn.GroupNorm everywhere, divisor 16 — args.py:37)."""

    divisor: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from camradepth_tpu.ops.groupnorm import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(
            x.astype(self.dtype), scale, bias, max(1, c // self.divisor)
        )


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class ConvLayer(nn.Module):
    """conv(bias=False) -> GroupNorm -> GELU (utils.py:201-228)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    activation: str = "gelu"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = GroupNorm(dtype=self.dtype, name="norm")(x)
        act = {
            "gelu": lambda v: gelu_for_dtype(v),
            "relu": nn.relu,
            "elu": nn.elu,
        }[self.activation]
        return act(x)


class ShortResBlock(nn.Module):
    """3-layer shrinking dense block (utils.py:103-135).

    Channel plan for mid=128: in -> 96, cat -> 64, cat -> out; the first two
    outputs are int(mid*0.75) and int(mid*0.5)."""

    features: int
    mid_channels: int = 128
    num_layers: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        widths = []
        for i in range(self.num_layers):
            if i == self.num_layers - 1:
                widths.append(self.features)
            else:
                widths.append(int(self.mid_channels * (0.75 - 0.25 * i)))
        for i in range(self.num_layers - 1):
            out = ConvLayer(widths[i], dtype=self.dtype, name=f"layers_{i}")(x)
            x = jnp.concatenate([x, out], axis=-1)
        return ConvLayer(
            widths[-1], dtype=self.dtype, name=f"layers_{self.num_layers - 1}"
        )(x)


class Decoder(nn.Module):
    """Bicubic x2 upsample -> optional skip concat -> ShortResBlock
    (utils.py:231-257)."""

    features: int
    mid_channels: int = 128
    has_skip: bool = False
    dtype: Dtype = jnp.bfloat16
    use_pallas_resize: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        if self.use_pallas_resize:
            from camradepth_tpu.ops.resize_pallas import (
                upsample_bicubic_x2_auto,
            )

            x = upsample_bicubic_x2_auto(x)
        else:
            x = upsample_bicubic_x2(x)
        if self.has_skip:
            assert skip is not None
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        return ShortResBlock(
            self.features, mid_channels=self.mid_channels, dtype=self.dtype,
            name="conv",
        )(x)


class DepthActivation(nn.Module):
    """conv -> sigmoid -> conv depth head (utils.py:274-289)."""

    features: int = 1
    iter_channels: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            self.iter_channels,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=True,
            kernel_init=torch_default_conv_init,
            bias_init=_uniform_fan_in_bias(in_ch * 9),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv_1",
        )(x)
        x = nn.sigmoid(x)
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=True,
            kernel_init=torch_default_conv_init,
            bias_init=_uniform_fan_in_bias(self.iter_channels * 9),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv_2",
        )(x)
        return x


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC [B,H,W,C] -> [B,H/r,W/r,r*r*C]; channel blocks ordered
    (row, col, C) so :func:`depth_to_space` is its exact inverse."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC [B,H,W,r*r*C] -> [B,r*H,r*W,C] (inverse of space_to_depth)."""
    b, h, w, c = x.shape
    cc = c // (r * r)
    x = x.reshape(b, h, w, r, r, cc)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, cc)


class TPUDecoder(nn.Module):
    """MXU-aligned decoder stage for the documented "TPU variant"
    (``ModelConfig.tpu_decoder``).

    The reference Decoder (utils.py:231-257) upsamples FIRST and then
    convolves at the doubled resolution with 96/64-channel layers that
    leave most of the MXU's 128 lanes idle — at 416x800 the final stage
    alone is ~200 real GMAC (and ~255 lane-padded GMAC) per frame. This
    stage instead keeps the convolutions at the INPUT resolution with
    128-wide (lane-filling) layers and learns the x2 upsample as a
    subpixel depth-to-space projection; the full-resolution skip is
    folded in via space-to-depth. Same dense shrinking-skip wiring,
    ~4x less padded MXU work, identical output shape. NOT
    weight-compatible with the parity Decoder (transfer-learning
    restores skip these stages by shape matching).
    """

    features: int            # channels AFTER the optional depth_to_space
    width: int = 128         # lane-filling hidden width
    has_skip: bool = False   # skip arrives at 2x the input resolution
    upsample_out: bool = True  # conv3 emits 4*features, then D2S
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        if self.has_skip:
            assert skip is not None
            x = jnp.concatenate(
                [x, space_to_depth(skip.astype(x.dtype), 2)], axis=-1
            )
        out = ConvLayer(self.width, dtype=self.dtype, name="conv_0")(x)
        x = jnp.concatenate([x, out], axis=-1)
        out = ConvLayer(self.width, dtype=self.dtype, name="conv_1")(x)
        x = jnp.concatenate([x, out], axis=-1)
        if self.upsample_out:
            x = ConvLayer(4 * self.features, dtype=self.dtype,
                          name="conv_2")(x)
            return depth_to_space(x, 2)
        return ConvLayer(self.features, dtype=self.dtype, name="conv_2")(x)


class SubpixelDepthActivation(nn.Module):
    """Depth head for the TPU variant: both convs run at half
    resolution with lane-filling widths, and the final x2 upsample is a
    subpixel projection (conv_2 emits ``4*features`` channels ->
    depth_to_space). Replaces the parity DepthActivation's
    full-resolution 32-lane convs (utils.py:274-289) for the final
    head only; intermediate heads keep parity shapes."""

    features: int = 1
    iter_channels: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            self.iter_channels,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=True,
            kernel_init=torch_default_conv_init,
            bias_init=_uniform_fan_in_bias(in_ch * 9),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv_1",
        )(x)
        x = nn.sigmoid(x)
        x = nn.Conv(
            4 * self.features,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=True,
            kernel_init=torch_default_conv_init,
            bias_init=_uniform_fan_in_bias(self.iter_channels * 9),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv_2",
        )(x)
        return depth_to_space(x, 2)


def seg_block(seg_logits: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """argmax/num_classes map (utils.py:87-100). NHWC: class axis is last.

    As in the reference, argmax is non-differentiable, so the seg->depth
    guidance path intentionally carries no gradient (SURVEY.md defect note).
    """
    seg_map = jnp.argmax(seg_logits, axis=-1, keepdims=True)
    return (seg_map.astype(jnp.float32) / num_classes).astype(seg_logits.dtype)


class SegConv(nn.Module):
    """Plain 3x3 conv logits head (torch-default init), e.g.
    seg_conv_stage_4 / unsup_stage_4 (CamRaDepth.py:88-94)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        return nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=True,
            kernel_init=torch_default_conv_init,
            bias_init=_uniform_fan_in_bias(in_ch * 9),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
