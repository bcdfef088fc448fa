"""Alternative building blocks from the reference's component library.

The reference ships several blocks that the published model does not wire
in but that its experiments explored (utils.py component #5:
``AttentionBlcok`` :12-28, ``SparaseDenseLayer``/``SparaseDenseBlock``
:30-84, ``ResBlock`` :137-199, ``Acti`` :259-272, ``Unpool``
loss_funcs.py:182-196, and the encoder-side ``Conv_Attention``
simplified_attention.py:326-376). They are part of the framework surface —
a user switching from the reference can keep experimenting with them — so
they are provided here as NHWC Flax modules (names spelled correctly;
the reference's typos are noted for checkpoint mapping).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from camradepth_tpu.models.layers import (
    ConvLayer,
    kaiming_out_init,
    torch_default_conv_init,
)

Dtype = Any


class ChannelAttention(nn.Module):
    """Global-average-pool channel attention vector (reference
    ``AttentionBlcok`` [sic], utils.py:12-28): GAP -> 1x1 ConvLayer x2 ->
    sigmoid, broadcastable over the paired feature block."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        v = jnp.mean(x, axis=(1, 2), keepdims=True)
        v = ConvLayer(self.features, 1, 1, 0, dtype=self.dtype,
                      name="conv1")(v)
        v = ConvLayer(self.features, 1, 1, 0, dtype=self.dtype,
                      name="conv2")(v)
        return nn.sigmoid(v.astype(jnp.float32)).astype(x.dtype)


class SparseDenseLayer(nn.Module):
    """Conv branch modulated by a learned channel-attention vector
    (reference ``SparaseDenseLayer`` [sic], utils.py:30-52):
    out = conv3x3(x) * atten(x) + conv3x3(x), then a combine conv."""

    features: int
    mid_channels: int = 128
    as_final_block: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(self.mid_channels, dtype=self.dtype,
                        name="conv3x3")(x)
        atten = ChannelAttention(self.mid_channels, dtype=self.dtype,
                                 name="atten")(x)
        out = out * atten + out
        if self.as_final_block:
            return nn.Conv(
                self.features, (3, 3), padding=[(1, 1)] * 2,
                kernel_init=torch_default_conv_init,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="conv_combine",
            )(out)
        return ConvLayer(self.features, dtype=self.dtype,
                         name="conv_combine")(out)


class SparseDenseBlock(nn.Module):
    """Dense stack of SparseDenseLayers (utils.py:55-84)."""

    features: int
    mid_channels: int = 128
    num_layers: int = 1
    as_final_block: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            layer = SparseDenseLayer(
                self.features if last else self.mid_channels,
                mid_channels=self.mid_channels,
                as_final_block=self.as_final_block and last,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            if last:
                return layer(x)
            x = jnp.concatenate([x, layer(x)], axis=-1)
        return x


class ResBlock(nn.Module):
    """Full dense/residual block (utils.py:137-199). dense=True: 4-stage
    densely-concatenated convs (1x1, 3x3, 1x1, 3x3); dense=False: residual
    1-3-1 bottleneck with a concat tail."""

    features: int
    mid_channels: int = 128
    dense: bool = False
    as_final_block: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels
        if self.dense:
            out = ConvLayer(mid, 1, 1, 0, dtype=self.dtype, name="block_1")(x)
            x = jnp.concatenate([x, out], -1)
            out = ConvLayer(mid, 3, 1, 1, dtype=self.dtype, name="block_2")(x)
            x = jnp.concatenate([x, out], -1)
            out = ConvLayer(mid, 1, 1, 0, dtype=self.dtype, name="block_3")(x)
            x = jnp.concatenate([x, out], -1)
            return self._tail(x)
        out1 = ConvLayer(mid, 1, 1, 0, dtype=self.dtype, name="block_1")(x)
        out2 = ConvLayer(mid, 3, 1, 1, dtype=self.dtype, name="block_2")(out1)
        inter = out1 + out2
        out3 = ConvLayer(mid, 1, 1, 0, dtype=self.dtype, name="block_3")(inter)
        inter = inter + out3
        x = jnp.concatenate([x, inter], -1)
        return self._tail(x)

    def _tail(self, x):
        if self.as_final_block:
            x = ConvLayer(self.mid_channels, 3, 1, 1, dtype=self.dtype,
                          name="block_4_0")(x)
            return nn.Conv(
                self.features, (3, 3), padding=[(1, 1)] * 2,
                kernel_init=torch_default_conv_init,
                dtype=self.dtype, param_dtype=jnp.float32,
                name="block_4_1",
            )(x)
        return ConvLayer(self.features, 3, 1, 1, dtype=self.dtype,
                         name="block_4")(x)


class Acti(nn.Module):
    """sigmoid -> 3x3 conv head (utils.py:259-272)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.sigmoid(x)
        return nn.Conv(
            self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=True,
            kernel_init=torch_default_conv_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_2",
        )(x)


def unpool_x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 zero-stuffing unpool (reference Unpool, loss_funcs.py:182-196:
    a conv_transpose with a [1,0;0,0] kernel). Pure reshape/pad — no conv
    needed on TPU."""
    b, h, w, c = x.shape
    out = jnp.zeros((b, h, 2, w, 2, c), x.dtype)
    out = out.at[:, :, 0, :, 0, :].set(x)
    return out.reshape(b, 2 * h, 2 * w, c)


class ConvAttention(nn.Module):
    """Patch-embed + transformer blocks + x2 upsample + fuse conv
    (reference Conv_Attention, simplified_attention.py:326-376; unused by
    the published model)."""

    features: int
    embed_dim: int = 128
    num_heads: int = 4
    num_blocks: int = 4
    patch_size: int = 3
    stride: int = 2
    divisor: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from camradepth_tpu.models.encoder import Block, OverlapPatchEmbed
        from camradepth_tpu.ops.resize import upsample_bicubic_x2

        x_orig = x
        y = OverlapPatchEmbed(
            self.embed_dim, self.patch_size, self.stride,
            divisor=self.divisor, dtype=self.dtype, name="patch_embed1",
        )(x)
        b, h, w, c = y.shape
        tok = y.reshape(b, h * w, c)
        for i in range(self.num_blocks):
            tok = Block(
                self.embed_dim, self.num_heads, mlp_ratio=1, sr_ratio=8,
                qkv_bias=True, divisor=self.divisor, dtype=self.dtype,
                name=f"blocks_{i}",
            )(tok, (h, w), deterministic=deterministic)
        y = upsample_bicubic_x2(tok.reshape(b, h, w, c))
        y = jnp.concatenate([y, x_orig.astype(y.dtype)], axis=-1)
        return ConvLayer(self.features, 1, 1, 0, dtype=self.dtype,
                         name="final_conv")(y)
