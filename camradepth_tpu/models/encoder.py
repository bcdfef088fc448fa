"""Hierarchical softmax-free transformer encoder ("Simplified/DEST").

TPU-native re-design of /root/reference/src/models/simplified_attention.py:
four stages of OverlapPatchEmbed (stride 4,2,2,2) + Blocks with max-pool
attention and a depthwise-conv MLP. Tokens are kept channels-last
([B, N, C] / [B, H, W, C]) so every projection is a Dense riding the MXU,
and the attention exploits the rank-1 value structure (see
camradepth_tpu/ops/attention.py) instead of materializing [B,h,N,M] score
tensors in HBM.

Reference symbol map:
  Mlp                  -> MixFFN           (simplified_attention.py:11-43)
  Attention_MaxPool    -> MaxPoolAttention (:46-109)
  Block                -> Block            (:111-145)
  OverlapPatchEmbed    -> OverlapPatchEmbed(:148-188)
  SimplifiedTransformer-> SimplifiedTransformer (:190-310)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from camradepth_tpu.models.layers import (
    DropPath,
    GroupNorm,
    gelu_for_dtype,
    kaiming_out_init,
    trunc002_init,
)
from camradepth_tpu.ops.attention import maxpool_attention
from camradepth_tpu.parallel.mesh import constrain_batch

Dtype = Any


def _dense(features, use_bias, name, dtype):
    """1x1 conv over tokens == Dense; torch init trunc_normal(0.02)/zeros."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=trunc002_init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class MixFFN(nn.Module):
    """fc1 -> GN -> DWConv3x3 -> GN -> GELU -> fc2 (ref Mlp, :11-43)."""

    hidden: int
    out_features: int
    divisor: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = x.shape
        x = constrain_batch(
            _dense(self.hidden, True, "fc1", self.dtype)(x))
        x = GroupNorm(self.divisor, dtype=self.dtype, name="norm1")(x)
        # Depthwise 3x3 over the spatial grid (ref DWConv, :313-323).
        xs = constrain_batch(x.reshape(b, h, w, self.hidden))
        xs = nn.Conv(
            self.hidden,
            (3, 3),
            padding=[(1, 1)] * 2,
            feature_group_count=self.hidden,
            use_bias=True,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dwconv",
        )(xs)
        xs = constrain_batch(xs)
        x = constrain_batch(xs.reshape(b, n, self.hidden))
        # NOTE: ref norm2 is GroupNorm(out_features//divisor, hidden) — group
        # count follows *out* features while the normalized tensor still has
        # `hidden` channels (simplified_attention.py:24). Preserve the quirk.
        x = GroupNorm_groups(
            max(1, self.out_features // self.divisor),
            dtype=self.dtype,
            name="norm2",
        )(x)
        x = gelu_for_dtype(x)
        x = _dense(self.out_features, True, "fc2", self.dtype)(x)
        return x


class GroupNorm_groups(nn.Module):
    """GroupNorm with an explicit group count (fp32 stats, eps 1e-5),
    via the fused bandwidth-optimal kernel."""

    num_groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from camradepth_tpu.ops.groupnorm import group_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(
            x.astype(self.dtype), scale, bias, self.num_groups
        )


class MaxPoolAttention(nn.Module):
    """Softmax-free max-pool attention (ref Attention_MaxPool, :46-109)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    out_features: Optional[int] = None
    divisor: int = 16
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int]):
        h, w = hw
        b, n, c = x.shape
        assert c == self.dim
        head_dim = c // self.num_heads
        scale = head_dim ** -0.5
        out_features = self.out_features or c

        q = _dense(c, self.qkv_bias, "q", self.dtype)(x)
        if self.sr_ratio > 1:
            xs = x.reshape(b, h, w, c)
            xs = nn.Conv(
                c,
                (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID",
                use_bias=True,
                kernel_init=kaiming_out_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="sr",
            )(xs)
            x_kv = xs.reshape(b, -1, c)
            x_kv = GroupNorm(self.divisor, dtype=self.dtype, name="norm")(x_kv)
        else:
            x_kv = x
        # Batch-anchor the projection inputs/outputs so their backward
        # cotangents agree with the joint data x fsdp batch sharding —
        # see parallel.mesh.constrain_batch (no-op off-mesh).
        x_kv = constrain_batch(x_kv)
        q = constrain_batch(q)
        k = constrain_batch(_dense(c, self.qkv_bias, "k", self.dtype)(x_kv))

        out = constrain_batch(maxpool_attention(
            x, q, k, self.num_heads, scale, use_pallas=self.use_pallas
        ))
        return constrain_batch(
            _dense(out_features, True, "proj", self.dtype)(out))


class Block(nn.Module):
    """Pre-norm residual block (ref Block, :111-145):
    x + DropPath(Attn(GN(x))); x + DropPath(MixFFN(GN(x)))."""

    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    drop_path: float = 0.0
    qkv_bias: bool = True
    divisor: int = 16
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        y = GroupNorm(self.divisor, dtype=self.dtype, name="norm1")(x)
        y = MaxPoolAttention(
            self.dim,
            self.num_heads,
            sr_ratio=self.sr_ratio,
            qkv_bias=self.qkv_bias,
            divisor=self.divisor,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )(y, hw)
        x = x + DropPath(self.drop_path, name="drop_path1")(
            y, deterministic=deterministic
        )
        y = GroupNorm(self.divisor, dtype=self.dtype, name="norm2")(x)
        y = MixFFN(
            int(self.dim * self.mlp_ratio),
            self.dim,
            divisor=self.divisor,
            dtype=self.dtype,
            name="mlp1",
        )(y, hw)
        return x + DropPath(self.drop_path, name="drop_path2")(
            y, deterministic=deterministic
        )


class OverlapPatchEmbed(nn.Module):
    """Strided overlap conv + GroupNorm (ref :148-188). Returns NHWC."""

    features: int
    patch_size: int
    stride: int
    divisor: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(
            self.features,
            (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride),
            padding=[(p, p)] * 2,
            use_bias=True,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(x)
        x = GroupNorm(self.divisor, dtype=self.dtype, name="norm")(x)
        return x


class SimplifiedTransformer(nn.Module):
    """4-stage encoder; returns per-stage NHWC feature maps at /4,/8,/16,/32
    (ref SimplifiedTransformer.forward_features, :265-306)."""

    dims: Sequence[int] = (64, 128, 160, 256)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    depths: Sequence[int] = (3, 10, 16, 5)
    drop_path_rate: float = 0.1
    qkv_bias: bool = True
    divisor: int = 16
    use_pallas: bool = False
    remat_blocks: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # Linear stochastic-depth decay across all blocks (ref :214).
        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        patch = [
            dict(patch_size=7, stride=4),
            dict(patch_size=3, stride=2),
            dict(patch_size=3, stride=2),
            dict(patch_size=3, stride=2),
        ]
        outs = []
        cur = 0
        for i in range(4):
            x = OverlapPatchEmbed(
                self.dims[i],
                divisor=self.divisor,
                dtype=self.dtype,
                name=f"patch_embed{i + 1}",
                **patch[i],
            )(x)
            b, h, w, c = x.shape
            tok = x.reshape(b, h * w, c)
            # Optional backward rematerialization: encoder residuals
            # (notably the ratio-8 MixFFN hiddens) are the second
            # largest training-memory consumer after the decoder. The
            # functional nn.remat form closes over the static (h, w)
            # and deterministic flags so only tensors cross the
            # checkpoint boundary.
            def run_block(mdl, t, _hw=(h, w), _det=deterministic):
                return mdl(t, _hw, deterministic=_det)

            if self.remat_blocks:
                run_block = nn.remat(run_block)
            for j in range(self.depths[i]):
                blk = Block(
                    self.dims[i],
                    self.num_heads[i],
                    mlp_ratio=self.mlp_ratios[i],
                    sr_ratio=self.sr_ratios[i],
                    drop_path=float(dpr[cur + j]),
                    qkv_bias=self.qkv_bias,
                    divisor=self.divisor,
                    use_pallas=self.use_pallas,
                    dtype=self.dtype,
                    name=f"block{i + 1}_{j}",
                )
                tok = run_block(blk, tok)
            cur += self.depths[i]
            x = tok.reshape(b, h, w, c)
            outs.append(x)
        return outs
