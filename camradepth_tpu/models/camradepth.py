"""CamRaDepth: camera+radar depth estimation with optional semantic guidance.

TPU-native re-design of /root/reference/src/models/CamRaDepth.py:20-176.
Inputs are NHWC ``[B, H, W, C_in]`` (C_in = 7: BGR-normalized image, radar
inverse depth, radar uv flow, radar moving mask — or 3 for RGB-only
variants). Outputs mirror the reference's nested dict:

  {"depth": {"final_depth": [B,H,W,1],
             "intermediate_depths": (None, None, d3 [B,H/4,W/4,1],
                                     d4 [B,H/2,W/2,1])},
   "seg":   {"final_seg": [B,H,W,num_classes] | None,
             "intermediate_seg": [B,H/2,W/2,num_classes] | None,
             "unsup_map": [B,*,*,1] | None}}

Note: the reference returns ``intermediate_seg: None`` from the model and the
trainer multiplies its loss by 0 via ``supervised_seg`` gating when absent
(runner.py:197-198); here we *do* expose the stage-4 seg logits as
``intermediate_seg`` (computed anyway for the guidance map) so the published
"deep supervised seg" loss term is trainable, and keep ``final_seg`` parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from camradepth_tpu.config import ModelConfig
from camradepth_tpu.models.encoder import SimplifiedTransformer
from camradepth_tpu.models.layers import (
    ConvLayer,
    Decoder,
    DepthActivation,
    SegConv,
    SubpixelDepthActivation,
    TPUDecoder,
    depth_to_space,
    seg_block,
    space_to_depth,
)

Dtype = Any


class CamRaDepth(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        mid = cfg.mid_channels
        if x.shape[-1] != cfg.input_channels:
            raise ValueError(
                f"expected {cfg.input_channels} input channels (NHWC), got "
                f"{x.shape[-1]}; slice the feature stack to the model variant "
                f"(reference runner.py:193)"
            )
        x = x.astype(dtype)

        encoder = SimplifiedTransformer(
            dims=cfg.dims,
            num_heads=cfg.heads,
            mlp_ratios=cfg.ff_expansion,
            sr_ratios=cfg.sr_ratios,
            depths=cfg.depths,
            drop_path_rate=cfg.drop_path_rate,
            qkv_bias=cfg.qkv_bias,
            divisor=cfg.groupnorm_divisor,
            use_pallas=cfg.use_pallas_attention,
            remat_blocks=cfg.remat_encoder,
            dtype=dtype,
            name="dest_encoder",
        )
        lay_out = encoder(x, deterministic=deterministic)

        def dropout2d(v):
            # Channel dropout (torch Dropout2d(0.2), CamRaDepth.py:96):
            # drops whole feature maps, broadcast over H, W.
            return nn.Dropout(
                rate=cfg.dropout_rate, broadcast_dims=(1, 2)
            )(v, deterministic=deterministic)

        # Optional backward rematerialization of the memory-heavy decoder
        # stages (full-res residuals dominate training HBM).
        import functools
        DecCls = (
            nn.remat(Decoder, static_argnums=())
            if cfg.remat_decoder
            else Decoder
        )
        Dec = functools.partial(
            DecCls, use_pallas_resize=cfg.use_pallas_resize
        )
        # Low-resolution stages (<= quarter res) optionally remat
        # independently of the expensive full-res stages.
        DecSmallCls = (
            nn.remat(Decoder, static_argnums=())
            if (cfg.remat_decoder or cfg.remat_decoder_small)
            else Decoder
        )
        DecSmall = functools.partial(
            DecSmallCls, use_pallas_resize=cfg.use_pallas_resize
        )
        # TPU variant: half/full-res stages swap to the MXU-aligned
        # subpixel decoder (see TPUDecoder docstring / config.py).
        TDec = (
            nn.remat(TPUDecoder, static_argnums=())
            if cfg.remat_decoder
            else TPUDecoder
        )

        # 1x1 skip convs (CamRaDepth.py:61-64, 109-112).
        enc1 = ConvLayer(cfg.dims[3], 1, 1, 0, dtype=dtype,
                         name="from_encoder_1")(lay_out[3])
        enc2 = ConvLayer(cfg.dims[2], 1, 1, 0, dtype=dtype,
                         name="from_encoder_2")(lay_out[2])
        enc3 = ConvLayer(cfg.dims[1], 1, 1, 0, dtype=dtype,
                         name="from_encoder_3")(lay_out[1])
        enc4 = ConvLayer(cfg.dims[0], 1, 1, 0, dtype=dtype,
                         name="from_encoder_4")(lay_out[0])

        # Depth decoder (CamRaDepth.py:115-149).
        d = dropout2d(DecSmall(mid, has_skip=True, dtype=dtype,
                               name="depth_upsample_0")(enc1, enc2))
        d = dropout2d(DecSmall(mid, has_skip=True, dtype=dtype,
                               name="depth_upsample_1")(d, enc3))
        d = dropout2d(DecSmall(mid, has_skip=True, dtype=dtype,
                               name="depth_upsample_2")(d, enc4))
        inter_depth_3 = DepthActivation(1, dtype=dtype,
                                        name="depth_activation_3")(d)
        d = jnp.concatenate([d, inter_depth_3], axis=-1)

        if cfg.tpu_decoder:
            d4 = dropout2d(
                TDec(mid, upsample_out=True, dtype=dtype,
                     name="depth_upsample_3")(d)
            )
        else:
            d4 = dropout2d(Dec(mid, dtype=dtype, name="depth_upsample_3")(d))

        seg_features = None
        sup_seg_map = None
        unsup_map = None
        seg_map = None
        seg_logits_inter = None
        seg_logits_final = None
        use_seg = cfg.supervised_seg or cfg.unsupervised_seg

        if use_seg:
            if cfg.tpu_decoder:
                seg_features = dropout2d(
                    TDec(mid, upsample_out=True, dtype=dtype,
                         name="seg_upsample_0")(d)
                )
            else:
                seg_features = dropout2d(
                    Dec(mid, dtype=dtype, name="seg_upsample_0")(d)
                )
        if cfg.supervised_seg:
            seg_logits_inter = SegConv(cfg.num_classes, dtype=dtype,
                                       name="seg_conv_stage_4")(seg_features)
            sup_seg_map = seg_block(seg_logits_inter, cfg.num_classes)
            seg_map = sup_seg_map
        if cfg.unsupervised_seg:
            u = SegConv(cfg.unsup_classes, dtype=dtype,
                        name="unsup_stage_4")(seg_features)
            unsup_map = seg_block(u, cfg.unsup_classes)
            seg_map = (
                unsup_map if sup_seg_map is None
                else jnp.concatenate([sup_seg_map, unsup_map], axis=-1)
            )
        if cfg.supervised_seg:
            seg_features = jnp.concatenate([seg_features, sup_seg_map], -1)
        elif cfg.unsupervised_seg:
            seg_features = jnp.concatenate([seg_features, unsup_map], -1)

        tmp = d4 if seg_map is None else jnp.concatenate([d4, seg_map], -1)
        inter_depth_4 = DepthActivation(1, dtype=dtype,
                                        name="depth_activation_4")(tmp)
        d4 = jnp.concatenate([d4, inter_depth_4], axis=-1)

        # Final stage with the raw input as skip (CamRaDepth.py:149).
        # TPU variant: d5/seg_features stay at HALF resolution (the
        # skip is folded in via space_to_depth inside TPUDecoder) and
        # the final heads upsample via subpixel projection, so the
        # lane-starved full-resolution convolutions disappear entirely.
        if cfg.tpu_decoder:
            d5 = dropout2d(
                TDec(mid, has_skip=True, upsample_out=False, dtype=dtype,
                     name="depth_upsample_4")(d4, x)
            )
            if use_seg:
                seg_features = dropout2d(
                    TDec(mid, has_skip=True, upsample_out=False,
                         dtype=dtype, name="seg_upsample_1")(
                             seg_features, x)
                )
        else:
            d5 = dropout2d(
                Dec(mid, has_skip=True, dtype=dtype,
                    name="depth_upsample_4")(d4, x)
            )
            if use_seg:
                seg_features = dropout2d(
                    Dec(mid, has_skip=True, dtype=dtype,
                        name="seg_upsample_1")(seg_features, x)
                )
        seg_head_mul = 4 if cfg.tpu_decoder else 1
        if cfg.supervised_seg:
            seg_logits_final = SegConv(
                seg_head_mul * cfg.num_classes, dtype=dtype,
                name="seg_conv_final")(seg_features)
            if cfg.tpu_decoder:
                seg_logits_final = depth_to_space(seg_logits_final, 2)
            sup_seg_map = seg_block(seg_logits_final, cfg.num_classes)
            seg_map = sup_seg_map
        if cfg.unsupervised_seg:
            u = SegConv(seg_head_mul * cfg.unsup_classes, dtype=dtype,
                        name="unsup_final")(seg_features)
            if cfg.tpu_decoder:
                u = depth_to_space(u, 2)
            unsup_map = seg_block(u, cfg.unsup_classes)
            seg_map = (
                unsup_map if sup_seg_map is None
                else jnp.concatenate([sup_seg_map, unsup_map], axis=-1)
            )

        if cfg.tpu_decoder:
            # seg guidance re-enters the half-res head via S2D.
            tmp = (
                d5 if seg_map is None
                else jnp.concatenate([d5, space_to_depth(seg_map, 2)], -1)
            )
            final_depth = SubpixelDepthActivation(
                1, dtype=dtype, name="depth_activation_5")(tmp)
        else:
            tmp = (
                d5 if seg_map is None
                else jnp.concatenate([d5, seg_map], -1)
            )
            final_depth = DepthActivation(1, dtype=dtype,
                                          name="depth_activation_5")(tmp)

        f32 = lambda v: None if v is None else v.astype(jnp.float32)
        return {
            "depth": {
                "intermediate_depths": (
                    None, None, f32(inter_depth_3), f32(inter_depth_4)
                ),
                "final_depth": f32(final_depth),
            },
            "seg": {
                "final_seg": f32(seg_logits_final),
                "intermediate_seg": f32(seg_logits_inter),
                "unsup_map": f32(unsup_map),
            },
        }


def create_model(cfg: ModelConfig) -> CamRaDepth:
    return CamRaDepth(cfg)
