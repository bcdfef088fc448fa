"""Independent PyTorch implementation of the CamRaDepth architecture.

Test oracle only: written from the architecture spec (SURVEY.md §3.2 /
component table) with state_dict keys in the reference checkpoint format,
so it (a) provides golden activations for cross-framework parity tests and
(b) proves torch->flax checkpoint conversion on a structurally identical
state_dict. Evaluation-mode only (no DropPath/Dropout — both identity at
eval).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

GN_DIV = 16


def _gn(ch, groups=None):
    return nn.GroupNorm(groups or max(1, ch // GN_DIV), ch)


class MirrorMlp(nn.Module):
    def __init__(self, dim, hidden, out):
        super().__init__()
        self.fc1 = nn.Conv1d(dim, hidden, 1)
        self.dwconv = MirrorDWConv(hidden)
        self.norm1 = _gn(hidden)
        self.norm2 = nn.GroupNorm(max(1, out // GN_DIV), hidden)
        self.fc2 = nn.Conv1d(hidden, out, 1)

    def forward(self, x, h, w):
        x = self.norm1(self.fc1(x))
        x = self.norm2(self.dwconv(x, h, w))
        x = F.gelu(x)
        return self.fc2(x)


class MirrorDWConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, h, w):
        b, c, n = x.shape
        return self.dwconv(x.reshape(b, c, h, w)).flatten(2)


class MirrorAttention(nn.Module):
    def __init__(self, dim, heads, sr_ratio):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.sr_ratio = sr_ratio
        self.q = nn.Conv1d(dim, dim, 1, bias=True)
        self.k = nn.Conv1d(dim, dim, 1, bias=True)
        self.proj = nn.Conv1d(dim, dim, 1)
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = _gn(dim)

    def forward(self, x, h, w):
        b, c, n = x.shape
        q = self.q(x).reshape(b, self.heads, c // self.heads, n)
        q = q.permute(0, 1, 3, 2)
        if self.sr_ratio > 1:
            kv_src = self.norm(
                self.sr(x.reshape(b, c, h, w)).reshape(b, c, -1)
            )
        else:
            kv_src = x
        k = self.k(kv_src).reshape(b, self.heads, c // self.heads, -1)
        scores = (q @ k) * self.scale
        smax = scores.max(-1).values  # [b, heads, n]
        vbar = x.mean(2)  # [b, c]
        out = torch.einsum("bhn,bc->bcn", smax, vbar)
        return self.proj(out)


class MirrorBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, sr_ratio):
        super().__init__()
        self.norm1 = _gn(dim)
        self.norm2 = _gn(dim)
        self.attn = MirrorAttention(dim, heads, sr_ratio)
        self.mlp1 = MirrorMlp(dim, int(dim * mlp_ratio), dim)

    def forward(self, x, h, w):
        x = x + self.attn(self.norm1(x), h, w)
        return x + self.mlp1(self.norm2(x), h, w)


class MirrorPatchEmbed(nn.Module):
    def __init__(self, in_ch, dim, patch, stride):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch, stride, patch // 2)
        self.norm = _gn(dim)

    def forward(self, x):
        x = self.proj(x)
        _, _, h, w = x.shape
        return self.norm(x).flatten(2), h, w


class MirrorEncoder(nn.Module):
    def __init__(self, in_ch, dims, heads, mlp_ratios, sr_ratios, depths):
        super().__init__()
        patch = [(7, 4), (3, 2), (3, 2), (3, 2)]
        chans = [in_ch] + list(dims[:-1])
        for i in range(4):
            setattr(
                self,
                f"patch_embed{i + 1}",
                MirrorPatchEmbed(chans[i], dims[i], *patch[i]),
            )
            setattr(
                self,
                f"block{i + 1}",
                nn.ModuleList(
                    [
                        MirrorBlock(dims[i], heads[i], mlp_ratios[i],
                                    sr_ratios[i])
                        for _ in range(depths[i])
                    ]
                ),
            )

    def forward(self, x):
        outs = []
        b = x.shape[0]
        for i in range(4):
            x, h, w = getattr(self, f"patch_embed{i + 1}")(x)
            for blk in getattr(self, f"block{i + 1}"):
                x = blk(x, h, w)
            x = x.reshape(b, -1, h, w)
            outs.append(x)
        return outs


class MirrorConvLayer(nn.Module):
    def __init__(self, in_ch, out_ch, k=3, s=1, p=1):
        super().__init__()
        self.model = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, k, s, p, bias=False),
            _gn(out_ch),
            nn.GELU(),
        )

    def forward(self, x):
        return self.model(x)


class MirrorShortRes(nn.Module):
    """Internal widths always derive from mid=128 (reference default),
    independent of the model's mid_channels."""

    def __init__(self, in_ch, out_ch, mid=128):
        super().__init__()
        w0, w1 = int(mid * 0.75), int(mid * 0.5)
        self.layers = nn.ModuleList(
            [
                MirrorConvLayer(in_ch, w0),
                MirrorConvLayer(in_ch + w0, w1),
                MirrorConvLayer(in_ch + w0 + w1, out_ch),
            ]
        )

    def forward(self, x):
        for layer in self.layers[:-1]:
            x = torch.cat([x, layer(x)], 1)
        return self.layers[-1](x)


class MirrorDecoder(nn.Module):
    def __init__(self, in_ch, out_ch, skip=0, mid=128):
        super().__init__()
        self.upsample = nn.Upsample(scale_factor=2, mode="bicubic")
        self.conv = MirrorShortRes(in_ch + skip, out_ch, mid)
        self.has_skip = skip > 0

    def forward(self, x, skip=None):
        x = self.upsample(x)
        if self.has_skip:
            x = torch.cat([x, skip], 1)
        return self.conv(x)


class MirrorDepthAct(nn.Module):
    def __init__(self, in_ch, out_ch=1):
        super().__init__()
        self.conv_1 = nn.Conv2d(in_ch, 32, 3, padding=1)
        self.conv_2 = nn.Conv2d(32, out_ch, 3, padding=1)

    def forward(self, x):
        return self.conv_2(torch.sigmoid(self.conv_1(x)))


def _seg_map(logits, n):
    return logits.argmax(1, keepdim=True) / n


class MirrorCamRaDepth(nn.Module):
    """Full model; cfg is a camradepth_tpu ModelConfig."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dims = cfg.dims
        mid = cfg.mid_channels
        self.dest_encoder = MirrorEncoder(
            cfg.input_channels, dims, cfg.heads, cfg.ff_expansion,
            cfg.sr_ratios, cfg.depths,
        )
        self.from_encoder_1 = MirrorConvLayer(dims[3], dims[3], 1, 1, 0)
        self.from_encoder_2 = MirrorConvLayer(dims[2], dims[2], 1, 1, 0)
        self.from_encoder_3 = MirrorConvLayer(dims[1], dims[1], 1, 1, 0)
        self.from_encoder_4 = MirrorConvLayer(dims[0], dims[0], 1, 1, 0)
        self.depth_upsample = nn.ModuleList(
            [
                MirrorDecoder(dims[3], mid, skip=dims[2]),
                MirrorDecoder(mid, mid, skip=dims[1]),
                MirrorDecoder(mid, mid, skip=dims[0]),
                MirrorDecoder(mid + 1, mid),
                MirrorDecoder(mid + 1, mid, skip=cfg.input_channels),
            ]
        )
        n_seg = int(cfg.supervised_seg) + int(cfg.unsupervised_seg)
        self.depth_activation_3 = MirrorDepthAct(mid)
        self.depth_activation_4 = MirrorDepthAct(mid + n_seg)
        self.depth_activation_5 = MirrorDepthAct(mid + n_seg)
        if n_seg:
            self.seg_upsample = nn.ModuleList(
                [
                    MirrorDecoder(mid + 1, mid),
                    MirrorDecoder(mid + 1, mid, skip=cfg.input_channels),
                ]
            )
        if cfg.supervised_seg:
            self.seg_conv_stage_4 = nn.Conv2d(mid, cfg.num_classes, 3,
                                              padding=1)
            self.seg_conv_final = nn.Conv2d(mid, cfg.num_classes, 3,
                                            padding=1)
        if cfg.unsupervised_seg:
            self.unsup_stage_4 = nn.Conv2d(mid, cfg.unsup_classes, 3,
                                           padding=1)
            self.unsup_final = nn.Conv2d(mid, cfg.unsup_classes, 3,
                                         padding=1)

    def forward(self, x):
        cfg = self.cfg
        outs = self.dest_encoder(x)
        e1 = self.from_encoder_1(outs[3])
        e2 = self.from_encoder_2(outs[2])
        e3 = self.from_encoder_3(outs[1])
        e4 = self.from_encoder_4(outs[0])
        d = self.depth_upsample[0](e1, e2)
        d = self.depth_upsample[1](d, e3)
        d = self.depth_upsample[2](d, e4)
        inter3 = self.depth_activation_3(d)
        d = torch.cat([d, inter3], 1)
        d4 = self.depth_upsample[3](d)

        seg_feat = sup_map = unsup_map = seg_map = None
        seg_inter = seg_final = None
        use_seg = cfg.supervised_seg or cfg.unsupervised_seg
        if use_seg:
            seg_feat = self.seg_upsample[0](d)
        if cfg.supervised_seg:
            seg_inter = self.seg_conv_stage_4(seg_feat)
            sup_map = _seg_map(seg_inter, cfg.num_classes)
            seg_map = sup_map
        if cfg.unsupervised_seg:
            unsup_map = _seg_map(self.unsup_stage_4(seg_feat),
                                 cfg.unsup_classes)
            seg_map = unsup_map if sup_map is None else torch.cat(
                [sup_map, unsup_map], 1
            )
        if cfg.supervised_seg:
            seg_feat = torch.cat([seg_feat, sup_map], 1)
        elif cfg.unsupervised_seg:
            seg_feat = torch.cat([seg_feat, unsup_map], 1)

        tmp = d4 if seg_map is None else torch.cat([d4, seg_map], 1)
        inter4 = self.depth_activation_4(tmp)
        d4 = torch.cat([d4, inter4], 1)
        d5 = self.depth_upsample[4](d4, x)
        if use_seg:
            seg_feat = self.seg_upsample[1](seg_feat, x)
        if cfg.supervised_seg:
            seg_final = self.seg_conv_final(seg_feat)
            sup_map = _seg_map(seg_final, cfg.num_classes)
            seg_map = sup_map
        if cfg.unsupervised_seg:
            unsup_map = _seg_map(self.unsup_final(seg_feat),
                                 cfg.unsup_classes)
            seg_map = unsup_map if sup_map is None else torch.cat(
                [sup_map, unsup_map], 1
            )
        tmp = d5 if seg_map is None else torch.cat([d5, seg_map], 1)
        final = self.depth_activation_5(tmp)
        return {
            "depth": {
                "intermediate_depths": (None, None, inter3, inter4),
                "final_depth": final,
            },
            "seg": {"final_seg": seg_final, "intermediate_seg": seg_inter,
                    "unsup_map": unsup_map},
        }
