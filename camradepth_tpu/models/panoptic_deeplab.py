"""TPU-native Panoptic-DeepLab (clean-room, checkpoint-loadable).

The reference's prep pipeline shells out to the external torch
Panoptic-DeepLab repo to produce its vehicle segmentation artifacts
(/root/reference/scripts/semantic_seg.py:89-171: R101-os32 Cityscapes
model -> semantic argmax -> classes {13 car, 14 truck, 15 bus} ->
*_mseg.npy). This is a from-scratch JAX/Flax implementation of that
architecture ("Panoptic-DeepLab: A Simple, Strong, and Fast Baseline
for Bottom-Up Panoptic Segmentation", Cheng et al., CVPR 2020) so the
last torch-only prep stage can run natively on TPU:

- ResNet-101 backbone (torchvision v1.5 layout: stride on the 3x3,
  os32 — no dilation), NHWC, BatchNorm in eval semantics from
  checkpoint running statistics;
- dual ASPP + dual light-weight decoder (semantic: 256ch, skips
  res3->64 / res2->32; instance: 128ch, skips ->32/->16) with 5x5
  depthwise-separable fuse convs — depthwise ops are VPU work, the
  1x1 pointwise and every other conv are MXU matmuls;
- all decoder upsampling is align_corners=True bilinear expressed as
  two one-hot interpolation matmuls (static shapes, MXU-friendly;
  gather-based resizes scatter poorly on TPU);
- heads: semantic 256->19 logits, instance center 32->1 / offset
  32->2 (present so the parameter table matches the full official
  checkpoint; the prep stage only consumes the semantic argmax).

``load_torch_panoptic_deeplab`` maps the official
``panoptic_deeplab_R101_os32_cityscapes.pth`` state_dict onto the Flax
tree by REGISTRATION ORDER + shape grammar rather than by key string:
tensors are consumed in torch state_dict order (minus
``num_batches_tracked``) and zipped against this module's
deterministic parameter order with per-tensor shape checks. That makes
the loader robust to upstream module-name drift — the official repo is
not vendored here, so exact key strings are reconstructed best-effort
(tests synthesize that reconstruction AND prove the loader is
insensitive to renames), while counts/shapes/order are pinned by the
architecture itself.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from camradepth_tpu.models.raft import FrozenBatchNorm

Dtype = Any

# Cityscapes trainIds: 13 car, 14 truck, 15 bus (semantic_seg.py:165).
VEHICLE_CLASSES = (13, 14, 15)
NUM_CLASSES = 19
# Pixel-scale ImageNet statistics (the reference pads raw uint8 frames
# with DATASET.MEAN before normalizing, semantic_seg.py:150-152).
MEAN = (123.675, 116.28, 103.53)
STD = (58.395, 57.12, 57.375)


def resize_bilinear_ac(x: jnp.ndarray, out_hw: Tuple[int, int]):
    """align_corners=True bilinear resize (torch F.interpolate semantics
    used throughout the upstream decoder) as two interpolation-matrix
    matmuls — static shapes, runs on the MXU."""
    h, w = x.shape[1], x.shape[2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x

    def mat(n_in: int, n_out: int) -> np.ndarray:
        if n_out == 1 or n_in == 1:
            return np.ones((n_out, n_in), np.float32) / n_in
        pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
        frac = (pos - lo).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        m[np.arange(n_out), lo] = 1.0 - frac
        m[np.arange(n_out), lo + 1] += frac
        return m

    mh = jnp.asarray(mat(h, oh), x.dtype)
    mw = jnp.asarray(mat(w, ow), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class ConvBN(nn.Module):
    """conv (no bias) + frozen BN (+ optional relu) — the basic unit
    every non-head conv in the architecture uses."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    depthwise: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.features if self.depthwise else 1,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, name="bn")(x)
        return nn.relu(x) if self.relu else x


class SepConvBN(nn.Module):
    """5x5 depthwise-separable conv (dw+bn+relu, pw+bn+relu) — the
    upstream decoder's fuse/head unit."""

    features: int
    kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(x.shape[-1], self.kernel, depthwise=True,
                   dtype=self.dtype, name="depthwise")(x)
        return ConvBN(self.features, 1, dtype=self.dtype,
                      name="pointwise")(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvBN(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = ConvBN(self.planes, 3, stride=self.stride,
                     dtype=self.dtype, name="conv2")(out)
        out = ConvBN(self.planes * 4, 1, relu=False,
                     dtype=self.dtype, name="conv3")(out)
        if self.has_down:
            x = ConvBN(self.planes * 4, 1, stride=self.stride,
                       relu=False, dtype=self.dtype, name="down")(x)
        return nn.relu(out + x)


class ResNet101(nn.Module):
    """torchvision resnet101 feature extractor, os32: returns
    {res2: /4 256, res3: /8 512, res4: /16 1024, res5: /32 2048}."""

    dtype: Dtype = jnp.float32
    layers: Sequence[int] = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = ConvBN(64, 7, stride=2, dtype=self.dtype, name="stem")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        feats = {}
        planes = 64
        for li, n_blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    has_down=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x)
            feats[f"res{li + 2}"] = x
            planes *= 2
        return feats


class ASPP(nn.Module):
    """1x1 + three dilated 3x3 (rates (3,6,9) at os32) + image pooling,
    concat -> 1x1 project. Dropout is inference-disabled."""

    features: int
    rates: Sequence[int] = (3, 6, 9)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        branches = [ConvBN(self.features, 1, dtype=self.dtype,
                           name="conv0")(x)]
        for i, r in enumerate(self.rates):
            branches.append(
                ConvBN(self.features, 3, dilation=r, dtype=self.dtype,
                       name=f"conv{i + 1}")(x)
            )
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.features, 1, dtype=self.dtype,
                        name="pool_conv")(pooled)
        branches.append(
            jnp.broadcast_to(pooled, branches[0].shape)
        )
        cat = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, 1, dtype=self.dtype,
                      name="project")(cat)


class SingleDecoder(nn.Module):
    """ASPP + per-low-level (project -> upsample -> concat -> 5x5 sep
    fuse); low levels are consumed high-to-low (res3 then res2)."""

    aspp_channels: int
    decoder_channels: int
    project_channels: Sequence[int]  # e.g. (64, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, res5, lows: Sequence[jnp.ndarray]):
        x = ASPP(self.aspp_channels, dtype=self.dtype, name="aspp")(res5)
        for i, (low, pc) in enumerate(zip(lows, self.project_channels)):
            low = ConvBN(pc, 1, dtype=self.dtype, name=f"project{i}")(low)
            x = resize_bilinear_ac(x, low.shape[1:3])
            x = SepConvBN(self.decoder_channels, dtype=self.dtype,
                          name=f"fuse{i}")(
                jnp.concatenate([x, low], axis=-1)
            )
        return x


class Head(nn.Module):
    """5x5 sep conv -> 1x1 predictor (bias, no BN)."""

    head_channels: int
    num_outputs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = SepConvBN(self.head_channels, dtype=self.dtype,
                      name="head_conv")(x)
        return nn.Conv(self.num_outputs, (1, 1), use_bias=True,
                       dtype=self.dtype, name="predictor")(x)


class PanopticDeepLab(nn.Module):
    """R101-os32 Cityscapes Panoptic-DeepLab, inference semantics.

    Outputs (all at the res2 /4 resolution; the wrapper upsamples):
    semantic [B,h,w,19], center [B,h,w,1], offset [B,h,w,2].
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        feats = ResNet101(dtype=self.dtype, name="backbone")(x)
        lows = [feats["res3"], feats["res2"]]
        sem = SingleDecoder(256, 256, (64, 32), dtype=self.dtype,
                            name="semantic_decoder")(feats["res5"], lows)
        semantic = Head(256, NUM_CLASSES, dtype=self.dtype,
                        name="semantic_head")(sem)
        ins = SingleDecoder(256, 128, (32, 16), dtype=self.dtype,
                            name="instance_decoder")(feats["res5"], lows)
        center = Head(32, 1, dtype=self.dtype, name="center_head")(ins)
        offset = Head(32, 2, dtype=self.dtype, name="offset_head")(ins)
        return {
            "semantic": semantic.astype(jnp.float32),
            "center": center.astype(jnp.float32),
            "offset": offset.astype(jnp.float32),
        }


# ---------------------------------------------------------------------------
# Checkpoint loading: registration order + shape grammar
# ---------------------------------------------------------------------------


def _convbn_paths(prefix: str) -> List[Tuple[Tuple[str, ...], str]]:
    """(flax path, torch role) pairs for one ConvBN in torch
    registration order: conv.weight, bn.weight, bn.bias, bn.mean,
    bn.var."""
    p = tuple(prefix.split("/"))
    return [
        (p + ("conv", "kernel"), "conv"),
        (p + ("bn", "scale"), "bn"),
        (p + ("bn", "bias"), "bn"),
        (p + ("bn", "mean"), "bn"),
        (p + ("bn", "var"), "bn"),
    ]


def _sep_paths(prefix: str) -> List[Tuple[Tuple[str, ...], str]]:
    out = _convbn_paths(f"{prefix}/depthwise")
    # flax depthwise kernels are HWIO with I=1: mark for the transpose
    out[0] = (out[0][0], "dwconv")
    return out + _convbn_paths(f"{prefix}/pointwise")


def _decoder_paths(prefix: str) -> List[Tuple[Tuple[str, ...], str]]:
    out: List[Tuple[Tuple[str, ...], str]] = []
    # upstream ASPP: convs.0 (1x1), convs.1-3 (dilated), convs.4
    # (pooling), then project — registration order
    for unit in ("conv0", "conv1", "conv2", "conv3", "pool_conv",
                 "project"):
        out += _convbn_paths(f"{prefix}/aspp/{unit}")
    # upstream SinglePanopticDeepLabDecoder registers project convs
    # then fuse convs (ModuleLists in low-level order)
    for i in (0, 1):
        out += _convbn_paths(f"{prefix}/project{i}")
    for i in (0, 1):
        out += _sep_paths(f"{prefix}/fuse{i}")
    return out


def _head_paths(prefix: str) -> List[Tuple[Tuple[str, ...], str]]:
    out = _sep_paths(f"{prefix}/head_conv")
    p = tuple(prefix.split("/"))
    out.append((p + ("predictor", "kernel"), "conv"))
    out.append((p + ("predictor", "bias"), "bias"))
    return out


def param_order() -> List[Tuple[Tuple[str, ...], str]]:
    """Every parameter of :class:`PanopticDeepLab` in the torch
    state_dict registration order of the official model
    (backbone -> semantic decoder/head -> instance decoder/heads)."""
    out = _convbn_paths("backbone/stem")
    for li, n_blocks in enumerate((3, 4, 23, 3)):
        for bi in range(n_blocks):
            b = f"backbone/layer{li + 1}_{bi}"
            out += _convbn_paths(f"{b}/conv1")
            out += _convbn_paths(f"{b}/conv2")
            out += _convbn_paths(f"{b}/conv3")
            if bi == 0:
                out += _convbn_paths(f"{b}/down")
    out += _decoder_paths("semantic_decoder")
    out += _head_paths("semantic_head")
    out += _decoder_paths("instance_decoder")
    out += _head_paths("center_head")
    out += _head_paths("offset_head")
    return out


def _to_flax(value: np.ndarray, role: str) -> np.ndarray:
    v = np.asarray(value, np.float32)
    if role == "conv":  # OIHW -> HWIO
        return v.transpose(2, 3, 1, 0)
    if role == "dwconv":  # torch depthwise (C,1,k,k) -> flax (k,k,1,C)
        return v.transpose(2, 3, 1, 0)
    return v  # bn stats / bias: 1D


def load_torch_panoptic_deeplab(state: Dict[str, Any]) -> Dict:
    """Official ``panoptic_deeplab_R101_os32_cityscapes.pth``
    state_dict -> Flax param tree, by REGISTRATION ORDER + shape
    grammar (module docstring). Raises with the offending tensor on
    any count/shape mismatch — a wrong architecture cannot load
    silently."""
    items = [
        (k, np.asarray(v.numpy() if hasattr(v, "numpy") else v))
        for k, v in state.items()
        if not k.endswith("num_batches_tracked")
    ]
    order = param_order()
    if len(items) != len(order):
        raise ValueError(
            f"checkpoint has {len(items)} tensors (after dropping "
            f"num_batches_tracked), architecture expects {len(order)} — "
            "not a Panoptic-DeepLab R101-os32 state_dict?"
        )
    params: Dict = {}
    for (key, value), (path, role) in zip(items, order):
        v = _to_flax(value, role)
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = v
    # verify against the real module tree (paths AND shapes)
    model = PanopticDeepLab()
    want = jax.eval_shape(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, 65, 129, 3), jnp.float32)
        )["params"],
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    from flax import traverse_util

    got_flat = traverse_util.flatten_dict(params)
    want_flat = traverse_util.flatten_dict(want)
    if set(got_flat) != set(want_flat):
        missing = sorted(set(want_flat) - set(got_flat))[:3]
        extra = sorted(set(got_flat) - set(want_flat))[:3]
        raise ValueError(
            f"param tree mismatch: missing {missing}, extra {extra}"
        )
    for path, v in got_flat.items():
        if tuple(v.shape) != tuple(want_flat[path].shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: checkpoint "
                f"{v.shape} vs architecture {want_flat[path].shape}"
            )
    return params


# ---------------------------------------------------------------------------
# Inference wrappers (the prep-stage contract)
# ---------------------------------------------------------------------------


def _pad_hw(h: int, w: int) -> Tuple[int, int]:
    """The reference's exact pad rule (semantic_seg.py:147-149):
    (n+31)//32*32 + 1 — the odd size keeps align_corners resizes
    lattice-exact through the os32 pyramid."""
    return (h + 31) // 32 * 32 + 1, (w + 31) // 32 * 32 + 1


@functools.partial(jax.jit, static_argnums=(2,))
def _classmap(params, img_f32, out_hw: Tuple[int, int]):
    model = PanopticDeepLab()
    x = (img_f32 - jnp.asarray(MEAN)) / jnp.asarray(STD)
    logits = model.apply({"params": params}, x[None])["semantic"]
    logits = resize_bilinear_ac(logits, img_f32.shape[:2])
    cls = jnp.argmax(logits, axis=-1)[0]
    return cls[: out_hw[0], : out_hw[1]].astype(jnp.int32)


def classmap_fn(params):
    """Returns ``estimator(im [H,W,3] RGB uint8) -> [H,W] int64``
    cityscapes-trainId map — the dataprep seg-estimator contract
    (adapters.make_seg_estimator), matching semantic_seg.py's
    pad -> normalize -> forward -> argmax -> crop sequence."""

    def estimator(im: np.ndarray) -> np.ndarray:
        h, w = im.shape[:2]
        ph, pw = _pad_hw(h, w)
        canvas = np.empty((ph, pw, 3), np.float32)
        canvas[:] = np.asarray(MEAN, np.float32)  # mean-pad (ref quirk)
        canvas[:h, :w] = im.astype(np.float32)
        cls = _classmap(params, jnp.asarray(canvas), (h, w))
        return np.asarray(cls).astype(np.int64)

    return estimator
