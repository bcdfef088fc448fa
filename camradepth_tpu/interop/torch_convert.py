"""PyTorch checkpoint -> Flax params conversion.

Converts a reference-format ``state_dict`` (as produced by the reference's
``torch.save({'state_dict': ...})``, runner.py:366-373) into this
framework's parameter pytree. The module tree here intentionally mirrors
the reference's names, so conversion is a mechanical rename + layout
transform:

  torch                              flax (this repo)
  ---------------------------------- --------------------------------
  dest_encoder.block2.3.attn.q       dest_encoder/block2_3/attn/q
  conv2d weight [O,I,kh,kw]          kernel [kh,kw,I,O]
  depthwise conv2d [C,1,kh,kw]       kernel [kh,kw,1,C]
  conv1d 1x1 (token proj) [O,I,1]    Dense kernel [I,O]
  GroupNorm weight/bias              scale/bias
  *.model.0 / *.model.1 (ConvLayer)  */conv + */norm
  seg heads (bare Conv2d)            <name>/conv/{kernel,bias}

``module.`` prefixes (DataParallel) are stripped, mirroring the
reference's loader (utils.py:352-370); shape-matching partial application
is delegated to utils/checkpoint.partial_restore_params.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

_SEG_HEADS = (
    "seg_conv_stage_4",
    "seg_conv_final",
    "unsup_stage_4",
    "unsup_final",
)


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """Map one reference state_dict key to a flax param path."""
    key = key.removeprefix("module.")
    parts = key.split(".")
    leaf = parts[-1]
    body = parts[:-1]

    out = []
    i = 0
    while i < len(body):
        p = body[i]
        # blockN.M -> blockN_M
        m = re.fullmatch(r"block(\d)", p)
        if m and i + 1 < len(body) and body[i + 1].isdigit():
            out.append(f"block{m.group(1)}_{body[i + 1]}")
            i += 2
            continue
        # depth_upsample.K / seg_upsample.K (ModuleList)
        if p in ("depth_upsample", "seg_upsample") and i + 1 < len(body):
            out.append(f"{p}_{body[i + 1]}")
            i += 2
            continue
        # ConvLayer's Sequential: model.0 = conv, model.1 = norm
        if p == "model" and i + 1 < len(body):
            out.append({"0": "conv", "1": "norm"}[body[i + 1]])
            i += 2
            continue
        # ShortResBlock layers.J -> layers_J
        if p == "layers" and i + 1 < len(body):
            out.append(f"layers_{body[i + 1]}")
            i += 2
            continue
        # DWConv module wraps its conv attribute of the same name
        if p == "dwconv" and i + 1 < len(body) and body[i + 1] == "dwconv":
            out.append("dwconv")
            i += 2
            continue
        out.append(p)
        i += 1

    # bare Conv2d seg heads live under <name>/conv in flax
    if out and out[-1] in _SEG_HEADS:
        out.append("conv")
    if len(out) >= 2 and out[0] in _SEG_HEADS and out[-1] != "conv":
        out.append("conv")

    # leaf rename: GroupNorm weight->scale; conv weight->kernel
    if leaf == "weight":
        # norm layers are those whose flax path ends in norm1/norm2/norm
        if out and re.fullmatch(r"norm\d?", out[-1]):
            leaf = "scale"
        else:
            leaf = "kernel"
    return tuple(out) + (leaf,)


def convert_tensor(value: np.ndarray, leaf: str) -> np.ndarray:
    """Apply the torch->flax layout transform based on rank."""
    v = np.asarray(value)
    if leaf != "kernel":
        return v
    if v.ndim == 4:
        o, i, kh, kw = v.shape
        if i == 1 and o > 1:  # depthwise [C,1,kh,kw] -> [kh,kw,1,C]
            return v.transpose(2, 3, 1, 0)
        return v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if v.ndim == 3:  # conv1d 1x1 [O,I,1] -> Dense [I,O]
        return v[:, :, 0].T
    if v.ndim == 2:  # Linear [O,I] -> [I,O]
        return v.T
    return v


def convert_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """Full conversion: torch state_dict -> nested flax params dict."""
    tree: Dict = {}
    for key, value in state_dict.items():
        path = torch_key_to_flax_path(key)
        v = convert_tensor(
            value.detach().cpu().numpy()
            if hasattr(value, "detach")
            else np.asarray(value),
            path[-1],
        )
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def flax_params_to_state_dict(params) -> Dict[str, np.ndarray]:
    """Reverse conversion (flax -> reference-format torch state_dict keys),
    for exporting checkpoints a reference user could consume. Exact inverse
    of :func:`torch_key_to_flax_path` / :func:`convert_tensor`."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, value in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        v = np.asarray(value)
        out[_flax_path_to_torch_key(keys)] = _tensor_to_torch(v, keys)
    return out


def _tensor_to_torch(v: np.ndarray, keys) -> np.ndarray:
    if keys[-1] != "kernel":
        return v
    if v.ndim == 4:
        return v.transpose(3, 2, 0, 1)  # HWIO -> OIHW (incl depthwise)
    if v.ndim == 2:
        # token-space Dense layers came from conv1d 1x1 [O,I,1]
        return v.T[:, :, None]
    return v


def _flax_path_to_torch_key(keys) -> str:
    keys = list(keys)
    leaf = keys.pop()
    # ConvLayer context: path ends (..., <convlayer>, 'conv'|'norm') where
    # <convlayer> is from_encoder_* or layers_*. Bare seg heads end
    # (<seg_head>, 'conv').
    parts = []
    for idx, k in enumerate(keys):
        m = re.fullmatch(r"block(\d)_(\d+)", k)
        if m:
            parts += [f"block{m.group(1)}", m.group(2)]
            continue
        m = re.fullmatch(r"(depth_upsample|seg_upsample)_(\d+)", k)
        if m:
            parts += [m.group(1), m.group(2)]
            continue
        m = re.fullmatch(r"layers_(\d+)", k)
        if m:
            parts += ["layers", m.group(1)]
            continue
        if k == "dwconv":
            parts += ["dwconv", "dwconv"]
            continue
        prev = keys[idx - 1] if idx else ""
        in_convlayer = bool(
            re.fullmatch(r"layers_\d+", prev)
            or re.fullmatch(r"from_encoder_\d", prev)
        )
        if k == "conv" and prev in _SEG_HEADS:
            continue  # bare Conv2d: drop the wrapper level
        if k == "conv" and in_convlayer:
            parts.append("model.0")
            continue
        if k == "norm" and in_convlayer:
            parts.append("model.1")
            continue
        parts.append(k)
    leaf_name = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    return ".".join(parts + [leaf_name])


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference .pth and return its state_dict with the
    ``module.`` prefix stripped (runner.py:124-132 load path)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return {k.removeprefix("module."): v for k, v in sd.items()}
