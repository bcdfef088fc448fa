"""External-network adapters for the offline dataprep pipeline.

The reference computes optical flow with a RAFT checkpoint
(/root/reference/scripts/cal_flow.py:18-21,26-93) and vehicle masks
with a detectron2 Panoptic-DeepLab model remapped through mseg
(/root/reference/scripts/semantic_seg.py:89-171). Neither set of
weights ships with this environment, so the pipeline keeps those
stages *pluggable* (dataprep/stages.py): any callable with the right
contract slots in.

This module provides production adapters for the common packaging of
such nets — TorchScript exports — running on the host CPU (these are
offline preprocessing stages; the TPU stays on the training path):

- :func:`raft_flow_from_torchscript`: ``estimator(im1, im2) -> [H,W,2]``
  with RAFT conventions: RGB 0..255 float input, replicate-padding to a
  multiple of 8 (cal_flow.py uses RAFT's InputPadder), output unpadded
  back. Accepts modules returning a flow tensor, an (low, up) pair, or
  a list of iterates (RAFT returns all refinement iterations).
- :func:`seg_classmap_from_torchscript`: ``estimator(im) -> [H,W]``
  int64 class ids via argmax over the module's [1,C,H,W] logits —
  the contract semantic_seg_artifact expects before the mseg 194->56
  remap (stages.py).

Both adapters are interface-tested with randomly initialized scripted
modules (tests/test_adapters.py); with real exported weights they run
the actual networks.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Sequence, Union

import numpy as np


def _require_torch():
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "TorchScript adapters need the torch package"
        ) from e
    import torch

    return torch


def _pad_to_multiple(t, mult: int):
    """Replicate-pad an [N,C,H,W] tensor so H and W divide ``mult``
    (RAFT's InputPadder semantics, mode='replicate', pad at bottom and
    right like its 'kitti' mode)."""
    torch = _require_torch()
    h, w = t.shape[-2:]
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        t = torch.nn.functional.pad(t, (0, pw, 0, ph), mode="replicate")
    return t, (h, w)


def _first_flow_like(out, h: int, w: int):
    """Extract the final [1,2,H',W'] flow tensor from the module's
    return value (tensor, (low, up) tuple, or list of iterates)."""
    torch = _require_torch()
    if isinstance(out, (list, tuple)):
        out = out[-1]
    if not torch.is_tensor(out):
        raise TypeError(f"flow module returned {type(out)!r}")
    if out.ndim != 4 or out.shape[1] != 2:
        raise ValueError(
            f"expected [N,2,H,W] flow, got {tuple(out.shape)}"
        )
    return out


def raft_flow_from_torchscript(
    path: Union[str, Path],
    device: str = "cpu",
    iters: int = 20,
) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """Load a TorchScript RAFT export and wrap it in the pipeline's
    ``flow_estimator(im1, im2) -> [H,W,2] float32`` contract.

    ``im1``/``im2`` are [H,W,3] RGB uint8 frames. The module is called
    as ``module(image1, image2)`` with 0..255 float tensors (RAFT's
    own convention, cal_flow.py:62-66); modules whose forward takes an
    ``iters`` argument are retried with it.
    """
    torch = _require_torch()
    module = torch.jit.load(str(path), map_location=device)
    module.eval()

    def estimator(im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        t1 = torch.from_numpy(
            np.ascontiguousarray(im1)
        ).permute(2, 0, 1).float()[None].to(device)
        t2 = torch.from_numpy(
            np.ascontiguousarray(im2)
        ).permute(2, 0, 1).float()[None].to(device)
        t1, (h, w) = _pad_to_multiple(t1, 8)
        t2, _ = _pad_to_multiple(t2, 8)
        with torch.no_grad():
            try:
                out = module(t1, t2, iters)
            except (RuntimeError, TypeError):
                out = module(t1, t2)
        flow = _first_flow_like(out, h, w)
        flow = flow[0, :, :h, :w].permute(1, 2, 0)
        return flow.cpu().numpy().astype(np.float32)

    return estimator


def seg_classmap_from_torchscript(
    path: Union[str, Path],
    device: str = "cpu",
) -> Callable[[np.ndarray], np.ndarray]:
    """Load a TorchScript segmentation export (e.g. a Panoptic-DeepLab
    semantic head, semantic_seg.py:89-171) and wrap it in the
    pipeline's ``seg_estimator(im) -> [H,W] int64`` class-map contract.

    ``im`` is an [H,W,3] RGB uint8 frame; the module receives a
    0..1-normalized [1,3,H,W] float tensor and must return [1,C,H,W]
    logits (or a dict with a ``sem_seg``/``out`` entry). Class ids come
    from the channel argmax; the mseg universal->mseg-194 remap happens
    downstream in stages.semantic_seg_artifact.
    """
    torch = _require_torch()
    module = torch.jit.load(str(path), map_location=device)
    module.eval()

    def estimator(im: np.ndarray) -> np.ndarray:
        t = torch.from_numpy(
            np.ascontiguousarray(im)
        ).permute(2, 0, 1).float()[None].to(device) / 255.0
        t, (h, w) = _pad_to_multiple(t, 32)
        with torch.no_grad():
            out = module(t)
        if isinstance(out, dict):
            for k in ("sem_seg", "out", "logits"):
                if k in out:
                    out = out[k]
                    break
        if not torch.is_tensor(out) or out.ndim != 4:
            raise TypeError(
                "seg module must return [1,C,H,W] logits, got "
                f"{type(out)!r}"
            )
        cls = out[0, :, :h, :w].argmax(dim=0)
        return cls.cpu().numpy().astype(np.int64)

    return estimator


def jax_raft_estimator(
    ckpt: Union[str, Path],
    iters: int = 20,
) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """TPU-native RAFT flow: load an *official* RAFT .pth state_dict
    (raft-things/raft-kitti, the checkpoints scripts/cal_flow.py uses)
    into the clean-room JAX implementation
    (camradepth_tpu.models.raft) and wrap it in the pipeline's
    ``flow_estimator(im1, im2) -> [H,W,2]`` contract. Runs jitted on
    the default JAX backend — the TPU when available."""
    torch = _require_torch()
    import jax
    import jax.numpy as jnp

    from camradepth_tpu.models.raft import (
        RAFT,
        load_torch_raft_state_dict,
    )

    state = torch.load(str(ckpt), map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    params = load_torch_raft_state_dict(
        {k: v.numpy() if hasattr(v, "numpy") else v
         for k, v in state.items()}
    )
    model = RAFT(iters=iters)
    run = jax.jit(
        lambda a, b: model.apply({"params": params}, a, b)
    )

    def estimator(im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        h, w = im1.shape[:2]
        ph = (8 - h % 8) % 8
        pw = (8 - w % 8) % 8
        a = np.pad(im1, ((0, ph), (0, pw), (0, 0)), mode="edge")
        b = np.pad(im2, ((0, ph), (0, pw), (0, 0)), mode="edge")
        flow = run(
            jnp.asarray(a, jnp.float32)[None],
            jnp.asarray(b, jnp.float32)[None],
        )
        return np.asarray(flow)[0, :h, :w].astype(np.float32)

    return estimator


def make_flow_estimator(kind: str, ckpt: str = "", **kw):
    """Factory used by the CLI: 'lk' (built-in pyramidal Lucas-Kanade),
    'jax-raft' (official .pth into the native JAX RAFT),
    'torchscript'/'raft' (TorchScript export), or 'none'."""
    if kind in ("none", ""):
        return None
    if kind == "lk":
        from camradepth_tpu.ops.optical_flow import lk_flow

        return lk_flow
    if kind == "jax-raft":
        if not ckpt:
            raise ValueError(
                f"--flow {kind} requires --flow-ckpt <official RAFT .pth>"
            )
        return jax_raft_estimator(ckpt, **kw)
    if kind in ("torchscript", "raft"):
        if not ckpt:
            raise ValueError(
                f"--flow {kind} requires --flow-ckpt <torchscript file>"
            )
        return raft_flow_from_torchscript(ckpt, **kw)
    raise ValueError(f"unknown flow estimator {kind!r}")


def jax_panoptic_estimator(
    ckpt: Union[str, Path],
) -> Callable[[np.ndarray], np.ndarray]:
    """TPU-native Panoptic-DeepLab: load the official
    panoptic_deeplab_R101_os32_cityscapes.pth into the clean-room JAX
    implementation (camradepth_tpu.models.panoptic_deeplab) and wrap it
    in the pipeline's ``seg_estimator(im) -> [H,W] int64`` contract.
    Returns cityscapes trainIds — pair with remap='cityscapes' (21-class
    training labels) or 'vehicle_cityscapes' (the reference's
    semantic_seg.py vehicle-mask path). Runs jitted on the default JAX
    backend — the TPU when available."""
    torch = _require_torch()
    from camradepth_tpu.models.panoptic_deeplab import (
        classmap_fn,
        load_torch_panoptic_deeplab,
    )

    state = torch.load(str(ckpt), map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return classmap_fn(load_torch_panoptic_deeplab(state))


def make_seg_estimator(kind: str, ckpt: str = "", **kw):
    """Factory used by the CLI: 'jax-panoptic' (official .pth into the
    native JAX Panoptic-DeepLab), 'torchscript' (Panoptic-DeepLab-style
    export) or 'none'."""
    if kind in ("none", ""):
        return None
    if kind == "jax-panoptic":
        if not ckpt:
            raise ValueError(
                f"--seg {kind} requires --seg-ckpt <official "
                "panoptic_deeplab_R101_os32_cityscapes.pth>"
            )
        return jax_panoptic_estimator(ckpt, **kw)
    if kind in ("torchscript", "panoptic-deeplab"):
        if not ckpt:
            raise ValueError(
                f"--seg {kind} requires --seg-ckpt <torchscript file>"
            )
        return seg_classmap_from_torchscript(ckpt, **kw)
    raise ValueError(f"unknown seg estimator {kind!r}")
