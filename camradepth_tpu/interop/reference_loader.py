"""Import the REAL upstream reference model for golden parity + baselines.

The reference model files (src/models/CamRaDepth.py,
src/models/simplified_attention.py, src/utils/utils.py) are importable
torch code, but carry import-time obstacles:

- ``utils/args.py`` parses ``sys.argv`` at import, asserts split files
  exist and mkdirs output directories (args.py:124-198) — unusable in a
  test process;
- they import ``timm`` (DropPath/to_2tuple/trunc_normal_,
  simplified_attention.py:9) and ``torchinfo`` (CamRaDepth.py:9), neither
  of which is installed here.

This module loads the reference model anyway by installing, for the
duration of the import, (a) a stub ``utils.args`` module carrying exactly
the fields the model code reads (input_channels, num_classes,
supervised_seg/unsupervised_seg via ``.get``, groupnorm_divisor,
hashtags_prefix), and (b) minimal stand-ins for the three timm symbols and
``torchinfo.summary``. DropPath is exact in eval mode (identity); the init
helpers are irrelevant to parity tests because those load explicit
state_dicts. ``sys.modules``/``sys.path`` are restored afterwards.

This gives golden tests a ground truth that is the reference's OWN code,
not a reimplementation of it.
"""

from __future__ import annotations

import contextlib
import importlib
import os
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path(os.environ.get("CAMRADEPTH_REFERENCE", "/root/reference"))

_STUBBED = (
    "utils",
    "utils.args",
    "utils.utils",
    "models",
    "models.CamRaDepth",
    "models.simplified_attention",
    "timm",
    "timm.models",
    "timm.models.layers",
    "torchinfo",
)


def reference_available() -> bool:
    return (REFERENCE_ROOT / "src" / "models" / "CamRaDepth.py").is_file()


class _ArgsStub(dict):
    """dict with attribute access — the shape the model code expects from
    the EasyDict singleton (supports both ``args.x`` and ``args.get``)."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def _timm_layers_stub():
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        """Per-sample stochastic depth; identity in eval mode (which is
        the only mode parity/baseline runs use)."""

        def __init__(self, drop_prob=None, scale_by_keep: bool = True):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask = mask / keep
            return x * mask

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    mod = types.ModuleType("timm.models.layers")
    mod.DropPath = DropPath
    mod.to_2tuple = to_2tuple
    mod.trunc_normal_ = trunc_normal_
    return mod


@contextlib.contextmanager
def reference_modules(args_stub: _ArgsStub):
    """Context manager: reference ``models.*``/``utils.*`` importable with
    the given args stub; restores sys.modules/sys.path on exit."""
    saved = {n: sys.modules.pop(n) for n in _STUBBED if n in sys.modules}
    saved_path = list(sys.path)
    src = REFERENCE_ROOT / "src"

    utils_pkg = types.ModuleType("utils")
    utils_pkg.__path__ = [str(src / "utils")]
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [str(src / "models")]
    args_mod = types.ModuleType("utils.args")
    args_mod.args = args_stub

    timm_pkg = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = _timm_layers_stub()
    timm_pkg.models = timm_models
    timm_models.layers = timm_layers
    torchinfo = types.ModuleType("torchinfo")
    torchinfo.summary = lambda *a, **k: None

    sys.modules.update(
        {
            "utils": utils_pkg,
            "models": models_pkg,
            "utils.args": args_mod,
            "timm": timm_pkg,
            "timm.models": timm_models,
            "timm.models.layers": timm_layers,
            "torchinfo": torchinfo,
        }
    )
    try:
        yield
    finally:
        for n in _STUBBED:
            sys.modules.pop(n, None)
        sys.modules.update(saved)
        sys.path[:] = saved_path


def load_reference_model(
    *,
    img_size=(416, 800),
    heads=(1, 2, 4, 8),
    ff_expansion=(8, 8, 4, 4),
    reduction_ratio=(8, 4, 2, 1),
    depths=(3, 10, 16, 5),
    dims=(64, 128, 160, 256),
    input_channels: int = 7,
    supervised_seg: bool = False,
    unsupervised_seg: bool = False,
    num_classes: int = 21,
    groupnorm_divisor: int = 16,
):
    """Construct the reference ``CamRaDepth`` torch module (eval mode).

    Ctor surface mirrors CamRaDepth.py:20-31; the args-singleton fields it
    reads (CamRaDepth.py:38-45, simplified_attention.py:22-24,116) come
    from the stub. mid_channels is hardcoded 128 upstream
    (CamRaDepth.py:37) — pass a matching ModelConfig when comparing.
    """
    if not reference_available():
        raise FileNotFoundError(f"reference not found at {REFERENCE_ROOT}")
    args_stub = _ArgsStub(
        input_channels=input_channels,
        num_classes=num_classes,
        supervised_seg=supervised_seg,
        unsupervised_seg=unsupervised_seg,
        groupnorm_divisor=groupnorm_divisor,
        hashtags_prefix="####",
    )
    with reference_modules(args_stub):
        mod = importlib.import_module("models.CamRaDepth")
        model = mod.CamRaDepth(
            img_size=img_size,
            heads=heads,
            ff_expansion=ff_expansion,
            reduction_ratio=reduction_ratio,
            depths=depths,
            dims=dims,
            input_channels=input_channels,
        )
    return model.eval()
