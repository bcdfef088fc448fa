"""Generate the committed flagship-geometry golden tensors.

Runs the REAL reference model (/root/reference/src/models/
CamRaDepth.py:20-176) at the full flagship depths (3,10,16,5) —
where sr-conv/GroupNorm accumulation error actually lives — at a
reduced 128x256 image that fits CPU, with deterministic synthetic
weights (interop/golden.py), and commits input-free goldens:

  tests/goldens/flagship_128x256.npz
    shapes_json   — state_dict key->shape table (weights regenerate
                    from this with numpy alone)
    final_depth   — [1,128,256,1] NHWC fp32
    inter2/inter3 — intermediate depth heads (stages 3 and 4)

Usage: python tools/make_flagship_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from camradepth_tpu.interop.golden import (  # noqa: E402
    golden_input,
    shapes_to_json,
    synth_state_values,
)
from camradepth_tpu.interop.reference_loader import (  # noqa: E402
    load_reference_model,
    reference_available,
)

HW = (128, 256)
HW_FULL = (416, 800)  # the SHIPPING geometry (CamRaDepth.py:27)


def _run_variant(torch, hw=HW, **model_kw) -> tuple:
    model = load_reference_model(img_size=hw, **model_kw)
    sd = model.state_dict()
    shapes = {k: tuple(v.shape) for k, v in sd.items()}
    values = synth_state_values(shapes)
    model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in values.items()}, strict=True
    )
    model.eval()
    x = golden_input(hw)  # NHWC
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    return shapes, out


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1).astype(np.float32)


def _write(path, shapes, gold) -> None:
    for k, v in gold.items():
        v64 = v.astype(np.float64)  # fp16 self-accumulation overflows
        print(f"{k}: shape {v.shape} range [{v64.min():.6f}, "
              f"{v64.max():.6f}] std {v64.std():.6f}")
        assert np.isfinite(v64).all(), k
    np.savez_compressed(
        path,
        shapes_json=np.frombuffer(
            shapes_to_json(shapes).encode(), dtype=np.uint8
        ),
        **gold,
    )
    print(f"wrote {path} ({path.stat().st_size / 1e3:.0f} kB, "
          f"{len(shapes)} state_dict keys)")


def main() -> int:
    if not reference_available():
        print("reference checkout not found", file=sys.stderr)
        return 1
    import torch

    out_dir = REPO / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)

    # base variant: the three depth heads at full precision
    shapes, out = _run_variant(torch)
    inter = out["depth"]["intermediate_depths"]
    gold = {
        "final_depth": _nhwc(out["depth"]["final_depth"]),
        "inter2": _nhwc(inter[2]),
        "inter3": _nhwc(inter[3]),
    }
    # degenerate outputs (constant maps) would make the parity test
    # vacuous — require real spread
    assert gold["final_depth"].std() > 1e-4
    _write(out_dir / "flagship_128x256.npz", shapes, gold)

    # sup+unsup seg variant: depth heads consume the seg argmax maps, so
    # committing depth + argmax maps (+ a center crop of the raw seg
    # logits) pins the whole guidance path without committing the 21-ch
    # logit volumes
    shapes, out = _run_variant(
        torch, supervised_seg=True, unsupervised_seg=True
    )
    seg_logits = _nhwc(out["seg"]["final_seg"])            # [1,H,W,21]
    unsup_map = _nhwc(out["seg"]["unsup_map"])
    cy, cx = HW[0] // 2 - 16, HW[1] // 2 - 32
    gold = {
        "final_depth": _nhwc(out["depth"]["final_depth"]),
        "inter2": _nhwc(out["depth"]["intermediate_depths"][2]),
        "inter3": _nhwc(out["depth"]["intermediate_depths"][3]),
        "final_seg_argmax": seg_logits.argmax(-1).astype(np.int16),
        "final_seg_crop": seg_logits[:, cy: cy + 32, cx: cx + 64],
        "crop_yx": np.asarray([cy, cx], np.int32),
        "unsup_map": unsup_map,
    }
    _write(out_dir / "flagship_seg_128x256.npz", shapes, gold)

    # base variant at the SHIPPING 416x800 geometry (VERDICT r3 item 3:
    # resolution-dependent paths — bicubic x2 boundaries, patch-embed
    # padding — were only pinned at 128x256). The full-res maps go to
    # fp16 to keep the artifact under ~1 MB; fp16 quantization of the
    # GOLDEN adds <= 2^-11 relative error, far under the 2e-3 parity
    # tolerance, and a center crop stays fp32 for an exact-precision
    # anchor. inter2 (= intermediate_depths[2], H/4) is produced
    # entirely by stages the --tpu-decoder variant SHARES, so it also
    # pins the warm-start transfer path at full resolution.
    shapes, out = _run_variant(torch, hw=HW_FULL)
    inter = out["depth"]["intermediate_depths"]
    final = _nhwc(out["depth"]["final_depth"])
    cy, cx = HW_FULL[0] // 2 - 32, HW_FULL[1] // 2 - 64
    gold = {
        "final_depth_f16": final.astype(np.float16),
        "final_depth_crop": final[:, cy: cy + 64, cx: cx + 128],
        "crop_yx": np.asarray([cy, cx], np.int32),
        "inter2": _nhwc(inter[2]),
        "inter3_f16": _nhwc(inter[3]).astype(np.float16),
    }
    assert final.std() > 1e-4
    _write(out_dir / "flagship_416x800.npz", shapes, gold)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
