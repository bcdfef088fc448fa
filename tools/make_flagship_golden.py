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


def main() -> int:
    if not reference_available():
        print("reference checkout not found", file=sys.stderr)
        return 1
    import torch

    model = load_reference_model(img_size=HW)  # flagship defaults
    sd = model.state_dict()
    shapes = {k: tuple(v.shape) for k, v in sd.items()}
    values = synth_state_values(shapes)
    model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in values.items()}, strict=True
    )
    model.eval()

    x = golden_input(HW)  # NHWC
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    def nhwc(t):
        return t.numpy().transpose(0, 2, 3, 1).astype(np.float32)

    final = nhwc(out["depth"]["final_depth"])
    inter = out["depth"]["intermediate_depths"]
    gold = {
        "final_depth": final,
        "inter2": nhwc(inter[2]),
        "inter3": nhwc(inter[3]),
    }
    for k, v in gold.items():
        print(f"{k}: shape {v.shape} range [{v.min():.6f}, {v.max():.6f}] "
              f"std {v.std():.6f}")
        assert np.isfinite(v).all(), k
    # degenerate outputs (constant maps) would make the parity test
    # vacuous — require real spread
    assert final.std() > 1e-4, "final depth map is (near-)constant"

    out_dir = REPO / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "flagship_128x256.npz"
    np.savez_compressed(
        path,
        shapes_json=np.frombuffer(
            shapes_to_json(shapes).encode(), dtype=np.uint8
        ),
        **gold,
    )
    print(f"wrote {path} ({path.stat().st_size / 1e3:.0f} kB, "
          f"{len(shapes)} state_dict keys)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
