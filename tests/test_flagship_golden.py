"""Flagship-geometry golden parity with COMMITTED tensors.

The committed golden (tests/goldens/flagship_128x256.npz, written by
tools/make_flagship_golden.py) holds the REAL reference model's outputs
at the full flagship depths (3,10,16,5) / dims (64,128,160,256)
(/root/reference/src/models/CamRaDepth.py:20-176) at 128x256, with
deterministically synthesized weights (interop/golden.py).

Two layers of assurance:
- torch-free (always runs): weights regenerate from the committed
  shape table with numpy alone, flow through the interop converter
  into the Flax model, and the Flax forward must match the committed
  reference outputs — flagship parity without importing torch.
- authenticity (when torch + the reference checkout are available):
  the live reference model, fed the same synthesized weights,
  reproduces the committed tensors — proving the goldens really are
  the reference's outputs, not self-consistency.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camradepth_tpu.config import ModelConfig
from camradepth_tpu.interop.golden import (
    golden_input,
    shapes_from_json,
    synth_state_values,
)
from camradepth_tpu.interop.torch_convert import convert_state_dict
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.utils.checkpoint import partial_restore_params

GOLDEN = Path(__file__).parent / "goldens" / "flagship_128x256.npz"
GOLDEN_SEG = Path(__file__).parent / "goldens" / "flagship_seg_128x256.npz"
HW = (128, 256)


def _load_golden(path):
    assert path.is_file(), "run tools/make_flagship_golden.py"
    with np.load(path) as z:
        out = {k: z[k] for k in z.files if k != "shapes_json"}
        out["shapes"] = shapes_from_json(bytes(z["shapes_json"]).decode())
        return out


@pytest.fixture(scope="module")
def golden():
    return _load_golden(GOLDEN)


@pytest.fixture(scope="module")
def golden_seg():
    return _load_golden(GOLDEN_SEG)


def _flagship_cfg(**over):
    # flagship geometry (CamRaDepth.py:27: depths (3,10,16,5); :26 dims;
    # :37 mid_channels hardcoded 128) at a CPU-sized image
    kw = dict(
        img_size=HW, dims=(64, 128, 160, 256), heads=(1, 2, 4, 8),
        ff_expansion=(8, 8, 4, 4), sr_ratios=(8, 4, 2, 1),
        depths=(3, 10, 16, 5), mid_channels=128, input_channels=7,
        groupnorm_divisor=16, drop_path_rate=0.0,
        compute_dtype="float32", use_pallas_attention=False,
    )
    kw.update(over)
    return ModelConfig(**kw)


def _flax_forward(cfg, shapes):
    """Synthesized weights -> converter -> flagship Flax forward."""
    state = synth_state_values(shapes)
    converted = convert_state_dict(state)
    model = CamRaDepth(cfg)
    x = jnp.asarray(golden_input(HW))
    init = jax.jit(
        lambda k: model.init({"params": k}, x, deterministic=True)[
            "params"
        ]
    )(jax.random.PRNGKey(0))
    params, mismatches = partial_restore_params(
        converted, init, verbose=False
    )
    assert not mismatches, (
        f"{len(mismatches)} reference keys failed to convert at flagship "
        f"geometry, e.g. {mismatches[:3]}"
    )
    return jax.jit(
        lambda p: model.apply({"params": p}, x, deterministic=True)
    )(params)


def test_flax_matches_committed_reference_outputs(golden):
    """Torch-free flagship parity: committed shape table -> synthesized
    weights -> interop converter -> Flax forward == committed reference
    outputs."""
    out = _flax_forward(_flagship_cfg(), golden["shapes"])
    got_final = np.asarray(out["depth"]["final_depth"])
    np.testing.assert_allclose(
        got_final, golden["final_depth"], rtol=2e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]["intermediate_depths"][2]),
        golden["inter2"], rtol=2e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]["intermediate_depths"][3]),
        golden["inter3"], rtol=2e-3, atol=5e-4,
    )


def test_flax_matches_committed_seg_variant(golden_seg):
    """Torch-free flagship parity for the sup+unsup seg variant: the
    depth heads consume the seg argmax guidance maps, so matching depth
    + argmax maps + a raw-logit crop pins the whole seg branch."""
    cfg = _flagship_cfg(supervised_seg=True, unsupervised_seg=True)
    out = _flax_forward(cfg, golden_seg["shapes"])

    seg = np.asarray(out["seg"]["final_seg"])  # [1,H,W,21]
    cy, cx = golden_seg["crop_yx"]
    np.testing.assert_allclose(
        seg[:, cy: cy + 32, cx: cx + 64],
        golden_seg["final_seg_crop"], rtol=2e-3, atol=1e-3,
    )
    # argmax maps agree except where fp32-accumulation noise flips a
    # near-tie between the top-2 classes
    flips = seg.argmax(-1) != golden_seg["final_seg_argmax"]  # [1,H,W]
    assert flips.mean() < 0.005, f"seg argmax agreement {1-flips.mean():.4f}"
    # unsup_map is an argmax/num_classes-quantized map: where the argmax
    # agrees the division is bitwise identical, so compare by agreement
    unsup_agree = (
        np.asarray(out["seg"]["unsup_map"]) == golden_seg["unsup_map"]
    ).mean()
    assert unsup_agree > 0.995, f"unsup_map agreement {unsup_agree:.4f}"

    # a flipped guidance pixel (at stage 4 or final) legitimately
    # changes depth in a neighborhood that spreads through the decoder
    # convs, so exact allclose is ill-posed here; instead require that
    # >=99.5% of pixels match within tolerance and the flip-affected
    # tail stays bounded — a real conversion bug shifts EVERY pixel
    got = np.asarray(out["depth"]["final_depth"])[0, ..., 0]
    want = golden_seg["final_depth"][0, ..., 0]
    err = np.abs(got - want)
    tol = 5e-4 + 2e-3 * np.abs(want)
    frac_ok = (err <= tol).mean()
    assert frac_ok > 0.995, f"depth within-tolerance fraction {frac_ok:.4f}"
    assert np.median(err) < 2e-4
    assert err.max() < 0.2  # bounded even where guidance flipped


def test_committed_goldens_are_authentic(golden):
    """Live reference + synthesized weights reproduces the committed
    tensors (near-bitwise: same framework, same ops, fixed weights)."""
    torch = pytest.importorskip("torch")
    from camradepth_tpu.interop.reference_loader import (
        load_reference_model,
        reference_available,
    )

    if not reference_available():
        pytest.skip("reference checkout not present")
    model = load_reference_model(img_size=HW)
    sd_shapes = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    assert sd_shapes == golden["shapes"], (
        "reference state_dict shape table changed — regenerate goldens"
    )
    values = synth_state_values(golden["shapes"])
    model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in values.items()}, strict=True
    )
    model.eval()
    x = golden_input(HW)
    with torch.no_grad():
        out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = (
        out["depth"]["final_depth"].numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(
        got, golden["final_depth"], rtol=1e-5, atol=1e-6,
    )
