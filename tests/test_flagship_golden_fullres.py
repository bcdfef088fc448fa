"""Flagship golden parity at the SHIPPING 416x800 geometry.

VERDICT r3 item 3: the 128x256 goldens pin the block math (full
depths (3,10,16,5)), but resolution-dependent paths — bicubic x2
boundary handling, patch-embed padding, the H/4 and H/2 intermediate
map geometries — were never pinned at the resolution the reference
actually ships (/root/reference/src/models/CamRaDepth.py:27).

tests/goldens/flagship_416x800.npz (tools/make_flagship_golden.py)
holds the REAL reference model's outputs at 416x800 with
deterministically synthesized weights (interop/golden.py). To keep the
artifact under ~1 MB the full-res maps are stored fp16 (quantizing the
GOLDEN adds <= 2^-11 relative error, well under the 2e-3 parity
tolerance) plus one fp32 center crop as an exact-precision anchor;
inter2 (= intermediate_depths[2] at H/4, produced ENTIRELY by decoder
stages the --tpu-decoder variant shares) stays fp32 and doubles as the
full-res warm-start-transfer pin.
"""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camradepth_tpu.config import preset
from camradepth_tpu.interop.golden import (
    golden_input,
    shapes_from_json,
    synth_state_values,
)
from camradepth_tpu.interop.torch_convert import convert_state_dict
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.utils.checkpoint import partial_restore_params

GOLDEN = Path(__file__).parent / "goldens" / "flagship_416x800.npz"
HW = (416, 800)

# fp16 golden quantization: 2^-11 relative, plus headroom near zero.
F16_RTOL, F16_ATOL = 2e-3, 1.5e-3
# fp32 golden: same tolerances as the 128x256 parity test.
F32_RTOL, F32_ATOL = 2e-3, 5e-4


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.is_file(), "run tools/make_flagship_golden.py"
    with np.load(GOLDEN) as z:
        out = {k: z[k] for k in z.files if k != "shapes_json"}
        out["shapes"] = shapes_from_json(bytes(z["shapes_json"]).decode())
        return out


def _model_cfg(**over):
    # the REAL shipping config (preset 'base'), fp32 for oracle parity
    return dataclasses.replace(
        preset("base").model,
        compute_dtype="float32",
        use_pallas_attention=False,
        **over,
    )


@pytest.fixture(scope="module")
def converted_params(golden):
    """Synthesized reference state_dict -> interop converter (shared by
    the parity and transfer tests — one conversion, two consumers)."""
    return convert_state_dict(synth_state_values(golden["shapes"]))


def _forward(cfg, converted):
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
    out = jax.jit(
        lambda p: model.apply({"params": p}, x, deterministic=True)
    )(params)
    return out, mismatches


def test_fullres_parity_torch_free(golden, converted_params):
    """Committed shape table -> synthesized weights -> converter ->
    Flax forward at 416x800 == committed reference outputs."""
    out, mismatches = _forward(_model_cfg(), converted_params)
    assert not mismatches, (
        f"{len(mismatches)} reference keys failed to convert at the "
        f"shipping geometry, e.g. {mismatches[:3]}"
    )
    final = np.asarray(out["depth"]["final_depth"])
    cy, cx = golden["crop_yx"]
    # exact-precision anchor first: the fp32 crop
    np.testing.assert_allclose(
        final[:, cy: cy + 64, cx: cx + 128],
        golden["final_depth_crop"], rtol=F32_RTOL, atol=F32_ATOL,
    )
    np.testing.assert_allclose(
        final, golden["final_depth_f16"].astype(np.float32),
        rtol=F16_RTOL, atol=F16_ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]["intermediate_depths"][2]),
        golden["inter2"], rtol=F32_RTOL, atol=F32_ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(out["depth"]["intermediate_depths"][3]),
        golden["inter3_f16"].astype(np.float32),
        rtol=F16_RTOL, atol=F16_ATOL,
    )


def test_fullres_tpu_decoder_transfer(golden, converted_params):
    """The --tpu-decoder warm start at the shipping geometry: reference
    weights partial-restore into the variant (encoder + low-res decoder
    transfer by shape matching, interop contract in train/distill.py),
    and intermediate_depths[2] — produced entirely by TRANSFERRED
    stages — must reproduce the reference golden. The subpixel stages
    keep fresh init, so final_depth is only sanity-checked."""
    out, mismatches = _forward(
        _model_cfg(tpu_decoder=True), converted_params
    )
    # the variant's subpixel stages (du3/du4/final heads) legitimately
    # fail to match reference shapes; the shared trunk must transfer
    assert mismatches, "expected the variant's subpixel stages to mismatch"
    np.testing.assert_allclose(
        np.asarray(out["depth"]["intermediate_depths"][2]),
        golden["inter2"], rtol=F32_RTOL, atol=F32_ATOL,
    )
    final = np.asarray(out["depth"]["final_depth"])
    assert final.shape == (1, HW[0], HW[1], 1)
    assert np.isfinite(final).all()


def test_fullres_golden_is_authentic(golden):
    """Live reference at 416x800 + synthesized weights reproduces the
    committed tensors (the fp32 crop near-bitwise; the fp16 maps within
    quantization)."""
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
    final = (
        out["depth"]["final_depth"].numpy().transpose(0, 2, 3, 1)
    )
    cy, cx = golden["crop_yx"]
    np.testing.assert_allclose(
        final[:, cy: cy + 64, cx: cx + 128],
        golden["final_depth_crop"], rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        final, golden["final_depth_f16"].astype(np.float32),
        rtol=6e-4, atol=1e-4,
    )
