"""TPU-decoder variant SELF-golden: committed-output regression pin.

The --tpu-decoder architecture (models/layers.py TPUDecoder /
SubpixelDepthActivation) has no reference counterpart, so its numerics
are pinned against the framework itself: deterministic params
regenerate from the committed shape table (interop/golden.py
synth_flax_params — one rng stream, sorted keys) and the forward at
flagship depths (3,10,16,5) / 128x256 fp32 must reproduce the
committed tensors (tools/make_tpu_decoder_golden.py). Any silent
numeric change to the variant's decoder stages fails this.
"""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from camradepth_tpu.config import preset
from camradepth_tpu.interop.golden import (
    flax_param_shapes,
    golden_input,
    shapes_from_json,
    synth_flax_params,
)
from camradepth_tpu.models.camradepth import CamRaDepth

GOLDEN = Path(__file__).parent / "goldens" / "tpu_decoder_128x256.npz"
HW = (128, 256)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.is_file(), "run tools/make_tpu_decoder_golden.py"
    with np.load(GOLDEN) as z:
        out = {k: z[k] for k in z.files if k != "shapes_json"}
        out["shapes"] = shapes_from_json(
            bytes(z["shapes_json"]).decode()
        )
        return out


def test_tpu_decoder_matches_committed_golden(golden):
    mc = dataclasses.replace(
        preset("base").model,
        img_size=HW,
        tpu_decoder=True,
        compute_dtype="float32",
        use_pallas_attention=False,
    )
    model = CamRaDepth(mc)
    x = jnp.asarray(golden_input(HW, mc.input_channels))
    var_shapes = jax.eval_shape(
        lambda k, xx: model.init({"params": k}, xx, deterministic=True),
        jax.ShapeDtypeStruct((2,), jnp.uint32), x,
    )
    shapes = flax_param_shapes(var_shapes["params"])
    # the architecture itself (every param's path + shape) is pinned
    assert shapes == golden["shapes"]
    params = synth_flax_params(shapes)
    out = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, deterministic=True)
    )(params, x)
    d = out["depth"]
    got = {
        "final_depth": np.asarray(d["final_depth"], np.float32),
        "inter_depth_3": np.asarray(
            d["intermediate_depths"][2], np.float32
        ),
        "inter_depth_4": np.asarray(
            d["intermediate_depths"][3], np.float32
        ),
    }
    for k, v in got.items():
        np.testing.assert_allclose(
            v, golden[k], rtol=5e-4, atol=5e-6, err_msg=k
        )
