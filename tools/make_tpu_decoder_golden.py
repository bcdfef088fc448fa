"""One-time generator for the TPU-decoder variant SELF-golden.

The --tpu-decoder architecture (models/layers.py TPUDecoder /
SubpixelDepthActivation) has NO reference counterpart, so there is no
external oracle to pin its numerics — this golden pins them against
the framework itself: deterministic params from a committed shape
table (interop/golden.py synth_flax_params), one forward at the full
flagship depths (3,10,16,5) at 128x256 fp32, outputs committed to
tests/goldens/tpu_decoder_128x256.npz. tests/test_tpu_decoder_golden.py
regenerates the params and asserts the forward still matches — any
silent numeric change to the variant's decoder stages fails it.

Run on CPU: JAX_PLATFORMS=cpu python tools/make_tpu_decoder_golden.py
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from camradepth_tpu.config import preset  # noqa: E402
from camradepth_tpu.interop.golden import (  # noqa: E402
    flax_param_shapes,
    golden_input,
    shapes_to_json,
    synth_flax_params,
)
from camradepth_tpu.models.camradepth import CamRaDepth  # noqa: E402

HW = (128, 256)
OUT = Path(__file__).resolve().parents[1] / "tests" / "goldens" / (
    "tpu_decoder_128x256.npz"
)


def main() -> None:
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
    params = synth_flax_params(shapes)
    out = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx, deterministic=True)
    )(params, x)
    d = out["depth"]
    np.savez_compressed(
        OUT,
        shapes_json=np.frombuffer(
            shapes_to_json(shapes).encode(), dtype=np.uint8
        ),
        final_depth=np.asarray(d["final_depth"], np.float32),
        inter_depth_3=np.asarray(d["intermediate_depths"][2], np.float32),
        inter_depth_4=np.asarray(d["intermediate_depths"][3], np.float32),
    )
    print(f"wrote {OUT} ({OUT.stat().st_size / 1024:.0f} kB); "
          f"final_depth mean {float(np.mean(d['final_depth'])):.6f}")


if __name__ == "__main__":
    main()
