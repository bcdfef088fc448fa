"""Print the attainable-roofline table for the flagship forward.

Claims the TPU (for the compiled cost analysis); the jaxpr walk itself
is host-only. See camradepth_tpu/utils/roofline.py for the model.

Usage: python tools/roofline_report.py [--batch 8]
"""

import argparse
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="host-only (skip the compiled bytes term)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent cache is safe/useful only for the TPU path (CPU
        # AOT cache entries can SIGILL on feature mismatch — conftest)
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/camradepth_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0
        )

    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.utils import roofline as rl

    cfg = preset("base")
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    c = cfg.model.input_channels

    def fwd(p, x):
        return model.apply({"params": p}, x, deterministic=True)[
            "depth"
        ]["final_depth"]

    x = jnp.zeros((args.batch, h, w, c), jnp.float32)
    params = jax.eval_shape(
        lambda k: model.init({"params": k}, x, deterministic=True)[
            "params"
        ],
        jax.random.PRNGKey(0),
    )
    compiled = None
    if not args.cpu:
        real = jax.jit(
            lambda k: model.init({"params": k}, x, deterministic=True)[
                "params"
            ]
        )(jax.random.PRNGKey(0))
        compiled = jax.jit(fwd).lower(real, x).compile()
        r = rl.analyze(fwd, real, x, compiled=compiled)
    else:
        r = rl.analyze(fwd, params, x)
    print(r.report())
    print(
        f"per-frame attainable: {r.attainable_s / args.batch * 1e3:.3f} ms "
        f"(batch {args.batch})"
    )


if __name__ == "__main__":
    main()
