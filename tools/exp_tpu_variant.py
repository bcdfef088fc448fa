"""Round-3 experiment: measure the TPU-decoder variant
(ModelConfig.tpu_decoder — MXU-aligned subpixel decoder stages) against
the parity architecture at the headline setting (416x800, batch 8) plus
batch-1 latency, with per-variant roofline floors.

Run alone — claims the TPU.
"""

import dataclasses
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

jax.config.update("jax_compilation_cache_dir", "/tmp/camradepth_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from camradepth_tpu.config import preset  # noqa: E402
from camradepth_tpu.models.camradepth import CamRaDepth  # noqa: E402
from camradepth_tpu.utils import roofline as rl  # noqa: E402


def measure(name: str, mc, scan_len: int = 16) -> None:
    model = CamRaDepth(mc)
    h, w = mc.img_size
    c = mc.input_channels
    params = jax.jit(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, h, w, c)), deterministic=True
        )["params"]
    )(jax.random.PRNGKey(0))

    def many(p, x, eps):
        def body(carry, e):
            out = model.apply({"params": p}, x + e, deterministic=True)[
                "depth"
            ]["final_depth"]
            return carry + out.mean(), None

        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    for batch in (8, 1):
        manyj = jax.jit(many)
        xb = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, c),
                               jnp.float32)
        eps = jax.random.normal(
            jax.random.PRNGKey(2), (scan_len, 1, 1, 1, 1), jnp.float32
        ) * 1e-3
        t_c = time.perf_counter()
        np.asarray(manyj(params, xb, eps))
        print(f"{name} b{batch}: compile+run "
              f"{time.perf_counter() - t_c:.1f}s", flush=True)
        t0 = time.perf_counter()
        np.asarray(manyj(params, xb, eps))
        dt = time.perf_counter() - t0
        fps = batch * scan_len / dt
        print(f"{name} b{batch}: {fps:.1f} fps/chip, "
              f"{1000.0 / fps:.2f} ms/frame", flush=True)
        if batch == 8:
            def fwd(p, x):
                return model.apply({"params": p}, x, deterministic=True)[
                    "depth"
                ]["final_depth"]

            try:
                compiled = jax.jit(fwd).lower(params, xb).compile()
                r = rl.analyze(fwd, params, xb, compiled=compiled)
                att = r.attainable_s / batch * 1e3
                fl = sum(op.flops for op in r.matmuls) / batch
                print(
                    f"{name} b8 roofline: {fl / 1e9:.1f} GF/frame, "
                    f"attainable {att:.2f} ms/frame, measured "
                    f"{1000.0 / fps:.2f} -> {100 * att * fps / 1000:.1f}%",
                    flush=True,
                )
            except Exception as e:
                print(f"{name} roofline failed: {e}", flush=True)


def main():
    mc = preset("base").model
    measure("tpu-variant", dataclasses.replace(mc, tpu_decoder=True))
    measure("parity", mc)


if __name__ == "__main__":
    main()
