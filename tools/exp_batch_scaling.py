"""Round-3 experiment: does a larger batch lift MXU utilization?

Times the flagship forward at batch 8/16/32 with the bench.py scan
methodology, and pulls the compiled executable's cost analysis (flops,
bytes accessed) for a roofline statement.

Run alone — claims the TPU.
"""

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


def main():
    cfg = preset("base")
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    c = cfg.model.input_channels
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

    # single-forward cost analysis (per-frame flops/bytes)
    one = jax.jit(
        lambda p, x: model.apply({"params": p}, x, deterministic=True)[
            "depth"
        ]["final_depth"]
    )
    x1 = jnp.zeros((1, h, w, c), jnp.float32)
    try:
        ca = one.lower(params, x1).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        print(f"cost_analysis b1: flops={flops/1e9:.2f} GF "
              f"bytes={bytes_/1e9:.3f} GB", flush=True)
    except Exception as e:
        print(f"cost_analysis failed: {e}", flush=True)
        flops = bytes_ = 0.0

    scan_len = 16
    for batch in (8, 16, 32):
        manyj = jax.jit(many)
        xb = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, c),
                               jnp.float32)
        eps = jax.random.normal(
            jax.random.PRNGKey(2), (scan_len, 1, 1, 1, 1), jnp.float32
        ) * 1e-3
        t_c = time.perf_counter()
        np.asarray(manyj(params, xb, eps))
        print(f"b{batch}: compile+run {time.perf_counter()-t_c:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        np.asarray(manyj(params, xb, eps))
        dt = time.perf_counter() - t0
        fps = batch * scan_len / dt
        ms = 1000.0 / fps
        # batch-level cost analysis
        try:
            cab = jax.jit(many).lower(params, xb, eps).compile(
            ).cost_analysis()
            if isinstance(cab, (list, tuple)):
                cab = cab[0]
            fl = float(cab.get("flops", 0.0)) / (batch * scan_len)
            by = float(cab.get("bytes accessed", 0.0)) / (batch * scan_len)
        except Exception:
            fl = by = 0.0
        tf = fl * fps / 1e12
        print(
            f"b{batch}: {fps:.1f} fps/chip, {ms:.2f} ms/frame, "
            f"per-frame flops={fl/1e9:.2f} GF bytes={by/1e9:.3f} GB, "
            f"achieved {tf:.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
