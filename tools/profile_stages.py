"""Per-stage TPU timing of the flagship forward (batch 8, 416x800).

block_until_ready is unreliable through the axon tunnel (CLAUDE.md), so
each stage is timed by folding K executions into one device program via
lax.scan with an input perturbation, then dividing. Prints ms/frame per
stage. Claims the TPU — do not run concurrently with other TPU jobs."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/camradepth_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = 8
K = 16


def timed(fn, *args, label=""):
    """ms per execution of fn(*args) via scan folding."""

    def many(eps, *a):
        def body(c, e):
            out = fn(*[x + e if isinstance(x, jnp.ndarray) and
                       x.dtype != jnp.int32 else x for x in a[:1]],
                     *a[1:])
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "mean")]
            return c + sum(l.mean().astype(jnp.float32) for l in leaves), None

        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    manyj = jax.jit(many)
    eps = jax.random.normal(jax.random.PRNGKey(2), (K,), jnp.bfloat16) * 1e-3
    np.asarray(manyj(eps, *args))
    t0 = time.perf_counter()
    np.asarray(manyj(eps, *args))
    ms = (time.perf_counter() - t0) / K * 1000.0
    print(f"{label:32s} {ms / BATCH:7.3f} ms/frame ({ms:7.3f} ms/batch)")
    return ms / BATCH


def main():
    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.models.encoder import SimplifiedTransformer
    from camradepth_tpu.models.layers import (
        ConvLayer, Decoder, DepthActivation,
    )

    cfg = preset("base").model
    dt = jnp.bfloat16
    model = CamRaDepth(cfg)
    h, w = cfg.img_size
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, h, w, 7), dt)
    params = jax.jit(
        lambda k: model.init({"params": k},
                             jnp.zeros((1, h, w, 7)), deterministic=True)[
            "params"
        ]
    )(jax.random.PRNGKey(0))

    total = timed(
        lambda v: model.apply({"params": params}, v, deterministic=True)[
            "depth"]["final_depth"],
        x, label="TOTAL forward",
    )

    enc = SimplifiedTransformer(
        dims=cfg.dims, num_heads=cfg.heads, mlp_ratios=cfg.ff_expansion,
        sr_ratios=cfg.sr_ratios, depths=cfg.depths,
        drop_path_rate=0.0, qkv_bias=cfg.qkv_bias,
        divisor=cfg.groupnorm_divisor, use_pallas=False, dtype=dt,
    )
    ep = params["dest_encoder"]
    timed(lambda v: enc.apply({"params": ep}, v, deterministic=True),
          x, label="encoder")

    # decoder stage shapes (flagship): /32 13x25x256 ... full res
    shapes = {
        "enc1": (BATCH, h // 32, w // 32, cfg.dims[3]),
        "enc2": (BATCH, h // 16, w // 16, cfg.dims[2]),
        "enc3": (BATCH, h // 8, w // 8, cfg.dims[1]),
        "enc4": (BATCH, h // 4, w // 4, cfg.dims[0]),
    }
    t = {k: jax.random.normal(jax.random.PRNGKey(i), s, dt)
         for i, (k, s) in enumerate(shapes.items())}
    mid = cfg.mid_channels

    def stage(name, mod, inp, extra=None):
        p = params[name]
        if extra is not None:
            timed(lambda v: mod.apply({"params": p}, v, extra),
                  inp, label=name)
        else:
            timed(lambda v: mod.apply({"params": p}, v), inp, label=name)

    stage("depth_upsample_0", Decoder(mid, has_skip=True, dtype=dt),
          t["enc1"], t["enc2"])
    d1 = jax.random.normal(jax.random.PRNGKey(10),
                           (BATCH, h // 16, w // 16, mid), dt)
    stage("depth_upsample_1", Decoder(mid, has_skip=True, dtype=dt),
          d1, t["enc3"])
    d2 = jax.random.normal(jax.random.PRNGKey(11),
                           (BATCH, h // 8, w // 8, mid), dt)
    stage("depth_upsample_2", Decoder(mid, has_skip=True, dtype=dt),
          d2, t["enc4"])
    d3 = jax.random.normal(jax.random.PRNGKey(12),
                           (BATCH, h // 4, w // 4, mid), dt)
    stage("depth_activation_3", DepthActivation(1, dtype=dt), d3)
    d3c = jax.random.normal(jax.random.PRNGKey(13),
                            (BATCH, h // 4, w // 4, mid + 1), dt)
    stage("depth_upsample_3", Decoder(mid, dtype=dt), d3c)
    d4 = jax.random.normal(jax.random.PRNGKey(14),
                           (BATCH, h // 2, w // 2, mid), dt)
    stage("depth_activation_4", DepthActivation(1, dtype=dt), d4)
    d4c = jax.random.normal(jax.random.PRNGKey(15),
                            (BATCH, h // 2, w // 2, mid + 1), dt)
    stage("depth_upsample_4", Decoder(mid, has_skip=True, dtype=dt),
          d4c, x)
    d5 = jax.random.normal(jax.random.PRNGKey(16),
                           (BATCH, h, w, mid), dt)
    stage("depth_activation_5", DepthActivation(1, dtype=dt), d5)


if __name__ == "__main__":
    main()
