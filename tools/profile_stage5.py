"""Micro-profile of the full-res decoder stage (depth_upsample_4):
bicubic upsample, each conv, GN+GELU, and bare-conv ceilings at the same
shapes. Claims the TPU."""

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

B = 8
K = 16
H, W = 416, 800


def timed(fn, *args, label="", flops=None):
    def many(eps, *a):
        def body(c, e):
            out = fn(a[0] + e, *a[1:])
            return c + out.mean().astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    manyj = jax.jit(many)
    eps = jax.random.normal(jax.random.PRNGKey(2), (K,), jnp.bfloat16) * 1e-3
    np.asarray(manyj(eps, *args))
    t0 = time.perf_counter()
    np.asarray(manyj(eps, *args))
    ms = (time.perf_counter() - t0) / K * 1000.0
    extra = ""
    if flops:
        extra = f"  {flops * B / (ms / 1e3) / 1e12:7.1f} TF/s"
    print(f"{label:36s} {ms / B:7.3f} ms/frame{extra}")
    return ms / B


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def main():
    from camradepth_tpu.ops.resize import upsample_bicubic_x2
    from camradepth_tpu.ops.groupnorm import group_norm

    rng = jax.random.PRNGKey(0)
    y = jax.random.normal(rng, (B, H // 2, W // 2, 129), jnp.bfloat16)
    timed(upsample_bicubic_x2, y, label="bicubic x2 (129ch 208x400->full)")

    hw = H * W
    for cin, cout, name in ((136, 96, "conv1 136->96"),
                            (232, 64, "conv2 232->64"),
                            (296, 128, "conv3 296->128"),
                            (128, 32, "head conv 128->32"),
                            (256, 128, "ref: conv 256->128"),
                            (128, 128, "ref: conv 128->128"),
                            (384, 128, "ref: conv 384->128")):
        x = jax.random.normal(rng, (B, H, W, cin), jnp.bfloat16)
        w = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        timed(lambda v, w=w: conv(v, w), x, label=f"bare {name}",
              flops=2 * 9 * hw * cin * cout)

    # GN+GELU at full res 96ch
    x = jax.random.normal(rng, (B, H, W, 96), jnp.bfloat16)
    s = jnp.ones((96,), jnp.float32)
    b = jnp.zeros((96,), jnp.float32)
    timed(lambda v: jax.nn.gelu(group_norm(v, s, b, 6), approximate=True),
          x, label="GN+GELU 96ch full-res")

    # full ShortResBlock-shaped chain (conv+GN+GELU x3 with concats)
    x0 = jax.random.normal(rng, (B, H, W, 136), jnp.bfloat16)
    w1 = jax.random.normal(rng, (3, 3, 136, 96), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(rng, (3, 3, 232, 64), jnp.bfloat16) * 0.05
    w3 = jax.random.normal(rng, (3, 3, 296, 128), jnp.bfloat16) * 0.05
    s1, b1 = jnp.ones((96,), jnp.float32), jnp.zeros((96,), jnp.float32)
    s2, b2 = jnp.ones((64,), jnp.float32), jnp.zeros((64,), jnp.float32)
    s3, b3 = jnp.ones((128,), jnp.float32), jnp.zeros((128,), jnp.float32)

    def block(x):
        o1 = jax.nn.gelu(group_norm(conv(x, w1), s1, b1, 6),
                         approximate=True)
        x1 = jnp.concatenate([x, o1], axis=-1)
        o2 = jax.nn.gelu(group_norm(conv(x1, w2), s2, b2, 4),
                         approximate=True)
        x2 = jnp.concatenate([x1, o2], axis=-1)
        return jax.nn.gelu(group_norm(conv(x2, w3), s3, b3, 8),
                           approximate=True)

    total_flops = 2 * 9 * hw * (136 * 96 + 232 * 64 + 296 * 128)
    timed(block, x0, label="ShortResBlock chain (no upsample)",
          flops=total_flops)


if __name__ == "__main__":
    main()
