"""Per-stage TPU timing of the flagship forward (bisection profiler).

The axon tunnel hides per-op device traces, so this times individual
modules the same way bench.py times the whole net: K iterations folded
into ONE device execution via lax.scan with an input perturbation, so
per-execution dispatch overhead amortizes away. Reports ms/frame and
achieved TF/s per module at batch 8 and batch 1.

Usage: python tools/profile_stages.py [--scan 16] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, params, shapes, scan_len=16, dtypes=None):
    """Time fn(params, *xs) folded scan_len times into one execution.

    shapes: list of input shapes. Returns seconds per iteration.
    """
    if dtypes is None:
        dtypes = [jnp.float32] * len(shapes)

    def many(p, xs, eps):
        def body(carry, e):
            out = fn(p, *[x + e.astype(x.dtype) for x in xs])
            return carry + out, None

        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    manyj = jax.jit(many)
    keys = jax.random.split(jax.random.PRNGKey(1), len(shapes))
    xs = [
        jax.random.normal(k, s, d) * 0.5
        for k, s, d in zip(keys, shapes, dtypes)
    ]
    eps = (
        jax.random.normal(jax.random.PRNGKey(2), (scan_len,), jnp.float32)
        * 1e-3
    )
    np.asarray(manyj(params, xs, eps))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(manyj(params, xs, eps))
        best = min(best, time.perf_counter() - t0)
    return best / scan_len


def conv3x3_flops(px, cin, cout):
    return 2 * 9 * px * cin * cout


def srb_flops(px, cin, mid=128):
    w1, w2, w3 = int(mid * 0.75), int(mid * 0.5), mid
    return (
        conv3x3_flops(px, cin, w1)
        + conv3x3_flops(px, cin + w1, w2)
        + conv3x3_flops(px, cin + w1 + w2, w3)
    )


def da_flops(px, cin, iter_ch=32):
    return conv3x3_flops(px, cin, iter_ch) + conv3x3_flops(px, iter_ch, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--trace", default="", help="also dump a jax.profiler trace here")
    args = ap.parse_args()

    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.models.encoder import SimplifiedTransformer
    from camradepth_tpu.models.layers import Decoder, DepthActivation
    from camradepth_tpu.ops.resize import upsample_bicubic_x2

    cfg = preset("base")
    mc = cfg.model
    H, W = mc.img_size
    B = args.batch
    results = {}

    def run(name, module_or_fn, shapes, flops, method="module",
            dtypes=None, extra_kw=None):
        if method == "module":
            m = module_or_fn
            pr = jax.jit(
                lambda k, xs: m.init({"params": k}, *xs, **(extra_kw or {}))[
                    "params"
                ]
            )
            keys = jax.random.split(jax.random.PRNGKey(0), len(shapes))
            xs0 = [
                jnp.zeros(s, d)
                for s, d in zip(
                    shapes, dtypes or [jnp.float32] * len(shapes)
                )
            ]
            params = pr(jax.random.PRNGKey(0), xs0)

            def fn(p, *xs):
                out = m.apply({"params": p}, *xs, **(extra_kw or {}))
                if isinstance(out, dict):
                    out = out["depth"]["final_depth"]
                if isinstance(out, (list, tuple)):
                    out = out[0]
                return out.astype(jnp.float32).mean()

        else:
            params = None
            f = module_or_fn

            def fn(p, *xs):
                return f(*xs).astype(jnp.float32).mean()

        sec = timed(fn, params, shapes, args.scan, dtypes)
        ms_frame = sec * 1000 / B
        tfs = flops * B / sec / 1e12 if flops else 0.0
        results[name] = {"ms_per_frame": round(ms_frame, 3),
                         "tf_per_s": round(tfs, 1)}
        print(f"{name:28s} {ms_frame:7.3f} ms/frame   {tfs:7.1f} TF/s",
              flush=True)

    # ---- full model ----
    model = CamRaDepth(mc)
    px_full, px_h2, px_h4 = H * W, H * W // 4, H * W // 16
    total_dec_flops = (
        srb_flops(px_full, 136) + srb_flops(px_h2, 129)
        + srb_flops(px_h4, 192) + srb_flops(px_h4 // 4, 256)
        + srb_flops(px_h4 // 16, 416)
        + da_flops(px_full, 128) + da_flops(px_h2, 129) + da_flops(px_h4, 128)
    )
    run("full_forward", model, [(B, H, W, 7)], None,
        extra_kw={"deterministic": True})

    # ---- encoder only ----
    enc = SimplifiedTransformer(
        dims=mc.dims, num_heads=mc.heads, mlp_ratios=mc.ff_expansion,
        sr_ratios=mc.sr_ratios, depths=mc.depths,
        drop_path_rate=mc.drop_path_rate, qkv_bias=mc.qkv_bias,
        divisor=mc.groupnorm_divisor, use_pallas=mc.use_pallas_attention,
        dtype=jnp.bfloat16,
    )
    run("encoder", enc, [(B, H, W, 7)], None,
        extra_kw={"deterministic": True})

    # ---- decoder stages ----
    bf = jnp.bfloat16
    run("dec4_full_res(136->SRB)",
        Decoder(128, has_skip=True, dtype=bf),
        [(B, H // 2, W // 2, 129), (B, H, W, 7)],
        srb_flops(px_full, 136), dtypes=[bf, bf])
    run("dec3_half_res(129->SRB)",
        Decoder(128, dtype=bf),
        [(B, H // 4, W // 4, 129)],
        srb_flops(px_h2, 129), dtypes=[bf])
    run("dec2_quarter(192->SRB)",
        Decoder(128, has_skip=True, dtype=bf),
        [(B, H // 8, W // 8, 128), (B, H // 4, W // 4, 64)],
        srb_flops(px_h4, 192), dtypes=[bf, bf])
    run("dec01_small", Decoder(128, has_skip=True, dtype=bf),
        [(B, H // 16, W // 16, 128), (B, H // 8, W // 8, 128)],
        srb_flops(px_h4 // 4, 256), dtypes=[bf, bf])
    run("DA5_full_res(128->32->1)", DepthActivation(1, dtype=bf),
        [(B, H, W, 128)], da_flops(px_full, 128), dtypes=[bf])
    run("DA4_half_res", DepthActivation(1, dtype=bf),
        [(B, H // 2, W // 2, 129)], da_flops(px_h2, 129), dtypes=[bf])
    run("upsample_x2@208x400x129", upsample_bicubic_x2,
        [(B, H // 2, W // 2, 129)], 0, method="fn", dtypes=[bf])

    # ---- batch 1 ----
    B = 1
    run("full_forward_b1", model, [(1, H, W, 7)], None,
        extra_kw={"deterministic": True})
    run("encoder_b1", enc, [(1, H, W, 7)], None,
        extra_kw={"deterministic": True})
    run("dec4_b1", Decoder(128, has_skip=True, dtype=bf),
        [(1, H // 2, W // 2, 129), (1, H, W, 7)],
        srb_flops(px_full, 136), dtypes=[bf, bf])

    print(json.dumps({"theoretical_decoder_gflops_per_frame":
                      total_dec_flops / 1e9, **results}))

    if args.trace:
        model_j = jax.jit(
            lambda p, x: model.apply(
                {"params": p}, x, deterministic=True
            )["depth"]["final_depth"]
        )
        x = jnp.zeros((args.batch, H, W, 7))
        params = jax.jit(
            lambda k: model.init({"params": k}, x[:1],
                                 deterministic=True)["params"]
        )(jax.random.PRNGKey(0))
        np.asarray(model_j(params, x))
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                np.asarray(model_j(params, x))
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
