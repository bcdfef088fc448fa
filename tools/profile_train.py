"""Profile the jitted train step on the TPU.

Measures steady-state step time for the flagship training
configurations and optionally dumps a device trace:

  python tools/profile_train.py            # reference shape: 2 x 3 accum
  python tools/profile_train.py --tuned    # batch 6 padded to 8, remats
  python tools/profile_train.py --trace /tmp/trace_train

Round-2 measurements (v5e): 640 ms reference shape, 372.6 ms tuned
(the difference is XLA's space-to-batch rewrite of batch<8 convs;
see TrainConfig.pad_microbatch_to).
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from camradepth_tpu.config import preset
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.schedule import onecycle
from camradepth_tpu.train.step import init_state, make_train_step

if jax.default_backend() != "cpu":
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/camradepth_jax_cache"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tuned", action="store_true")
    ap.add_argument("--tpu-decoder", action="store_true",
                    help="profile the TPU architecture variant "
                         "(ModelConfig.tpu_decoder)")
    ap.add_argument("--distill", action="store_true",
                    help="profile the distillation step (parity teacher "
                         "forward + student forward/backward in one "
                         "program; train/distill.py). Usually combined "
                         "with --tpu-decoder for the student")
    ap.add_argument("--no-remat", action="store_true",
                    help="drop remat_encoder/remat_decoder (with "
                         "--tuned; the TPU variant's small full-res "
                         "footprint may not need remat)")
    ap.add_argument("--batch", type=int, default=None,
                    help="override microbatch size (with --tuned)")
    ap.add_argument("--trace", default="")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = preset("base")
    if args.tuned:
        b = args.batch or 6
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model,
                remat_encoder=not args.no_remat,
                remat_decoder=not args.no_remat,
            ),
            train=dataclasses.replace(
                cfg.train, batch_size=b, desired_batch_size=b,
                pad_microbatch_to=8 if b < 8 else None,
            ),
        )
    if args.tpu_decoder:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, tpu_decoder=True)
        )
    mc = cfg.model
    H, W = mc.img_size
    model = CamRaDepth(mc)
    sched = onecycle(
        cfg.train.learning_rate, total_steps=100,
        div_factor=cfg.train.div_factor,
    )
    tx = diffgrad_norm(sched, weight_decay=cfg.train.weight_decay)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, tx, rng)
    if args.distill:
        from camradepth_tpu.train.distill import make_distill_step

        t_cfg = dataclasses.replace(
            mc, tpu_decoder=False, remat_encoder=False,
            remat_decoder=False,
        )
        teacher = CamRaDepth(t_cfg)
        t_params = jax.jit(
            lambda k: teacher.init(
                {"params": k},
                jnp.zeros((1, H, W, t_cfg.input_channels), jnp.float32),
                deterministic=True,
            )["params"]
        )(jax.random.PRNGKey(1))
        step = jax.jit(
            make_distill_step(cfg, model, teacher, t_params, tx,
                              alpha=0.7),
            donate_argnums=(0,),
        )
    else:
        step = jax.jit(
            make_train_step(cfg, model, tx), donate_argnums=(0,)
        )

    acc = cfg.train.update_interval
    mb = cfg.train.batch_size
    micro = {
        "features": jax.random.normal(
            rng, (acc, mb, H, W, 7), jnp.float32
        ),
        "gt_depth": jnp.abs(
            jax.random.normal(rng, (acc, mb, H, W), jnp.float32)
        )
        * 0.1,
    }
    label = (
        f"tuned b{mb}"
        + (f"pad{cfg.train.pad_microbatch_to}"
           if cfg.train.pad_microbatch_to else "")
        if args.tuned else f"{mb}x{acc}"
    )
    if args.no_remat:
        label += " no-remat"
    if args.tpu_decoder:
        label += " tpu-decoder"
    if args.distill:
        label += " distill"
    print(f"compiling train step ({label})...", flush=True)
    t0 = time.perf_counter()
    state, m = step(state, micro, rng)
    np.asarray(m["loss"])
    print(f"compiled+first in {time.perf_counter() - t0:.1f}s",
          flush=True)
    for _ in range(2):
        state, m = step(state, micro, rng)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, micro, rng)
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters * 1000
    eff = acc * mb
    print(
        f"step time ({label}): {dt:.1f} ms "
        f"= {eff / dt * 1000:.1f} train-frames/s",
        flush=True,
    )
    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(2):
                state, m = step(state, micro, rng)
            np.asarray(m["loss"])
        print("trace written to", args.trace, flush=True)


if __name__ == "__main__":
    main()
