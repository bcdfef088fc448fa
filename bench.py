"""Headline benchmark: nuScenes-resolution inference throughput per chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures steady-state frames/sec/chip of the flagship base (camera+radar)
model at the reference's test setting — full 416x800 forward to the final
depth map (reference times wall-clock around the batch-1 forward,
runner.py:417-420).

Timing methodology: the axon-tunneled TPU backend has ~30 ms host
round-trip latency and block_until_ready does not reflect device completion,
so we time K forwards folded into ONE device execution via lax.scan, with a
per-iteration input perturbation so XLA cannot hoist the loop body, and
divide by K*batch. This is a pure device-compute number — exactly what
multi-frame streaming inference achieves with input prefetch.

vs_baseline: the reference repo publishes no number (BASELINE.md). The
baseline comes from baseline_measured.json (written by
tools/measure_baseline.py): the paper's desktop-GPU setting, ~25 fps, IEEE
Sensors Journal 2023 DOI 10.1109/JSEN.2023.3321886, corroborated by a
same-machine CPU timing of the reference's own code.

Roofline fields (attainable-floor model, utils/roofline.py): every
matmul-class op in the traced graph gets a floor of

    max(padded_flops / 197 TFLOP/s,  op bytes / 819 GB/s)

where padded_flops pads the [M,K]x[K,N] view to the MXU's physical
tiles (N->128 lanes, K->8 sublane granularity, M->8) — this is what
makes the floor ATTAINABLE rather than peak-naive: the decoder's
32..96-output-channel convs cannot use all 128 MXU lanes no matter the
schedule. Depthwise convs are bandwidth-only (VPU). All remaining
(fused elementwise/norm/resize) work is floored by the compiled
executable's post-fusion "bytes accessed" minus the matmul bytes, at
HBM bandwidth. Then

    roofline_pct = 100 * attainable_ms / measured_ms

>= ~90 means the schedule is within noise of this architecture's
practical optimum on one v5e chip; the per-op table is printed by
tools/roofline_report.py, and the measured per-module attribution by
tools/trace_report.py.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def probe_backend(
    attempts: int = 6,
    probe_timeout_s: float = 90.0,
    sleep_s: float = 45.0,
    code: str = "import jax; print(jax.devices()[0].platform)",
) -> str:
    """Wait (bounded) for the JAX backend to come up before benchmarking.

    The axon TPU tunnel flaps: when it is down, backend init HANGS
    inside jax.devices() rather than raising, so a bench run would sit
    until the driver's timeout with no diagnostics. Probe backend init
    in a short-timeout subprocess and retry with a fixed backoff — a
    flapping tunnel gets a bounded second chance (~13 min worst case
    with the defaults), a dead one fails fast with a clear message.
    The probe process exits before we proceed, so it never contends
    with this process for the single TPU.

    Returns the platform string the probe's backend actually selected
    ("tpu"/"cpu"/...) — callers gate backend-specific behavior on this
    REPORTED platform, not on env vars (the axon sitecustomize can win
    backend selection regardless of JAX_PLATFORMS).
    """
    import subprocess
    import sys

    last = "no probe ran"
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=probe_timeout_s,
            )
            if proc.returncode == 0:
                return proc.stdout.strip().splitlines()[-1]
            last = f"rc={proc.returncode}: {proc.stderr.strip()[-500:]}"
        except subprocess.TimeoutExpired:
            last = f"backend init hung > {probe_timeout_s:.0f}s (tunnel down?)"
        # Emit a parseable PARTIAL result line to stdout after EVERY
        # failed probe — if the driver's own timeout kills us mid-retry
        # (r3: rc=124 with an empty tail), the last line on the pipe is
        # still one valid JSON object describing the failure. A later
        # success prints the real result line after this one; consumers
        # take the LAST parseable line.
        print(
            json.dumps(
                {
                    "metric": "nuScenes 416x800 camera+radar inference "
                    "throughput",
                    "value": None,
                    "unit": "frames/sec/chip",
                    "error": f"backend probe {i + 1}/{attempts} failed: "
                    f"{last}",
                }
            ),
            flush=True,
        )
        if i + 1 < attempts:
            print(
                f"# backend probe {i + 1}/{attempts} failed ({last}); "
                f"retrying in {sleep_s:.0f}s",
                file=sys.stderr,
            )
            time.sleep(sleep_s)
    raise SystemExit(
        f"bench: JAX backend unreachable after {attempts} probes — {last}. "
        "If this is the axon tunnel, retry later (bench itself is healthy; "
        "see CLAUDE.md round-3 notes)."
    )


def _baseline_fps() -> float:
    path = Path(__file__).resolve().parent / "baseline_measured.json"
    try:
        return float(json.loads(path.read_text())["baseline_fps"])
    except (OSError, KeyError, ValueError):
        return 25.0


BASELINE_FPS = _baseline_fps()
BATCH = 8
SCAN_LEN = 16
def roofline_fields(model, params, hwc, fps: float) -> dict:
    """Attainable-floor roofline for the batch-BATCH forward (see module
    docstring; model in utils/roofline.py)."""
    from camradepth_tpu.utils import roofline as rl

    h, w, c = hwc

    def fwd(p, x):
        return model.apply({"params": p}, x, deterministic=True)[
            "depth"
        ]["final_depth"]

    x = jnp.zeros((BATCH, h, w, c), jnp.float32)
    try:
        compiled = jax.jit(fwd).lower(params, x).compile()
    except Exception:
        compiled = None
    try:
        r = rl.analyze(fwd, params, x, compiled=compiled)
    except Exception:
        return {}
    attainable_ms = r.attainable_s / BATCH * 1e3
    measured_ms = 1e3 / fps
    flops = sum(op.flops for op in r.matmuls) / BATCH
    return {
        "gflops_per_frame": round(flops / 1e9, 1),
        "achieved_tflops": round(flops * fps / 1e12, 1),
        "attainable_ms_per_frame": round(attainable_ms, 2),
        "roofline_pct": round(100.0 * attainable_ms / measured_ms, 1),
    }


def timed_fps(model, params, batch: int, scan_len: int, hwc) -> float:
    h, w, c = hwc

    def many(p, x, eps):
        def body(carry, e):
            out = model.apply({"params": p}, x + e, deterministic=True)[
                "depth"
            ]["final_depth"]
            return carry + out.mean(), None

        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    manyj = jax.jit(many)
    xb = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, c),
                           jnp.float32)
    eps = (
        jax.random.normal(jax.random.PRNGKey(2), (scan_len, 1, 1, 1, 1),
                          jnp.float32) * 1e-3
    )
    np.asarray(manyj(params, xb, eps))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(manyj(params, xb, eps))
    dt = time.perf_counter() - t0
    return batch * scan_len / dt


def train_step_ms() -> dict:
    """Measure the TPU-tuned effective-batch-6 train step (one
    microbatch of 6 padded to 8, encoder+decoder remat — see
    TrainConfig.pad_microbatch_to), plus its attainable-roofline floor
    (same model as the inference roofline; the rematerialized forward's
    convs and the transposed gradient convs all appear in the traced
    graph and are each floored once, matching per-step execution).
    Compile is served from the persistent JAX cache after the first
    run."""
    import dataclasses

    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.train.diffgrad import diffgrad_norm
    from camradepth_tpu.train.schedule import onecycle
    from camradepth_tpu.train.step import init_state, make_train_step

    cfg = preset("base")
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, remat_encoder=True, remat_decoder=True
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=6, pad_microbatch_to=8
        ),
    )
    mc = cfg.model
    h, w = mc.img_size
    model = CamRaDepth(mc)
    tx = diffgrad_norm(
        onecycle(cfg.train.learning_rate, total_steps=100,
                 div_factor=cfg.train.div_factor),
        weight_decay=cfg.train.weight_decay,
    )
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, tx, rng)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
    micro = {
        "features": jax.random.normal(rng, (1, 6, h, w, 7), jnp.float32),
        "gt_depth": jnp.abs(
            jax.random.normal(rng, (1, 6, h, w), jnp.float32)
        ) * 0.1,
    }
    state, m = step(state, micro, rng)
    np.asarray(m["loss"])
    for _ in range(2):
        state, m = step(state, micro, rng)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(4):
        state, m = step(state, micro, rng)
    np.asarray(m["loss"])
    ms = (time.perf_counter() - t0) / 4 * 1000

    # No roofline fields for training: the backward graph's floor model
    # is not sound the way the forward's is — AD's grouped weight-grad
    # convs and remat'd fusion boundaries make the post-fusion
    # bytes-accessed term overcount, so a "pct of floor" here would be
    # noise. The measured step time is the honest train metric; the
    # attainable analysis stands for inference (roofline_pct above).
    return {
        "train_step_ms_batch6": round(ms, 1),
        "train_frames_per_sec": round(6000.0 / ms, 1),
    }


def tpu_variant_fields() -> dict:
    """Measure the documented TPU architecture variant
    (ModelConfig.tpu_decoder: subpixel MXU-aligned decoder stages —
    models/layers.py TPUDecoder). Benchmarked separately from the
    parity headline because it is NOT weight-compatible with the
    reference architecture (same inputs/outputs/losses; encoder and
    low-res decoder transfer from parity checkpoints)."""
    import dataclasses

    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth

    mc = dataclasses.replace(preset("base").model, tpu_decoder=True)
    model = CamRaDepth(mc)
    h, w = mc.img_size
    c = mc.input_channels
    params = jax.jit(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, h, w, c)), deterministic=True
        )["params"]
    )(jax.random.PRNGKey(0))
    fps = timed_fps(model, params, BATCH, SCAN_LEN, (h, w, c))
    fps1 = timed_fps(model, params, 1, SCAN_LEN, (h, w, c))
    rf = roofline_fields(model, params, (h, w, c), fps)
    return {
        "tpu_variant_fps": round(fps, 1),
        "tpu_variant_vs_baseline": round(fps / BASELINE_FPS, 2),
        "tpu_variant_batch1_latency_ms": round(1000.0 / fps1, 2),
        "tpu_variant_roofline_pct": rf.get("roofline_pct"),
        "tpu_variant_gflops_per_frame": rf.get("gflops_per_frame"),
    }


def main() -> None:
    import sys

    # Any failure past this point (e.g. the tunnel dying mid-bench)
    # must still leave ONE parseable JSON line on stdout.
    try:
        _main_measured()
    except BaseException as e:
        print(
            json.dumps(
                {
                    "metric": "nuScenes 416x800 camera+radar inference "
                    "throughput",
                    "value": None,
                    "unit": "frames/sec/chip",
                    "error": f"{type(e).__name__}: {e}"[:500],
                }
            ),
            flush=True,
        )
        raise


def _main_measured() -> None:
    import sys

    platform = probe_backend()
    # Persistent compile cache — TPU entry points only (XLA:CPU AOT cache
    # entries can SIGILL on this host, see CLAUDE.md); bench on the CPU
    # backend is a dev-only path and stays cache-less. Gate on the
    # platform the probe's backend REALLY selected, not env vars — the
    # sitecustomize can override JAX_PLATFORMS either way.
    if platform != "cpu":
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/camradepth_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0
        )

    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth

    cfg = preset("base")
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    c = cfg.model.input_channels

    params = jax.jit(
        lambda k: model.init(
            {"params": k}, jnp.zeros((1, h, w, c)), deterministic=True
        )["params"]
    )(jax.random.PRNGKey(0))

    fps = timed_fps(model, params, BATCH, SCAN_LEN, (h, w, c))
    fps1 = timed_fps(model, params, 1, SCAN_LEN, (h, w, c))

    roofline = roofline_fields(model, params, (h, w, c), fps)

    extra = {}
    try:
        extra.update(tpu_variant_fields())
    except Exception as e:
        print(f"# tpu-variant bench failed: {e}", file=sys.stderr)
    if "--train" in sys.argv:
        extra.update(train_step_ms())
    print(
        json.dumps(
            {
                "metric": "nuScenes 416x800 camera+radar inference throughput",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
                "batch1_latency_ms": round(1000.0 / fps1, 2),
                "batch": BATCH,
                "device": str(jax.devices()[0]),
                **roofline,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
