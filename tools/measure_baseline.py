"""Anchor the benchmark baseline to recorded measurements.

BENCH vs_baseline previously rested on a bare constant (25 fps, the
desktop-GPU figure implied by the reference paper). This tool records a
defensible provenance trail into ``baseline_measured.json`` at the repo
root:

1. measures the REAL reference torch model's forward (flagship variant,
   batch 1, 416x800, 7 channels, eval, no_grad) on THIS machine's CPU —
   the reference's own code via interop.reference_loader;
2. measures our Flax model under the identical setting on the same CPU
   (jitted, same shapes) — a same-hardware framework comparison;
3. pins the published source: IEEE Sensors Journal 2023,
   DOI 10.1109/JSEN.2023.3321886 (README.md:276-285), whose reported
   inference time corresponds to ~25 fps on a desktop GPU — the per-chip
   baseline the driver's >=5x north-star divides by.

bench.py reads baseline_fps from this file when present.

Run:  JAX_PLATFORMS=cpu python tools/measure_baseline.py
(the script forces the cpu platform itself so it never claims the TPU).
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# Never claim the tunneled TPU for a CPU measurement.
os.environ["JAX_PLATFORMS"] = "cpu"

BATCH = 1
HW = (416, 800)
CHANNELS = 7
WARMUP = 2
ITERS = 5
PAPER_DOI = "10.1109/JSEN.2023.3321886"
PAPER_GPU_FPS = 25.0


def time_reference_cpu() -> float:
    """Mean seconds/frame of the reference torch model on CPU."""
    import torch

    from camradepth_tpu.interop.reference_loader import load_reference_model

    torch.manual_seed(0)
    model = load_reference_model(input_channels=CHANNELS)
    x = torch.randn(BATCH, CHANNELS, *HW)
    with torch.no_grad():
        for _ in range(WARMUP):
            model(x)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            model(x)
    return (time.perf_counter() - t0) / ITERS / BATCH


def time_flax_cpu() -> float:
    """Mean seconds/frame of our model on the same CPU (jitted fp32 —
    matching the reference's fp32 torch path, not the TPU bf16 config)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from camradepth_tpu.config import preset
    from camradepth_tpu.models.camradepth import CamRaDepth

    cfg = preset("base")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="float32")
    )
    model = CamRaDepth(cfg.model)
    x = jnp.zeros((BATCH, *HW, CHANNELS), jnp.float32)
    params = jax.jit(
        lambda k: model.init({"params": k}, x, deterministic=True)["params"]
    )(jax.random.PRNGKey(0))
    fwd = jax.jit(
        lambda p, x: model.apply({"params": p}, x, deterministic=True)[
            "depth"
        ]["final_depth"]
    )
    jax.block_until_ready(fwd(params, x))
    for _ in range(WARMUP):
        jax.block_until_ready(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(fwd(params, x))
    return (time.perf_counter() - t0) / ITERS / BATCH


def main() -> None:
    ref_s = time_reference_cpu()
    print(f"reference torch CPU: {ref_s * 1e3:.1f} ms/frame "
          f"({1.0 / ref_s:.2f} fps)")
    ours_s = time_flax_cpu()
    print(f"ours (Flax, fp32) CPU: {ours_s * 1e3:.1f} ms/frame "
          f"({1.0 / ours_s:.2f} fps)")
    out = {
        "baseline_fps": PAPER_GPU_FPS,
        "baseline_provenance": (
            "Reference publishes no benchmark table (BASELINE.json "
            "published={}). The per-chip baseline is the paper's desktop-"
            f"GPU inference setting (~{PAPER_GPU_FPS:.0f} fps), IEEE "
            f"Sensors Journal 2023, DOI {PAPER_DOI} (README.md:276-285). "
            "Corroborating same-machine CPU measurements of the "
            "reference's own code below."
        ),
        "reference_cpu_s_per_frame": round(ref_s, 4),
        "reference_cpu_fps": round(1.0 / ref_s, 3),
        "ours_flax_fp32_cpu_s_per_frame": round(ours_s, 4),
        "ours_flax_fp32_cpu_fps": round(1.0 / ours_s, 3),
        "setting": {
            "batch": BATCH,
            "hw": list(HW),
            "channels": CHANNELS,
            "iters": ITERS,
            "mode": "eval/no_grad vs jit, fp32 both",
        },
        "machine": {
            "platform": platform.platform(),
            "processor": platform.processor() or "unknown",
            "cpu_count": os.cpu_count(),
        },
        "measured_on": str(date.today()),
    }
    path = REPO / "baseline_measured.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
