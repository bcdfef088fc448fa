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
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _baseline_fps() -> float:
    path = Path(__file__).resolve().parent / "baseline_measured.json"
    try:
        return float(json.loads(path.read_text())["baseline_fps"])
    except (OSError, KeyError, ValueError):
        return 25.0


BASELINE_FPS = _baseline_fps()
BATCH = 8
SCAN_LEN = 16


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


def main() -> None:
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
            }
        )
    )


if __name__ == "__main__":
    main()
