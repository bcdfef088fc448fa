"""Throughput of the TPU-native data-prep networks on the real chip.

The reference's prep pipeline spends most of its wall-clock inside two
external torch/CUDA networks: RAFT optical flow (needed_repos.txt; ~20
GRU iterations per pair) and Panoptic-DeepLab R101-os32 vehicle
segmentation (scripts/semantic_seg.py:89-171). Both have clean-room JAX
ports here (models/raft.py, models/panoptic_deeplab.py) that the prep
CLI can run natively on the TPU — this tool measures what that is
worth: frames/sec of each net at the prep geometry, scan-folded per
the repo timing rules (block_until_ready lies through the axon tunnel;
K forwards fold into ONE device execution with per-iteration input
perturbation, see bench.py).

Weights are randomly initialized (the official checkpoints are not
present in this offline environment; the architectures are
checkpoint-loadable and oracle-pinned in tests/test_raft.py and
tests/test_panoptic_deeplab.py) — throughput is weight-independent.

Usage:
  python tools/prep_bench.py [--hw 416,800] [--scan 8] [--out PREP.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="416,800",
                    help="prep image geometry (the *_im.jpg artifacts)")
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--raft-iters", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from camradepth_tpu.cli import _enable_compile_cache_on_accelerator

    _enable_compile_cache_on_accelerator()

    from camradepth_tpu.models.panoptic_deeplab import (
        MEAN,
        STD,
        PanopticDeepLab,
        _pad_hw,
        resize_bilinear_ac,
    )
    from camradepth_tpu.models.raft import RAFT

    h, w = (int(v) for v in args.hw.split(","))
    scan = args.scan
    report = {
        "device": str(jax.devices()[0]),
        "hw": [h, w],
        "scan_len": scan,
    }

    def timed(manyj, *operands, frames_per_iter=1):
        """Compile, warm, then time ONE folded execution (sync by
        materializing the small carry on the host)."""
        np.asarray(manyj(*operands))
        t0 = time.perf_counter()
        np.asarray(manyj(*operands))
        dt = time.perf_counter() - t0
        return scan * frames_per_iter / dt, dt

    # ---- Panoptic-DeepLab R101-os32: the semantic_seg.py workload ----
    ph, pw = _pad_hw(h, w)
    pdl = PanopticDeepLab()
    xpad = jnp.zeros((1, ph, pw, 3), jnp.float32)
    t0 = time.perf_counter()
    pdl_params = jax.jit(
        lambda k: pdl.init({"params": k}, xpad)["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(pdl_params)
    report["panoptic_init_s"] = round(time.perf_counter() - t0, 1)

    def pdl_many(p, x, eps):
        def body(carry, e):
            xi = (x + e - jnp.asarray(MEAN)) / jnp.asarray(STD)
            logits = pdl.apply({"params": p}, xi)["semantic"]
            # full _classmap workload: upsample logits to the padded
            # geometry before the argmax (models/panoptic_deeplab.py)
            logits = resize_bilinear_ac(logits, (ph, pw))
            cls = jnp.argmax(logits, axis=-1)
            return carry + cls.sum(), None

        s, _ = jax.lax.scan(body, jnp.int32(0), eps)
        return s

    eps = jax.random.uniform(
        jax.random.PRNGKey(1), (scan, 1, 1, 1, 1), jnp.float32
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(2), (1, ph, pw, 3), jnp.float32, 0.0, 255.0
    )
    fps, dt = timed(jax.jit(pdl_many), pdl_params, x, eps)
    report["panoptic_deeplab"] = {
        "padded_hw": [ph, pw],
        "batch": 1,
        "fps": round(fps, 2),
        "ms_per_frame": round(1000.0 / fps, 2),
        "reference": "scripts/semantic_seg.py:89-171 (torch/CUDA, "
                     "frame-by-frame)",
    }
    print(json.dumps({"panoptic_deeplab": report["panoptic_deeplab"]}))

    # ---- RAFT (20 GRU iterations), frame-pair flow ----
    raft = RAFT(iters=args.raft_iters)
    pair = jax.random.uniform(
        jax.random.PRNGKey(3), (2, 1, h, w, 3), jnp.float32, 0.0, 255.0
    )
    t0 = time.perf_counter()
    raft_params = jax.jit(
        lambda k: raft.init({"params": k}, pair[0], pair[1])["params"]
    )(jax.random.PRNGKey(4))
    jax.block_until_ready(raft_params)
    report["raft_init_s"] = round(time.perf_counter() - t0, 1)

    def raft_many(p, im1, im2, eps):
        def body(carry, e):
            flow = raft.apply({"params": p}, im1 + e, im2)
            return carry + flow.mean(), None

        s, _ = jax.lax.scan(body, jnp.float32(0), eps)
        return s

    epsf = (
        jax.random.normal(
            jax.random.PRNGKey(5), (scan, 1, 1, 1, 1), jnp.float32
        ) * 0.5
    )
    fps, dt = timed(jax.jit(raft_many), raft_params, pair[0], pair[1], epsf)
    report["raft"] = {
        "iters": args.raft_iters,
        "batch": 1,
        "pairs_per_sec": round(fps, 2),
        "ms_per_pair": round(1000.0 / fps, 2),
        "reference": "external torch RAFT (needed_repos.txt), 20 GRU "
                     "iterations per pair",
    }

    text = json.dumps(report, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
