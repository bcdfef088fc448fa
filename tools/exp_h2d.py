"""Measure the axon tunnel's H2D characteristics (one-off experiment).

Questions the sustained-train gap (0.5 steps/s end-to-end vs 2.68
pure-device, TRAIN_r04.json) hangs on:
  1. What is the real H2D bandwidth through the tunnel?
  2. Does a device_put overlap with device compute (async dispatch), or
     does the tunnel serialize transfer and execution?
  3. How much does the per-step training payload (features + GT) cost?

Timing rule (CLAUDE.md): block_until_ready lies on this backend; sync
by materializing a small reduction of the data on the host.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32).ravel()[:8])))


def time_put(arr, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        sync(d)
        ts.append(time.perf_counter() - t0)
        del d
    return min(ts)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "platform": dev.platform}))

    # 1) bandwidth at training-relevant sizes
    for mb in (1, 8, 37, 74):
        n = mb * 1024 * 1024
        arr = np.random.default_rng(0).standard_normal(n // 4).astype(np.float32)
        t = time_put(arr)
        print(json.dumps({
            "payload_mb": mb, "put_s": round(t, 4),
            "mb_per_s": round(mb / t, 1),
        }))

    # 2) overlap: long compute dispatched async, then a put mid-flight
    m = 4096
    a = jnp.asarray(np.random.default_rng(1).standard_normal((m, m)), jnp.bfloat16)

    @jax.jit
    def burn(a):
        def body(x, _):
            return jnp.tanh(x @ a), ()
        y, _ = jax.lax.scan(body, a, None, length=64)
        return jnp.sum(y.astype(jnp.float32))

    burn(a)  # compile
    t0 = time.perf_counter()
    r = burn(a)
    float(r)
    compute_s = time.perf_counter() - t0

    payload = np.random.default_rng(2).standard_normal(37 * 1024 * 1024 // 4).astype(np.float32)
    put_s = time_put(payload)

    t0 = time.perf_counter()
    r = burn(a)          # async dispatch
    d = jax.device_put(payload)
    sync(d)              # wait for the put
    float(r)             # wait for compute
    both_s = time.perf_counter() - t0
    print(json.dumps({
        "compute_s": round(compute_s, 4), "put37_s": round(put_s, 4),
        "overlapped_s": round(both_s, 4),
        "sequential_would_be_s": round(compute_s + put_s, 4),
        "overlap_achieved": both_s < 0.8 * (compute_s + put_s),
    }))

    # 3) bf16 vs f32 vs uint8 put cost at the training feature shape
    feat32 = np.random.default_rng(3).standard_normal((8, 416, 800, 7)).astype(np.float32)
    feat16 = feat32.astype(jnp.bfloat16)
    featu8 = (feat32 * 16).astype(np.uint8)
    for name, arr in (("features_f32", feat32), ("features_bf16", feat16),
                      ("features_u8", featu8)):
        t = time_put(arr)
        print(json.dumps({
            "array": name, "mb": round(arr.nbytes / 2**20, 1),
            "put_s": round(t, 4),
            "mb_per_s": round(arr.nbytes / 2**20 / t, 1),
        }))


if __name__ == "__main__":
    main()
