"""Tracing / profiling utilities.

The reference's only telemetry is wall-clock timing around the forward
pass (runner.py:417-420) and tqdm postfixes. Here:

- :func:`trace` wraps ``jax.profiler`` for TensorBoard-viewable device
  traces;
- :class:`StepTimer` gives steady-state step statistics with correct
  device-completion semantics (it synchronizes on a tiny output transfer,
  since ``block_until_ready`` does not reflect completion under tunneled
  backends);
- :func:`flops_estimate` reports the XLA cost model for a jitted fn.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Device trace into ``log_dir`` (view with TensorBoard's profile
    plugin). No-op when disabled or when the backend rejects profiling."""
    if not enabled:
        yield
        return
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Steady-state step timing with host-transfer synchronization."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        """Call with a small device array from the step's outputs; the
        host transfer guarantees device completion."""
        if sync_value is not None:
            np.asarray(sync_value)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """XLA cost-model FLOPs for one invocation of a jittable fn."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return None
