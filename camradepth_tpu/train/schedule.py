"""Learning-rate schedules.

OneCycle matching ``torch.optim.lr_scheduler.OneCycleLR`` exactly as the
reference configures it (runner.py:151-152): cosine annealing in both
phases, ``pct_start=0.15``, ``div_factor`` (initial = max/div),
``final_div_factor=1e4`` (min = initial/1e4), ``three_phase=False``.

torch's phase boundaries are step-index based: phase 1 ends at
``pct_start * total_steps - 1`` and phase 2 ends at ``total_steps - 1``
(so the last step hits min_lr exactly). optax's cosine_onecycle uses
different boundary conventions, hence this hand-rolled version.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def onecycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.15,
    div_factor: float = 2.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    phase1_end = float(pct_start * total_steps) - 1.0
    phase2_end = float(total_steps) - 1.0

    def _anneal_cos(start, end, pct):
        cos_out = jnp.cos(jnp.pi * pct) + 1.0
        return end + (start - end) / 2.0 * cos_out

    def schedule(count):
        step = jnp.asarray(count, jnp.float32)
        pct1 = jnp.clip(step / jnp.maximum(phase1_end, 1e-8), 0.0, 1.0)
        lr1 = _anneal_cos(initial_lr, max_lr, pct1)
        pct2 = jnp.clip(
            (step - phase1_end) / jnp.maximum(phase2_end - phase1_end, 1e-8),
            0.0,
            1.0,
        )
        lr2 = _anneal_cos(max_lr, min_lr, pct2)
        return jnp.where(step <= phase1_end, lr1, lr2)

    return schedule
