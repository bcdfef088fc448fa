"""Learning-rate schedules.

OneCycle matching torch.optim.lr_scheduler.OneCycleLR as configured by the
reference (runner.py:151-152): cosine annealing, pct_start=0.15,
div_factor=2 (initial = max/2), final_div_factor=1e4
(min = initial/1e4).
"""

from __future__ import annotations

import optax


def onecycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.15,
    div_factor: float = 2.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )
