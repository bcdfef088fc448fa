"""Random hyperparameter search.

The reference ships a *stub* random search (Trainer.hyperparameters_tuning,
runner.py:521-565 — the trial loop body is a TODO). This is the working
equivalent: sample configs from typed search spaces, run short budgeted
trials through the real Trainer, rank by validation loss.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from camradepth_tpu.config import ExperimentConfig


def sample_config(
    search_spaces: Dict[str, Tuple[Sequence[Any], str]],
    rng: np.random.Generator,
) -> Dict[str, Any]:
    """Sample one assignment. Space modes (reference
    random_search_spaces_to_config, runner.py:523-547):
      'log'   — log-uniform over [lo, hi]
      'float' — uniform over [lo, hi]
      'int'   — uniform integer in [lo, hi)
      'item'  — uniform choice from the list
    """
    out: Dict[str, Any] = {}
    for key, (rng_vals, mode) in search_spaces.items():
        if mode == "log":
            lo, hi = rng_vals[0], rng_vals[-1]
            if lo <= 0 or hi <= 0:
                continue
            out[key] = float(
                10 ** rng.uniform(math.log10(lo), math.log10(hi))
            )
        elif mode == "float":
            out[key] = float(rng.uniform(rng_vals[0], rng_vals[-1]))
        elif mode == "int":
            out[key] = int(rng.integers(rng_vals[0], rng_vals[-1]))
        elif mode == "item":
            out[key] = rng_vals[int(rng.integers(len(rng_vals)))]
        # unknown modes are skipped, like the reference
    return out


def apply_overrides(cfg: ExperimentConfig, overrides: Dict[str, Any]
                    ) -> ExperimentConfig:
    """Route sampled values into the typed config (train.* by default,
    'model.xxx' / 'data.xxx' prefixes route to the other trees)."""
    train_kw, model_kw, data_kw = {}, {}, {}
    for k, v in overrides.items():
        if k.startswith("model."):
            model_kw[k[6:]] = v
        elif k.startswith("data."):
            data_kw[k[5:]] = v
        else:
            train_kw[k] = v
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))
    if data_kw:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **data_kw))
    return cfg


def successive_halving_search(
    base_cfg: ExperimentConfig,
    search_spaces: Dict[str, Tuple[Sequence[Any], str]],
    num_trials: int = 9,
    min_steps: int = 10,
    max_steps: int = 200,
    eta: int = 3,
    seed: int = 0,
    loaders=None,
    trial_runner=None,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Random search with successive-halving early pruning
    (Jamieson & Talwalkar, AISTATS 2016 — the Hyperband inner loop).

    All ``num_trials`` sampled configs train for ``min_steps`` optimizer
    steps; each rung keeps the best ceil(1/eta) fraction by val loss and
    multiplies the step budget by ``eta``, until one survivor remains or
    the budget would exceed ``max_steps``. Against plain random search
    at full budget this spends O(eta/num_trials) of the compute on the
    losers instead of 100%. (The reference's search is a TODO stub,
    runner.py:521-565, so the pruning policy here is framework-grade
    addition, not parity.)

    ``trial_runner(cfg) -> float`` overrides the default Trainer run
    (tests); the step budget arrives via ``cfg.train.num_steps``.
    """
    rng = np.random.default_rng(seed)
    trials: List[Dict[str, Any]] = [
        sample_config(search_spaces, rng) for _ in range(num_trials)
    ]
    results: List[Dict] = []
    budget = max(1, min_steps)
    rung = 0
    while True:
        scored: List[Tuple[float, Dict[str, Any]]] = []
        for overrides in trials:
            cfg = apply_overrides(base_cfg, overrides)
            cfg = cfg.replace(
                train=dataclasses.replace(
                    cfg.train, num_steps=budget, num_epochs=None
                )
            )
            if trial_runner is not None:
                val_loss = float(trial_runner(cfg))
            else:
                from camradepth_tpu.train.trainer import Trainer

                trainer = Trainer(cfg, loaders=loaders)
                val_loss = float(trainer.train())
            scored.append((val_loss, overrides))
            results.append({
                "overrides": overrides, "val_loss": val_loss,
                "rung": rung, "steps": budget,
            })
        scored.sort(key=lambda t: t[0])
        keep = max(1, math.ceil(len(scored) / eta))
        trials = [o for _, o in scored[:keep]]
        if budget * eta > max_steps:
            # this was the final (largest-budget) rung
            best_loss, best = scored[0]
            return best, best_loss, results
        budget *= eta
        rung += 1


def random_search(
    base_cfg: ExperimentConfig,
    search_spaces: Dict[str, Tuple[Sequence[Any], str]],
    num_trials: int = 50,
    seed: int = 0,
    loaders=None,
    trial_runner=None,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Run ``num_trials`` short trainings; returns (best_overrides,
    best_val_loss, all_results). ``trial_runner(cfg) -> float`` can replace
    the default Trainer-based runner (used in tests)."""
    rng = np.random.default_rng(seed)
    results: List[Dict] = []
    best, best_loss = None, float("inf")
    for trial in range(num_trials):
        overrides = sample_config(search_spaces, rng)
        cfg = apply_overrides(base_cfg, overrides)
        if trial_runner is not None:
            val_loss = float(trial_runner(cfg))
        else:
            from camradepth_tpu.train.trainer import Trainer

            trainer = Trainer(cfg, loaders=loaders)
            val_loss = float(trainer.train())
        results.append({"overrides": overrides, "val_loss": val_loss})
        if val_loss < best_loss:
            best, best_loss = overrides, val_loss
    return best, best_loss, results
