"""Hyperparameter search: random, successive-halving, vmapped-parallel.

The reference ships a *stub* random search (Trainer.hyperparameters_tuning,
runner.py:521-565 — the trial loop body is a TODO). This module is the
working equivalent and two upgrades: sample configs from typed search
spaces and either (a) run short budgeted trials sequentially through the
real Trainer, (b) prune early with successive halving, or (c) train ALL
trials simultaneously as one vmapped jitted program with the trial axis
sharded over the device mesh (``vmapped_trials`` — the TPU-native sweep).
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


def batches_from_loader(loader, update_interval: int,
                        max_batches: int = 8) -> List[Dict[str, Any]]:
    """Group a BatchLoader's [B, ...] microbatches into the
    [update_interval, B, ...] optimizer-step stacks ``vmapped_trials``
    consumes (each stack is one gradient-accumulated step's data)."""
    from camradepth_tpu.train.trainer import _BATCH_KEYS

    it = iter(loader)
    batches: List[Dict[str, Any]] = []
    mbs: List[Dict[str, Any]] = []
    try:
        while len(batches) < max_batches:
            b = next(it)
            mbs.append(
                {k: np.asarray(b[k]) for k in _BATCH_KEYS if k in b}
            )
            if len(mbs) == update_interval:
                batches.append(
                    {k: np.stack([m[k] for m in mbs]) for k in mbs[0]}
                )
                mbs = []
    except StopIteration:
        pass
    return batches


def _check_vmap_spaces(search_spaces) -> None:
    unsupported = {
        k for k in search_spaces if k not in ("learning_rate",
                                              "weight_decay")
    }
    if unsupported:
        raise ValueError(
            "vmapped trials share one model graph; only optimizer "
            f"hyperparameters can vary, got {sorted(unsupported)} "
            "(use the sequential search paths for those)"
        )


def _resolve_batches(batches, val_batch, loaders, update_interval):
    """Shared batches/val_batch resolution for the vmapped sweeps."""
    if batches is None:
        if loaders is None:
            raise ValueError("need batches or loaders")
        train_loader = (
            loaders["train"] if isinstance(loaders, dict)
            else loaders.train
        )
        batches = batches_from_loader(train_loader, update_interval)
        if not batches:
            raise ValueError(
                "train split too small for one optimizer step "
                f"(need {update_interval} microbatches)"
            )
        if val_batch is None and (
            isinstance(loaders, dict) and loaders.get("val") is not None
        ):
            from camradepth_tpu.train.trainer import _BATCH_KEYS

            vb = next(iter(loaders["val"]))
            val_batch = {
                k: np.asarray(vb[k]) for k in _BATCH_KEYS if k in vb
            }
    return list(batches), val_batch


def _vmapped_machinery(cfg: ExperimentConfig, model, total_steps: int):
    """The one-jitted-program sweep core shared by :func:`vmapped_trials`
    and :func:`vmapped_halving`: a vmapped train step (trial axis over
    params/opt-state/lr/wd; jit retraces automatically when the trial
    axis shrinks between halving rungs), a vmapped val-loss ranker, and
    a stacked-state builder. The OneCycle schedule is normalized
    (max_lr=1 shape x per-trial peak — every term is linear in max_lr)
    over ``total_steps``."""
    import jax
    import jax.numpy as jnp

    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.train.diffgrad import scale_by_diffgrad_norm
    from camradepth_tpu.train.losses import multitask_loss
    from camradepth_tpu.train.schedule import onecycle
    from camradepth_tpu.train.step import build_gt

    tr = cfg.train
    model = model if model is not None else CamRaDepth(cfg.model)
    tx = scale_by_diffgrad_norm(tr.betas[0], tr.betas[1], tr.eps)
    shape_fn = onecycle(1.0, total_steps=total_steps,
                        pct_start=tr.pct_start,
                        div_factor=tr.div_factor,
                        final_div_factor=tr.final_div_factor)

    h, w = cfg.model.img_size
    dummy = jnp.zeros((1, h, w, cfg.model.input_channels), jnp.float32)
    # Jit the init on accelerator backends (eager init on the tunneled
    # TPU dispatches per-op, ~minutes for the flagship); eager on CPU
    # where the compile would cost more than it saves. Identical values
    # either way (see train/step.py init_state).
    init_fn = lambda k: model.init({"params": k}, dummy,
                                   deterministic=True)["params"]

    def make_state(num_trials: int, rng):
        if jax.default_backend() == "cpu":
            params0 = init_fn(rng)
            opt0 = tx.init(params0)
        else:
            params0 = jax.jit(init_fn)(rng)
            opt0 = jax.jit(tx.init)(params0)
        stack = lambda tree: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (num_trials,) + x.shape), tree
        )
        return stack(params0), stack(opt0)

    def loss_fn(params, micro, drop_rng):
        pred = model.apply(
            {"params": params}, micro["features"], deterministic=False,
            rngs={"dropout": drop_rng},
        )
        return multitask_loss(pred, build_gt(micro), cfg)

    def trial_step(params, opt_state, lr, wd, micro, drop_rng, step_i):
        accum = jax.tree.leaves(micro)[0].shape[0]

        def micro_grads(acc, i):
            mb = jax.tree.map(lambda x: x[i], micro)
            (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, jax.random.fold_in(drop_rng, i)
            )
            return (
                jax.tree.map(lambda a, b: a + b, acc[0], g),
                acc[1] + loss,
            ), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, loss_sum), _ = jax.lax.scan(
            micro_grads, (zero, jnp.float32(0)), jnp.arange(accum)
        )
        grads = jax.tree.map(lambda g: g / accum, grads)
        # coupled L2 exactly as diffgrad_norm's add_decayed_weights
        grads = jax.tree.map(lambda g, p: g + wd * p, grads, params)
        direction, opt_state = tx.update(grads, opt_state)
        scale = lr * shape_fn(step_i)
        params = jax.tree.map(
            lambda p, d: (p - scale * d).astype(p.dtype), params,
            direction,
        )
        return params, opt_state, loss_sum / accum

    v_step = jax.jit(
        jax.vmap(trial_step,
                 in_axes=(0, 0, 0, 0, None, None, None)),
        donate_argnums=(0, 1),
    )

    def val_loss_fn(params, batch):
        pred = model.apply({"params": params}, batch["features"],
                           deterministic=True)
        loss, _ = multitask_loss(pred, build_gt(batch), cfg)
        return loss

    v_val = jax.jit(jax.vmap(val_loss_fn, in_axes=(0, None)))
    return v_step, v_val, make_state


def vmapped_trials(
    base_cfg: ExperimentConfig,
    search_spaces: Dict[str, Tuple[Sequence[Any], str]],
    num_trials: int = 8,
    num_steps: int = 50,
    seed: int = 0,
    batches=None,
    val_batch=None,
    loaders=None,
    mesh=None,
    model=None,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """ALL trials train simultaneously as one jitted program: the trial
    dimension is a ``jax.vmap`` axis over (params, optimizer state,
    hyperparameters), optionally sharded across a device mesh's ``data``
    axis — the TPU-native way to scale a sweep (one compile, N trials
    per step, XLA batches the per-trial convs). The reference's tuner is
    a TODO stub (runner.py:521-565); the sequential paths above mirror
    its intended behavior, this one is the framework-grade upgrade.

    Only optimizer hyperparameters can vary across vmapped trials
    (every trial must share the model graph): supported keys are
    ``learning_rate`` and ``weight_decay``. The onecycle schedule is
    exactly preserved: every term of the reference schedule scales
    linearly with max_lr, so a normalized shape (max_lr=1) times the
    per-trial peak reproduces it.

    ``batches``: iterable of microbatch dicts (leading axes
    [update_interval, micro_batch, ...]) reused cyclically for
    ``num_steps`` steps; all trials see identical data. ``val_batch``:
    one dict for final ranking (falls back to the last train batch).
    ``loaders``: alternative source when ``batches`` is None — the
    ``make_loaders`` dict (or any object with a ``.train`` loader);
    its [B, ...] microbatches are grouped into optimizer-step stacks
    via :func:`batches_from_loader`, and a val batch is drawn from the
    dict's ``val`` loader when ``val_batch`` is not given. ``mesh``: shard the trial axis over the mesh's
    ``data`` axis (requires num_trials % mesh.shape['data'] == 0).
    ``model``: override the flagship CamRaDepth with any Flax module
    whose ``apply`` returns the prediction dict ``multitask_loss``
    consumes — the unit tests inject a 2-conv toy model here because
    XLA:CPU takes ~10 min to compile the vmapped flagship step (on TPU
    the real-model compile is the usual one-off cost).
    """
    import jax
    import jax.numpy as jnp

    _check_vmap_spaces(search_spaces)

    rng_np = np.random.default_rng(seed)
    trials = [sample_config(search_spaces, rng_np)
              for _ in range(num_trials)]
    lrs = jnp.asarray(
        [t.get("learning_rate", base_cfg.train.learning_rate)
         for t in trials], jnp.float32)
    wds = jnp.asarray(
        [t.get("weight_decay", base_cfg.train.weight_decay)
         for t in trials], jnp.float32)

    cfg = base_cfg
    tr = cfg.train
    rng = jax.random.PRNGKey(tr.seed)
    v_step, v_val, make_state = _vmapped_machinery(cfg, model, num_steps)
    params_t, opt_t = make_state(num_trials, rng)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        if num_trials % max(1, n_data):
            raise ValueError(
                f"num_trials {num_trials} must divide over the data "
                f"axis ({n_data})"
            )
        sh = NamedSharding(mesh, P("data"))
        shard = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, sh), tree
        )
        params_t, opt_t = shard(params_t), shard(opt_t)
        lrs, wds = jax.device_put(lrs, sh), jax.device_put(wds, sh)

    batches, val_batch = _resolve_batches(
        batches, val_batch, loaders, tr.update_interval
    )
    last = None
    for i in range(num_steps):
        micro = batches[i % len(batches)]
        micro = jax.tree.map(jnp.asarray, micro)
        last = micro
        params_t, opt_t, losses = v_step(
            params_t, opt_t, lrs, wds, micro,
            jax.random.fold_in(rng, i), jnp.int32(i),
        )
    if val_batch is None:
        # rank on the last train microbatch, flattened to one batch
        val_batch = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), last
        )
    else:
        val_batch = jax.tree.map(jnp.asarray, val_batch)
    val = np.asarray(v_val(params_t, val_batch))

    results = [
        {"overrides": t, "val_loss": float(v), "steps": num_steps}
        for t, v in zip(trials, val)
    ]
    order = int(np.argmin(val))
    return trials[order], float(val[order]), results


def vmapped_halving(
    base_cfg: ExperimentConfig,
    search_spaces: Dict[str, Tuple[Sequence[Any], str]],
    num_trials: int = 9,
    min_steps: int = 10,
    max_steps: int = 200,
    eta: int = 3,
    seed: int = 0,
    batches=None,
    val_batch=None,
    loaders=None,
    mesh=None,
    model=None,
) -> Tuple[Dict[str, Any], float, List[Dict]]:
    """Successive halving where every rung's survivors train
    CONCURRENTLY as one vmapped jitted program — the two search
    upgrades composed. Unlike :func:`successive_halving_search` (which
    retrains each rung from scratch through the sequential Trainer),
    survivors here CONTINUE from their params/optimizer state —
    checkpoint-based SHA, the standard formulation when all trials
    live in one program. Rung r's cumulative budget is
    ``min_steps * eta**r`` capped at ``max_steps``; after each rung the
    best ceil(1/eta) fraction is gathered out of the stacked state
    (``tree_map(x[idx])``) and jit retraces for the smaller trial axis
    (one extra compile per rung; on TPU that cost is amortized by the
    pruned trials' saved step time).

    The OneCycle schedule is laid out over the FINAL cumulative budget
    so the winner sees the full annealed cycle; pruned trials exit
    mid-schedule (exactly as sequential SHA's short rungs see a
    truncated cycle). ``mesh``: the trial axis shards over the mesh's
    ``data`` axis whenever the current rung's trial count divides it;
    non-divisible rungs fall back to replication.
    """
    import jax
    import jax.numpy as jnp

    _check_vmap_spaces(search_spaces)

    rng_np = np.random.default_rng(seed)
    trials = [sample_config(search_spaces, rng_np)
              for _ in range(num_trials)]
    lrs = jnp.asarray(
        [t.get("learning_rate", base_cfg.train.learning_rate)
         for t in trials], jnp.float32)
    wds = jnp.asarray(
        [t.get("weight_decay", base_cfg.train.weight_decay)
         for t in trials], jnp.float32)

    cfg = base_cfg
    tr = cfg.train
    # cumulative step targets per rung: min_steps * eta^r, capped
    targets = [max(1, min_steps)]
    while targets[-1] * eta <= max_steps:
        targets.append(targets[-1] * eta)
    total_steps = targets[-1]

    rng = jax.random.PRNGKey(tr.seed)
    v_step, v_val, make_state = _vmapped_machinery(cfg, model,
                                                   total_steps)
    params_t, opt_t = make_state(num_trials, rng)

    def maybe_shard(n_alive, *trees):
        if mesh is None:
            return trees
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape.get("data", 1)
        spec = P("data") if n_alive % max(1, n_data) == 0 else P()
        sh = NamedSharding(mesh, spec)
        return tuple(
            jax.tree.map(lambda x: jax.device_put(x, sh), t)
            for t in trees
        )

    params_t, opt_t, lrs, wds = maybe_shard(
        num_trials, params_t, opt_t, lrs, wds
    )

    batches, val_batch = _resolve_batches(
        batches, val_batch, loaders, tr.update_interval
    )
    if val_batch is not None:
        val_batch = jax.tree.map(jnp.asarray, val_batch)

    results: List[Dict] = []
    step_i = 0
    last = None
    for rung, target in enumerate(targets):
        while step_i < target:
            micro = jax.tree.map(
                jnp.asarray, batches[step_i % len(batches)]
            )
            last = micro
            params_t, opt_t, _ = v_step(
                params_t, opt_t, lrs, wds, micro,
                jax.random.fold_in(rng, step_i), jnp.int32(step_i),
            )
            step_i += 1
        vb = val_batch
        if vb is None:
            vb = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), last
            )
        val = np.asarray(v_val(params_t, vb))
        for t, v in zip(trials, val):
            results.append({
                "overrides": t, "val_loss": float(v), "rung": rung,
                "steps": target,
            })
        if rung == len(targets) - 1:
            order = int(np.argmin(val))
            return trials[order], float(val[order]), results
        if len(trials) == 1:
            continue  # lone survivor trains on to the final budget
        keep = max(1, math.ceil(len(trials) / eta))
        idx = np.argsort(val)[:keep]
        trials = [trials[i] for i in idx]
        gather_idx = jnp.asarray(idx)
        gather = lambda tree: jax.tree.map(
            lambda x: x[gather_idx], tree
        )
        params_t, opt_t = gather(params_t), gather(opt_t)
        lrs, wds = lrs[gather_idx], wds[gather_idx]
        params_t, opt_t, lrs, wds = maybe_shard(
            len(trials), params_t, opt_t, lrs, wds
        )


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
