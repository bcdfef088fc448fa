"""Jitted train/eval steps with microbatch gradient accumulation.

TPU-native rework of the reference hot loop (runner.py:166-270): one jitted
step consumes ``update_interval`` microbatches (a leading scan axis),
accumulates gradients with ``lax.scan`` (runner.py:218-222's accumulation,
minus the Python loop), averages, and applies diffGradNorm + OneCycle. AMP
GradScaler is unnecessary in bf16 — activations are bf16, norms, losses,
params and optimizer state are fp32.

The GT min-pool pyramid (dataloader.py:255-257) is computed inside the step
so the host ships only the full-res inverse-depth map.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from camradepth_tpu.config import ExperimentConfig
from camradepth_tpu.data.wire import decode_wire_micro, is_wire_micro
from camradepth_tpu.ops.pooling import minpool_sparse
from camradepth_tpu.train.losses import multitask_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def pad_microbatch(
    micro: Dict[str, jnp.ndarray], target: int
) -> Dict[str, jnp.ndarray]:
    """Pad a microbatch with dummy samples up to ``target``.

    XLA:TPU rewrites convolutions with batch < 8 through its
    space-to-batch converter, whose pad/transpose plumbing makes the
    small-microbatch train step ~2.5x slower than the same math at
    batch 8 (measured on v5e; the b>=8 inference graph keeps natural
    [B,H,W,C] conv shapes). Dummy samples are exact no-ops for every
    loss term: depth losses mask on gt > 0 (zero-filled) and the focal
    CE masks on ignore_index=255 (the seg fill), so both the loss
    numerators and the mask denominators are untouched — gradients are
    identical to the unpadded step.
    """
    def pad(name, a):
        mb = a.shape[0]
        if a.ndim == 0 or mb >= target:
            return a
        widths = [(0, target - mb)] + [(0, 0)] * (a.ndim - 1)
        fill = 255 if name.startswith("seg") else 0
        return jnp.pad(a, widths, constant_values=fill)

    return {
        k: (v if v is None else pad(k, v)) for k, v in micro.items()
    }


def build_gt(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Deep-supervision targets from the raw batch (pyramid on device)."""
    gt_depth = batch["gt_depth"]
    s3 = minpool_sparse(gt_depth)      # H/2
    s2 = minpool_sparse(s3)            # H/4
    return {
        "depth": gt_depth,
        "depth_stage4": s3,
        "depth_stage3": s2,
        "seg": batch.get("seg"),
        "seg_inter": batch.get("seg_inter"),
    }


def make_train_step(
    cfg: ExperimentConfig, model, tx: optax.GradientTransformation,
    unroll: Optional[int] = None,
) -> Callable:
    """Returns train_step(state, microbatches, rng) -> (state, metrics).

    ``microbatches`` is a dict of arrays with leading axes
    [update_interval, micro_batch, ...]. ``unroll`` unrolls the
    gradient-accumulation scan; measured on v5e the unrolled and loop
    forms run at the same speed (639.7 vs 640 ms at 2x3 — the
    small-batch cost is XLA's space-to-batch conv rewrite, not loop
    layouts; see TrainConfig.pad_microbatch_to for the actual fix), so
    the default stays the loop for ~3x faster compiles.
    """
    if unroll is None:
        unroll = 1

    pad_to = cfg.train.pad_microbatch_to

    def loss_fn(params, micro, rng):
        if pad_to:
            micro = pad_microbatch(micro, pad_to)
        if is_wire_micro(micro):
            # compact wire batches (data/wire.py) decode on device —
            # scatter + normalize fuse into the step for free, and the
            # decoded batch is bit-identical to the dense stack
            micro = decode_wire_micro(micro)
        pred = model.apply(
            {"params": params},
            micro["features"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        gt = build_gt(micro)
        return multitask_loss(pred, gt, cfg)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, microbatches, rng):
        accum = jax.tree.leaves(microbatches)[0].shape[0]

        def micro_step(grads_acc, inp):
            i, micro = inp
            # Serialize unrolled microbatches: the barrier makes this
            # microbatch's forward depend on the previous accumulator,
            # so XLA cannot overlap their activation liveness (which
            # OOMs at full resolution) while layouts stay free.
            micro, grads_acc = jax.lax.optimization_barrier(
                (micro, grads_acc)
            )
            step_rng = jax.random.fold_in(rng, i)
            (_, metrics), grads = grad_fn(state.params, micro, step_rng)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return grads_acc, metrics

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        idx = jnp.arange(accum)
        grads, metrics = jax.lax.scan(
            micro_step, zeros, (idx, microbatches),
            unroll=min(unroll, accum) if unroll else 1,
        )
        grads = jax.tree.map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        mean_metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(params, opt_state, state.step + 1),
            mean_metrics,
        )

    return train_step


def make_eval_step(cfg: ExperimentConfig, model) -> Callable:
    """eval_step(params, batch) -> PER-SAMPLE metrics dict, each [B]
    (no_grad val pass, runner.py:273-350).

    Metrics are per-frame (losses vmapped over the batch) so the caller
    can drop the loader's padded duplicate tail frames (batch["valid"],
    data/pipeline.py pads ragged val batches by repeating the last
    example) and aggregate frame-weighted — the reference's val loop
    never sees duplicates, so neither may ours."""

    def eval_step(params, batch):
        if is_wire_micro(batch):
            # compact wire batches decode on device (data/wire.py) —
            # the val pass sees the same bit-exact dense contract the
            # train step does
            batch = decode_wire_micro(batch)
        pred = model.apply(
            {"params": params}, batch["features"], deterministic=True
        )
        gt = build_gt(batch)

        def per_sample(pred_i, gt_i):
            _, metrics = multitask_loss(pred_i, gt_i, cfg)
            return metrics

        return jax.vmap(per_sample)(pred, gt)

    return eval_step


def make_predict_step(cfg: ExperimentConfig, model) -> Callable:
    """predict(params, features) -> model output dict (inference path)."""

    def predict(params, features):
        return model.apply(
            {"params": params}, features, deterministic=True
        )

    return predict


def init_state(
    cfg: ExperimentConfig, model, tx: optax.GradientTransformation, rng
) -> TrainState:
    """Initialization, jitted on accelerator backends: on the tunneled
    TPU, eager model.init dispatches every op through the ~30 ms host
    round-trip (minutes for the flagship model); one compiled init
    graph costs a single compile instead. On CPU (the test mesh) eager
    init is faster than compiling the init graph, and jit-vs-eager
    produce identical values (threefry PRNG is deterministic under
    both), so the choice is purely a dispatch-cost one."""
    h, w = cfg.model.img_size
    dummy = jnp.zeros((1, h, w, cfg.model.input_channels), jnp.float32)
    if jax.default_backend() == "cpu":
        params = model.init({"params": rng}, dummy, deterministic=True)[
            "params"
        ]
        opt_state = tx.init(params)
    else:
        params = jax.jit(
            lambda k: model.init(
                {"params": k}, dummy, deterministic=True
            )["params"]
        )(rng)
        opt_state = jax.jit(tx.init)(params)
    return TrainState(params, opt_state, jnp.zeros([], jnp.int32))
