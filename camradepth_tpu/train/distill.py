"""Teacher→student distillation: reference weights → the TPU decoder.

The reference has no distillation path; this closes the one practical
adoption gap of ``ModelConfig.tpu_decoder`` (the MXU-aligned variant,
~6× inference throughput on v5e): it is NOT weight-compatible with
reference checkpoints (`export` refuses it; only the encoder + low-res
decoder transfer by shape matching). A user holding a trained reference
``.pth`` gets the fast variant without re-labelling anything:

1. convert + shape-matching-transfer the teacher's weights into the
   student (encoder + low-res decoder carry over; the half/full-res
   subpixel stages start fresh), then
2. run a short *dense* distillation: the student trains against the
   parity teacher's per-pixel predictions (optionally mixed with the
   sparse lidar GT loss via ``alpha``).

Dense teacher supervision is strictly richer than the lidar GT the
reference trains on (every pixel carries a target, not ~5% of them), so
short schedules converge. Teacher and student emit the same output
contract (camradepth.py docstring) at identical resolutions — final
depth [B,H,W,1], intermediate depths at H/2 and H/4, seg logits at H
and H/2 — so every head distills one-to-one.

TPU shape: the teacher forward runs INSIDE the jitted train step
(deterministic, ``stop_gradient``) on the same microbatch, so teacher
inference rides the same device execution as the student's
forward/backward — no extra host round-trips through the axon tunnel,
no second program. Teacher params are closed over (replicated on the
mesh when one is in use); only the student's TrainState is donated.

Microbatch padding (TrainConfig.pad_microbatch_to, see
train/step.pad_microbatch) stays gradient-exact here too: GT terms mask
themselves (gt>0 / ignore=255), and the dense distill terms — which a
dummy sample WOULD otherwise pollute — are weighted by a static
per-sample valid mask (padding width is known at trace time).

No reference equivalent (closest in spirit: the reference's
transfer-learning shape-matching load, utils.py:352-370, which step 1
reuses).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from camradepth_tpu.config import ExperimentConfig
from camradepth_tpu.data.wire import decode_wire_micro, is_wire_micro
from camradepth_tpu.train.losses import multitask_loss
from camradepth_tpu.train.step import (
    TrainState,
    build_gt,
    pad_microbatch,
)
from camradepth_tpu.train.trainer import Trainer
from camradepth_tpu.utils import checkpoint as ckpt_util


def _per_sample_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
                          beta: float = 1.0) -> jnp.ndarray:
    """Dense SmoothL1, mean over all pixels, per sample → [B].

    Same elementwise form as losses.masked_smooth_l1 but unmasked —
    the teacher's prediction is dense, every pixel is a target."""
    diff = jnp.abs(target - pred)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss, axis=tuple(range(1, loss.ndim)))


def _per_sample_kl(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                   temperature: float) -> jnp.ndarray:
    """KL(teacher‖student) over the class axis with the usual T² scale
    (Hinton et al. 2015), mean over pixels, per sample → [B]. NHWC
    class-last logits."""
    t = jnp.asarray(temperature, jnp.float32)
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    log_t = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, -1)
    log_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, -1)
    kl = jnp.sum(p_t * (log_t - log_s), axis=-1) * (t * t)
    return jnp.mean(kl, axis=tuple(range(1, kl.ndim)))


def distill_terms(student_pred: dict, teacher_pred: dict,
                  cfg: ExperimentConfig,
                  temperature: float = 1.0) -> tuple[jnp.ndarray, dict]:
    """Per-sample distillation objective [B] + scalar term breakdown.

    Head weighting mirrors the GT multitask loss (losses.multitask_loss,
    runner.py:197-215 weights [1,1,1,0.2,0.2], normalized): depth heads
    distill with dense SmoothL1, seg heads with temperature-scaled KL.
    The argmax-derived unsup_map is skipped (non-differentiable; its
    producing logits already distill when supervised)."""
    w = cfg.train.loss_weights
    s_d, t_d = student_pred["depth"], teacher_pred["depth"]
    l_final = _per_sample_smooth_l1(s_d["final_depth"][..., 0],
                                    t_d["final_depth"][..., 0])
    l_d4 = _per_sample_smooth_l1(s_d["intermediate_depths"][3][..., 0],
                                 t_d["intermediate_depths"][3][..., 0])
    l_d3 = _per_sample_smooth_l1(s_d["intermediate_depths"][2][..., 0],
                                 t_d["intermediate_depths"][2][..., 0])
    zeros = jnp.zeros_like(l_final)
    s_seg, t_seg = student_pred["seg"], teacher_pred["seg"]
    l_seg = (
        _per_sample_kl(s_seg["final_seg"], t_seg["final_seg"], temperature)
        if s_seg["final_seg"] is not None and t_seg["final_seg"] is not None
        else zeros
    )
    l_seg_i = (
        _per_sample_kl(s_seg["intermediate_seg"], t_seg["intermediate_seg"],
                       temperature)
        if s_seg["intermediate_seg"] is not None
        and t_seg["intermediate_seg"] is not None
        else zeros
    )
    total = (
        w[0] * l_final + w[1] * l_d4 + w[2] * l_d3
        + w[3] * l_seg + w[4] * l_seg_i
    ) / sum(w)
    terms = {
        "distill_depth_final": jnp.mean(l_final),
        "distill_depth_stage4": jnp.mean(l_d4),
        "distill_depth_stage3": jnp.mean(l_d3),
        "distill_seg_final": jnp.mean(l_seg),
        "distill_seg_inter": jnp.mean(l_seg_i),
    }
    return total, terms


def make_distill_step(
    cfg: ExperimentConfig,
    student_model,
    teacher_model,
    teacher_params,
    tx: optax.GradientTransformation,
    alpha: float = 0.5,
    temperature: float = 1.0,
) -> Callable:
    """distill_step(state, microbatches, rng) -> (state, metrics).

    Same contract as step.make_train_step (the Trainer loop is reused
    unchanged); the objective becomes
    ``alpha * distill(student, teacher) + (1-alpha) * multitask_gt``.
    ``teacher_params`` are closed over — callers place them (replicated
    on the mesh) before jit capture."""
    pad_to = cfg.train.pad_microbatch_to
    alpha = float(alpha)

    def loss_fn(params, micro, valid, teacher_pred, rng):
        pred = student_model.apply(
            {"params": params},
            micro["features"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        per_sample, terms = distill_terms(pred, teacher_pred, cfg,
                                          temperature)
        l_distill = jnp.sum(per_sample * valid) / jnp.maximum(
            jnp.sum(valid), 1.0
        )
        l_gt, gt_metrics = multitask_loss(pred, build_gt(micro), cfg)
        total = alpha * l_distill + (1.0 - alpha) * l_gt
        metrics = {
            "loss": total,
            "loss_distill": l_distill,
            "loss_gt": l_gt,
            "rmse_m": gt_metrics["rmse_m"],
            **terms,
        }
        return total, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def distill_step(state: TrainState, microbatches, rng):
        accum = jax.tree.leaves(microbatches)[0].shape[0]
        orig_b = next(
            v for k, v in microbatches.items()
            if k in ("features", "image_u8")
        ).shape[1]

        def micro_step(grads_acc, inp):
            i, micro = inp
            micro, grads_acc = jax.lax.optimization_barrier(
                (micro, grads_acc)
            )
            if pad_to:
                micro = pad_microbatch(micro, pad_to)
            if is_wire_micro(micro):
                # compact wire batches decode on device (data/wire.py);
                # both teacher and student see the decoded features
                micro = decode_wire_micro(micro)
            b = micro["features"].shape[0]
            # static: which rows are real vs dummy padding — the dense
            # distill terms (unlike the self-masking GT terms) must not
            # count padded samples
            valid = (jnp.arange(b) < orig_b).astype(jnp.float32)
            teacher_pred = jax.lax.stop_gradient(
                teacher_model.apply(
                    {"params": teacher_params},
                    micro["features"],
                    deterministic=True,
                )
            )
            step_rng = jax.random.fold_in(rng, i)
            (_, metrics), grads = grad_fn(
                state.params, micro, valid, teacher_pred, step_rng
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return grads_acc, metrics

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        idx = jnp.arange(accum)
        grads, metrics = jax.lax.scan(micro_step, zeros, (idx, microbatches))
        grads = jax.tree.map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        mean_metrics = jax.tree.map(jnp.mean, metrics)
        mean_metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(params, opt_state, state.step + 1),
            mean_metrics,
        )

    return distill_step


class DistillTrainer(Trainer):
    """Trainer whose objective distills a frozen teacher into the
    (typically tpu_decoder) student. Validation stays GT-based — the
    reported val loss/RMSE measure the student against real lidar, not
    against the teacher, so best-checkpoint selection and early stopping
    mean the same thing they do in a normal run."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        teacher_cfg: ExperimentConfig,
        teacher_params,
        alpha: float = 0.5,
        temperature: float = 1.0,
        init_from_teacher: bool = True,
        **kwargs,
    ):
        from camradepth_tpu.models.camradepth import CamRaDepth

        if not 0.0 <= float(alpha) <= 1.0:
            raise ValueError(f"alpha must be in [0, 1], got {alpha}")
        if tuple(teacher_cfg.model.img_size) != tuple(cfg.model.img_size):
            raise ValueError(
                "teacher and student must share img_size "
                f"({teacher_cfg.model.img_size} vs {cfg.model.img_size})"
            )
        if teacher_cfg.model.input_channels != cfg.model.input_channels:
            raise ValueError(
                "teacher and student must share input_channels "
                f"({teacher_cfg.model.input_channels} vs "
                f"{cfg.model.input_channels})"
            )
        # A seg-head mismatch would silently ZERO the seg KL terms in
        # distill_terms instead of erroring — refuse it up front.
        for f in ("supervised_seg", "unsupervised_seg", "num_classes"):
            tv, sv = getattr(teacher_cfg.model, f), getattr(cfg.model, f)
            if tv != sv:
                raise ValueError(
                    f"teacher and student must share model.{f} "
                    f"({tv} vs {sv}) — a mismatch drops the seg "
                    "distillation terms silently"
                )
        self._teacher_model = CamRaDepth(teacher_cfg.model)
        self._teacher_params_host = teacher_params
        self._alpha = float(alpha)
        self._temperature = float(temperature)
        super().__init__(cfg, **kwargs)
        # The warm start must never clobber a RESTORED state: after a
        # programmatic resume (auto_resume found a checkpoint, or
        # cfg.train.load_ckpt) the params belong with the restored
        # optimizer moments — overwriting them with teacher weights
        # would corrupt the resume. training_steps > 0 marks an
        # auto-resume; load_ckpt marks an explicit restore.
        restored = self.training_steps > 0 or bool(
            cfg.train.checkpoint and cfg.train.load_ckpt
        )
        if init_from_teacher and restored:
            print("#### teacher warm start SKIPPED: a checkpoint was "
                  "restored (resume takes precedence)")
        if init_from_teacher and not restored:
            # reference-semantics warm start (utils.py:352-370): encoder
            # + low-res decoder transfer, subpixel stages keep their init
            params, mismatches = ckpt_util.partial_restore_params(
                teacher_params, jax.device_get(self.state.params),
                verbose=False,
            )
            n_total = len(jax.tree.leaves(self.state.params))
            print(f"#### teacher warm start: {n_total - len(mismatches)}/"
                  f"{n_total} param tensors transferred")
            if self.mesh is not None:
                from camradepth_tpu.parallel import multihost

                params = multihost.put_global(
                    params, self._state_shardings.params
                )
            else:
                params = jax.device_put(params)
            self.state = self.state._replace(params=params)

    def _build_train_step(self):
        tp = jax.tree.map(jnp.asarray, self._teacher_params_host)
        if self.mesh is not None:
            from camradepth_tpu.parallel import multihost
            from camradepth_tpu.parallel.mesh import replicated

            rep = replicated(self.mesh)
            tp = multihost.put_global(
                tp, jax.tree.map(lambda _: rep, tp)
            )
        return make_distill_step(
            self.cfg, self.model, self._teacher_model, tp, self.tx,
            alpha=self._alpha, temperature=self._temperature,
        )
