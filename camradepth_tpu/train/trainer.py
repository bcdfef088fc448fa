"""Training driver: epochs, validation, early stopping, checkpointing.

TPU-native counterpart of the reference Trainer (runner.py:87-392):

- one jitted train step consumes ``update_interval`` microbatches
  (lax.scan gradient accumulation) — the reference's per-batch Python loop
  with GradScaler becomes a single device execution per optimizer step;
- the OneCycle schedule is step-indexed inside the optimizer (the reference
  calls scheduler.step() per dataloader iteration after a warm gap,
  runner.py:269-270; here the schedule advances once per optimizer step
  with total_steps scaled accordingly);
- validation is a jitted no-grad pass (runner.py:273-350);
- early stopping + best-val checkpointing via Orbax with loss-in-filename
  (runner.py:365-384);
- scalars go to TensorBoard-compatible events + JSONL (utils/logging.py);
- batches shard over the data axis of the mesh when one is provided.
"""

from __future__ import annotations

import signal
import threading
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from camradepth_tpu.config import (
    ConfigError,
    ExperimentConfig,
    MeshConfig,
    num_epochs_for_steps,
)
from camradepth_tpu.data import wire
from camradepth_tpu.data.pipeline import make_loaders
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.parallel import multihost
from camradepth_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_sharding_rule,
    replicated,
)
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.schedule import onecycle
from camradepth_tpu.train.step import (
    TrainState,
    init_state,
    make_eval_step,
    make_train_step,
)
from camradepth_tpu.utils import checkpoint as ckpt_util
from camradepth_tpu.utils.logging import (
    MetricWriter,
    NullWriter,
    create_run_dir,
)
from camradepth_tpu.utils.prefetch import prefetch_iter

# dense batch contract + the compact wire keys (data/wire.py) — the
# stacker takes whichever subset the loader produced
_BATCH_KEYS = (
    "features", "gt_depth", "seg", "seg_inter",
    "image_u8", "radar_idx", "radar_val", "gt_idx", "gt_val",
)


class _PreemptionMonitor:
    """SIGTERM -> flag; the Trainer polls it at optimizer-step boundaries.

    TPU pods are preemptible with a grace period (the resource manager
    SIGTERMs every worker process); converting the signal into a
    boundary-checked flag lets the step in flight finish and the full
    TrainState reach disk before exit, instead of dying mid-epoch and
    losing everything since the last best-val checkpoint. Installable
    only from the main thread (CPython signal rule); ``restore`` puts
    the previous handlers back."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = False
        self._prev = {}
        for s in signals:
            self._prev[s] = signal.signal(s, self._handle)

    def _handle(self, signum, frame):
        self._flag = True

    def triggered(self) -> bool:
        return self._flag

    def restore(self) -> None:
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev = {}


def _auto_mesh(cfg: ExperimentConfig) -> Optional[object]:
    """Build the training mesh from MeshConfig, or None for single-device.

    The reference runs DataParallel BY DEFAULT (runner.py:135-136,
    args.py:39 store_false); the SPMD equivalent: with
    data_parallel == -1 (auto) the data axis takes the largest divisor of
    the global microbatch that fits the available devices — mirroring
    DataParallel's use of at most batch-size GPUs. Explicit axis sizes are
    strict: indivisible batches are an error, not a silent fallback."""
    m = cfg.mesh
    fsdp = max(1, m.fsdp_parallel)
    sp = max(1, m.spatial_parallel)
    n = len(jax.devices())
    if m.data_parallel > 0:
        data = m.data_parallel
    elif sp > 1:
        # sp must be the sole nontrivial training axis (see below)
        data = 1
    else:
        # auto: largest batch divisor that fits (batch shards jointly
        # over data x fsdp, so fsdp also divides the batch)
        avail = max(1, n // (fsdp * sp))
        data = 1
        for d in range(min(avail, cfg.train.batch_size), 0, -1):
            if cfg.train.batch_size % (d * fsdp) == 0:
                data = d
                break
    if data * fsdp * sp == 1:
        return None
    if sp > 1 and data * fsdp > 1:
        raise ConfigError(
            "spatial_parallel cannot be combined with data/fsdp axes in "
            "TRAINING: XLA GSPMD miscomputes conv gradients when "
            "spatially-sharded activations are partially replicated "
            "across other mesh axes (see parallel/mesh.py and "
            "parallel/gradcheck.py). Use sp for inference, or alone."
        )
    if sp > 2:
        raise ConfigError(
            "spatial_parallel > 2 in TRAINING produces wrong conv "
            "gradients under current XLA (gradcheck-verified safe: sp=2 "
            "sole axis). Inference supports any sp."
        )
    if cfg.train.batch_size % (data * fsdp):
        raise ConfigError(
            f"batch_size {cfg.train.batch_size} is not divisible by "
            f"data_parallel*fsdp={data}x{fsdp} (batches shard jointly "
            "over both axes)"
        )
    if data * fsdp * sp > n:
        raise ConfigError(
            f"mesh {data}x{fsdp}x{sp} needs {data * fsdp * sp} devices, "
            f"have {n}"
        )
    if sp > 1 and cfg.model.img_size[0] % sp:
        raise ConfigError(
            f"image height {cfg.model.img_size[0]} is not divisible by "
            f"spatial_parallel={sp}"
        )
    sized = MeshConfig(
        data_axis=m.data_axis, fsdp_axis=m.fsdp_axis, sp_axis=m.sp_axis,
        data_parallel=data, fsdp_parallel=fsdp, spatial_parallel=sp,
    )
    return create_mesh(sized, jax.devices()[: data * fsdp * sp])


def _snapshot_run(cfg: ExperimentConfig, run_dir: Path) -> None:
    """Reproducibility snapshot per run (reference save_files copies the
    source tree into the run dir, runner.py:34-84): the resolved config as
    JSON, the git revision, and a copy of the model/train sources."""
    import dataclasses
    import json
    import shutil
    import subprocess

    snap = run_dir / "project_files"
    snap.mkdir(parents=True, exist_ok=True)
    (snap / "config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
    )
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=Path(__file__).resolve().parents[2],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        (snap / "GIT_REVISION").write_text(rev + "\n")
    except Exception:
        pass
    pkg = Path(__file__).resolve().parents[1]
    for rel in ("models/camradepth.py", "models/encoder.py",
                "models/layers.py", "train/step.py", "train/losses.py",
                "train/diffgrad.py", "config.py", "data/channels.py"):
        src = pkg / rel
        if src.exists():
            dst = snap / rel.replace("/", "__")
            try:
                shutil.copyfile(src, dst)
            except OSError:
                pass


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        loaders: Optional[Dict] = None,
        run_dir: Optional[str] = None,
        mesh=None,
        auto_resume: bool = False,
    ):
        self.cfg = cfg
        self.model = CamRaDepth(cfg.model)
        self.mesh = mesh if mesh is not None else _auto_mesh(cfg)
        if multihost.is_multiprocess():
            if self.mesh is None:
                raise ValueError(
                    "multi-process training requires a device mesh "
                    "(every process must participate in one SPMD "
                    "program); check that batch_size divides over the "
                    "mesh axes"
                )
            mesh_procs = {
                d.process_index for d in self.mesh.devices.flat
            }
            if len(mesh_procs) != jax.process_count():
                raise ValueError(
                    f"training mesh spans {len(mesh_procs)} of "
                    f"{jax.process_count()} processes; a process "
                    "without mesh devices cannot read the replicated "
                    "metrics and would desync — size the mesh "
                    "(batch_size / --data-parallel) to cover every "
                    "host's devices"
                )
        # multi-host IO: when the batch axis spans processes (data/fsdp
        # training meshes — sp==1), each process loads only its slice of
        # every train batch (disjoint row partition) and the global batch
        # is stitched from the local pieces at device_put time. An
        # sp-only mesh replicates the batch, so every process must load
        # the SAME full batches (seed-deterministic loaders guarantee
        # agreement). Explicitly passed loaders are assumed to yield full
        # global batches.
        self._loader_process_sharded = (
            loaders is None
            and multihost.is_multiprocess()
            and self.mesh is not None
            and self.mesh.shape.get(cfg.mesh.sp_axis, 1) == 1
        )
        # compact wire loader (data/wire.py): single-process, no sp
        # sharding (the scatter decode must stay frame-local under the
        # batch-only sharding; sp shards image H). "auto" silently
        # falls back; "on" insists.
        want_wire = cfg.data.wire_format
        if want_wire not in ("off", "auto", "on"):
            raise ConfigError(
                f"data.wire_format must be off|auto|on, got {want_wire!r}"
            )
        wire_ok = (
            want_wire != "off"
            and not multihost.is_multiprocess()
            and (
                self.mesh is None
                or self.mesh.shape.get(cfg.mesh.sp_axis, 1) == 1
            )
        )
        if want_wire == "on" and not wire_ok:
            raise ConfigError(
                "data.wire_format=on requires a single-process run "
                "without sp sharding (the on-device scatter decode is "
                "frame-local) — use wire_format=auto or off"
            )
        if self._loader_process_sharded:
            pc = jax.process_count()
            if cfg.train.batch_size % pc:
                raise ValueError(
                    f"batch_size {cfg.train.batch_size} must divide over "
                    f"{pc} processes"
                )
            self.loaders = make_loaders(
                cfg.data, cfg.train.batch_size // pc,
                process_shard=(jax.process_index(), pc),
            )
        else:
            self.loaders = loaders or make_loaders(
                wire.resolve_wire_ship(cfg) if wire_ok else cfg.data,
                cfg.train.batch_size, wire=wire_ok,
                wire_eval=wire_ok,
            )

        if self.loaders.get("train") is None:
            # mini_dataset sets effective_train_val_split=(0,0), which gives
            # every frame to the test split (args.py:134-137) — the reference
            # crashes deep in its loop here; fail up front with the cause.
            raise ValueError(
                "training requires a non-empty train split; the current "
                "config assigns 0 frames to train (mini_dataset presets "
                "route all frames to test — use 'camradepth test', or pass "
                "a split with train frames)."
            )
        steps_per_epoch = max(1, len(self.loaders["train"]))
        self.num_epochs = num_epochs_for_steps(cfg)
        opt_steps = max(
            1, self.num_epochs * steps_per_epoch // cfg.train.update_interval
        )
        self.schedule = onecycle(
            cfg.train.learning_rate,
            total_steps=opt_steps,
            pct_start=cfg.train.pct_start,
            div_factor=cfg.train.div_factor,
            final_div_factor=cfg.train.final_div_factor,
        )
        self.tx = diffgrad_norm(
            self.schedule,
            b1=cfg.train.betas[0],
            b2=cfg.train.betas[1],
            eps=cfg.train.eps,
            weight_decay=cfg.train.weight_decay,
        )
        self.state = init_state(
            cfg, self.model, self.tx, jax.random.PRNGKey(cfg.train.seed)
        )
        if cfg.train.checkpoint and cfg.train.load_ckpt:
            self.load_checkpoint(cfg.train.checkpoint)

        if self.mesh is not None:
            # SPMD training: params/optimizer state shard over fsdp (ZeRO
            # rule), microbatches over data (+ image H over sp); XLA emits
            # the grad all-reduces / param all-gathers from annotations.
            from jax.sharding import NamedSharding, PartitionSpec as P

            mc = cfg.mesh
            rule = param_sharding_rule(self.mesh, mc)
            self._state_shardings = TrainState(
                params=jax.tree.map(rule, self.state.params),
                opt_state=jax.tree.map(rule, self.state.opt_state),
                step=replicated(self.mesh),
            )
            # put_global == device_put single-process; in multi-host runs
            # it materializes only this process's addressable shards
            self.state = multihost.put_global(
                self.state, self._state_shardings
            )
            sp_axis = (
                mc.sp_axis if self.mesh.shape.get(mc.sp_axis, 1) > 1 else None
            )
            # microbatch stacks are [accum, B, H, W, C]; batch shards
            # jointly over data x fsdp (required layout — mesh.py docstring)
            self._micro_sharding = NamedSharding(
                self.mesh, P(None, (mc.data_axis, mc.fsdp_axis), sp_axis)
            )
            self._batch_sharding = batch_sharding(self.mesh, mc)
            self._train_step = jax.jit(
                self._build_train_step(),
                in_shardings=(self._state_shardings, self._micro_sharding,
                              None),
                out_shardings=(self._state_shardings, None),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(make_eval_step(cfg, self.model))
        else:
            self._micro_sharding = None
            self._batch_sharding = None
            self._train_step = jax.jit(
                self._build_train_step(),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(make_eval_step(cfg, self.model))

        if run_dir is None and multihost.is_multiprocess():
            # create_run_dir auto-indexes — concurrent processes would
            # race to different directories; multi-host runs must agree
            # on the run dir up front (it also anchors auto-resume)
            raise ValueError(
                "multi-process training requires an explicit run_dir "
                "(pass --run-dir) so every process uses the same "
                "directory"
            )
        self.run_dir = (
            Path(run_dir)
            if run_dir
            else create_run_dir(
                cfg.train.output_dir, cfg.train.arch_name, cfg.train.run_name
            )
        )
        # single-writer discipline: only process 0 owns run-dir artifacts
        self._primary = multihost.is_primary()
        self.writer = MetricWriter(self.run_dir) if self._primary \
            else NullWriter()
        self._async_saver = (
            ckpt_util.AsyncSaver() if cfg.train.async_checkpoint else None
        )
        self.training_steps = 0
        self.val_steps = 0
        self.start_epoch = 0
        self._preempt_monitor: Optional[_PreemptionMonitor] = None
        self._preempted = False
        if self._primary:
            _snapshot_run(cfg, self.run_dir)

        if auto_resume:
            # Preemption-safe resume (no reference equivalent — TPU jobs
            # are preemptible): restore the full TrainState (params +
            # diffGradNorm moments + step) from the newest checkpoint in
            # run_dir and continue the epoch loop after it.
            latest = ckpt_util.latest_checkpoint(self.run_dir)
            if latest is not None:
                self.state = ckpt_util.restore_checkpoint(latest, self.state)
                import re as _re

                # both name forms encode epochs COMPLETED: regular saves
                # resume at the next epoch, graceful-preemption saves
                # restart the interrupted one (train() fast-forwards the
                # loader past its already-consumed steps)
                m = _re.match(r"ckpt_(?:preempt_)?epoch_(\d+)_", latest.name)
                self.start_epoch = int(m.group(1)) if m else 0
                self.training_steps = int(self.state.step)
                print(f"#### auto-resumed from {latest.name} "
                      f"(epoch {self.start_epoch}, "
                      f"step {self.training_steps})")

    # ------------------------------------------------------------------
    def _build_train_step(self):
        """The un-jitted (state, microbatches, rng) step. Subclasses
        override this to swap the objective (e.g. DistillTrainer) while
        reusing the full epoch/mesh/checkpoint machinery."""
        return make_train_step(self.cfg, self.model, self.tx)

    # ------------------------------------------------------------------
    def load_checkpoint(self, path: str) -> None:
        """Transfer-learning load: shape-matching partial params restore
        (reference semantics, runner.py:124-132)."""
        try:
            restored = ckpt_util.restore_checkpoint(path, self.state)
            self.state = restored
            print(f"#### restored full train state from {path}")
            return
        except Exception:
            pass
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(Path(path).resolve())
        saved_params = raw.get("params", raw) if isinstance(raw, dict) else raw
        params, _ = ckpt_util.partial_restore_params(
            saved_params, self.state.params
        )
        self.state = self.state._replace(params=params)
        print(f"#### partial-restored params from {path}")

    # ------------------------------------------------------------------
    def _stack_microbatches(self, it):
        accum = self.cfg.train.update_interval
        mbs = []
        for _ in range(accum):
            b = next(it)
            mbs.append({k: b[k] for k in _BATCH_KEYS if k in b})
        return {k: np.stack([m[k] for m in mbs]) for k in mbs[0]}

    def _feature_transfer_dtype(self):
        """Wire dtype for batch["features"] (TrainConfig.transfer_dtype):
        bf16 halves the dominant per-step H2D payload and is BIT-EXACT
        when the model computes in bf16 (its first op casts the input,
        models/camradepth.py) — 'auto' only ships bf16 in that case."""
        td = self.cfg.train.transfer_dtype
        if td == "auto":
            td = (
                "bfloat16"
                if self.cfg.model.compute_dtype == "bfloat16"
                else "float32"
            )
        if td == "bfloat16":
            return jnp.bfloat16
        if td == "float32":
            return None  # loader-native f32: no cast, no copy
        raise ValueError(
            f"train.transfer_dtype must be auto|float32|bfloat16, "
            f"got {td!r}"
        )

    def _prepare_micro(self, micro):
        """Host microbatch stack -> device arrays (cast + put); the
        single H2D step both the inline loop and the prefetcher use."""
        tdt = self._feature_transfer_dtype()
        if tdt is not None:
            micro = dict(micro)
            if "features" in micro:
                micro["features"] = micro["features"].astype(tdt)
            elif "radar_val" in micro:
                # wire batches: the radar values are the only feature
                # payload the bf16 wire quantizes (the image ships u8,
                # normalized in f32 on device) — same bits the dense
                # bf16 feature stack would carry for those channels
                micro["radar_val"] = micro["radar_val"].astype(tdt)
        if self._micro_sharding is None:
            return jax.device_put(micro)
        if self._loader_process_sharded:
            # micro holds only this process's rows of the global batch
            return multihost.local_batch_to_global(
                micro, self._micro_sharding
            )
        return multihost.put_global(micro, self._micro_sharding)

    def _micro_source(self, it, n_steps: int):
        """Up to n_steps host microbatch stacks (ends early when the
        loader runs dry)."""
        for _ in range(n_steps):
            try:
                yield self._stack_microbatches(it)
            except StopIteration:
                return

    def _device_microbatches(self, it, n_steps: int):
        """Yield up to n_steps device-resident microbatch stacks.

        Single-process runs assemble + dispatch the H2D for up to
        ``prefetch_batches`` stacks AHEAD on a worker thread
        (device_put is async: the transfer overlaps device compute of
        the current step — the round-4 sustained run measured the
        naive loop at ~3x the pure device step time, all input
        pipeline). Multi-process runs keep the inline path: global
        array assembly must happen on one thread in the same order on
        every process."""
        depth = self.cfg.train.prefetch_batches
        if multihost.is_multiprocess():
            depth = 0
        return prefetch_iter(
            self._micro_source(it, n_steps), depth, self._prepare_micro
        )

    def _preemption_requested(self) -> bool:
        """Poll the SIGTERM flag; in multi-process runs the decision is
        all-reduced so every process stops at the SAME step boundary (a
        unilateral exit would strand the others in a collective)."""
        if not self.cfg.train.graceful_preemption:
            # static + identical across SPMD processes, so skipping the
            # collective cannot desync; also avoids a per-step cross-host
            # allgather that could never return True
            return False
        trig = (
            self._preempt_monitor is not None
            and self._preempt_monitor.triggered()
        )
        if multihost.is_multiprocess():
            from jax.experimental import multihost_utils

            return bool(
                np.max(multihost_utils.process_allgather(
                    np.int32(1 if trig else 0)
                )) > 0
            )
        return trig

    def train_one_epoch(self, epoch: int, skip_opt_steps: int = 0) -> None:
        cfg = self.cfg
        it = iter(self.loaders["train"])
        accum = cfg.train.update_interval
        n_opt_steps = max(1, len(self.loaders["train"]) // accum)
        rng = jax.random.PRNGKey(cfg.train.seed * 1000 + epoch)
        # resume of a preempted epoch: skim past the optimizer steps the
        # interrupted run already consumed (host-side loader iteration
        # only), so the epoch's remaining batches — and its per-step rng
        # fold — match an uninterrupted run exactly
        for _ in range(min(skip_opt_steps, n_opt_steps) * accum):
            try:
                next(it)
            except StopIteration:
                break
        t0 = time.perf_counter()
        start = min(skip_opt_steps, n_opt_steps)
        batches = self._device_microbatches(it, n_opt_steps - start)
        for i in range(start, n_opt_steps):
            micro = next(batches, None)
            if micro is None:
                break
            step_rng = jax.random.fold_in(rng, i)
            if multihost.is_multiprocess():
                # every jit input must live on the global mesh
                step_rng = multihost.put_global(
                    step_rng, replicated(self.mesh)
                )
            self.state, metrics = self._train_step(
                self.state, micro, step_rng
            )
            self.training_steps += 1
            if (
                i % self.cfg.train.log_every == 0
                or i == n_opt_steps - 1
            ):
                m = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(m.get("grad_norm", 0.0)):
                    # e.g. degenerate inputs: zero-variance GroupNorm
                    # backward amplifies cotangents by 1/sqrt(eps) per layer
                    print(
                        "#### WARNING: non-finite gradients at step "
                        f"{self.training_steps} — check input scaling"
                    )
                m["lr"] = float(self.schedule(self.training_steps))
                m["steps_per_sec"] = (i + 1 - skip_opt_steps) / (
                    time.perf_counter() - t0
                )
                self.writer.scalars(m, self.training_steps, prefix="train/")
                print(
                    f"[epoch {epoch + 1}/{self.num_epochs} step {i + 1}/"
                    f"{n_opt_steps}] loss {m['loss']:.5f} rmse "
                    f"{m['rmse_m']:.3f}m lr {m['lr']:.2e}"
                )
            if self._preemption_requested():
                # step boundary: the state is consistent — leave the epoch
                # loop so train() can checkpoint and exit cleanly
                self._preempted = True
                break

    def evaluate(self) -> Dict[str, float]:
        if self.loaders.get("val") is None:
            raise ValueError(
                "validation requires a non-empty val split; the current "
                "config assigns 0 frames to val."
            )
        data_size = (
            self.mesh.shape.get(self.cfg.mesh.data_axis, 1)
            if self.mesh is not None
            else 1
        )
        sums: Dict[str, float] = {}
        counts: Dict[str, float] = {}
        n_frames = 0.0
        for batch in self.loaders["val"]:
            dev = {k: jnp.asarray(batch[k]) for k in _BATCH_KEYS if k in batch}
            bsz = int(next(iter(dev.values())).shape[0])
            # the loader pads ragged tail batches by duplicating the last
            # example and marks the padding in batch["valid"] — padded
            # frames must not count in val aggregation (the reference val
            # loop sees no duplicates, runner.py:273-350)
            valid = np.asarray(
                batch.get("valid", np.ones((bsz,), np.float32)),
                np.float32,
            )
            if (
                self._batch_sharding is not None
                and bsz % data_size == 0
                and not multihost.is_multiprocess()
            ):
                # shard eval batches over the data axis; ragged final
                # batches fall back to single-device. Multi-host runs
                # keep eval batches replicated: per-frame metric outputs
                # would otherwise come back sharded across processes and
                # be unreadable from the host aggregation below.
                dev = jax.device_put(dev, self._batch_sharding)
            elif self.mesh is not None and multihost.is_multiprocess():
                # params live on the global mesh, so batches must too
                dev = multihost.put_global(dev, replicated(self.mesh))
            metrics = self._eval_step(self.state.params, dev)
            for k, v in metrics.items():
                # a single non-finite per-frame metric (e.g. a diverged
                # prediction on one val frame) must not poison the whole
                # epoch aggregate that drives early stopping / best-ckpt
                # selection — drop it from this metric's mean, like the
                # pre-valid-mask np.nanmean aggregation did
                v = np.asarray(v, np.float64)
                finite = np.isfinite(v)
                w = valid * finite
                sums[k] = sums.get(k, 0.0) + float(
                    np.sum(np.where(finite, v, 0.0) * valid)
                )
                counts[k] = counts.get(k, 0.0) + float(w.sum())
            n_frames += float(valid.sum())
        if n_frames == 0:
            return {"loss": float("nan"), "rmse_m": float("nan")}
        agg = {
            k: (sums[k] / counts[k] if counts[k] else float("nan"))
            for k in sums
        }
        self.val_steps += 1
        self.writer.scalars(agg, self.val_steps, prefix="val/")
        return agg

    def train(self) -> float:
        cfg = self.cfg
        best_eval = float("inf")
        patience = 0
        stop_after = cfg.train.stop_after or max(1, self.num_epochs - 4)
        self._preempted = False
        if (
            cfg.train.graceful_preemption
            and self._preempt_monitor is None
            and threading.current_thread() is threading.main_thread()
        ):
            # signal handlers are a main-thread-only CPython facility;
            # background-thread trainers (tests, notebooks) simply run
            # without graceful shutdown
            self._preempt_monitor = _PreemptionMonitor()
        try:
            return self._train_loop(best_eval, patience, stop_after)
        finally:
            if self._preempt_monitor is not None:
                self._preempt_monitor.restore()
                self._preempt_monitor = None

    def _train_loop(self, best_eval, patience, stop_after) -> float:
        cfg = self.cfg
        steps_per_epoch = max(
            1, len(self.loaders["train"]) // cfg.train.update_interval
        )
        for epoch in range(self.start_epoch, self.num_epochs):
            # resuming a preempted epoch: its checkpoint restored the
            # optimizer step count; anything past this epoch's first step
            # was already trained — skim the loader to the boundary
            skip = (
                max(0, self.training_steps - epoch * steps_per_epoch)
                if epoch == self.start_epoch
                else 0
            )
            self.train_one_epoch(epoch, skip_opt_steps=skip)
            if self._preempted:
                state_for_save = (
                    multihost.replicated_host_tree(self.state)
                    if multihost.is_multiprocess()
                    else self.state
                )
                # synchronous write — the grace period is short and the
                # process exits right after (orbax save is collective:
                # every process calls it, orbax coordinates the writers)
                path = ckpt_util.save_preemption_checkpoint(
                    self.run_dir, state_for_save, epoch
                )
                if self._primary:
                    print(
                        "#### SIGTERM: saved preemption checkpoint to "
                        f"{path} (step {self.training_steps}) — rerun with "
                        "auto-resume to continue"
                    )
                break
            val = self.evaluate()
            print(
                f"#### epoch {epoch + 1}: val loss {val['loss']:.5f} "
                f"RMSE {val.get('rmse_m', float('nan')):.3f} m"
            )
            if val["loss"] < best_eval:
                best_eval = val["loss"]
                patience = 0
                if cfg.train.save_model:
                    # multi-process: gather any cross-host fsdp shards
                    # first, and note orbax's Checkpointer.save is itself
                    # a COLLECTIVE (it runs sync_global_devices
                    # internally), so EVERY process must call it — orbax
                    # does its own primary-writes coordination. Gating
                    # the call on process 0 deadlocks the barrier.
                    state_for_save = (
                        multihost.replicated_host_tree(self.state)
                        if multihost.is_multiprocess()
                        else self.state
                    )
                    if cfg.train.async_checkpoint:
                        if self._async_saver is None:  # fresh train()
                            self._async_saver = ckpt_util.AsyncSaver()
                        # host snapshot now, serialization in the
                        # background — the next epoch starts immediately
                        path = self._async_saver.save(
                            self.run_dir, state_for_save, epoch, best_eval
                        )
                    else:
                        path = ckpt_util.save_checkpoint(
                            self.run_dir, state_for_save, epoch, best_eval
                        )
                    if self._primary:
                        print(f"#### saved best checkpoint to {path}")
            else:
                patience += 1
            if patience >= cfg.train.early_stopping_thresh:
                print("#### early stopping")
                break
            if epoch + 1 >= stop_after:
                # reference skips the final low-LR epochs (runner.py:382-384)
                print("#### stop_after reached")
                break
        if self._async_saver is not None:
            # drain the in-flight write so the best checkpoint is
            # finalized (and discoverable) when train() returns
            self._async_saver.wait()
            self._async_saver.close()
            self._async_saver = None
        self.writer.close()
        return best_eval
