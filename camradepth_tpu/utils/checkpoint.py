"""Orbax checkpointing with the reference's resume semantics.

The reference saves {state_dict, optimizer, lr, steps} on val-loss
improvement with the epoch+loss in the filename (runner.py:366-373) and on
load partial-loads only shape-matching keys (utils.py:352-370). Here the
TrainState pytree (params + full diffGradNorm state + step) checkpoints
atomically through Orbax; :func:`partial_restore_params` reproduces the
shape-matching transfer-learning load for params from any saved tree."""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_path(run_dir: str | Path, epoch: int, eval_loss: float) -> Path:
    return Path(run_dir).resolve() / (
        f"ckpt_epoch_{epoch + 1}_loss_{eval_loss:.7f}"
    )


def save_checkpoint(run_dir: str | Path, state, epoch: int,
                    eval_loss: float) -> Path:
    """Write ckpt_epoch_<e>_loss_<l> under run_dir (async-safe, atomic)."""
    path = _ckpt_path(run_dir, epoch, eval_loss)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    return path


class AsyncSaver:
    """Non-blocking checkpoint writes (no reference equivalent — the
    reference's torch.save blocks the epoch loop, runner.py:366-373).

    ``save`` snapshots the state to host synchronously (so the train
    loop's donated device buffers can be reused immediately) and hands
    serialization to Orbax's background thread; the train loop continues
    while bytes hit disk. Directories appear atomically on finalize, so
    ``latest_checkpoint``/``best_checkpoint`` never see partial writes.
    A second save while one is in flight waits for the first (Orbax
    semantics). Call ``wait``/``close`` before reading the newest
    checkpoint back or exiting."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, run_dir: str | Path, state, epoch: int,
             eval_loss: float) -> Path:
        path = _ckpt_path(run_dir, epoch, eval_loss)
        self._ckptr.save(
            path, args=ocp.args.StandardSave(jax.device_get(state))
        )
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()


def save_preemption_checkpoint(run_dir: str | Path, state,
                               epochs_completed: int) -> Path:
    """Mid-epoch graceful-shutdown save (SIGTERM landed between optimizer
    steps). The filename's epoch number is EPOCHS COMPLETED — the same
    convention the regular ``ckpt_epoch_<n>`` names use — so auto-resume
    restarts the interrupted epoch; the optimizer step counter inside the
    state lets the trainer fast-forward past already-consumed batches.
    Synchronous write (the process is about to exit)."""
    path = Path(run_dir).resolve() / (
        f"ckpt_preempt_epoch_{epochs_completed}_step_{int(state.step)}"
    )
    ckptr = ocp.StandardCheckpointer()
    # force: resume-then-repreempt can land on the SAME step (e.g. the
    # grace period expires before any new step completes); an
    # already-exists error here would lose the save entirely
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(run_dir: str | Path) -> Optional[Path]:
    """Newest checkpoint in a run dir (preemption auto-resume).

    Regular ``ckpt_epoch_<n>_loss_<l>`` and graceful-shutdown
    ``ckpt_preempt_epoch_<n>_step_<s>`` names both encode n = epochs
    completed; a preempt save additionally holds a partial epoch, so on
    an equal epoch count the preempt checkpoint is the newer state, and
    between two preempt saves of the same epoch the higher optimizer
    step wins."""
    run_dir = Path(run_dir)
    best, best_key = None, (-1, -1, -1)
    for p in run_dir.glob("ckpt_*epoch_*"):
        m = re.match(r"ckpt_epoch_(\d+)_loss_([\d.]+)", p.name)
        if m:
            key = (int(m.group(1)), 0, 0)
        else:
            m = re.match(r"ckpt_preempt_epoch_(\d+)_step_(\d+)", p.name)
            if not m:
                continue
            key = (int(m.group(1)), 1, int(m.group(2)))
        if key > best_key:
            best, best_key = p, key
    return best


def best_checkpoint(run_dir: str | Path) -> Optional[Path]:
    """Lowest-loss checkpoint in a run dir (filename-encoded, like the
    reference's best-ckpt convention)."""
    run_dir = Path(run_dir)
    best, best_loss = None, float("inf")
    for p in run_dir.glob("ckpt_epoch_*_loss_*"):
        m = re.match(r"ckpt_epoch_(\d+)_loss_([\d.]+)", p.name)
        if m:
            loss = float(m.group(2))
            if loss < best_loss:
                best, best_loss = p, loss
    return best


def restore_checkpoint(path: str | Path, target):
    """Restore a full TrainState saved by :func:`save_checkpoint`."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).resolve(), target)


def partial_restore_params(saved_params, target_params,
                           verbose: bool = True) -> Tuple[Any, list]:
    """Shape-matching partial load (reference
    load_checkpoint_with_shape_match, utils.py:352-370): keys present in the
    checkpoint with matching shapes are taken, everything else keeps the
    freshly-initialized value. Returns (params, mismatches)."""
    flat_saved = _flatten(saved_params)
    flat_target, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    out = []
    mismatches = []
    for path, value in flat_target:
        key = _path_str(path)
        if key in flat_saved and tuple(np.shape(flat_saved[key])) == tuple(
            np.shape(value)
        ):
            # COPY, never alias: jnp.asarray returns the SAME Array
            # object for a matching-dtype device array, and restored
            # leaves flow into TrainStates whose jitted steps DONATE
            # their buffers (trainer.py donate_argnums) — an aliased
            # source tree is invalidated by the first step, crashing
            # any later use of it ("Array has been deleted", e.g. a
            # distill teacher warm-starting a second student).
            out.append(jax.numpy.array(flat_saved[key], dtype=value.dtype))
        else:
            reason = ("missing" if key not in flat_saved else
                      f"shape {np.shape(flat_saved[key])} vs {np.shape(value)}")
            mismatches.append((key, reason))
            out.append(value)
    if verbose:
        for key, reason in mismatches:
            print(f"#### partial restore: keeping init for {key} ({reason})")
    return jax.tree_util.tree_unflatten(treedef, out), mismatches


def _flatten(tree) -> dict:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {_path_str(path): v for path, v in flat}


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)
