"""Graceful-preemption handling: SIGTERM mid-epoch saves a full
TrainState checkpoint at the next optimizer-step boundary, and
auto-resume restarts the interrupted epoch fast-forwarded past the
steps it already consumed (no reference equivalent — the reference has
no preemption story at all; TPU pods are preemptible with a SIGTERM
grace period)."""

import os
import signal

import jax
import numpy as np
import pytest

from camradepth_tpu.config import DataConfig, TrainConfig, tiny_test_config
from camradepth_tpu.data import synthetic
from camradepth_tpu.train.trainer import Trainer
from camradepth_tpu.utils import checkpoint as ckpt_util


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("prepared")
    split = synthetic.generate(d, num_frames=8, hw=(64, 128), seed=1)
    return str(split)


def _cfg(synth, tmp_path):
    cfg = tiny_test_config()
    data = DataConfig(
        image_dimension=(64, 128),
        split_path=synth,
        train_val_split=(6, 2),
        num_workers=2,
    )
    # accum 1 -> 3 optimizer steps per epoch: preempt after step 1,
    # resume must run exactly steps 2..3
    train = TrainConfig(
        batch_size=2,
        desired_batch_size=2,
        num_steps=None,
        num_epochs=1,
        learning_rate=1e-3,
        output_dir=str(tmp_path / "out"),
        save_model=True,
        stop_after=10,
    )
    return cfg.replace(data=data, train=train)


class TestLatestCheckpointOrdering:
    def test_preempt_wins_equal_epoch_regular_wins_later_epoch(self, tmp_path):
        (tmp_path / "ckpt_epoch_2_loss_0.5000000").mkdir()
        (tmp_path / "ckpt_preempt_epoch_2_step_14").mkdir()
        # equal epochs-completed: the preempt save also holds a partial
        # epoch 2, so it is the newer state
        assert ckpt_util.latest_checkpoint(tmp_path).name == (
            "ckpt_preempt_epoch_2_step_14"
        )
        (tmp_path / "ckpt_epoch_3_loss_0.4000000").mkdir()
        assert ckpt_util.latest_checkpoint(tmp_path).name == (
            "ckpt_epoch_3_loss_0.4000000"
        )
        # best-checkpoint selection stays loss-based and never picks a
        # preemption save (its name encodes no loss)
        assert ckpt_util.best_checkpoint(tmp_path).name == (
            "ckpt_epoch_3_loss_0.4000000"
        )

    def test_two_preempts_same_epoch_higher_step_wins(self, tmp_path):
        """Resume-then-repreempt in the same epoch: the newer (higher
        optimizer step) save must win regardless of glob order."""
        (tmp_path / "ckpt_preempt_epoch_3_step_380").mkdir()
        (tmp_path / "ckpt_preempt_epoch_3_step_350").mkdir()
        assert ckpt_util.latest_checkpoint(tmp_path).name == (
            "ckpt_preempt_epoch_3_step_380"
        )


class TestGracefulPreemption:
    def test_sigterm_saves_and_resume_completes_epoch(self, synth, tmp_path):
        cfg = _cfg(synth, tmp_path)
        tr = Trainer(cfg)
        n_opt_steps = len(tr.loaders["train"]) // cfg.train.update_interval
        assert n_opt_steps == 3

        # deliver a real SIGTERM to ourselves right after the first
        # optimizer step returns (main thread: the handler runs before
        # the boundary check, deterministically)
        real_step = tr._train_step
        calls = {"n": 0}

        def step_then_sigterm(state, micro, rng):
            out = real_step(state, micro, rng)
            calls["n"] += 1
            if calls["n"] == 1:
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        tr._train_step = step_then_sigterm
        prev_handler = signal.getsignal(signal.SIGTERM)
        tr.train()
        # handlers restored on exit
        assert signal.getsignal(signal.SIGTERM) == prev_handler
        assert tr._preempted
        assert calls["n"] == 1
        ck = ckpt_util.latest_checkpoint(tr.run_dir)
        assert ck is not None and ck.name == "ckpt_preempt_epoch_0_step_1"

        # a run preempted before its first best-val save is still
        # loadable by every CLI consumer: --checkpoint <run-dir> falls
        # back to the newest preempt save, and the exact ckpt dir works
        from camradepth_tpu.cli import _load_params

        _, p_run = _load_params(cfg, str(tr.run_dir))
        _, p_dir = _load_params(cfg, str(ck))
        for a, b in zip(jax.tree.leaves(p_run), jax.tree.leaves(p_dir)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # resume: restarts epoch 0, skips the consumed step, finishes
        tr2 = Trainer(cfg, run_dir=str(tr.run_dir), auto_resume=True)
        assert tr2.start_epoch == 0
        assert tr2.training_steps == 1
        # preempted state restored exactly (params + optimizer moments)
        for a, b in zip(
            jax.tree.leaves(tr.state.params),
            jax.tree.leaves(tr2.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(tr.state.opt_state),
            jax.tree.leaves(tr2.state.opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        best = tr2.train()
        assert np.isfinite(best)
        assert not tr2._preempted
        assert tr2.training_steps == n_opt_steps
        # the completed run wrote a regular best-val checkpoint that now
        # outranks the preemption save for any further resume
        latest = ckpt_util.latest_checkpoint(tr2.run_dir)
        assert latest.name.startswith("ckpt_epoch_1_")
