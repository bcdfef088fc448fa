"""End-to-end trainer tests on synthetic data (tiny config):
train -> val -> checkpoint -> restore -> transfer-learning partial load."""

import numpy as np
import pytest
import jax

from camradepth_tpu.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    tiny_test_config,
)
from camradepth_tpu.data import synthetic
from camradepth_tpu.data.pipeline import make_loaders
from camradepth_tpu.train.trainer import Trainer
from camradepth_tpu.utils import checkpoint as ckpt_util


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("prepared")
    split = synthetic.generate(d, num_frames=8, hw=(64, 128), seed=1)
    return str(split)


def _cfg(synth, tmp_path, **train_kw):
    cfg = tiny_test_config()
    data = DataConfig(
        image_dimension=(64, 128),
        split_path=synth,
        train_val_split=(6, 2),
        num_workers=2,
    )
    train = TrainConfig(
        batch_size=2,
        desired_batch_size=4,
        num_steps=None,
        num_epochs=1,
        learning_rate=1e-3,
        output_dir=str(tmp_path / "out"),
        save_model=True,
        stop_after=10,
        **train_kw,
    )
    return cfg.replace(data=data, train=train)


class TestTrainer:
    def test_train_eval_checkpoint_cycle(self, synth, tmp_path):
        cfg = _cfg(synth, tmp_path)
        tr = Trainer(cfg)
        best = tr.train()
        assert np.isfinite(best)
        # best checkpoint exists and restores into a fresh trainer
        ck = ckpt_util.best_checkpoint(tr.run_dir)
        assert ck is not None
        cfg2 = cfg.replace(
            train=cfg.train.__class__(
                **{
                    **{f: getattr(cfg.train, f)
                       for f in cfg.train.__dataclass_fields__},
                    "checkpoint": str(ck),
                    "load_ckpt": True,
                }
            )
        )
        tr2 = Trainer(cfg2)
        a = jax.tree.leaves(tr.state.params)[0]
        b = jax.tree.leaves(tr2.state.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_partial_restore_shape_mismatch(self, synth, tmp_path):
        """Transfer learning across variants: a 7-channel checkpoint loads
        into a 3-channel model keeping init for the mismatched patch embed
        (reference utils.py:352-370 semantics)."""
        cfg = _cfg(synth, tmp_path)
        tr = Trainer(cfg)
        # 3-channel model
        model_kw = {f: getattr(cfg.model, f)
                    for f in cfg.model.__dataclass_fields__}
        model_kw["input_channels"] = 3
        cfg3 = cfg.replace(model=ModelConfig(**model_kw))
        tr3 = Trainer(cfg3)
        params, mismatches = ckpt_util.partial_restore_params(
            tr.state.params, tr3.state.params, verbose=False
        )
        keys = [k for k, _ in mismatches]
        assert any("patch_embed1" in k for k in keys)
        # matching keys copied exactly
        flat_new = dict(
            jax.tree_util.tree_flatten_with_path(params)[0]
        )
        flat_old = dict(
            jax.tree_util.tree_flatten_with_path(tr.state.params)[0]
        )
        copied = [
            k for k in flat_new
            if "patch_embed1" not in str(k)
        ]
        assert copied
        k0 = copied[0]
        np.testing.assert_array_equal(
            np.asarray(flat_new[k0]), np.asarray(flat_old[k0])
        )

    def test_auto_resume_restores_state(self, synth, tmp_path):
        """Preemption recovery: a new Trainer pointed at the same run_dir
        with auto_resume picks up params, optimizer state and epoch."""
        cfg = _cfg(synth, tmp_path)
        tr = Trainer(cfg)
        tr.train()
        resumed = Trainer(cfg, run_dir=str(tr.run_dir), auto_resume=True)
        assert resumed.start_epoch >= 1
        a = jax.tree.leaves(tr.state.params)[0]
        b = jax.tree.leaves(resumed.state.params)[0]
        # resumed params come from the saved best checkpoint, which may be
        # an earlier epoch than the live end-state; must at least be the
        # checkpointed tensor, not fresh init
        fresh = Trainer(cfg)
        c = jax.tree.leaves(fresh.state.params)[0]
        assert not np.allclose(np.asarray(b), np.asarray(c))
        # optimizer moments restored (nonzero after training)
        m = jax.tree.leaves(resumed.state.opt_state)
        assert any(np.abs(np.asarray(x)).max() > 0 for x in m
                   if hasattr(x, 'shape') and np.size(x) > 1)

    def test_ragged_val_batches_do_not_double_count(self, synth, tmp_path):
        """The loader pads ragged val batches by duplicating the last
        example (batch["valid"] marks the padding); evaluate() must mask
        those duplicates out, so a 5-frame val split yields IDENTICAL
        metrics at batch 4 (4 + 1-real/3-dup) and batch 5 (one full
        batch) — the reference's val loop never sees duplicates
        (runner.py:273-350)."""
        import dataclasses

        base = _cfg(synth, tmp_path)
        data = dataclasses.replace(base.data, train_val_split=(3, 5))
        results = {}
        for bs in (4, 5):
            cfg = base.replace(
                data=data,
                train=dataclasses.replace(
                    base.train, batch_size=bs, desired_batch_size=bs,
                    save_model=False,
                ),
            )
            t = Trainer(cfg, run_dir=str(tmp_path / f"ragged{bs}"))
            results[bs] = t.evaluate()
        assert results[4].keys() == results[5].keys()
        for k in results[4]:
            np.testing.assert_allclose(
                results[4][k], results[5][k], rtol=2e-5, atol=1e-6,
                err_msg=f"val metric {k} differs between batch 4 and 5",
            )

    def test_eval_nonfinite_frame_does_not_poison_epoch(
        self, synth, tmp_path
    ):
        """A single non-finite per-frame val metric (e.g. one diverged
        prediction) is dropped from that metric's mean instead of
        turning the whole epoch aggregate NaN — the aggregate drives
        early stopping and best-checkpoint selection."""
        import dataclasses

        base = _cfg(synth, tmp_path)
        data = dataclasses.replace(base.data, train_val_split=(3, 4))
        cfg = base.replace(
            data=data,
            train=dataclasses.replace(
                base.train, batch_size=4, desired_batch_size=4,
                save_model=False,
            ),
        )
        t = Trainer(cfg, run_dir=str(tmp_path / "nanval"))
        real = t._eval_step

        def poisoned(params, batch):
            out = {}
            for k, v in real(params, batch).items():
                v = np.asarray(v, np.float64).copy()
                v[0] = np.nan  # first frame of every batch diverged
                out[k] = v
            return out

        t._eval_step = poisoned
        agg = t.evaluate()
        assert agg  # at least loss + rmse
        for k, v in agg.items():
            assert np.isfinite(v), f"val metric {k} poisoned by one NaN"

    def test_empty_train_split_clear_error(self, synth, tmp_path):
        """mini_dataset-style (0,0) splits must fail up front with a clear
        message, not a TypeError on len(None) (the reference crashes deep
        in its loop on the same degenerate split)."""
        cfg = _cfg(synth, tmp_path)
        loaders = {"train": None, "val": None, "test": object()}
        with pytest.raises(ValueError, match="train split"):
            Trainer(cfg, loaders=loaders, run_dir=str(tmp_path / "g1"))

    def test_empty_val_split_clear_error(self, synth, tmp_path):
        import dataclasses

        cfg = _cfg(synth, tmp_path)
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, train_val_split=(8, 0))
        )
        t = Trainer(cfg, run_dir=str(tmp_path / "g2"))
        with pytest.raises(ValueError, match="val split"):
            t.evaluate()


class TestAsyncCheckpoint:
    def test_async_saver_roundtrip(self, tmp_path):
        """AsyncSaver: non-blocking save finalizes atomically and
        restores bit-identically; discovery helpers see it only after
        the drain."""
        state = {
            "w": np.arange(12, dtype=np.float32).reshape(3, 4),
            # 0-d ndarray, not np.int32: orbax's StandardCheckpointHandler
            # rejects bare numpy scalar types
            "step": np.asarray(7, np.int32),
        }
        saver = ckpt_util.AsyncSaver()
        path = saver.save(tmp_path, state, epoch=2, eval_loss=0.125)
        saver.wait()
        saver.close()
        assert path.name == "ckpt_epoch_3_loss_0.1250000"
        assert ckpt_util.latest_checkpoint(tmp_path) == path
        restored = ckpt_util.restore_checkpoint(path, state)
        np.testing.assert_array_equal(restored["w"], state["w"])
        assert int(restored["step"]) == 7

    def test_trainer_async_checkpoint_cycle(self, synth, tmp_path):
        """--async-checkpoint: the epoch loop saves in the background;
        after train() returns the best checkpoint is finalized and
        restores into a fresh trainer exactly like the sync path."""
        cfg = _cfg(synth, tmp_path, async_checkpoint=True)
        tr = Trainer(cfg)
        best = tr.train()
        assert np.isfinite(best)
        assert tr._async_saver is None  # drained and closed
        ck = ckpt_util.best_checkpoint(tr.run_dir)
        assert ck is not None
        restored = ckpt_util.restore_checkpoint(ck, tr.state)
        a = jax.tree.leaves(tr.state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestInputPipeline:
    """Round-4 input-pipeline shape (TrainConfig.transfer_dtype /
    prefetch_batches): the sustained 416x800 run measured the naive
    loop at ~3x the pure device step (loader + per-step H2D through
    the tunnel), so microbatches are now prefetched/dispatched ahead
    on a worker thread and features can ship bf16. Both must be
    OBSERVATIONALLY EXACT: identical parameters, identical losses."""

    def test_prefetch_matches_inline(self, synth, tmp_path):
        outs = []
        for prefetch in (0, 2):
            cfg = _cfg(synth, tmp_path / f"p{prefetch}",
                       prefetch_batches=prefetch)
            tr = Trainer(cfg)
            tr.train()
            outs.append(jax.device_get(tr.state.params))
        a, b = (jax.tree.leaves(o) for o in outs)
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), (
            "prefetched input pipeline changed training results"
        )

    def test_bf16_transfer_exact_for_bf16_compute(self, synth, tmp_path):
        import dataclasses

        outs = []
        for td in ("float32", "bfloat16"):
            cfg = _cfg(synth, tmp_path / td, transfer_dtype=td)
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, compute_dtype="bfloat16"))
            tr = Trainer(cfg)
            tr.train()
            outs.append(jax.device_get(tr.state.params))
        a, b = (jax.tree.leaves(o) for o in outs)
        # the model's first op casts f32 inputs to bf16 on device;
        # shipping bf16 moves that same round-to-nearest onto the host
        assert all(np.array_equal(x, y) for x, y in zip(a, b)), (
            "bf16 feature transfer changed bf16-compute training results"
        )

    def test_auto_keeps_f32_for_f32_models(self, synth, tmp_path):
        cfg = _cfg(synth, tmp_path)  # tiny config computes in f32
        tr = Trainer(cfg)
        assert tr._feature_transfer_dtype() is None
