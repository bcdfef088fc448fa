"""Teacher→student distillation (train/distill.py).

Pins: (1) alpha=0 reduces the distill step to the plain GT train step,
(2) self-distillation of identical weights at alpha=1 has ~zero distill
loss, (3) microbatch padding stays gradient-exact under the dense
(valid-masked) distill terms, (4) DistillTrainer end-to-end with the
teacher warm start, (5) the CLI `distill` subcommand, (6) a mesh run
matches single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.config import DataConfig, TrainConfig, tiny_test_config
from camradepth_tpu.data import synthetic
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.distill import (
    DistillTrainer,
    distill_terms,
    make_distill_step,
)
from camradepth_tpu.train.step import init_state, make_train_step


def _tiny_cfg(seg=False, dropout=0.0, tpu_decoder=False, pad_to=None):
    cfg = tiny_test_config()
    model_kw = {"dropout_rate": dropout, "tpu_decoder": tpu_decoder}
    if seg:
        model_kw.update(supervised_seg=True)
    train = TrainConfig(batch_size=2, desired_batch_size=2, num_steps=None,
                        num_epochs=1, pad_microbatch_to=pad_to,
                        learning_rate=1e-3)
    return cfg.replace(
        model=dataclasses.replace(cfg.model, **model_kw), train=train
    )


def _micro(cfg, accum=1, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    h, w = cfg.model.img_size
    out = {
        "features": rng.normal(
            0, 1, (accum, batch, h, w, cfg.model.input_channels)
        ).astype(np.float32),
        "gt_depth": (
            rng.uniform(0, 1, (accum, batch, h, w))
            * (rng.uniform(size=(accum, batch, h, w)) < 0.3)
        ).astype(np.float32),
    }
    if cfg.model.supervised_seg:
        out["seg"] = rng.integers(
            0, cfg.model.num_classes, (accum, batch, h, w)
        ).astype(np.int32)
        out["seg_inter"] = rng.integers(
            0, cfg.model.num_classes, (accum, batch, h // 2, w // 2)
        ).astype(np.int32)
    return {k: jnp.asarray(v) for k, v in out.items()}


def _models_and_state(cfg, teacher_cfg=None, seed=0):
    model = CamRaDepth(cfg.model)
    teacher_cfg = teacher_cfg or cfg
    teacher = CamRaDepth(teacher_cfg.model)
    tx = diffgrad_norm(cfg.train.learning_rate)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(seed))
    h, w = teacher_cfg.model.img_size
    dummy = jnp.zeros((1, h, w, teacher_cfg.model.input_channels))
    t_params = teacher.init(
        {"params": jax.random.PRNGKey(seed + 7)}, dummy, deterministic=True
    )["params"]
    return model, teacher, tx, state, t_params


class TestDistillStep:
    def test_alpha0_matches_gt_train_step(self):
        """alpha=0: the distill objective degenerates to the plain
        multitask GT loss — updated params match make_train_step."""
        cfg = _tiny_cfg(seg=True)
        model, teacher, tx, state, t_params = _models_and_state(cfg)
        micro = _micro(cfg)
        rng = jax.random.PRNGKey(3)
        d_step = jax.jit(make_distill_step(
            cfg, model, teacher, t_params, tx, alpha=0.0))
        t_step = jax.jit(make_train_step(cfg, model, tx))
        s1, m1 = d_step(state, micro, rng)
        s2, m2 = t_step(state, micro, rng)
        assert np.isfinite(float(m1["loss"]))
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
        a = np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(s1.params)])
        b = np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(s2.params)])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)

    def test_self_distillation_is_zero(self):
        """Student == teacher (same arch, same weights, no dropout):
        every distill term vanishes at alpha=1."""
        cfg = _tiny_cfg(seg=True)
        model, _, tx, state, _ = _models_and_state(cfg)
        step = jax.jit(make_distill_step(
            cfg, model, model, state.params, tx, alpha=1.0))
        _, m = step(state, _micro(cfg), jax.random.PRNGKey(0))
        assert float(m["loss_distill"]) < 1e-5
        for k in ("distill_depth_final", "distill_seg_final"):
            assert float(m[k]) < 1e-5, k

    def test_padding_gradient_exact(self):
        """pad_microbatch_to with dummy samples must not perturb the
        dense distill gradients (the static valid mask zeroes them)."""
        cfg_pad = _tiny_cfg(pad_to=4)
        cfg_nopad = _tiny_cfg()
        model, teacher, tx, state, t_params = _models_and_state(cfg_nopad)
        micro = _micro(cfg_nopad, batch=2)
        rng = jax.random.PRNGKey(1)
        s_pad, m_pad = jax.jit(make_distill_step(
            cfg_pad, model, teacher, t_params, tx, alpha=0.6))(
                state, micro, rng)
        s_ref, m_ref = jax.jit(make_distill_step(
            cfg_nopad, model, teacher, t_params, tx, alpha=0.6))(
                state, micro, rng)
        np.testing.assert_allclose(
            float(m_pad["loss"]), float(m_ref["loss"]), rtol=1e-5)
        a = np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(s_pad.params)])
        b = np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(s_ref.params)])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_cross_architecture_terms_finite(self):
        """Parity teacher → tpu_decoder student: every head aligns
        (identical output resolutions) and the loss is finite."""
        cfg = _tiny_cfg(seg=True, tpu_decoder=True)
        t_cfg = _tiny_cfg(seg=True, tpu_decoder=False)
        model, teacher, tx, state, t_params = _models_and_state(cfg, t_cfg)
        step = jax.jit(make_distill_step(
            cfg, model, teacher, t_params, tx, alpha=0.7))
        s1, m = step(state, _micro(cfg), jax.random.PRNGKey(2))
        for k, v in m.items():
            assert np.isfinite(float(v)), k
        assert float(m["loss_distill"]) > 0


class TestDistillTerms:
    def test_weights_mirror_multitask(self):
        """Head weighting is loss_weights-normalized like the GT loss."""
        cfg = _tiny_cfg(seg=False)
        model = CamRaDepth(cfg.model)
        h, w = cfg.model.img_size
        x = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (2, h, w, 7)), jnp.float32)
        p1 = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        p2 = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
        pred_s = model.apply({"params": p1}, x, deterministic=True)
        pred_t = model.apply({"params": p2}, x, deterministic=True)
        per_sample, terms = distill_terms(pred_s, pred_t, cfg)
        assert per_sample.shape == (2,)
        w_ = cfg.train.loss_weights
        expect = (
            w_[0] * terms["distill_depth_final"]
            + w_[1] * terms["distill_depth_stage4"]
            + w_[2] * terms["distill_depth_stage3"]
        ) / sum(w_)
        np.testing.assert_allclose(
            float(jnp.mean(per_sample)), float(expect), rtol=1e-6)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("prepared")
    return str(synthetic.generate(d, num_frames=6, hw=(64, 128), seed=3))


def _loader_cfg(cfg, synth, tmp_path):
    data = DataConfig(image_dimension=(64, 128), split_path=synth,
                      train_val_split=(4, 2), num_workers=2)
    train = dataclasses.replace(
        cfg.train, output_dir=str(tmp_path / "out"), save_model=True,
        stop_after=10)
    return cfg.replace(data=data, train=train)


class TestDistillTrainer:
    def test_end_to_end_with_warm_start(self, synth, tmp_path):
        t_cfg = _loader_cfg(_tiny_cfg(), synth, tmp_path)
        s_cfg = _loader_cfg(_tiny_cfg(tpu_decoder=True), synth, tmp_path)
        _, _, _, _, t_params = _models_and_state(t_cfg)
        tr = DistillTrainer(s_cfg, t_cfg, t_params, alpha=0.7)
        # warm start: shared-shape leaves (encoder) transferred exactly
        flat_t = dict(jax.tree_util.tree_flatten_with_path(t_params)[0])
        flat_s = dict(
            jax.tree_util.tree_flatten_with_path(tr.state.params)[0])
        shared = [k for k in flat_s
                  if k in flat_t and flat_t[k].shape == flat_s[k].shape]
        assert shared, "no transferable leaves found"
        for k in shared[:5]:
            np.testing.assert_array_equal(
                np.asarray(flat_s[k]), np.asarray(flat_t[k]))
        best = tr.train()
        assert np.isfinite(best)

    def test_mesh_matches_single_device(self, synth, tmp_path):
        """data_parallel=2 distillation reproduces the single-device
        loss trajectory (teacher replication + valid masks shard
        correctly)."""
        from camradepth_tpu.config import MeshConfig

        base = _loader_cfg(_tiny_cfg(), synth, tmp_path)
        _, _, _, _, t_params = _models_and_state(base)
        losses = {}
        for name, mesh_cfg in (
            # data_parallel defaults to auto (the reference runs
            # DataParallel by default) — single-device must be explicit
            ("single", MeshConfig(data_parallel=1, fsdp_parallel=1,
                                  spatial_parallel=1)),
            ("dp2", MeshConfig(data_parallel=2, fsdp_parallel=1,
                               spatial_parallel=1)),
        ):
            cfg = base.replace(mesh=mesh_cfg)
            tr = DistillTrainer(
                cfg, base, t_params, alpha=0.5,
                run_dir=str(tmp_path / f"run_{name}"))
            if name == "single":
                assert tr.mesh is None
            else:
                assert tr.mesh is not None
            micro = _micro(cfg, accum=1, batch=2, seed=9)
            if tr._micro_sharding is not None:
                micro = jax.device_put(micro, tr._micro_sharding)
            _, m = tr._train_step(tr.state, micro, jax.random.PRNGKey(5))
            losses[name] = float(m["loss"])
        np.testing.assert_allclose(
            losses["dp2"], losses["single"], rtol=2e-5)


class TestDistillCLI:
    def test_cli_distill_from_orbax_teacher(self, synth, tmp_path):
        """`camradepth distill` end-to-end: teacher checkpoint from a
        regular tiny training run, student = --tpu-decoder."""
        from camradepth_tpu import cli
        from camradepth_tpu.train.trainer import Trainer
        from camradepth_tpu.utils import checkpoint as ckpt_util

        t_cfg = _loader_cfg(_tiny_cfg(), synth, tmp_path / "teacher")
        tr = Trainer(t_cfg)
        tr.train()
        ck = ckpt_util.best_checkpoint(tr.run_dir)
        assert ck is not None
        rc = cli.main([
            "distill",
            "--teacher-checkpoint", str(ck),
            "--tpu-decoder",
            "--split", synth,
            "--train-val-split", "4,2",
            "--batch-size", "2",
            "--num-epochs", "1",
            "--alpha", "0.8",
            "--save-model",
            "--output-dir", str(tmp_path / "distill_out"),
            "--set", "model.img_size=64,128",
            "--set", "data.image_dimension=64,128",
            "--set", "model.dims=16,32,32,64",
            "--set", "model.depths=1,1,1,1",
            "--set", "model.ff_expansion=2,2,2,2",
            "--set", "model.mid_channels=32",
            "--set", "model.groupnorm_divisor=16",
            "--set", "model.compute_dtype=float32",
            "--set", "model.use_pallas_attention=false",
            "--set", "model.dropout_rate=0.0",
            "--set", "model.drop_path_rate=0.0",
            "--set", "train.desired_batch_size=2",
            "--set", "data.num_workers=2",
        ])
        assert rc == 0
        runs = list((tmp_path / "distill_out").rglob("ckpt_epoch_*"))
        assert runs, "distilled checkpoint not saved"
