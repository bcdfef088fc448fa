"""Remat-decoder equivalence + CLI config-building tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from camradepth_tpu.cli import _build_config, main as cli_main
from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth


class TestRemat:
    def test_forward_and_grads_identical(self):
        cfg = tiny_test_config().model
        m1 = CamRaDepth(cfg)
        m2 = CamRaDepth(dataclasses.replace(cfg, remat_decoder=True))
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 128, 7)),
            jnp.float32,
        )
        v = m1.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
        o1 = m1.apply(v, x, deterministic=True)["depth"]["final_depth"]
        o2 = m2.apply(v, x, deterministic=True)["depth"]["final_depth"]
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

        def loss(m, p):
            out = m.apply({"params": p}, x, deterministic=True)
            return jnp.mean(out["depth"]["final_depth"] ** 2)

        g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
        g2 = jax.grad(lambda p: loss(m2, p))(v["params"])
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCLIConfig:
    def _args(self, argv):
        import argparse

        # reuse the real parser by going through main's parser indirectly:
        # build a namespace the way cmd_* would see it
        from camradepth_tpu import cli

        parser = argparse.ArgumentParser()
        sub = parser.add_subparsers(dest="command")
        p = sub.add_parser("train")
        cli._add_common_model_flags(p)
        return parser.parse_args(["train"] + argv)

    def test_preset_and_overrides(self):
        args = self._args([
            "--preset", "sup_unsup_seg", "--batch-size", "4",
            "--learning-rate", "1e-4", "--num-epochs", "3",
            "--compute-dtype", "float32",
        ])
        cfg = _build_config(args)
        assert cfg.model.supervised_seg and cfg.model.unsupervised_seg
        assert cfg.train.batch_size == 4
        assert cfg.train.learning_rate == 1e-4
        assert cfg.train.num_epochs == 3
        assert cfg.train.num_steps is None  # epochs override step budget
        assert cfg.model.compute_dtype == "float32"

    def test_rgb_preset_channels(self):
        args = self._args(["--preset", "base_rgb"])
        cfg = _build_config(args)
        assert cfg.model.input_channels == 3

    def test_checkpoint_implies_load(self):
        args = self._args(["--checkpoint", "/x/y.pth"])
        cfg = _build_config(args)
        assert cfg.train.load_ckpt

    def test_max_distances_flag(self):
        args = self._args(["--max-distances", "80,40"])
        cfg = _build_config(args)
        assert cfg.data.max_distances == (80.0, 40.0)

    def test_tpu_decoder_flag(self):
        args = self._args(["--tpu-decoder"])
        cfg = _build_config(args)
        assert cfg.model.tpu_decoder
        assert not _build_config(self._args([])).model.tpu_decoder

    def test_export_refuses_tpu_decoder(self, capsys, tmp_path):
        # the TPU architecture variant has no reference .pth
        # representation; export must fail loudly, not write garbage keys
        rc = cli_main([
            "export", "--preset", "base", "--tpu-decoder",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--out", str(tmp_path / "out.pth"),
        ])
        assert rc == 2
        assert "tpu-decoder" in capsys.readouterr().err
        assert not (tmp_path / "out.pth").exists()
