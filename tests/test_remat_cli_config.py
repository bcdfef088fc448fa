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

    def test_async_checkpoint_flag(self):
        args = self._args(["--preset", "base"])
        args.async_checkpoint = True
        assert _build_config(args).train.async_checkpoint
        args.async_checkpoint = False
        assert not _build_config(args).train.async_checkpoint

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


class TestSetOverrides:
    """--set SECTION.FIELD=VALUE dotted overrides (config.apply_overrides):
    every reference argparse option without a dedicated CLI flag is
    reachable this way (docs/MIGRATION.md maps args.py:11-66 line by
    line)."""

    def _cfg(self, sets, extra=()):
        import argparse

        from camradepth_tpu import cli

        parser = argparse.ArgumentParser()
        sub = parser.add_subparsers(dest="command")
        p = sub.add_parser("train")
        cli._add_common_model_flags(p)
        argv = ["train", *extra]
        for s in sets:
            argv += ["--set", s]
        return _build_config(parser.parse_args(argv))

    def test_int_float_bool_str_fields(self):
        cfg = self._cfg([
            "train.early_stopping_thresh=10",
            "train.weight_decay=0.01",
            "data.native_assemble=false",
            "train.arch_name=MyRun",
            "data.num_workers=4",
        ])
        assert cfg.train.early_stopping_thresh == 10
        assert cfg.train.weight_decay == 0.01
        assert cfg.data.native_assemble is False
        assert cfg.train.arch_name == "MyRun"
        assert cfg.data.num_workers == 4

    def test_tuple_and_none_fields(self):
        cfg = self._cfg([
            "data.max_distances=80,50",
            "data.train_val_split=6,2",
            "train.num_steps=none",
            "train.loss_weights=1,1,1,0.5,0.5",
        ])
        assert cfg.data.max_distances == (80.0, 50.0)
        assert cfg.data.train_val_split == (6, 2)
        assert cfg.train.num_steps is None
        assert cfg.train.loss_weights == (1, 1, 1, 0.5, 0.5)

    def test_applies_after_dedicated_flags(self):
        cfg = self._cfg(["train.learning_rate=3e-4"],
                        extra=["--learning-rate", "1e-4"])
        assert cfg.train.learning_rate == 3e-4

    def test_unknown_field_and_section_raise(self):
        import pytest

        with pytest.raises(ValueError, match="unknown field"):
            self._cfg(["train.not_a_field=1"])
        with pytest.raises(ValueError, match="unknown config section"):
            self._cfg(["optim.lr=1"])
        with pytest.raises(ValueError, match="section.field=value"):
            self._cfg(["train.learning_rate"])

    def test_post_init_invariants_still_run(self):
        import pytest

        # desired_batch_size must stay a multiple of batch_size
        with pytest.raises(ValueError, match="multiple"):
            self._cfg(["train.batch_size=4"])  # desired stays 6

    def test_mesh_and_name(self):
        cfg = self._cfg(["mesh.spatial_parallel=2", "name=exp42"])
        assert cfg.mesh.spatial_parallel == 2
        assert cfg.name == "exp42"

    def test_internal_valueerror_propagates(self, monkeypatch):
        """main() converts only UserError (bad flags/config) to a clean
        exit 2; an internal ValueError raised deep inside a command must
        surface with its traceback — a blanket catch would make field
        failures (numpy/JAX shape errors hours into a train run)
        indistinguishable from a typoed --set flag."""
        import pytest

        from camradepth_tpu import cli

        def boom(args):
            raise ValueError("internal shape mismatch")

        monkeypatch.setattr(cli, "cmd_summary", boom)
        with pytest.raises(ValueError, match="internal shape mismatch"):
            cli.main(["summary", "--preset", "base"])


class TestPrepSegRemapValidation:
    """`prep --seg X --seg-remap Y` label-space compatibility: the
    jax-panoptic estimator emits cityscapes trainIds; feeding those
    through the mseg-universal LUTs (the 'merged'/'vehicle' remaps)
    would write wrong-but-valid-looking artifacts with no error, so the
    CLI must refuse the combination up front (before the devkit
    import, so the error is reachable without nuscenes installed)."""

    def _prep(self, *extra):
        return cli_main(
            ["prep", "--data-root", "/nonexistent", "--out",
             "/tmp/never-used"] + list(extra)
        )

    def test_jax_panoptic_default_remap_refused(self, capsys):
        rc = self._prep("--seg", "jax-panoptic", "--seg-ckpt", "x.pth")
        assert rc == 2
        err = capsys.readouterr().err
        assert "cityscapes trainIds" in err and "--seg-remap" in err

    def test_torchscript_cityscapes_remap_refused(self, capsys):
        rc = self._prep("--seg", "torchscript", "--seg-ckpt", "x.ts",
                        "--seg-remap", "cityscapes")
        assert rc == 2
        assert "mseg-universal" in capsys.readouterr().err

    def test_valid_combo_reaches_devkit_gate(self, capsys):
        # valid label-space pairing passes validation; in this devkit-
        # free environment prep then stops at the nuscenes import with
        # its own message — proving validation did not fire.
        rc = self._prep("--seg", "jax-panoptic", "--seg-ckpt", "x.pth",
                        "--seg-remap", "vehicle_cityscapes")
        assert rc == 2
        err = capsys.readouterr().err
        assert "nuscenes-devkit" in err
        assert "--seg-remap" not in err


class TestSummaryCommand:
    """cli summary: shape-only param/FLOPs report (reference torchinfo
    smoke block, CamRaDepth.py:179-180, as a product subcommand)."""

    def test_summary_tiny_via_set_overrides(self, capsys):
        rc = cli_main([
            "summary",
            "--set", "model.img_size=64,128",
            "--set", "data.image_dimension=64,128",
            "--set", "model.depths=1,1,1,1",
            "--set", "model.dims=16,32,32,64",
            "--set", "model.ff_expansion=2,2,2,2",
            "--set", "model.mid_channels=32",
            "--summary-batch", "2",
        ])
        out = capsys.readouterr().out
        assert rc == 0
        assert "TOTAL" in out and "dest_encoder" in out
        assert "matmul GFLOPs/frame" in out
        # param count parses and is positive
        total = int(out.split("TOTAL")[1].split("(")[0].strip()
                    .replace(",", ""))
        assert total > 10_000

    def test_summary_tpu_decoder_flagged(self, capsys):
        rc = cli_main([
            "summary", "--tpu-decoder",
            "--set", "model.img_size=64,128",
            "--set", "model.depths=1,1,1,1",
            "--set", "model.dims=16,32,32,64",
            "--set", "model.ff_expansion=2,2,2,2",
            "--set", "model.mid_channels=32",
        ])
        out = capsys.readouterr().out
        assert rc == 0
        assert "[tpu_decoder]" in out


class TestDoctorCommand:
    """cli doctor: bounded environment health report. Under the test env
    (JAX_PLATFORMS=cpu) the probe subprocess must force the cpu backend
    past the axon sitecustomize — the same landmine the dryrun defuses."""

    def test_doctor_cpu_backend(self, capsys):
        rc = cli_main(["doctor", "--timeout", "240"])
        out = capsys.readouterr().out
        assert "backend: cpu" in out, out
        assert "native C++ kernels" in out
        assert "compile cache" in out
        assert rc == 0
