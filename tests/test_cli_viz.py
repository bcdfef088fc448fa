"""CLI + visualization tests: drive train -> test -> viz through the CLI
surface on synthetic data."""

import subprocess
import sys

import numpy as np
import pytest

import cv2

from camradepth_tpu import cli
from camradepth_tpu.config import DataConfig, tiny_test_config
from camradepth_tpu.data import synthetic
from camradepth_tpu.data.pipeline import make_loaders
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu import viz


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("prepared")
    return str(synthetic.generate(d, num_frames=6, hw=(64, 128), seed=2))


class TestViz:
    def test_colorize_and_collage(self):
        depth = np.random.default_rng(0).uniform(0, 1, (32, 64))
        img = viz.colorize_depth(depth)
        assert img.shape == (32, 64, 3) and img.dtype == np.uint8
        seg = np.random.default_rng(1).integers(0, 21, (32, 64))
        seg_img = viz.colorize_seg(seg)
        assert seg_img.shape == (32, 64, 3)
        panels = {"a": img, "b": seg_img, "c": img, "d": img}
        c = viz.collage(panels, cols=2)
        assert c.shape == (64, 128, 3)

    def test_run_visualization(self, synth, tmp_path):
        import jax

        cfg = tiny_test_config().replace(
            data=DataConfig(image_dimension=(64, 128), split_path=synth,
                            train_val_split=(4, 0), num_workers=2)
        )
        model = CamRaDepth(cfg.model)
        loaders = make_loaders(cfg.data, batch_size=2)
        import jax.numpy as jnp

        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 128, 7)), deterministic=True,
        )["params"]
        out = tmp_path / "viz"
        n = viz.run_visualization(cfg, model, params, loaders["test"], out,
                                  num_frames=2)
        assert n == 2
        pngs = list(out.glob("*.png"))
        assert len(pngs) == 2
        im = cv2.imread(str(pngs[0]))
        assert im is not None and im.size > 0


    def test_cli_viz_from_stablehlo_artifact(self, synth, tmp_path):
        """cli viz accepts the deployment artifact like serve/test do;
        the artifact's decoded metric depth is re-encoded to the [0,1]
        collage space."""
        import contextlib
        import io
        import unittest.mock as mock

        import jax
        import jax.numpy as jnp

        from camradepth_tpu.interop.hlo_export import (
            export_serving_artifact,
        )
        from camradepth_tpu.utils import checkpoint as ck

        cfg = tiny_test_config().replace(
            data=DataConfig(image_dimension=(64, 128), split_path=synth,
                            train_val_split=(4, 0), num_workers=2)
        )
        model = CamRaDepth(cfg.model)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 128, 7)), deterministic=True,
        )["params"]
        art = tmp_path / "model.stablehlo"
        export_serving_artifact(cfg, model, params, str(art),
                                batch_size=2, platforms=("cpu",))
        out = tmp_path / "viz_art"
        with mock.patch.object(cli, "_build_config", lambda a: cfg):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = cli.main([
                    "viz", "--preset", "base",
                    "--checkpoint", str(art),
                    "--out", str(out), "--num-vis", "2",
                ])
        assert rc == 0, buf.getvalue()
        pngs = list(out.glob("*.png"))
        assert len(pngs) == 2
        im = cv2.imread(str(pngs[0]))
        assert im is not None and im.size > 0


class TestCLI:
    def test_help_and_unknown(self):
        with pytest.raises(SystemExit):
            cli.main(["--help"])
        with pytest.raises(SystemExit):
            cli.main(["bogus"])

    def test_test_requires_checkpoint(self, synth):
        rc = cli.main(["test", "--split", synth])
        assert rc == 2

    def test_prep_without_devkit_errors_cleanly(self, tmp_path):
        rc = cli.main([
            "prep", "--data-root", str(tmp_path), "--out", str(tmp_path),
        ])
        assert rc == 2  # devkit absent in this environment
