"""Evaluation harness end-to-end on synthetic data: report keys,
rain/sunny split, nanmean aggregation, formatting."""

import numpy as np
import jax

from camradepth_tpu.config import DataConfig, tiny_test_config
from camradepth_tpu.data import synthetic
from camradepth_tpu.data.pipeline import make_loaders
from camradepth_tpu.evaluation.harness import (TIMING_KEYS, evaluate,
                                               format_report)
from camradepth_tpu.models.camradepth import CamRaDepth


class TestEvaluate:
    def test_full_report(self, tmp_path):
        split = synthetic.generate(tmp_path, num_frames=6, hw=(64, 128),
                                   seed=4, rain_every=3)
        cfg = tiny_test_config().replace(
            data=DataConfig(image_dimension=(64, 128),
                            split_path=str(split),
                            train_val_split=(0, 0), num_workers=2)
        )
        model = CamRaDepth(cfg.model)
        import jax.numpy as jnp

        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 128, 7)), deterministic=True,
        )["params"]
        loaders = make_loaders(cfg.data, batch_size=4)
        report = evaluate(cfg, model, params, loaders["test"])
        # the background-prefetch input path must be observationally
        # identical to inline loading (metric keys are means of the
        # same per-frame rows in the same order)
        inline = evaluate(cfg, model, params,
                          make_loaders(cfg.data, batch_size=4)["test"],
                          prefetch=0)
        for k, v in report.items():
            if k not in TIMING_KEYS:
                np.testing.assert_array_equal(v, inline[k], err_msg=k)
        for key in ("rmse_100", "mae_100", "rel_100", "rmse_50", "mae_50",
                    "rel_50", "rmse_edge", "rmse_sunny", "frames",
                    "true_rmse_50", "true_rmse_70", "true_rmse_80",
                    "frames_per_sec_end_to_end"):
            assert key in report, key
        assert report["frames"] == 6
        assert np.isfinite(report["rmse_100"])
        # rain frames exist in the synthetic split -> edge defined
        assert np.isfinite(report["rmse_edge"])
        text = format_report(cfg, report)
        assert "max depth 100" in text and "north star" in text

    def test_format_report_reference_structure(self):
        """Mirror runner.py:494-519: mean inference time opens BOTH cap
        blocks (:501,:516); IoU appears once, under the first cap only
        (:507-509), before the second block starts."""
        cfg = tiny_test_config()
        report = {
            f"{m}_{c}": 1.0
            for m in ("rmse", "mae", "rel")
            for c in (100, 50)
        }
        report.update(
            rmse_edge=1.0, rmse_sunny=1.0, frames=6.0, iou=0.5,
            time_per_frame_s=0.01, wall_s=0.06,
            frames_per_sec_end_to_end=100.0,
        )
        text = format_report(cfg, report)
        assert text.count("inference time:") == 2
        assert text.count("IoU") == 1
        assert text.index("IoU") < text.index("max depth 50")
