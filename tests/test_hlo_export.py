"""StableHLO serving artifacts (interop/hlo_export.py).

The reference's only deployment artifact is a .pth that needs the full
source tree (runner.py re-instantiates the model class around the state
dict); these tests pin the TPU-native addition: a self-contained
compiled artifact that serves without model code, config, or weights —
and bit-matches the live engine it was exported from.
"""

import contextlib
import dataclasses
import io
import json
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.interop import hlo_export as hx
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.serving import DepthEngine


def _model_and_params(cfg):
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    return model, params


class TestArtifactRoundtrip:
    def test_matches_live_engine(self, tmp_path):
        """Export -> reload -> serve must produce the SAME outputs as
        the live jitted engine: same XLA program, params baked in as
        constants."""
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        path = tmp_path / "tiny.stablehlo"
        header = hx.export_serving_artifact(
            cfg, model, params, str(path), batch_size=2,
            platforms=("cpu",),
        )
        assert header["batch_size"] == 2
        assert header["img_size"] == list(cfg.model.img_size)

        eng = hx.artifact_engine(str(path), cfg)
        live = DepthEngine(cfg, model, params, batch_size=2)
        h, w = cfg.model.img_size
        x = np.random.default_rng(0).standard_normal(
            (2, h, w, cfg.model.input_channels)
        ).astype(np.float32)
        got = eng.infer_batch(x)
        want = live.infer_batch(x)
        np.testing.assert_allclose(got["depth"], want["depth"],
                                   rtol=1e-6, atol=1e-6)
        if "seg" in want:
            np.testing.assert_array_equal(got["seg"], want["seg"])
        # depth is decoded to metric meters by the baked-in forward
        assert got["depth"].min() >= 0.0
        assert got["depth"].max() <= cfg.data.max_depth

    def test_self_contained_no_config(self, tmp_path):
        """The artifact serves with cfg=None — geometry and decode
        semantics come from the committed header, not Python state."""
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        path = tmp_path / "tiny.stablehlo"
        hx.export_serving_artifact(cfg, model, params, str(path),
                                   batch_size=2, platforms=("cpu",))
        eng = hx.artifact_engine(str(path))
        h, w = cfg.model.img_size
        x = np.zeros((1, h, w, cfg.model.input_channels), np.float32)
        out = eng.infer_batch(x)  # tail-pads 1 -> 2 internally
        assert out["depth"].shape == (1, h, w)

    def test_multi_platform_serialization(self, tmp_path):
        """platforms=('cpu','tpu') lowers for BOTH targets from this
        CPU-only host (deploy-anywhere is the point of the format);
        the cpu lowering stays executable."""
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        path = tmp_path / "xplat.stablehlo"
        header = hx.export_serving_artifact(
            cfg, model, params, str(path), batch_size=1,
            platforms=("cpu", "tpu"),
        )
        assert header["platforms"] == ["cpu", "tpu"]
        eng = hx.artifact_engine(str(path), cfg)
        h, w = cfg.model.img_size
        out = eng.infer_batch(
            np.zeros((1, h, w, cfg.model.input_channels), np.float32)
        )
        assert np.isfinite(out["depth"]).all()


class TestDynamicBatch:
    def test_dynamic_artifact_serves_any_batch(self, tmp_path):
        """--dynamic-batch exports a symbolic batch dimension: one
        artifact serves batch 1 AND 3 (runtime compiles per concrete
        shape), matching the live engine bit-for-bit."""
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        path = tmp_path / "dyn.stablehlo"
        header = hx.export_serving_artifact(
            cfg, model, params, str(path), platforms=("cpu",),
            dynamic_batch=True,
        )
        assert header["batch_size"] is None
        h, w = cfg.model.img_size
        x = np.random.default_rng(4).standard_normal(
            (5, h, w, cfg.model.input_channels)
        ).astype(np.float32)
        live = DepthEngine(cfg, model, params, batch_size=5)
        want = live.infer_batch(x)
        for bs in (1, 3):
            eng = hx.artifact_engine(str(path), cfg, batch_size=bs)
            assert eng.batch_size == bs
            got = [r["depth"] for r in eng.infer_stream(iter(x))]
            np.testing.assert_allclose(
                np.stack(got), want["depth"], rtol=1e-6, atol=1e-6
            )


class TestArtifactDtype:
    def test_bf16_halves_size_and_matches_on_bf16_compute(self, tmp_path):
        """On a bfloat16-compute config (the flagship default) baking
        bf16 weights is numerically FREE: apply casts fp32 params to
        bf16 at use anyway, so pre-rounding is a no-op — and the
        artifact roughly halves (params dominate the blob)."""
        cfg = tiny_test_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model,
                                      compute_dtype="bfloat16")
        )
        model, params = _model_and_params(cfg)
        f32 = tmp_path / "f32.stablehlo"
        bf16 = tmp_path / "bf16.stablehlo"
        hx.export_serving_artifact(cfg, model, params, str(f32),
                                   batch_size=1, platforms=("cpu",))
        header = hx.export_serving_artifact(
            cfg, model, params, str(bf16), batch_size=1,
            platforms=("cpu",), artifact_dtype="bfloat16",
        )
        assert header["artifact_dtype"] == "bfloat16"
        assert bf16.stat().st_size < 0.65 * f32.stat().st_size
        h, w = cfg.model.img_size
        x = np.random.default_rng(2).standard_normal(
            (1, h, w, cfg.model.input_channels)
        ).astype(np.float32)
        a = hx.artifact_engine(str(f32)).infer_batch(x)
        b = hx.artifact_engine(str(bf16)).infer_batch(x)
        np.testing.assert_array_equal(a["depth"], b["depth"])

    def test_bf16_within_bf16_resolution_on_f32_compute(self, tmp_path):
        cfg = tiny_test_config()  # compute_dtype=float32
        model, params = _model_and_params(cfg)
        f32 = tmp_path / "f32.stablehlo"
        bf16 = tmp_path / "bf16.stablehlo"
        hx.export_serving_artifact(cfg, model, params, str(f32),
                                   batch_size=1, platforms=("cpu",))
        hx.export_serving_artifact(cfg, model, params, str(bf16),
                                   batch_size=1, platforms=("cpu",),
                                   artifact_dtype="bfloat16")
        h, w = cfg.model.img_size
        x = np.random.default_rng(3).standard_normal(
            (1, h, w, cfg.model.input_channels)
        ).astype(np.float32)
        a = hx.artifact_engine(str(f32)).infer_batch(x)
        b = hx.artifact_engine(str(bf16)).infer_batch(x)
        # depth is in meters (0..max_depth); weight rounding is bf16-
        # resolution, compounded through ~10 layers
        assert np.max(np.abs(a["depth"] - b["depth"])) < 1.0

    def test_bad_dtype_rejected(self, tmp_path):
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        with pytest.raises(ValueError, match="artifact_dtype"):
            hx.export_serving_artifact(
                cfg, model, params, str(tmp_path / "x.stablehlo"),
                artifact_dtype="float16",
            )


class TestTpuDecoderDeployment:
    """The --tpu-decoder architecture variant has NO reference .pth
    representation (cli export refuses it); the StableHLO artifact is
    its advertised deployment path — pin that the path actually works
    end to end."""

    def test_variant_artifact_matches_live_engine(self, tmp_path):
        cfg = tiny_test_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, tpu_decoder=True)
        )
        model, params = _model_and_params(cfg)
        path = tmp_path / "variant.stablehlo"
        header = hx.export_serving_artifact(
            cfg, model, params, str(path), batch_size=2,
            platforms=("cpu",),
        )
        assert header["tpu_decoder"] is True
        eng = hx.artifact_engine(str(path), cfg)
        live = DepthEngine(cfg, model, params, batch_size=2)
        h, w = cfg.model.img_size
        x = np.random.default_rng(1).standard_normal(
            (2, h, w, cfg.model.input_channels)
        ).astype(np.float32)
        got = eng.infer_batch(x)
        want = live.infer_batch(x)
        np.testing.assert_allclose(got["depth"], want["depth"],
                                   rtol=1e-6, atol=1e-6)

    def test_cli_refuses_pth_but_exports_stablehlo(self, tmp_path):
        from camradepth_tpu import cli
        from camradepth_tpu.utils import checkpoint as ck

        cfg = tiny_test_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, tpu_decoder=True)
        )
        model, params = _model_and_params(cfg)
        ckpt = ck.save_checkpoint(tmp_path / "ckpt", {"params": params},
                                  epoch=0, eval_loss=0.5)
        with mock.patch.object(cli, "_build_config", lambda a: cfg):
            err = io.StringIO()
            with contextlib.redirect_stderr(err):
                rc = cli.main([
                    "export", "--preset", "base",
                    "--checkpoint", str(ckpt),
                    "--out", str(tmp_path / "w.pth"),
                ])
            assert rc == 2
            assert "stablehlo" in err.getvalue()  # points at the fix

            art = tmp_path / "variant.stablehlo"
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = cli.main([
                    "export", "--preset", "base",
                    "--checkpoint", str(ckpt),
                    "--out", str(art), "--format", "stablehlo",
                    "--serve-batch", "1", "--platforms", "cpu",
                ])
            assert rc == 0, buf.getvalue()
        assert hx.is_artifact(str(art))
        eng = hx.artifact_engine(str(art))
        h, w = cfg.model.img_size
        out = eng.infer_batch(
            np.zeros((1, h, w, cfg.model.input_channels), np.float32)
        )
        assert out["depth"].shape == (1, h, w)
        assert np.isfinite(out["depth"]).all()


class TestArtifactValidation:
    def test_is_artifact(self, tmp_path):
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        art = tmp_path / "a.bin"  # magic sniffed even without suffix
        hx.export_serving_artifact(cfg, model, params, str(art),
                                   batch_size=1, platforms=("cpu",))
        assert hx.is_artifact(str(art))
        other = tmp_path / "weights.pth"
        other.write_bytes(b"\x80\x04 not an artifact")
        assert not hx.is_artifact(str(other))
        assert not hx.is_artifact(str(tmp_path / "missing.pth"))

    def test_corrupt_blob_rejected(self, tmp_path):
        """One flipped byte in the compiled program fails the header's
        sha256 at load — truncation/bit rot cannot silently serve."""
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        p = tmp_path / "a.stablehlo"
        hx.export_serving_artifact(cfg, model, params, str(p),
                                   batch_size=1, platforms=("cpu",))
        raw = bytearray(p.read_bytes())
        raw[-1] ^= 0xFF
        p.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="corrupt"):
            hx.load_serving_artifact(str(p))

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.stablehlo"
        p.write_bytes(b"JUNKJUNK" + b"\x00" * 64)
        with pytest.raises(ValueError, match="not a camradepth"):
            hx.load_serving_artifact(str(p))

    def test_geometry_mismatch_rejected(self, tmp_path):
        cfg = tiny_test_config()
        model, params = _model_and_params(cfg)
        path = tmp_path / "tiny.stablehlo"
        hx.export_serving_artifact(cfg, model, params, str(path),
                                   batch_size=1, platforms=("cpu",))
        wrong = cfg.replace(
            model=dataclasses.replace(cfg.model, img_size=(32, 64))
        )
        with pytest.raises(ValueError, match="geometry"):
            hx.artifact_engine(str(path), wrong)


def test_cli_test_evaluates_artifact(tmp_path):
    """`cli test --checkpoint model.stablehlo` = pre-ship validation of
    the EXACT compiled bits that will serve: the metric report must
    match the live-checkpoint report (the artifact's decoded depth is
    re-encoded into the reference's inverse metric space — affine, so
    only float roundoff separates the two paths)."""
    from camradepth_tpu import cli
    from camradepth_tpu.data import synthetic
    from camradepth_tpu.utils import checkpoint as ck

    cfg = tiny_test_config()
    split = synthetic.generate(tmp_path / "data", num_frames=6,
                               hw=cfg.model.img_size, seed=7)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            split_path=str(split),
            image_dimension=cfg.model.img_size,
            train_val_split=(2, 1),  # -> 3 test frames, batch 2 pads
            num_workers=1,
        )
    )
    model, params = _model_and_params(cfg)
    ckpt = ck.save_checkpoint(tmp_path / "ckpt", {"params": params},
                              epoch=0, eval_loss=0.5)
    art = tmp_path / "model.stablehlo"
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        rc = cli.main([
            "export", "--preset", "base", "--checkpoint", str(ckpt),
            "--out", str(art), "--format", "stablehlo",
            "--serve-batch", "2", "--platforms", "cpu",
        ])
        assert rc == 0

        live_json = tmp_path / "live.json"
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "test", "--preset", "base", "--checkpoint", str(ckpt),
                "--test-batch", "2",
                "--report-json", str(live_json),
            ])
        assert rc == 0, buf.getvalue()[-2000:]

        art_json = tmp_path / "art.json"
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "test", "--preset", "base", "--checkpoint", str(art),
                "--test-batch", "4",  # wrong on purpose: header wins
                "--report-json", str(art_json),
            ])
        out = buf.getvalue()
        assert rc == 0, out[-2000:]
        assert "artifact batch size is 2" in out
        assert "RMSE" in out

        live = json.loads(live_json.read_text())
        got = json.loads(art_json.read_text())
        assert got["frames"] == live["frames"] == 3.0
        from camradepth_tpu.evaluation.harness import TIMING_KEYS

        for k, v in live.items():
            if k in TIMING_KEYS:
                continue
            np.testing.assert_allclose(
                got[k], v, rtol=1e-4, atol=1e-5, equal_nan=True,
                err_msg=f"metric {k} diverged between live and artifact",
            )

        # geometry mismatch is a clean user error
        import sys

        wrong = cfg.replace(
            model=dataclasses.replace(cfg.model, img_size=(32, 64))
        )
        with mock.patch.object(cli, "_build_config", lambda a: wrong):
            err = io.StringIO()
            with contextlib.redirect_stderr(err):
                rc = cli.main([
                    "test", "--preset", "base",
                    "--checkpoint", str(art),
                ])
            assert rc == 2
            assert "geometry" in err.getvalue()


def test_cli_export_stablehlo_then_serve(tmp_path):
    """Product path end-to-end: `export --format stablehlo` from an
    Orbax checkpoint, then `serve --checkpoint <artifact>` streams the
    synthetic split through the compiled artifact."""
    from camradepth_tpu import cli
    from camradepth_tpu.data import synthetic
    from camradepth_tpu.utils import checkpoint as ck

    cfg = tiny_test_config()
    split = synthetic.generate(tmp_path / "data", num_frames=4,
                               hw=cfg.model.img_size, seed=3)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            split_path=str(split),
            image_dimension=cfg.model.img_size,
            train_val_split=(2, 1),
            num_workers=1,
        )
    )
    model, params = _model_and_params(cfg)
    ckpt_path = ck.save_checkpoint(tmp_path / "ckpt", {"params": params},
                                   epoch=0, eval_loss=0.5)
    art = tmp_path / "model.stablehlo"
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "export", "--preset", "base",
                "--checkpoint", str(ckpt_path),
                "--out", str(art), "--format", "stablehlo",
                "--serve-batch", "2", "--platforms", "cpu",
            ])
        assert rc == 0, buf.getvalue()
        assert "StableHLO" in buf.getvalue()

        out = tmp_path / "served"
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "serve", "--preset", "base",
                "--checkpoint", str(art),
                "--out", str(out), "--serve-batch", "2", "--limit", "1",
            ])
        assert rc == 0, buf.getvalue()
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["frames"] == 1
        d = np.load(out / "00000_depth.npy")
        assert d.shape == cfg.model.img_size
        assert np.isfinite(d).all()

        # artifacts have their partitioning fixed at export time: mesh
        # flags must fail as a clean user error, not a traceback
        import sys

        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = cli.main([
                "serve", "--preset", "base",
                "--checkpoint", str(art),
                "--out", str(out), "--data-parallel", "2",
            ])
        assert rc == 2
        assert "fixed at export time" in err.getvalue()
