"""Compact wire-format tests (data/wire.py).

The codec replaces the dense f32 feature stack on the loader->device
boundary (uint8 image + sparse COO radar/GT, decoded inside the jitted
step). Its contract is BIT-exactness: a decoded wire batch must equal
the dense assemble_frame stack value-for-value, because every
downstream golden/metric was pinned on the dense path. These tests pin
that, the plan/overflow machinery, and the Trainer integration.
"""

import dataclasses

import numpy as np
import pytest

from camradepth_tpu.config import DataConfig, TrainConfig, tiny_test_config
from camradepth_tpu.data import channels as ch
from camradepth_tpu.data import synthetic, wire
from camradepth_tpu.data.pipeline import load_frame_arrays, make_loaders
from camradepth_tpu.data.split import load_split


def _frame_arrays(rng, h=32, w=48, radar_pts=40, gt_fill=0.05):
    """Hand-built artifact arrays with the adversarial cases: negative
    radar depths (clip to 0 but still 'a point'), points where only the
    uv/vel channel is nonzero, GT beyond max_depth."""
    image = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    radar = np.zeros((h, w, 3), np.float32)
    ys = rng.integers(0, h, radar_pts)
    xs = rng.integers(0, w, radar_pts)
    radar[ys, xs, 0] = rng.uniform(-5, 120, radar_pts)  # negatives clip
    radar[ys, xs, 1] = rng.normal(0, 1, radar_pts)
    radar[ys, xs, 2] = rng.normal(0, 1, radar_pts)
    # a pixel where ONLY uv is nonzero (depth exactly 0)
    radar[0, 0] = (0.0, 0.37, -0.21)
    rad_vel = np.zeros((h, w), np.float32)
    rad_vel[ys[: radar_pts // 2], xs[: radar_pts // 2]] = 1.0
    rad_vel[1, 1] = 1.0  # vel-only point
    gt = np.zeros((h, w, 3), np.float32)
    m = rng.random((h, w)) < gt_fill
    gt[..., 0][m] = rng.uniform(0.5, 120, int(m.sum()))
    mseg = rng.integers(0, 21, (h + 6, w)).astype(np.int64)
    mseg[0] = 255
    radar_filtered = np.zeros((h, w), np.float32)
    radar_filtered[ys, xs] = rng.uniform(0, 120, radar_pts)
    return {
        "image": image, "radar": radar, "rad_vel": rad_vel, "gt": gt,
        "mseg": mseg, "radar_filtered": radar_filtered,
    }


def _decode_np(example):
    """Run the on-device decode (jitted, CPU backend) -> numpy dict."""
    import jax

    dec = jax.jit(wire.decode_wire_micro)(
        {k: np.asarray(v) for k, v in example.items()}
    )
    return {k: np.asarray(v) for k, v in dec.items()}


class TestCodecBitExact:
    @pytest.mark.parametrize("filtered", [False, True])
    def test_single_frame_matches_dense(self, filtered):
        rng = np.random.default_rng(3)
        arrays = _frame_arrays(rng)
        cfg = DataConfig(image_dimension=(32, 48), filtered_radar=filtered)
        dense = ch.assemble_frame(arrays, cfg)

        n_ch = 1 if filtered else 4  # depth + uv + rad_vel
        plan = wire.WirePlan(radar_cap=256, gt_cap=256, n_radar_ch=n_ch)
        enc = wire.encode_frame_wire(arrays, cfg, plan)
        assert enc["image_u8"].dtype == np.uint8
        assert enc["seg"].dtype == np.uint8
        dec = _decode_np(enc)

        assert dec["features"].dtype == np.float32
        np.testing.assert_array_equal(dec["features"], dense["features"])
        np.testing.assert_array_equal(dec["gt_depth"], dense["gt_depth"])
        np.testing.assert_array_equal(dec["seg"], dense["seg"])
        np.testing.assert_array_equal(dec["seg_inter"], dense["seg_inter"])
        assert dec["seg"].dtype == np.int32

    def test_batched_decode_matches_dense(self):
        rng = np.random.default_rng(5)
        cfg = DataConfig(image_dimension=(32, 48))
        plan = wire.WirePlan(radar_cap=256, gt_cap=0, n_radar_ch=4)
        frames = [_frame_arrays(rng) for _ in range(3)]
        encs = [wire.encode_frame_wire(a, cfg, plan) for a in frames]
        batch = {k: np.stack([e[k] for e in encs]) for k in encs[0]}
        assert "gt_depth" in batch and "gt_idx" not in batch  # dense GT
        dec = _decode_np(batch)
        for i, a in enumerate(frames):
            dense = ch.assemble_frame(a, cfg)
            np.testing.assert_array_equal(dec["features"][i],
                                          dense["features"])
            np.testing.assert_array_equal(dec["gt_depth"][i],
                                          dense["gt_depth"])

    def test_overflow_raises_with_cap_in_message(self):
        rng = np.random.default_rng(7)
        arrays = _frame_arrays(rng, radar_pts=60)
        cfg = DataConfig(image_dimension=(32, 48))
        plan = wire.WirePlan(radar_cap=8, gt_cap=256, n_radar_ch=4)
        with pytest.raises(wire.WireOverflowError, match="wire cap 8"):
            wire.encode_frame_wire(arrays, cfg, plan)


class TestShipGating:
    """Round-5: seg label planes ride the wire only when the config
    reads them (wire.resolve_wire_ship) — the base preset paid ~0.42
    MB/frame of dead H2D weight for labels losses.py never touched."""

    @pytest.mark.parametrize("native", [False, True])
    def test_encode_omits_unshipped_planes(self, native):
        rng = np.random.default_rng(11)
        arrays = _frame_arrays(rng)
        cfg = DataConfig(image_dimension=(32, 48),
                         native_assemble=native)
        full = wire.encode_frame_wire(
            arrays, cfg,
            wire.WirePlan(radar_cap=256, gt_cap=256, n_radar_ch=4))
        bare = wire.encode_frame_wire(
            arrays, cfg,
            wire.WirePlan(radar_cap=256, gt_cap=256, n_radar_ch=4,
                          ship_seg=False, ship_seg_inter=False))
        assert "seg" not in bare and "seg_inter" not in bare
        # every shipped plane is byte-identical to the full encode
        for k in bare:
            np.testing.assert_array_equal(bare[k], full[k])
        # decode tolerates the absence and matches the dense features
        dense = ch.assemble_frame(arrays, cfg)
        dec = _decode_np(bare)
        assert "seg" not in dec and "seg_inter" not in dec
        np.testing.assert_array_equal(dec["features"], dense["features"])
        np.testing.assert_array_equal(dec["gt_depth"], dense["gt_depth"])

    def test_seg_only_final_plane(self):
        rng = np.random.default_rng(12)
        arrays = _frame_arrays(rng)
        cfg = DataConfig(image_dimension=(32, 48))
        enc = wire.encode_frame_wire(
            arrays, cfg,
            wire.WirePlan(radar_cap=256, gt_cap=256, n_radar_ch=4,
                          ship_seg=True, ship_seg_inter=False))
        assert "seg" in enc and "seg_inter" not in enc

    def test_resolver_narrows_per_config(self):
        from camradepth_tpu.config import preset

        base = preset("base")
        d = wire.resolve_wire_ship(base)
        assert not d.wire_ship_seg and not d.wire_ship_seg_inter
        seg = preset("sup_unsup_seg")
        d = wire.resolve_wire_ship(seg)
        assert d.wire_ship_seg and not d.wire_ship_seg_inter  # inter off
        seg_i = seg.replace(
            train=dataclasses.replace(seg.train, seg_inter_loss=True)
        )
        assert wire.resolve_wire_ship(seg_i).wire_ship_seg_inter
        # never widens: explicit False survives a supervised config
        seg_off = seg.replace(
            data=dataclasses.replace(seg.data, wire_ship_seg=False)
        )
        assert not wire.resolve_wire_ship(seg_off).wire_ship_seg

    def test_plan_carries_ship_flags(self, tmp_path):
        split = synthetic.generate(tmp_path / "d", num_frames=2,
                                   hw=(32, 64), seed=3)
        cfg = DataConfig(split_path=str(split), image_dimension=(32, 64),
                         wire_ship_seg=False, wire_ship_seg_inter=False)
        rows = load_split(split)
        plan = wire.plan_wire(rows, cfg)
        assert plan is not None
        assert not plan.ship_seg and not plan.ship_seg_inter
        enc = wire.encode_frame_wire(load_frame_arrays(rows[0], cfg),
                                     cfg, plan)
        assert "seg" not in enc


class TestPlan:
    def test_unsupported_configs_fall_back(self):
        assert not wire.wire_supported(
            DataConfig(image_dimension=(32, 48), sparse_lidar=True)
        )
        assert not wire.wire_supported(
            DataConfig(image_dimension=(32, 48), im_uv=True)
        )
        assert wire.wire_supported(DataConfig(image_dimension=(32, 48)))

    def test_plan_probes_split_and_caps(self, tmp_path):
        split = synthetic.generate(tmp_path, num_frames=4, hw=(64, 128),
                                   seed=0)
        rows = load_split(split)
        cfg = DataConfig(image_dimension=(64, 128), split_path=str(split))
        plan = wire.plan_wire(rows, cfg)
        assert plan is not None
        assert plan.n_radar_ch == 4
        arrays = load_frame_arrays(rows[0], cfg)
        mask = (np.asarray(arrays["radar"]) != 0).any(-1)
        mask |= np.asarray(arrays["rad_vel"]) != 0
        assert plan.radar_cap >= mask.sum()
        # synthetic GT is ~25% dense: sparse COO would not beat dense
        # f32 bytes at this geometry, so the plan ships GT dense
        assert plan.gt_cap == 0

    def test_dense_radar_rejects_plan(self, tmp_path):
        """A 'radar' denser than the wire's break-even point -> None."""
        split = synthetic.generate(tmp_path, num_frames=2, hw=(64, 128),
                                   seed=0)
        rows = load_split(split)
        cfg = DataConfig(image_dimension=(64, 128), split_path=str(split),
                         wire_radar_cap=64 * 128)
        assert wire.plan_wire(rows, cfg) is None


class TestLoaderIntegration:
    def test_wire_loader_batches_decode_to_dense_batches(self, tmp_path):
        split = synthetic.generate(tmp_path, num_frames=6, hw=(64, 128),
                                   seed=2)
        cfg = DataConfig(image_dimension=(64, 128), split_path=str(split),
                         train_val_split=(4, 1), num_workers=2)
        lw = make_loaders(cfg, batch_size=2, seed=11, wire=True)
        ld = make_loaders(cfg, batch_size=2, seed=11, wire=False)
        for bw, bd in zip(lw["train"], ld["train"]):
            assert "image_u8" in bw and "features" not in bw
            np.testing.assert_array_equal(bw["index"], bd["index"])
            dec = _decode_np(
                {k: v for k, v in bw.items()
                 if k in wire.WIRE_KEYS + ("seg", "seg_inter", "gt_depth")}
            )
            np.testing.assert_array_equal(dec["features"], bd["features"])
            np.testing.assert_array_equal(dec["gt_depth"], bd["gt_depth"])
            np.testing.assert_array_equal(dec["seg"], bd["seg"])
            np.testing.assert_array_equal(dec["seg_inter"],
                                          bd["seg_inter"])
        # val/test loaders stay dense (eval path consumes features)
        assert "features" in next(iter(lw["val"]))

    def test_wire_payload_is_smaller(self, tmp_path):
        split = synthetic.generate(tmp_path, num_frames=4, hw=(64, 128),
                                   seed=2)
        cfg = DataConfig(image_dimension=(64, 128), split_path=str(split),
                         train_val_split=(4, 0), num_workers=1)
        lw = make_loaders(cfg, batch_size=2, seed=1, wire=True)
        ld = make_loaders(cfg, batch_size=2, seed=1, wire=False)
        nb_w = sum(v.nbytes for v in next(iter(lw["train"])).values())
        nb_d = sum(v.nbytes for v in next(iter(ld["train"])).values())
        assert nb_w < 0.45 * nb_d  # the point of the codec


class TestTrainStepEquivalence:
    def test_one_train_step_wire_equals_dense(self, tmp_path):
        """Same frames, same rng: the wire step and the dense step must
        produce the same loss and the same updated params (the decode
        is bit-exact, so the grads are too)."""
        import jax

        from camradepth_tpu.models.camradepth import CamRaDepth
        from camradepth_tpu.train.diffgrad import diffgrad_norm
        from camradepth_tpu.train.step import init_state, make_train_step

        split = synthetic.generate(tmp_path, num_frames=4, hw=(64, 128),
                                   seed=4)
        cfg = tiny_test_config()
        cfg = cfg.replace(
            data=DataConfig(image_dimension=(64, 128),
                            split_path=str(split),
                            train_val_split=(4, 0), num_workers=2),
            train=dataclasses.replace(
                cfg.train, batch_size=2, pad_microbatch_to=3,
            ),
        )
        model = CamRaDepth(cfg.model)
        tx = diffgrad_norm(cfg.train.learning_rate)
        state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(cfg, model, tx))
        rng = jax.random.PRNGKey(42)

        def one_step(wire_on):
            loaders = make_loaders(cfg.data, 2, seed=5, wire=wire_on)
            it = iter(loaders["train"])
            mbs = [next(it), next(it)]
            keys = [k for k in mbs[0]
                    if k in ("features", "gt_depth", "seg", "seg_inter")
                    + wire.WIRE_KEYS]
            stack = {k: np.stack([m[k] for m in mbs]) for k in keys}
            new_state, metrics = step(state, stack, rng)
            return new_state, jax.device_get(metrics)

        s_w, m_w = one_step(True)
        s_d, m_d = one_step(False)
        np.testing.assert_allclose(m_w["loss"], m_d["loss"], rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s_w.params),
                        jax.tree.leaves(s_d.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)


class TestCLIConfig:
    def _args(self, argv):
        import argparse

        from camradepth_tpu import cli

        parser = argparse.ArgumentParser()
        sub = parser.add_subparsers(dest="command")
        p = sub.add_parser("train")
        cli._add_common_model_flags(p)
        return parser.parse_args(["train"] + argv)

    def test_wire_flag_plumbs_into_config(self):
        from camradepth_tpu.cli import _build_config

        assert _build_config(self._args([])).data.wire_format == "off"
        assert _build_config(
            self._args(["--wire", "on"])
        ).data.wire_format == "on"
        # --tpu-tuned implies wire auto; an explicit --wire wins
        assert _build_config(
            self._args(["--tpu-tuned"])
        ).data.wire_format == "auto"
        assert _build_config(
            self._args(["--tpu-tuned", "--wire", "off"])
        ).data.wire_format == "off"


class TestTrainerIntegration:
    def test_trainer_wire_on(self, tmp_path):
        split = synthetic.generate(tmp_path / "d", num_frames=6,
                                   hw=(64, 128), seed=6)
        cfg = tiny_test_config()
        cfg = cfg.replace(
            data=DataConfig(image_dimension=(64, 128),
                            split_path=str(split),
                            train_val_split=(4, 2), num_workers=2,
                            wire_format="on"),
            train=TrainConfig(batch_size=2, desired_batch_size=4,
                              num_steps=None, num_epochs=1,
                              output_dir=str(tmp_path / "out"),
                              save_model=False),
        )
        from camradepth_tpu.train.trainer import Trainer

        tr = Trainer(cfg)
        b = next(iter(tr.loaders["train"]))
        assert "image_u8" in b  # the wire loader actually engaged
        best = tr.train()
        assert np.isfinite(best)

    def test_wire_on_refused_under_sp_mesh(self, tmp_path):
        split = synthetic.generate(tmp_path / "d", num_frames=6,
                                   hw=(64, 128), seed=6)
        from camradepth_tpu.config import MeshConfig
        from camradepth_tpu.train.trainer import Trainer

        cfg = tiny_test_config()
        cfg = cfg.replace(
            data=DataConfig(image_dimension=(64, 128),
                            split_path=str(split),
                            train_val_split=(4, 2), num_workers=2,
                            wire_format="on"),
            mesh=MeshConfig(spatial_parallel=2),
        )
        with pytest.raises(ValueError, match="wire_format=on requires"):
            Trainer(cfg)


class TestEvalWire:
    """Wire inference path: val/test loaders ship compact wire batches
    (make_loaders wire_eval=True), the harness/eval steps decode on
    device — metric outputs must be IDENTICAL to the dense path (the
    decode is bit-exact and the metric math runs on the same values)."""

    def _model_and_cfg(self, tmp_path, n_frames=5):
        import jax
        import jax.numpy as jnp

        from camradepth_tpu.models.camradepth import CamRaDepth

        split = synthetic.generate(tmp_path / "d", num_frames=n_frames,
                                   hw=(64, 128), seed=9, rain_every=3)
        cfg = tiny_test_config()
        cfg = cfg.replace(
            data=DataConfig(image_dimension=(64, 128),
                            split_path=str(split),
                            train_val_split=(0, 2), num_workers=2),
        )
        model = CamRaDepth(cfg.model)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 128, 7)), deterministic=True,
        )["params"]
        return cfg, model, params

    def test_evaluate_wire_equals_dense(self, tmp_path):
        from camradepth_tpu.evaluation.harness import TIMING_KEYS, evaluate

        cfg, model, params = self._model_and_cfg(tmp_path)
        lw = make_loaders(cfg.data, batch_size=2, wire_eval=True)
        assert "image_u8" in next(iter(lw["test"]))  # wire engaged
        rw = evaluate(cfg, model, params, lw["test"])
        rd = evaluate(cfg, model, params,
                      make_loaders(cfg.data, batch_size=2)["test"])
        assert set(rw) == set(rd)
        for k, v in rd.items():
            if k not in TIMING_KEYS:
                np.testing.assert_array_equal(rw[k], v, err_msg=k)

    def test_eval_step_wire_equals_dense(self, tmp_path):
        """The Trainer's val pass (make_eval_step) must decode wire val
        batches to the same per-frame metrics as dense ones."""
        import jax

        from camradepth_tpu.train.step import make_eval_step

        cfg, model, params = self._model_and_cfg(tmp_path)
        step = jax.jit(make_eval_step(cfg, model))
        keys = ("features", "gt_depth", "seg", "seg_inter") + wire.WIRE_KEYS
        bw = {k: v for k, v in next(iter(
            make_loaders(cfg.data, 2, wire_eval=True)["val"]
        )).items() if k in keys}
        bd = {k: v for k, v in next(iter(
            make_loaders(cfg.data, 2)["val"]
        )).items() if k in keys}
        assert "image_u8" in bw and "features" in bd
        mw = jax.device_get(step(params, bw))
        md = jax.device_get(step(params, bd))
        assert set(mw) == set(md)
        for k in md:
            np.testing.assert_array_equal(mw[k], md[k], err_msg=k)


class TestAdviceR4Fixes:
    """Regression tests for the round-4 advisor findings."""

    @pytest.mark.parametrize("filtered", [False, True])
    @pytest.mark.parametrize("uv", [False, True])
    @pytest.mark.parametrize("vel", [False, True])
    def test_radar_channel_count_mirrors_sources(self, filtered, uv, vel):
        """radar_channel_count (cfg-only) must agree with the loaded-
        array _radar_sources list for every channel combination."""
        rng = np.random.default_rng(11)
        arrays = _frame_arrays(rng)
        cfg = DataConfig(image_dimension=(32, 48), filtered_radar=filtered,
                         sparse_depth_uv=uv, rad_vel=vel)
        assert wire.radar_channel_count(cfg) == len(
            wire._radar_sources(arrays, cfg))

    def test_serve_wire_rejects_rgb_only(self, capsys):
        """--set data.wire_radar_cap on an rgb preset must be a clear
        user error, not a degenerate 0-radar-channel wire engine."""
        from camradepth_tpu import cli

        rc = cli.main([
            "serve", "--preset", "base_rgb", "--checkpoint", "/nonexistent",
            "--http-port", "1", "--set", "data.wire_format=auto",
            "--set", "data.wire_radar_cap=64",
        ])
        assert rc == 2
        assert "no radar channels" in capsys.readouterr().err

    def test_serve_wire_rejects_channel_mismatch(self, capsys):
        """An inconsistent model/data pairing (input_channels says 2
        radar slots, DataConfig carries 4) must be rejected, not served
        with the wrong channel count."""
        from camradepth_tpu import cli

        rc = cli.main([
            "serve", "--preset", "base", "--checkpoint", "/nonexistent",
            "--http-port", "1", "--set", "data.wire_format=auto",
            "--set", "model.input_channels=5",
            "--set", "data.wire_radar_cap=64",
        ])
        assert rc == 2
        assert "channel mismatch" in capsys.readouterr().err

    def test_wire_on_unsupported_is_user_error(self, tmp_path):
        """make_loaders with wire_format=on on an unsupported channel
        config raises ConfigError — which cli.main treats as a user
        error (exit 2), not an internal traceback."""
        from camradepth_tpu.config import ConfigError

        split = synthetic.generate(tmp_path, num_frames=2, hw=(32, 48))
        cfg = DataConfig(
            image_dimension=(32, 48), wire_format="on", sparse_lidar=True,
            train_val_split=(1, 1),
        )
        with pytest.raises(ConfigError):
            make_loaders(cfg, batch_size=1, split_path=str(split), wire=True)
