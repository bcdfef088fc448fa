"""Serving engine tests: batching, padding, stream ordering, decode."""

import numpy as np
import jax
import jax.numpy as jnp

from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.serving import DepthEngine


def _engine(batch_size=4, decode=True):
    cfg = tiny_test_config()
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    return cfg, DepthEngine(cfg, model, params, batch_size=batch_size,
                            decode_depth=decode)


class TestDepthEngine:
    def test_batch_and_tail_padding(self):
        cfg, eng = _engine(batch_size=4)
        eng.warmup()
        h, w = cfg.model.img_size
        x = np.random.default_rng(0).standard_normal(
            (3, h, w, 7)
        ).astype(np.float32)
        out = eng.infer_batch(x)
        assert out["depth"].shape == (3, h, w)
        # decoded to meters
        assert out["depth"].min() >= 0.0
        assert out["depth"].max() <= cfg.data.max_depth

    def test_stream_order_and_count(self):
        cfg, eng = _engine(batch_size=4)
        eng.warmup()
        h, w = cfg.model.img_size
        rng = np.random.default_rng(1)
        frames = [rng.standard_normal((h, w, 7)).astype(np.float32)
                  for _ in range(10)]
        results = list(eng.infer_stream(iter(frames)))
        assert len(results) == 10
        # order preserved: re-running frame 0 alone gives the same depth
        single = eng.infer_batch(frames[0][None])
        np.testing.assert_allclose(
            results[0]["depth"], single["depth"][0], rtol=1e-5, atol=1e-5
        )
        stats = eng.stats()
        assert stats["frames"] >= 10
        assert stats["frames_per_sec"] > 0

    def test_stream_pipelining_exact(self):
        """The double-buffered stream (dispatch batch N+1 before
        materializing batch N) must yield EXACTLY the sequential
        results, for any in-flight window and a ragged tail."""
        cfg, eng = _engine(batch_size=4)
        eng.warmup()
        h, w = cfg.model.img_size
        rng = np.random.default_rng(2)
        frames = [rng.standard_normal((h, w, 7)).astype(np.float32)
                  for _ in range(7)]  # 4 + ragged 3
        want = []
        for i in range(0, 7, 4):
            out = eng.infer_batch(np.stack(frames[i:i + 4]))
            for j in range(out["depth"].shape[0]):
                want.append({k: v[j] for k, v in out.items()})
        for inflight in (1, 2, 3):
            got = list(eng.infer_stream(iter(frames), inflight=inflight))
            assert len(got) == 7
            for g, wnt in zip(got, want):
                assert g.keys() == wnt.keys()
                for k in g:
                    np.testing.assert_array_equal(g[k], wnt[k])


    def test_stream_accepts_prebatched_items(self):
        """Pre-batched [b, H, W, C] items (a loader's batches) stream
        through without the per-frame unpack/restack and yield the same
        results as per-frame feeding; ragged/mixed sizes re-chunk."""
        cfg, eng = _engine(batch_size=4)
        eng.warmup()
        h, w = cfg.model.img_size
        rng = np.random.default_rng(3)
        frames = [rng.standard_normal((h, w, 7)).astype(np.float32)
                  for _ in range(9)]
        want = list(eng.infer_stream(iter(frames)))
        # full batch, ragged batch, then single frames
        items = [np.stack(frames[0:4]), np.stack(frames[4:7]),
                 frames[7], frames[8]]
        got = list(eng.infer_stream(iter(items)))
        assert len(got) == 9
        for g, wnt in zip(got, want):
            for k in wnt:
                np.testing.assert_array_equal(g[k], wnt[k])

    def test_stream_rechunks_oversized_batch(self):
        """Items LARGER than the engine batch re-chunk row-wise instead
        of erroring (regression: a fixed-batch StableHLO artifact whose
        baked batch is smaller than the loader's crashed mid-stream)."""
        cfg, eng = _engine(batch_size=2)
        eng.warmup()
        h, w = cfg.model.img_size
        rng = np.random.default_rng(5)
        frames = [rng.standard_normal((h, w, 7)).astype(np.float32)
                  for _ in range(5)]
        want = list(eng.infer_stream(iter(frames)))
        got = list(eng.infer_stream(iter([np.stack(frames)])))
        assert len(got) == 5
        for g, wnt in zip(got, want):
            for k in wnt:
                np.testing.assert_array_equal(g[k], wnt[k])


def test_cli_serve_skips_padded_tail_frames(tmp_path):
    """Eval loaders pad ragged tail batches by duplicating the last
    frame; serve must not write those duplicates as extra outputs
    (regression: 3 test frames at batch 2 used to produce 4 files)."""
    import contextlib
    import dataclasses
    import io
    import json
    import unittest.mock as mock

    from camradepth_tpu import cli
    from camradepth_tpu.data import synthetic
    from camradepth_tpu.utils import checkpoint as ck

    cfg = tiny_test_config()
    split = synthetic.generate(tmp_path / "data", num_frames=6,
                               hw=cfg.model.img_size, seed=5)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            split_path=str(split),
            image_dimension=cfg.model.img_size,
            train_val_split=(2, 1),  # -> 3 test frames
            num_workers=1,
        )
    )
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    ckpt_path = ck.save_checkpoint(tmp_path / "ckpt", {"params": params},
                                   epoch=0, eval_loss=0.5)
    out = tmp_path / "served"
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main([
                "serve", "--preset", "base",
                "--checkpoint", str(ckpt_path),
                "--out", str(out), "--serve-batch", "2",
            ])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["frames"] == 3
    assert len(list(out.glob("*_depth.npy"))) == 3


def test_cli_serve_end_to_end(tmp_path):
    """`camradepth serve` streams a synthetic split through the engine
    and writes per-frame metric-depth artifacts + a stats JSON line."""
    import contextlib
    import dataclasses
    import io
    import json
    import unittest.mock as mock

    from camradepth_tpu import cli
    from camradepth_tpu.config import DataConfig
    from camradepth_tpu.data import synthetic
    from camradepth_tpu.utils import checkpoint as ck

    cfg = tiny_test_config()
    split = synthetic.generate(tmp_path / "data", num_frames=5,
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
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    ck_dir = tmp_path / "ckpt"
    ckpt_path = ck.save_checkpoint(ck_dir, {"params": params}, epoch=0, eval_loss=0.5)

    out = tmp_path / "served"
    argv = [
        "serve",
        "--preset", "base",
        "--checkpoint", str(ckpt_path),
        "--out", str(out),
        "--serve-batch", "2",
        "--limit", "2",
    ]
    with mock.patch.object(cli, "_build_config", lambda a: cfg):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(argv)
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["frames"] == 2
    d = np.load(out / "00000_depth.npy")
    assert d.shape == cfg.model.img_size
    assert np.isfinite(d).all()


def test_cli_serve_sharded_matches_single_device(tmp_path):
    """`camradepth serve --data-parallel 2 --spatial-parallel 2` runs the
    product path on a 2x2 virtual mesh and writes the SAME depth maps as
    the single-device serve (multi-chip serving is a CLI flag, not just
    an engine constructor argument)."""
    import contextlib
    import dataclasses
    import io
    import json
    import unittest.mock as mock

    from camradepth_tpu import cli
    from camradepth_tpu.data import synthetic
    from camradepth_tpu.utils import checkpoint as ck

    cfg = tiny_test_config()
    split = synthetic.generate(tmp_path / "data", num_frames=5,
                               hw=cfg.model.img_size, seed=4)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            split_path=str(split),
            image_dimension=cfg.model.img_size,
            train_val_split=(2, 1),
            num_workers=1,
        )
    )
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    ckpt_path = ck.save_checkpoint(tmp_path / "ckpt", {"params": params},
                                   epoch=0, eval_loss=0.5)

    outs = {}
    for tag, extra in (
        ("single", []),
        ("sharded", ["--data-parallel", "2", "--spatial-parallel", "2"]),
    ):
        out = tmp_path / f"served_{tag}"
        argv = [
            "serve", "--preset", "base",
            "--checkpoint", str(ckpt_path),
            "--out", str(out),
            "--serve-batch", "2", "--limit", "2", *extra,
        ]
        with mock.patch.object(cli, "_build_config", lambda a: cfg):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = cli.main(argv)
        assert rc == 0
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["frames"] == 2
        outs[tag] = np.stack(
            [np.load(out / f"{i:05d}_depth.npy") for i in range(2)]
        )
    np.testing.assert_allclose(
        outs["single"], outs["sharded"], rtol=1e-5, atol=1e-5
    )


def test_mesh_sharded_engine_matches_single_device():
    """Multi-chip serving: batch x spatial sharded engine reproduces the
    single-device engine bit-for-bit (GSPMD halo exchanges included)."""
    from jax.sharding import Mesh

    cfg, ref_engine = _engine(batch_size=2)
    ref_engine.warmup()
    h, w = cfg.model.img_size
    x = np.random.default_rng(7).standard_normal(
        (2, h, w, 7)
    ).astype(np.float32)
    ref = ref_engine.infer_batch(x)

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "sp"))
    from camradepth_tpu.serving import DepthEngine

    eng = DepthEngine(
        cfg, ref_engine.model, ref_engine.params, batch_size=2,
        mesh=mesh, spatial_axis="sp",
    )
    eng.warmup()
    out = eng.infer_batch(x)
    np.testing.assert_allclose(
        ref["depth"], out["depth"], atol=1e-5, rtol=1e-5
    )


def test_cli_serve_requires_checkpoint(capsys):
    """serve without --checkpoint must exit 2 with a clear message, not
    crash in load_engine (serving random weights is never intended)."""
    from camradepth_tpu import cli

    rc = cli.main(["serve", "--preset", "base"])
    assert rc == 2
    assert "--checkpoint" in capsys.readouterr().err


class TestWireEngine:
    """Compact wire serving: engines built with a WirePlan take
    {image_u8, radar_idx, radar_val} request dicts and must serve
    EXACTLY the dense engine's outputs (the on-device decode is
    bit-exact, tests/test_wire.py)."""

    def _loaders(self, tmp_path, bs=2, n=5):
        import dataclasses

        from camradepth_tpu.data import synthetic
        from camradepth_tpu.data.pipeline import make_loaders

        cfg = tiny_test_config()
        split = synthetic.generate(tmp_path / "data", num_frames=n,
                                   hw=cfg.model.img_size, seed=21)
        cfg = cfg.replace(
            data=dataclasses.replace(
                cfg.data, split_path=str(split),
                image_dimension=cfg.model.img_size,
                train_val_split=(0, 0), num_workers=1,
            )
        )
        lw = make_loaders(cfg.data, batch_size=bs, wire_eval=True)
        ld = make_loaders(cfg.data, batch_size=bs)
        return cfg, lw["test"], ld["test"]

    def test_wire_engine_matches_dense_engine(self, tmp_path):
        from camradepth_tpu.serving import SERVE_WIRE_KEYS, DepthEngine

        cfg, lw, ld = self._loaders(tmp_path)
        plan = lw.frames.wire_plan
        assert plan is not None
        model = CamRaDepth(cfg.model)
        h, w = cfg.model.img_size
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, h, w, cfg.model.input_channels)),
            deterministic=True,
        )["params"]
        dense = DepthEngine(cfg, model, params, batch_size=2)
        wired = DepthEngine(cfg, model, params, batch_size=2,
                            wire_plan=plan)

        def wire_items(per_frame=False):
            for b in lw:
                valid = np.asarray(b["valid"]).astype(bool)
                item = {k: np.asarray(b[k])[valid]
                        for k in SERVE_WIRE_KEYS}
                if per_frame:
                    n = item["image_u8"].shape[0]
                    for i in range(n):
                        yield {k: v[i] for k, v in item.items()}
                else:
                    yield item

        def dense_items():
            for b in ld:
                valid = np.asarray(b["valid"]).astype(bool)
                yield np.asarray(b["features"])[valid]

        want = list(dense.infer_stream(dense_items()))
        got = list(wired.infer_stream(wire_items()))
        assert len(got) == len(want) == 5
        for g, wnt in zip(got, want):
            assert g.keys() == wnt.keys()
            for k in g:
                np.testing.assert_array_equal(g[k], wnt[k], err_msg=k)
        # per-frame dict items restack through the batcher identically
        # (covers the ragged tail: 5 frames at batch 2)
        got_pf = list(wired.infer_stream(wire_items(per_frame=True)))
        for g, wnt in zip(got_pf, want):
            for k in g:
                np.testing.assert_array_equal(g[k], wnt[k], err_msg=k)

    def test_wire_engine_refuses_spatial_sharding(self, tmp_path):
        import pytest

        from camradepth_tpu.data.wire import WirePlan
        from camradepth_tpu.serving import DepthEngine

        cfg = tiny_test_config()
        model = CamRaDepth(cfg.model)
        plan = WirePlan(radar_cap=256, gt_cap=0, n_radar_ch=4)
        with pytest.raises(ValueError, match="spatial"):
            DepthEngine(cfg, model, None, wire_plan=plan,
                        spatial_axis="sp")
        with pytest.raises(ValueError, match="channels"):
            DepthEngine(cfg, model, None,
                        wire_plan=WirePlan(256, 0, n_radar_ch=2))


def test_cli_serve_wire_matches_dense(tmp_path):
    """`serve --wire auto` must write byte-identical depth/seg artifacts
    to the dense serve (the loader ships compact wire batches, the
    engine decodes on device)."""
    import contextlib
    import dataclasses
    import io
    import json
    import unittest.mock as mock

    from camradepth_tpu import cli
    from camradepth_tpu.data import synthetic
    from camradepth_tpu.utils import checkpoint as ck

    cfg = tiny_test_config()
    split = synthetic.generate(tmp_path / "data", num_frames=5,
                               hw=cfg.model.img_size, seed=13)
    base_data = dataclasses.replace(
        cfg.data, split_path=str(split),
        image_dimension=cfg.model.img_size,
        train_val_split=(2, 0), num_workers=1,
    )
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    ckpt = ck.save_checkpoint(tmp_path / "ckpt", {"params": params},
                              epoch=0, eval_loss=0.5)

    outs = {}
    for mode in ("off", "on"):
        cfg_m = cfg.replace(
            data=dataclasses.replace(base_data, wire_format=mode)
        )
        out = tmp_path / f"served_{mode}"
        with mock.patch.object(cli, "_build_config", lambda a, c=cfg_m: c):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = cli.main([
                    "serve", "--preset", "base",
                    "--checkpoint", str(ckpt),
                    "--out", str(out), "--serve-batch", "2",
                ])
        assert rc == 0, buf.getvalue()[-2000:]
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["frames"] == 3  # 5 frames - (2 train, 0 val)
        outs[mode] = out
    for i in range(3):
        a = np.load(outs["off"] / f"{i:05d}_depth.npy")
        b = np.load(outs["on"] / f"{i:05d}_depth.npy")
        np.testing.assert_array_equal(a, b)
