"""HTTP serving front end (serving_http.py): REST endpoint over the
streaming engine — health, info, inference (npy in / npz out), input
validation — pinned byte-equal to the in-process engine."""

import io
import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.serving import DepthEngine
from camradepth_tpu.serving_http import start_server


class _FakeEngine:
    """Counts infer_batch calls; output encodes input order."""

    def __init__(self, batch_size):
        self.batch_size = batch_size
        self.calls = []

    def infer_batch(self, x):
        self.calls.append(x.shape[0])
        return {"depth": x[..., 0] * 2.0}


class TestBatchAggregator:
    def test_concurrent_requests_coalesce(self):
        from concurrent.futures import ThreadPoolExecutor

        from camradepth_tpu.serving_http import BatchAggregator

        eng = _FakeEngine(batch_size=4)
        agg = BatchAggregator(eng, max_wait_ms=1000.0)
        try:
            xs = [np.full((1, 2, 2, 3), float(i), np.float32)
                  for i in range(4)]
            with ThreadPoolExecutor(4) as pool:
                outs = list(pool.map(agg.infer, xs))
            for i, o in enumerate(outs):  # results routed per request
                np.testing.assert_array_equal(
                    o["depth"], np.full((1, 2, 2), 2.0 * i)
                )
            # all four 1-frame requests ran as ONE device batch
            assert eng.calls == [4]
        finally:
            agg.close()

    def test_fifo_overflow_spills_to_next_round(self):
        from concurrent.futures import ThreadPoolExecutor

        from camradepth_tpu.serving_http import BatchAggregator

        eng = _FakeEngine(batch_size=2)
        agg = BatchAggregator(eng, max_wait_ms=500.0)
        try:
            xs = [np.full((1, 2, 2, 3), float(i), np.float32)
                  for i in range(3)]
            with ThreadPoolExecutor(3) as pool:
                outs = list(pool.map(agg.infer, xs))
            for i, o in enumerate(outs):
                np.testing.assert_array_equal(
                    o["depth"], np.full((1, 2, 2), 2.0 * i)
                )
            assert sorted(eng.calls) == [1, 2]  # 2-frame round + spill
        finally:
            agg.close()

    def test_engine_error_propagates_to_all_waiters(self):
        from concurrent.futures import ThreadPoolExecutor

        from camradepth_tpu.serving_http import BatchAggregator

        class Boom:
            batch_size = 2

            def infer_batch(self, x):
                raise RuntimeError("device fell over")

        agg = BatchAggregator(Boom(), max_wait_ms=500.0)
        try:
            xs = [np.zeros((1, 2, 2, 3), np.float32)] * 2
            with ThreadPoolExecutor(2) as pool:
                futs = [pool.submit(agg.infer, x) for x in xs]
                for f in futs:
                    with pytest.raises(RuntimeError, match="fell over"):
                        f.result(timeout=30)
        finally:
            agg.close()


@pytest.fixture(scope="module")
def server():
    cfg = tiny_test_config()
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    engine = DepthEngine(cfg, model, params, batch_size=2)
    srv, _ = start_server(engine, cfg, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    yield cfg, engine, f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post_npy(url, arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_healthz_and_info(server):
    cfg, engine, base = server
    status, health = _get(base + "/healthz")
    assert status == 200 and health["status"] == "ok"
    status, info = _get(base + "/v1/info")
    assert status == 200
    assert info["batch_size"] == 2
    assert info["img_size"] == list(cfg.model.img_size)
    assert info["max_depth"] == cfg.data.max_depth


def test_metrics_prometheus_format(server):
    cfg, engine, base = server
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]
        text = r.read().decode()
    assert "# TYPE camradepth_frames counter" in text
    assert "camradepth_frames_per_sec" in text


def test_depth_inference_matches_engine(server):
    cfg, engine, base = server
    h, w = cfg.model.img_size
    x = np.random.default_rng(0).standard_normal(
        (2, h, w, cfg.model.input_channels)
    ).astype(np.float32)
    status, body = _post_npy(base + "/v1/depth", x)
    assert status == 200
    out = np.load(io.BytesIO(body))
    want = engine.infer_batch(x)
    np.testing.assert_array_equal(out["depth"], want["depth"])
    if "seg" in want:
        np.testing.assert_array_equal(out["seg"], want["seg"])

    # unbatched [H, W, C] is accepted and served as batch 1
    status, body = _post_npy(base + "/v1/depth", x[0])
    assert status == 200
    out1 = np.load(io.BytesIO(body))
    assert out1["depth"].shape == (1, h, w)
    np.testing.assert_array_equal(out1["depth"][0], out["depth"][0])


def test_input_validation(server):
    cfg, engine, base = server
    h, w = cfg.model.img_size

    def post_expect_400(arr=None, raw=None):
        data = raw
        if data is None:
            buf = io.BytesIO()
            np.save(buf, arr)
            data = buf.getvalue()
        req = urllib.request.Request(base + "/v1/depth", data=data,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        return json.loads(e.value.read())

    err = post_expect_400(np.zeros((3, h, w, 7), np.float32))  # b > max
    assert "b<=2" in err["error"]
    post_expect_400(np.zeros((h, w), np.float32))  # wrong rank
    err = post_expect_400(raw=b"not an npy")
    assert ".npy" in err["error"]

    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert e.value.code == 404


# ---------------------------------------------------------------------------
# compact wire serving over HTTP (npz request bodies, decoded on device)

@pytest.fixture(scope="module")
def wire_server():
    from camradepth_tpu.data.wire import WirePlan

    cfg = tiny_test_config()
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, h, w, cfg.model.input_channels)),
        deterministic=True,
    )["params"]
    plan = WirePlan(radar_cap=256, gt_cap=0, n_radar_ch=4)
    engine = DepthEngine(cfg, model, params, batch_size=2,
                         wire_plan=plan)
    srv, _ = start_server(engine, cfg, host="127.0.0.1", port=0)
    yield cfg, engine, plan, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post_npz(url, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def _wire_request(cfg, plan, seed=0):
    from tests.test_wire import _frame_arrays

    from camradepth_tpu.data import wire

    h, w = cfg.model.img_size
    arrays = _frame_arrays(np.random.default_rng(seed), h=h, w=w)
    enc = wire.encode_frame_wire(arrays, cfg.data, plan)
    return {k: enc[k] for k in ("image_u8", "radar_idx", "radar_val")}


def test_wire_info_and_inference(wire_server):
    cfg, engine, plan, base = wire_server
    status, info = _get(base + "/v1/info")
    assert status == 200 and info["wire"] is True
    assert info["wire_radar_cap"] == plan.radar_cap
    assert info["wire_radar_channels"] == plan.n_radar_ch

    # unbatched wire request -> batch-1 response, byte-equal to the
    # in-process wire engine (on-device decode parity is pinned in
    # tests/test_wire.py; this pins the HTTP plumbing)
    req = _wire_request(cfg, plan, seed=3)
    status, body = _post_npz(base + "/v1/depth", **req)
    assert status == 200
    out = np.load(io.BytesIO(body))
    want = engine.infer_batch({k: v[None] for k, v in req.items()})
    np.testing.assert_array_equal(out["depth"], want["depth"])

    # batched [2, ...] request
    req2 = _wire_request(cfg, plan, seed=4)
    batched = {k: np.stack([req[k], req2[k]]) for k in req}
    status, body = _post_npz(base + "/v1/depth", **batched)
    assert status == 200
    out2 = np.load(io.BytesIO(body))
    assert out2["depth"].shape[0] == 2
    np.testing.assert_array_equal(out2["depth"][0], out["depth"][0])


def test_wire_request_validation(wire_server):
    cfg, engine, plan, base = wire_server
    h, w = cfg.model.img_size

    def post_expect_400(**arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        req = urllib.request.Request(base + "/v1/depth",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        return json.loads(e.value.read())["error"]

    good = _wire_request(cfg, plan)
    err = post_expect_400(**{k: v for k, v in good.items()
                             if k != "radar_val"})
    assert "radar_val" in err
    bad = dict(good, radar_idx=good["radar_idx"][:128])  # wrong cap
    assert "radar_idx" in post_expect_400(**bad)
    bad = dict(good, image_u8=good["image_u8"].astype(np.float32))
    assert "uint8" in post_expect_400(**bad)

    # a dense .npy against a wire engine is a clear client error
    buf = io.BytesIO()
    np.save(buf, np.zeros((h, w, 7), np.float32))
    req = urllib.request.Request(base + "/v1/depth", data=buf.getvalue(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert "wire" in json.loads(e.value.read())["error"]


def test_wire_npz_against_dense_engine_is_400(server):
    cfg, engine, base = server
    h, w = cfg.model.img_size
    buf = io.BytesIO()
    np.savez(buf, image_u8=np.zeros((h, w, 3), np.uint8),
             radar_idx=np.zeros((16,), np.int32),
             radar_val=np.zeros((16, 4), np.float32))
    req = urllib.request.Request(base + "/v1/depth", data=buf.getvalue(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    assert "dense" in json.loads(e.value.read())["error"]
