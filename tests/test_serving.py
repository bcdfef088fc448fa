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
