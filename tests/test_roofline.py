"""Attainable-roofline analyzer: jaxpr walk + floor model."""

import jax
import jax.numpy as jnp
import numpy as np

from camradepth_tpu.utils import roofline as rl


def test_conv_extraction_shapes():
    """A single NHWC conv must extract the exact [M,K,N] matmul view."""
    k = jnp.zeros((3, 3, 16, 32))

    def f(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    r = rl.analyze(f, jnp.zeros((2, 8, 10, 16)))
    assert len(r.matmuls) == 1
    op = r.matmuls[0]
    assert op.kind == "conv"
    assert op.m == 2 * 8 * 10
    assert op.k == 3 * 3 * 16
    assert op.n == 32
    assert op.flops == 2.0 * op.m * op.k * op.n
    # N=32 -> quarter of the 128 MXU lanes
    assert op.attainable_tflops < rl.V5E_PEAK_FLOPS / 1e12 * 0.3


def test_depthwise_is_bandwidth_only():
    k = jnp.zeros((3, 3, 1, 16))

    def f(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=16,
        )

    r = rl.analyze(f, jnp.zeros((1, 8, 10, 16)))
    assert len(r.matmuls) == 1
    op = r.matmuls[0]
    assert op.kind == "dwconv" and op.bw_only
    assert op.t_floor == op.bytes / rl.V5E_HBM_BW


def test_dot_general_and_subjaxpr_recursion():
    """dot_general inside a scanned body must be found (scan sub-jaxpr),
    once — the analyzer reports the per-trace cost, not per-iteration."""
    w = jnp.zeros((64, 256))

    def f(x):
        def body(c, _):
            return c, c @ w

        _, ys = jax.lax.scan(body, x, None, length=3)
        return ys

    r = rl.analyze(f, jnp.zeros((32, 64)))
    dots = [op for op in r.matmuls if op.kind == "dot"]
    assert len(dots) == 1
    assert dots[0].m == 32 and dots[0].k == 64 and dots[0].n == 256


def test_flagship_floor_is_plausible():
    """The tiny model's attainable floor is positive and below a
    trivially loose bound."""
    from camradepth_tpu.config import tiny_test_config
    from camradepth_tpu.models.camradepth import CamRaDepth

    cfg = tiny_test_config()
    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    x = jnp.zeros((1, h, w, cfg.model.input_channels))
    params = jax.eval_shape(
        lambda k: model.init({"params": k}, x, deterministic=True)[
            "params"
        ],
        jax.random.PRNGKey(0),
    )

    def fwd(p, xx):
        return model.apply({"params": p}, xx, deterministic=True)[
            "depth"
        ]["final_depth"]

    r = rl.analyze(fwd, params, x)
    assert len(r.matmuls) > 20  # encoder blocks + decoder SRBs + heads
    assert 0 < r.attainable_s < 1.0
    total_flops = sum(op.flops for op in r.matmuls)
    assert total_flops > 1e8
    # floors are at least the pure-compute bound at peak
    assert r.t_matmul_floor >= total_flops / rl.V5E_PEAK_FLOPS
    assert "attainable" in r.report()

class TestScalingProjection:
    """utils/scaling.py — analytic data-parallel scaling model."""

    def test_weak_scaling_compute_constant_comm_saturates(self):
        from camradepth_tpu.utils import scaling

        pts = scaling.project_dp_scaling(
            9_000_000, 0.373, n_chips=[1, 2, 8, 64], mode="weak"
        )
        assert pts[0].t_comm_s == 0.0 and pts[0].efficiency == 1.0
        assert all(p.t_compute_s == 0.373 for p in pts)
        # (N-1)/N all-reduce term grows monotonically, saturating at
        # 2 * bytes / bw
        comm = [p.t_comm_s for p in pts]
        assert comm == sorted(comm)
        cap = 2 * 9_000_000 * 4 / scaling.V5E_ICI_AXIS_BW
        assert comm[-1] < cap <= comm[-1] * 64 / 63 + 1e-12
        # this model's gradients are tiny vs a 373 ms step: overlapped
        # efficiency should stay ~100%
        assert pts[-1].efficiency > 0.99
        assert pts[-1].t_overlap_s <= pts[-1].t_serial_s

    def test_strong_scaling_divides_compute(self):
        from camradepth_tpu.utils import scaling

        pts = scaling.project_dp_scaling(
            9_000_000, 0.8, n_chips=[1, 4], mode="strong"
        )
        assert pts[1].t_compute_s == 0.2

    def test_format_is_labeled_projection(self):
        from camradepth_tpu.utils import scaling

        pts = scaling.project_dp_scaling(9e6, 0.373, n_chips=[1, 8])
        txt = scaling.format_projection(pts, "weak", 9e6,
                                        frames_per_step=6)
        assert "PROJECTION" in txt
        assert "measured only at N=1" in txt

    def test_rejects_bad_mode(self):
        import pytest

        from camradepth_tpu.utils import scaling

        with pytest.raises(ValueError):
            scaling.project_dp_scaling(1e6, 0.1, mode="magic")
