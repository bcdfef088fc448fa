"""Geometry kernel tests: SE(3)/projection vs scipy oracles, scatter-min
raster vs a python z-buffer-loop oracle (the published RC-PDA behavior)."""

import numpy as np
import pytest
import jax.numpy as jnp

from camradepth_tpu.geometry import se3
from camradepth_tpu.geometry.raster import (
    quantize_points,
    raster_min_depth,
    rasterize_radar,
)


class TestSE3:
    def test_quat_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(0)
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        got = se3.quat_to_rot(q)  # [w,x,y,z]
        want = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_transform_inverse_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.standard_normal(4)
        t = rng.standard_normal(3)
        fwd = se3.transform_matrix(t, q, inverse=False)
        inv = se3.transform_matrix(t, q, inverse=True)
        np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-12)
        pts = rng.standard_normal((10, 3))
        back = se3.apply_se3(inv, se3.apply_se3(fwd, pts))
        np.testing.assert_allclose(back, pts, atol=1e-10)

    def test_projection(self):
        K = np.array([[1266.0, 0, 816.0], [0, 1266.0, 491.0], [0, 0, 1]])
        pts = np.array([[0.0, 0.0, 10.0], [1.0, -2.0, 5.0]])
        x, y = se3.project_pinhole(pts, K)
        np.testing.assert_allclose(x, [816.0, 1266.0 / 5 + 816.0])
        np.testing.assert_allclose(y, [491.0, -2 * 1266.0 / 5 + 491.0])

    def test_doppler_compensation(self):
        pts = np.zeros((3, 3))
        vx = np.array([1.0, 2.0, 0.0])
        vy = np.array([0.0, -1.0, 3.0])
        out = se3.doppler_compensate(pts, vx, vy, 0.5)
        np.testing.assert_allclose(out[:, 0], [0.5, 1.0, 0.0])
        np.testing.assert_allclose(out[:, 1], [0.0, -0.5, 1.5])
        np.testing.assert_allclose(out[:, 2], 0.0)

    def test_flow_to_uv(self):
        K = np.array([[1000.0, 0, 800.0], [0, 1000.0, 450.0], [0, 0, 1]])
        h, w = 8, 12
        flow = np.zeros((h, w, 2), np.float32)
        uv = se3.flow_to_uv(flow, K, downsample_scale=2, y_cutoff=3)
        # pixel (0,0): u = (0 - 400)/500, v = (0 - (225-3))/500
        np.testing.assert_allclose(uv[0, 0, 0], -400 / 500, rtol=1e-6)
        np.testing.assert_allclose(uv[0, 0, 1], -222 / 500, rtol=1e-6)


def _oracle_raster(x1, y1, depth, payloads, h, w, scale):
    """Python z-buffer loop implementing the published min-depth-wins
    semantics (first write wins on exact ties)."""
    h_new, w_new = int(h / scale), int(w / scale)
    xq = np.clip((x1 + 0.5) / scale - 0.5, 0, w_new - 1)
    yq = np.clip((y1 + 0.5) / scale - 0.5, 0, h_new - 1)
    dm = np.zeros((h_new, w_new))
    pm = {k: np.zeros((h_new, w_new)) for k in payloads}
    for i in range(len(x1)):
        xi, yi = int(round(xq[i])), int(round(yq[i]))
        if dm[yi, xi] == 0 or dm[yi, xi] > depth[i]:
            dm[yi, xi] = depth[i]
            for k in payloads:
                pm[k][yi, xi] = payloads[k][i]
    return dm, pm


class TestRaster:
    def test_matches_python_zbuffer(self):
        rng = np.random.default_rng(2)
        n, h, w, scale = 400, 90, 160, 2.0
        x = rng.uniform(0, w - 1, n)
        y = rng.uniform(0, h - 1, n)
        depth = rng.uniform(2, 100, n)
        rcs = rng.uniform(-5, 20, n)
        dm_want, pm_want = _oracle_raster(
            x, y, depth, {"rcs": rcs}, h, w, scale
        )
        h_out, w_out = int(h / scale), int(w / scale)
        xi, yi, _, _ = quantize_points(
            jnp.asarray(x), jnp.asarray(y), h_out, w_out, scale
        )
        pix = yi * w_out + xi
        dm, pm = raster_min_depth(
            pix, jnp.asarray(depth), {"rcs": jnp.asarray(rcs)},
            h_out * w_out,
        )
        np.testing.assert_allclose(
            np.asarray(dm).reshape(h_out, w_out), dm_want, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pm["rcs"]).reshape(h_out, w_out), pm_want["rcs"],
            rtol=1e-6,
        )

    def test_invalid_points_dropped(self):
        pix = jnp.array([0, 1, 2], jnp.int32)
        depth = jnp.array([5.0, 3.0, 1.0])
        valid = jnp.array([True, False, True])
        dm, _ = raster_min_depth(pix, depth, {}, 4, valid)
        assert float(dm[0]) == 5.0
        assert float(dm[1]) == 0.0
        assert float(dm[2]) == 1.0

    def test_tie_break_first_point_wins(self):
        pix = jnp.array([3, 3], jnp.int32)
        depth = jnp.array([7.0, 7.0])
        dm, pm = raster_min_depth(
            pix, depth, {"tag": jnp.array([1.0, 2.0])}, 4
        )
        assert float(pm["tag"][3]) == 1.0

    def test_full_radar_raster_shapes_and_vcomp(self):
        rng = np.random.default_rng(3)
        n = 128
        x1 = jnp.asarray(rng.uniform(0, 1599, n))
        y1 = jnp.asarray(rng.uniform(0, 899, n))
        maps = rasterize_radar(
            x1, y1,
            depth1=jnp.asarray(rng.uniform(2, 100, n)),
            times1=jnp.asarray(rng.uniform(0, 0.5, n)),
            x2=x1 + 2.0, y2=y1 - 1.0,
            rcs=jnp.asarray(rng.uniform(-5, 10, n)),
            v_comp=jnp.asarray(rng.uniform(0, 2, n)),
            valid=jnp.ones((n,), bool),
        )
        assert maps["depth"].shape == (450 - 34, 800)
        assert maps["flow"].shape == (416, 800, 2)
        assert set(np.unique(np.asarray(maps["v_comp"]))) <= {0.0, 1.0}
        # flow at hit pixels ~ (+1, -0.5) in downsampled units
        hit = np.asarray(maps["depth"]) > 0
        flows = np.asarray(maps["flow"])[hit]
        interior = (np.abs(flows[:, 0]) > 1e-9) & (np.abs(flows[:, 1]) > 1e-9)
        # clip at grid borders perturbs a few flows; the bulk must be exact
        np.testing.assert_allclose(
            np.median(flows[interior, 0]), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(
            np.median(flows[interior, 1]), -0.5, atol=1e-5
        )
