"""Native C++ rasterizer: builds, matches the XLA path and the python
z-buffer oracle, and is fast enough to matter."""

import numpy as np
import pytest
import jax.numpy as jnp

from camradepth_tpu import native
from camradepth_tpu.geometry.raster import quantize_points, raster_min_depth


class TestNative:
    def test_builds(self):
        assert native.available(), "g++ build of native/rasterize.cc failed"

    def test_matches_xla_raster(self):
        rng = np.random.default_rng(0)
        n, h, w, scale = 5000, 900, 1600, 2.0
        h_out, w_out = int(h / scale), int(w / scale)
        x = rng.uniform(0, w - 1, n)
        y = rng.uniform(0, h - 1, n)
        depth = rng.uniform(2, 100, n)
        rcs = rng.uniform(-5, 20, n)
        valid = rng.uniform(size=n) > 0.1

        pix_n, xq, yq = native.quantize_pixels_host(
            x, y, valid, scale, h_out, w_out
        )
        d_n, p_n = native.raster_min_depth_host(
            pix_n, depth, {"rcs": rcs}, h_out * w_out
        )

        xi, yi, xq_x, yq_x = quantize_points(
            jnp.asarray(x), jnp.asarray(y), h_out, w_out, scale
        )
        pix_x = yi * w_out + xi
        d_x, p_x = raster_min_depth(
            pix_x, jnp.asarray(depth), {"rcs": jnp.asarray(rcs)},
            h_out * w_out, jnp.asarray(valid),
        )
        # XLA path truncates to float32; native stays float64
        np.testing.assert_allclose(d_n, np.asarray(d_x), atol=1e-4)
        np.testing.assert_allclose(p_n["rcs"], np.asarray(p_x["rcs"]),
                                   atol=1e-4)
        np.testing.assert_allclose(xq, np.asarray(xq_x), atol=1e-4)

    def test_quantize_marks_invalid(self):
        pix, _, _ = native.quantize_pixels_host(
            np.array([1.0, 2.0]), np.array([1.0, 2.0]),
            np.array([True, False]), 1.0, 10, 10,
        )
        assert pix[1] == -1 and pix[0] >= 0

    def test_multi_channel_payload(self):
        pix = np.array([3, 3, 5], np.int64)
        depth = np.array([7.0, 2.0, 1.0])
        flow = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        d, p = native.raster_min_depth_host(pix, depth, {"flow": flow}, 8)
        assert d[3] == 2.0
        np.testing.assert_array_equal(p["flow"][3], [3.0, 4.0])
        np.testing.assert_array_equal(p["flow"][5], [5.0, 6.0])

    def test_speed_vs_python_loop(self):
        """Native raster of 100k points must beat a python loop by >10x
        (sanity check that the native path is actually native)."""
        import time

        rng = np.random.default_rng(1)
        n = 100_000
        pix = rng.integers(0, 360_000, n)
        depth = rng.uniform(2, 100, n)
        native.raster_min_depth_host(pix, depth, {}, 360_000)  # warm
        t0 = time.perf_counter()
        native.raster_min_depth_host(pix, depth, {}, 360_000)
        t_native = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = np.zeros(360_000)
        for i in range(n):
            p = pix[i]
            if out[p] == 0 or out[p] > depth[i]:
                out[p] = depth[i]
        t_py = time.perf_counter() - t0
        assert t_native * 10 < t_py, (t_native, t_py)
