"""Native C++ rasterizer: builds, matches the XLA path and the python
z-buffer oracle, and is fast enough to matter."""

import numpy as np
import pytest
import jax.numpy as jnp

from camradepth_tpu import native
from camradepth_tpu.config import DataConfig
from camradepth_tpu.geometry.raster import quantize_points, raster_min_depth


class TestNative:
    def test_builds(self):
        assert native.available(), "g++ build of native/rasterize.cc failed"

    def test_stale_library_triggers_rebuild(self, tmp_path, monkeypatch):
        """A loadable .so missing newer symbols must trigger a rebuild
        from the current source, not crash every native consumer: git
        does not preserve mtimes, so the mtime freshness check can pass
        on a stale prebuilt library (regression: binding the missing
        symbols raised AttributeError inside _load, so available()
        itself crashed instead of falling back)."""
        import subprocess
        import time

        stale_src = tmp_path / "stale.cc"
        stale_src.write_text('extern "C" void unrelated() {}\n')
        stale_lib = tmp_path / "librasterize.so"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(stale_lib),
             str(stale_src)],
            check=True, capture_output=True,
        )
        # looks newer than the real source -> freshness check passes
        future = time.time() + 3600
        import os

        os.utime(stale_lib, (future, future))
        monkeypatch.setattr(native, "_LIB", stale_lib)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", False)
        assert native.available(), "stale .so did not trigger a rebuild"
        # the rebuilt library really serves the newest symbols
        out = native.encode_inverse_depth_native(
            np.full((2, 3), 25.0, np.float32), 100.0
        )
        np.testing.assert_allclose(out, 0.75, rtol=1e-6)

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


class TestAssembleKernels:
    """C++ frame-assembly fast path (native/rasterize.cc frame-assembly
    kernels; channels._assemble_frame_native). The contract is BIT
    exactness with the numpy path — the loader switches silently, so any
    rounding drift would contaminate every downstream parity test."""

    H, W = 64, 128

    def _arrays(self, rng, fdtype, mdtype):
        h, w = self.H, self.W
        a = {
            "image": rng.integers(0, 256, (h, w, 3)).astype(np.uint8),
            "gt": rng.uniform(-5, 150, (h, w, 3)).astype(fdtype),
            "mseg": rng.integers(0, 21, (h + 8, w)).astype(mdtype),
            "radar": rng.uniform(-5, 150, (h, w, 3)).astype(fdtype),
            "rad_vel": rng.uniform(0, 1, (h, w)).astype(fdtype),
            "im_uv": rng.normal(0, 1, (h, w, 2)).astype(fdtype),
            "radar_filtered": rng.uniform(-5, 150, (h, w)).astype(fdtype),
        }
        # NaNs must flow through clip/where identically in both paths
        a["radar"][0, 0, 0] = np.nan
        a["gt"][0, 1, 0] = np.nan
        return a

    def _configs(self):
        import dataclasses

        from camradepth_tpu.config import DataConfig

        base = DataConfig(image_dimension=(self.H, self.W))
        return {
            "base": base,
            "filtered": dataclasses.replace(base, filtered_radar=True),
            "im_uv": dataclasses.replace(base, im_uv=True),
            "rgbd_only": dataclasses.replace(
                base, sparse_depth_uv=False, rad_vel=False
            ),
        }

    def test_bit_exact_across_variants_and_dtypes(self):
        import dataclasses

        import pytest

        from camradepth_tpu.data import channels as ch

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(0)
        for fdtype in (np.float32, np.float64):
            for mdtype in (np.int64, np.int32, np.uint8):
                arrays = self._arrays(rng, fdtype, mdtype)
                for name, cfg in self._configs().items():
                    nat_out = ch.assemble_frame(
                        arrays,
                        dataclasses.replace(cfg, native_assemble=True),
                    )
                    np_out = ch.assemble_frame(
                        arrays,
                        dataclasses.replace(cfg, native_assemble=False),
                    )
                    assert set(nat_out) == set(np_out)
                    for k in np_out:
                        assert nat_out[k].dtype == np_out[k].dtype, (
                            name, fdtype, mdtype, k,
                        )
                        np.testing.assert_array_equal(
                            nat_out[k], np_out[k],
                            err_msg=f"{name} {fdtype} {mdtype} {k}",
                        )

    def test_unsupported_dtype_falls_back(self):
        """A float16 radar frame can't ride the native kernels; the
        dispatcher must return the numpy result, not crash."""
        import dataclasses

        from camradepth_tpu.data import channels as ch

        rng = np.random.default_rng(1)
        arrays = self._arrays(rng, np.float32, np.int64)
        arrays["radar"] = arrays["radar"].astype(np.float16)
        cfg = self._configs()["base"]
        out = ch.assemble_frame(
            arrays, dataclasses.replace(cfg, native_assemble=True)
        )
        ref = ch.assemble_frame(
            arrays, dataclasses.replace(cfg, native_assemble=False)
        )
        np.testing.assert_array_equal(out["features"], ref["features"])

    def test_sparse_lidar_stays_numpy(self):
        """The random-mask sparse-lidar mode is rng-driven and must not
        take the native path."""
        import dataclasses

        from camradepth_tpu.data import channels as ch

        cfg = dataclasses.replace(
            self._configs()["base"], sparse_lidar=True
        )
        assert ch._assemble_frame_native({}, cfg) is None

    def test_default_config_routes_native(self):
        """The shipped artifact dtypes (f32 floats, int mseg, u8 jpg)
        must take the native path under the default config — a silent
        numpy fallback here would be a 6x loader regression with no
        functional symptom."""
        import pytest

        from camradepth_tpu.data import channels as ch

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(2)
        arrays = self._arrays(rng, np.float32, np.int64)
        out = ch._assemble_frame_native(arrays, self._configs()["base"])
        assert out is not None
        assert out["features"].shape == (self.H, self.W, 7)


class TestWireEncodeNative:
    """C++ wire-encode fast path (native/rasterize.cc wire kernels;
    data/wire._encode_frame_wire_native). Same contract as the assemble
    kernels: BIT exactness with the numpy encode — the wire loader
    switches silently and every decoded-batch golden depends on it."""

    H, W = 64, 128

    def _arrays(self, rng, fdtype, mdtype):
        h, w = self.H, self.W
        radar = np.zeros((h, w, 3), fdtype)
        ys = rng.integers(0, h, 70)
        xs = rng.integers(0, w, 70)
        radar[ys, xs, 0] = rng.uniform(-5, 150, 70)  # negatives clip to 0
        radar[ys, xs, 1] = rng.normal(0, 1, 70)
        radar[ys, xs, 2] = rng.normal(0, 1, 70)
        radar[0, 0] = (0.0, 0.4, -0.3)   # uv-only point
        radar[0, 1, 0] = np.nan          # NaN is "a point" (!= 0)
        radar[0, 2, 0] = -0.0            # -0.0 is NOT a point
        rad_vel = np.zeros((h, w), fdtype)
        rad_vel[1, 1] = 1.0              # vel-only point
        gt = np.zeros((h, w, 3), fdtype)
        m = rng.random((h, w)) < 0.3
        gt[..., 0][m] = rng.uniform(0.5, 150, int(m.sum()))
        gt[2, 2, 0] = 100.0              # d == max_depth -> enc 0, excluded
        gt[2, 3, 0] = -1.0               # clips to 0, excluded
        gt[2, 4, 0] = np.nan             # NaN -> enc 0, excluded
        mseg = rng.integers(0, 21, (h + 8, w)).astype(mdtype)
        mseg[0] = 255
        rf = np.zeros((h, w), fdtype)
        rf[ys, xs] = rng.uniform(-5, 150, 70)
        return {
            "image": rng.integers(0, 256, (h, w, 3)).astype(np.uint8),
            "radar": radar, "rad_vel": rad_vel, "gt": gt, "mseg": mseg,
            "radar_filtered": rf,
        }

    def _cfgs(self):
        import dataclasses

        from camradepth_tpu.config import DataConfig

        base = DataConfig(image_dimension=(self.H, self.W))
        return {
            "base": base,
            "filtered": dataclasses.replace(base, filtered_radar=True),
            "rgbd_only": dataclasses.replace(
                base, sparse_depth_uv=False, rad_vel=False
            ),
        }

    @pytest.mark.parametrize("gt_cap", [4096, 0])
    def test_bit_exact_across_variants_and_dtypes(self, gt_cap):
        import dataclasses

        from camradepth_tpu.data import wire

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(3)
        for fdtype in (np.float32, np.float64):
            for mdtype in (np.int64, np.int32):
                arrays = self._arrays(rng, fdtype, mdtype)
                for name, cfg in self._cfgs().items():
                    plan = wire.WirePlan(
                        radar_cap=256, gt_cap=gt_cap,
                        n_radar_ch=wire.radar_channel_count(cfg),
                    )
                    nat = wire.encode_frame_wire(
                        arrays,
                        dataclasses.replace(cfg, native_assemble=True),
                        plan,
                    )
                    ref = wire.encode_frame_wire(
                        arrays,
                        dataclasses.replace(cfg, native_assemble=False),
                        plan,
                    )
                    assert set(nat) == set(ref)
                    for k in ref:
                        assert nat[k].dtype == ref[k].dtype, (
                            name, fdtype, mdtype, k,
                        )
                        np.testing.assert_array_equal(
                            nat[k], ref[k],
                            err_msg=f"{name} {fdtype} {mdtype} gt{gt_cap} {k}",
                        )

    def test_overflow_matches_numpy(self):
        import dataclasses

        from camradepth_tpu.data import wire

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(4)
        arrays = self._arrays(rng, np.float32, np.int64)
        cfg = DataConfig(image_dimension=(self.H, self.W))
        plan = wire.WirePlan(radar_cap=8, gt_cap=4096, n_radar_ch=4)
        for native_assemble in (True, False):
            with pytest.raises(wire.WireOverflowError,
                               match="exceed the wire cap 8"):
                wire.encode_frame_wire(
                    arrays,
                    dataclasses.replace(cfg, native_assemble=native_assemble),
                    plan,
                )

    def test_out_of_range_seg_matches_numpy(self):
        """Labels above 255 can't ride the u8 wire: the native path must
        fall back so the numpy path raises its descriptive error."""
        import dataclasses

        from camradepth_tpu.data import wire

        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(5)
        arrays = self._arrays(rng, np.float32, np.int64)
        arrays["mseg"][5, 5] = 1000
        cfg = DataConfig(image_dimension=(self.H, self.W))
        plan = wire.WirePlan(radar_cap=256, gt_cap=0, n_radar_ch=4)
        for native_assemble in (True, False):
            with pytest.raises(ValueError, match="uint8 range"):
                wire.encode_frame_wire(
                    arrays,
                    dataclasses.replace(cfg, native_assemble=native_assemble),
                    plan,
                )
