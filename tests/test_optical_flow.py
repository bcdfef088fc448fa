"""Pyramidal LK flow: recovers known translations on textured images."""

import numpy as np

from camradepth_tpu.ops.optical_flow import lk_flow


def _textured(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 32, w + 32))
    # smooth a little so gradients are informative
    k = np.ones((5, 5)) / 25
    from scipy.signal import convolve2d

    sm = convolve2d(base, k, mode="same")
    return sm


class TestLKFlow:
    def test_recovers_global_translation(self):
        big = _textured(96, 128)
        dx, dy = 3, 2
        im1 = big[8: 8 + 96, 8: 8 + 128]
        # cropping im2 at +offset shifts its CONTENT by -offset, so the
        # im1->im2 flow (position of im1 pixels in im2) is (-dx, -dy)
        im2 = big[8 + dy: 8 + dy + 96, 8 + dx: 8 + dx + 128]
        flow = lk_flow(im1 * 1.0, im2 * 1.0)
        assert flow.shape == (96, 128, 2)
        interior = flow[16:-16, 16:-16]
        assert abs(np.median(interior[..., 0]) + dx) < 0.5
        assert abs(np.median(interior[..., 1]) + dy) < 0.5

    def test_zero_flow_on_identical(self):
        im = _textured(64, 64, seed=1)[: 64, : 64]
        flow = lk_flow(im, im)
        assert np.abs(flow).max() < 0.3

    def test_rgb_input(self):
        rgb = np.repeat(_textured(64, 64, 2)[:64, :64, None], 3, axis=-1)
        flow = lk_flow(rgb.astype(np.uint8), rgb.astype(np.uint8))
        assert flow.shape == (64, 64, 2)
