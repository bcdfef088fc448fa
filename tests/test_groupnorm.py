"""Fused GroupNorm parity vs torch.nn.GroupNorm (eps 1e-5)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from camradepth_tpu.ops.groupnorm import group_norm


class TestFusedGroupNorm:
    @pytest.mark.parametrize("shape,groups", [
        ((2, 100, 64), 4),      # token layout [B, N, C]
        ((2, 13, 25, 256), 16),  # NHWC
        ((1, 416, 800, 16), 1),
    ])
    def test_matches_torch_fp32(self, shape, groups):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32) * 3 + 1
        c = shape[-1]
        scale = rng.standard_normal(c).astype(np.float32)
        bias = rng.standard_normal(c).astype(np.float32)
        got = np.asarray(
            group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                       groups)
        )
        gn = torch.nn.GroupNorm(groups, c)
        with torch.no_grad():
            gn.weight.copy_(torch.from_numpy(scale))
            gn.bias.copy_(torch.from_numpy(bias))
        # torch wants channel-first
        perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
        xt = torch.from_numpy(x).permute(*perm)
        with torch.no_grad():
            want = gn(xt)
        inv = (0,) + tuple(range(2, x.ndim)) + (1,)
        want = want.permute(*inv).numpy()
        # single-pass E[x^2]-mu^2 variance costs ~1e-4 abs at 5M elements —
        # far below the bf16 activation resolution of the compute path
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-4)

    def test_bf16_path_close_to_fp32(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 64, 32)).astype(np.float32)
        scale = np.ones(32, np.float32)
        bias = np.zeros(32, np.float32)
        ref = np.asarray(
            group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 2)
        )
        got = np.asarray(
            group_norm(
                jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale),
                jnp.asarray(bias), 2,
            )
        ).astype(np.float32)
        np.testing.assert_allclose(got, ref, atol=0.05)
