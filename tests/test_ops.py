"""Unit tests for core TPU ops against PyTorch-CPU oracles.

These check exact-semantics parity for the ops where the reference relies on
PyTorch behavior: bicubic x2 upsampling (a=-0.75, align_corners=False,
utils.py:241), the sparse min-pool pyramid (dataloader.py:213-222), and the
max-pool attention math (simplified_attention.py:90-108)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from camradepth_tpu.ops.resize import upsample_bicubic_x2
from camradepth_tpu.ops.pooling import minpool_pyramid, minpool_sparse
from camradepth_tpu.ops.attention import maxpool_attention_scores


class TestBicubicUpsample:
    @pytest.mark.parametrize("shape", [(1, 8, 10, 3), (2, 13, 25, 128)])
    def test_matches_torch(self, shape):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(shape).astype(np.float32)
        got = np.asarray(upsample_bicubic_x2(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = torch.nn.Upsample(scale_factor=2, mode="bicubic")(xt)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_2d_input(self):
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        got = np.asarray(upsample_bicubic_x2(jnp.asarray(x)))
        want = torch.nn.Upsample(scale_factor=2, mode="bicubic")(
            torch.from_numpy(x)[None, None]
        )[0, 0].numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestMinpool:
    def _torch_minpool(self, x):
        x = x.clone()
        x[x == 0] = 255
        mp = torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        x = -mp(-x)
        x[x == 255] = 0
        return x

    @pytest.mark.parametrize("hw", [(416, 800), (64, 128), (13, 25)])
    def test_matches_torch(self, hw):
        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (1, *hw)).astype(np.float32)
        # sparsify: ~90% zeros like radar/lidar maps
        x *= rng.uniform(0, 1, x.shape) > 0.9
        got = np.asarray(minpool_sparse(jnp.asarray(x)))
        want = self._torch_minpool(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_pyramid_shapes(self):
        x = jnp.zeros((2, 1, 416, 800))
        p = minpool_pyramid(x.reshape(2, 416, 800))
        assert p[0].shape == (2, 208, 400)
        assert p[1].shape == (2, 104, 200)
        assert p[2].shape == (2, 52, 100)


class TestMaxPoolAttention:
    def test_matches_torch_reference_math(self):
        """Oracle implements the reference einsum chain in torch
        (simplified_attention.py:90-108) including the rank-1 v trick."""
        b, n, m, c, heads = 2, 40, 10, 16, 4
        rng = np.random.default_rng(2)
        x = rng.standard_normal((b, n, c)).astype(np.float32)
        q = rng.standard_normal((b, n, c)).astype(np.float32)
        k = rng.standard_normal((b, m, c)).astype(np.float32)
        scale = (c // heads) ** -0.5

        s = np.asarray(
            maxpool_attention_scores(jnp.asarray(q), jnp.asarray(k), heads, scale)
        )

        # torch oracle in the reference's BCN layout
        qt = torch.from_numpy(q).permute(0, 2, 1)  # [B,C,N]
        kt = torch.from_numpy(k).permute(0, 2, 1)  # [B,C,M]
        xt = torch.from_numpy(x).permute(0, 2, 1)
        qh = qt.reshape(b, heads, c // heads, n).permute(0, 1, 3, 2)
        kh = kt.reshape(b, heads, c // heads, m)
        attn = (qh @ kh) * scale
        attn, _ = torch.max(attn, -1)  # [B,h,N]
        v = torch.mean(xt, 2, True).repeat(1, 1, heads).transpose(-2, -1)
        out = (attn.transpose(-2, -1) @ v).transpose(-2, -1)  # [B,C,N]

        # Full rank-1 output equals s[b,n] * mean_c
        vbar = x.mean(axis=1)  # [B,C]
        got_out = s[:, :, None] * vbar[:, None, :]
        want_out = out.permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got_out, want_out, rtol=1e-4, atol=1e-5)


class TestMaxPoolAttentionGrad:
    def test_custom_vjp_matches_autodiff_oracle(self):
        """The gather/scatter backward must equal autodiff of a plain
        (residual-heavy) implementation."""
        import jax

        b, n, m, c, heads = 2, 12, 5, 8, 2
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, m, c)), jnp.float32)
        scale = 0.7

        def plain(q, k):
            d = c // heads
            qh = q.reshape(b, n, heads, d)
            kh = k.reshape(b, m, heads, d)
            scores = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * scale
            return jnp.sum(jnp.max(scores, -1), axis=1)

        from camradepth_tpu.ops.attention import maxpool_attention_scores

        g = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)

        def loss_custom(q, k):
            return jnp.sum(maxpool_attention_scores(q, k, heads, scale) * g)

        def loss_plain(q, k):
            return jnp.sum(plain(q, k) * g)

        dq_c, dk_c = jax.grad(loss_custom, argnums=(0, 1))(q, k)
        dq_p, dk_p = jax.grad(loss_plain, argnums=(0, 1))(q, k)
        np.testing.assert_allclose(np.asarray(dq_c), np.asarray(dq_p),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dk_c), np.asarray(dk_p),
                                   rtol=1e-5, atol=1e-6)
