"""Alternative component-library blocks: shape/behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp

from camradepth_tpu.models import alt_blocks as ab


def _run(module, x, **kw):
    v = module.init({"params": jax.random.PRNGKey(0)}, x, **kw)
    return module.apply(v, x, **kw)


class TestAltBlocks:
    def test_channel_attention_range_and_shape(self):
        x = jnp.ones((2, 8, 8, 16), jnp.float32)
        out = _run(ab.ChannelAttention(16, dtype=jnp.float32), x)
        assert out.shape == (2, 1, 1, 16)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_sparse_dense_block(self):
        x = jnp.ones((1, 8, 8, 16), jnp.float32)
        out = _run(
            ab.SparseDenseBlock(32, mid_channels=16, num_layers=3,
                                dtype=jnp.float32), x
        )
        assert out.shape == (1, 8, 8, 32)

    def test_resblock_both_modes(self):
        x = jnp.ones((1, 8, 8, 16), jnp.float32)
        for dense in (False, True):
            out = _run(
                ab.ResBlock(24, mid_channels=16, dense=dense,
                            dtype=jnp.float32), x
            )
            assert out.shape == (1, 8, 8, 24)
        out = _run(
            ab.ResBlock(24, mid_channels=16, as_final_block=True,
                        dtype=jnp.float32), x
        )
        assert out.shape == (1, 8, 8, 24)

    def test_acti(self):
        x = jnp.zeros((1, 4, 4, 8), jnp.float32)
        out = _run(ab.Acti(2, dtype=jnp.float32), x)
        assert out.shape == (1, 4, 4, 2)

    def test_unpool_zero_stuffing(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        out = np.asarray(ab.unpool_x2(x))
        assert out.shape == (1, 4, 4, 1)
        assert out[0, 0, 0, 0] == 0.0 and out[0, 0, 2, 0] == 1.0
        assert out[0, 1, 1, 0] == 0.0  # stuffed zeros
        assert out.sum() == 6.0  # values preserved exactly once

    def test_conv_attention(self):
        x = jnp.ones((1, 16, 32, 8), jnp.float32)
        out = _run(
            ab.ConvAttention(16, embed_dim=32, num_heads=2, num_blocks=1,
                             divisor=16, dtype=jnp.float32),
            x, deterministic=True,
        )
        assert out.shape == (1, 16, 32, 16)
