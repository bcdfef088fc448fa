"""Pallas bicubic-upsample kernel vs the XLA reference implementation.

On CPU the kernel runs in interpreter mode; on TPU the same code path
was verified bit-exact for bf16 at the decoder's hot shapes. Semantics:
torch nn.Upsample(scale_factor=2, mode='bicubic', align_corners=False)
(reference src/utils/utils.py:241).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.ops.resize import upsample_bicubic_x2
from camradepth_tpu.ops.resize_pallas import (
    _upsample_pallas_4d,
    upsample_bicubic_x2_pallas,
)


@pytest.mark.parametrize(
    "shape",
    [(2, 8, 16, 128), (1, 16, 24, 256), (2, 12, 8, 128)],
)
def test_pallas_upsample_matches_xla(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    a = np.asarray(upsample_bicubic_x2(x))
    b = np.asarray(_upsample_pallas_4d(x, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)


def test_pallas_upsample_rejects_unaligned_channels():
    x = jnp.zeros((1, 8, 8, 129))
    with pytest.raises(ValueError, match="multiple of 128"):
        _upsample_pallas_4d(x, interpret=True)


def test_pallas_upsample_gradient_is_exact_transpose():
    # The custom VJP reuses the XLA implementation's VJP (the public
    # entry itself falls back to XLA off-TPU, making this exact).
    from camradepth_tpu.ops.resize_pallas import _bwd

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16, 3),
                          jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 32, 3),
                          jnp.float32)
    g1 = jax.vjp(upsample_bicubic_x2, x)[1](g)[0]
    (g2,) = _bwd(x.shape, g)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)
    # And the public wrapper's end-to-end grad.
    e1 = jax.grad(lambda v: (upsample_bicubic_x2(v) ** 2).sum())(x)
    e2 = jax.grad(
        lambda v: (upsample_bicubic_x2_pallas(v) ** 2).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               atol=1e-5, rtol=1e-5)
