"""Fused conv3x3+GN-stats kernel vs its XLA reference (CPU interpret).

The kernel was built as a candidate replacement for the decoder's SRB
convs; on-device measurement showed XLA's im2col conv is already
within ~20% of the achievable MXU efficiency for these shapes, so the
model keeps the XLA path (see CLAUDE.md perf ledger). The kernel stays
correct, tested, and callable for experimentation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.ops.conv_fused import (
    Source,
    conv3x3_fused,
    conv3x3_reference,
    gn_affine_from_stats,
)


def _mk(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_fused_matches_reference_multi_source():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x0 = _mk(keys[0], (2, 16, 32, 128))
    x1 = _mk(keys[1], (2, 16, 32, 8))
    y1 = _mk(keys[5], (2, 16, 32, 128)).at[..., 96:].set(0)
    sc = _mk(keys[2], (2, 96)) * 0.2 + 1.0
    sh = _mk(keys[3], (2, 96)) * 0.1
    srcs = [Source(x0), Source(x1), Source(y1, sc, sh, True, 96)]
    w = _mk(keys[4], (3, 3, 128 + 8 + 96, 64)) * 0.1
    r1, s1, q1 = conv3x3_reference(srcs, w)
    r2, s2, q2 = conv3x3_fused(srcs, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(r1), np.asarray(r2[..., :64]), atol=2e-5, rtol=1e-4
    )
    assert float(jnp.abs(r2[..., 64:]).max()) == 0.0  # padded lanes
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-4, atol=1e-3)


def test_gn_affine_from_stats_matches_groupnorm():
    from camradepth_tpu.ops.groupnorm import group_norm

    key = jax.random.PRNGKey(1)
    x = _mk(key, (2, 8, 8, 32)) * 2.0 + 0.5
    gamma = _mk(jax.random.PRNGKey(2), (32,)) * 0.1 + 1.0
    beta = _mk(jax.random.PRNGKey(3), (32,)) * 0.1
    want = group_norm(x, gamma, beta, num_groups=2)
    f = x.astype(jnp.float32)
    scale, shift = gn_affine_from_stats(
        f.sum((1, 2)), (f * f).sum((1, 2)), 64, gamma, beta, 2
    )
    got = x * scale[:, None, None, :] + shift[:, None, None, :]
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=1e-4, atol=1e-5)
