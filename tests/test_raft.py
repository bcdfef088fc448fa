"""TPU-native RAFT: component numerics + official-checkpoint mapping.

Real RAFT weights are unavailable here, so the full network is
validated structurally — a synthesized state_dict with the TRUE
official raft-large key set and shapes (no fnet instance-norm params;
cnet BatchNorm with running stats + num_batches_tracked) must load
into a complete, applyable params tree — while the nonstandard
numerics (the gather-free correlation lookup, its x-offset-major
channel order, and the convex upsampler) are verified against naive
NumPy implementations of the published definitions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.models.raft import (
    RAFT,
    _bilinear_axis_weights,
    convex_upsample,
    corr_pyramid,
    load_torch_raft_state_dict,
    lookup_corr,
)


def test_corr_pyramid_matches_naive():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 4, 6, 8).astype(np.float32)
    f2 = rng.randn(2, 4, 6, 8).astype(np.float32)
    pyr = corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    want = np.einsum("bhwc,bijc->bhwij", f1, f2).reshape(2, 24, 4, 6)
    want /= np.sqrt(8.0)
    np.testing.assert_allclose(np.asarray(pyr[0]), want, rtol=1e-5,
                               atol=1e-5)
    pooled = want.reshape(2, 24, 2, 2, 3, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(np.asarray(pyr[1]), pooled, rtol=1e-5,
                               atol=1e-5)


def _naive_bilinear_zero_pad(grid, y, x):
    """grid [H,W]; zero-padded bilinear at float (y, x)."""
    h, w = grid.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            wgt = (1 - abs(y - yy)) * (1 - abs(x - xx))
            if 0 <= yy < h and 0 <= xx < w and wgt > 0:
                out += wgt * grid[yy, xx]
    return out


def test_bilinear_weights_zero_pad_semantics():
    rng = np.random.RandomState(1)
    grid = rng.randn(5, 7).astype(np.float32)
    for y, x in [(1.3, 2.7), (0.0, 0.0), (-0.4, 6.6), (4.9, -1.2),
                 (5.5, 3.0)]:
        wy = np.asarray(_bilinear_axis_weights(jnp.float32(y), 5))
        wx = np.asarray(_bilinear_axis_weights(jnp.float32(x), 7))
        got = float(wy @ grid @ wx)
        want = _naive_bilinear_zero_pad(grid, y, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lookup_corr_center_tap():
    """With zero flow, the center tap of level 0 must equal the
    self-correlation entry corr[b, n, y, x]."""
    rng = np.random.RandomState(2)
    f = rng.randn(1, 4, 5, 8).astype(np.float32)
    pyr = corr_pyramid(jnp.asarray(f), jnp.asarray(f), num_levels=1)
    flow = jnp.zeros((1, 4, 5, 2))
    out = np.asarray(lookup_corr(pyr, flow, radius=1))
    assert out.shape == (1, 4, 5, 9)
    corr = np.asarray(pyr[0]).reshape(1, 4, 5, 4, 5)
    for y in range(4):
        for x in range(5):
            np.testing.assert_allclose(
                out[0, y, x, 4], corr[0, y, x, y, x], rtol=1e-5,
                atol=1e-5,
            )


def test_lookup_corr_tap_order_is_x_major():
    """Every neighborhood tap must land at the official CorrBlock
    channel position: flat index a*(2r+1)+b samples offset
    (dx=offs[a], dy=offs[b]) — the OUTER index varies the x offset
    (delta = stack(meshgrid(dy, dx)) + bilinear_sampler's (x, y)
    split). With official convc1 weights a y-major order would
    transpose the channels and silently corrupt the flow."""
    h, w = 6, 7
    rng = np.random.RandomState(3)
    corr_np = rng.randn(1, h * w, h, w).astype(np.float32)
    pyr = [jnp.asarray(corr_np)]
    flow = jnp.zeros((1, h, w, 2))
    r = 1
    offs = [-1, 0, 1]
    out = np.asarray(lookup_corr(pyr, flow, radius=r))
    assert out.shape == (1, h, w, 9)
    # interior pixels: every tap is in range, value = exact grid entry
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            n = y * w + x
            for a, dx in enumerate(offs):
                for b, dy in enumerate(offs):
                    np.testing.assert_allclose(
                        out[0, y, x, a * 3 + b],
                        corr_np[0, n, y + dy, x + dx],
                        rtol=1e-5, atol=1e-5,
                    )


def test_convex_upsample_naive():
    rng = np.random.RandomState(3)
    flow = rng.randn(1, 2, 3, 2).astype(np.float32)
    mask = rng.randn(1, 2, 3, 9 * 64).astype(np.float32)
    up = np.asarray(convex_upsample(jnp.asarray(flow),
                                    jnp.asarray(mask)))
    assert up.shape == (1, 16, 24, 2)
    m = mask.reshape(1, 2, 3, 9, 8, 8)
    m = np.exp(m - m.max(3, keepdims=True))
    m = m / m.sum(3, keepdims=True)
    fp = np.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for i in range(2):
        for j in range(3):
            for u in range(8):
                for v in range(8):
                    want = np.zeros(2)
                    for k, (dy, dx) in enumerate(
                        [(a, b) for a in range(3) for b in range(3)]
                    ):
                        want += m[0, i, j, k, u, v] * fp[0, i + dy,
                                                         j + dx]
                    np.testing.assert_allclose(
                        up[0, 8 * i + u, 8 * j + v], want, rtol=1e-4,
                        atol=1e-5,
                    )


def _official_raft_state(seed: int = 0):
    """Synthesize a state_dict with the TRUE official raft-large key
    set and shapes (torch OIHW conv layout, module.-prefixed as saved
    by DataParallel). Notably:

    - fnet uses InstanceNorm2d with the affine default (False): NO
      fnet.norm* keys exist in real raft-things/raft-kitti files;
    - cnet uses BatchNorm2d: weight/bias/running_mean/running_var +
      num_batches_tracked per norm, and the stride-2 blocks register
      the downsample norm twice (norm3 AND downsample.1).
    """
    rng = np.random.RandomState(seed)
    state = {}

    def tensor(key, shape):
        state["module." + key] = rng.randn(*shape).astype(
            np.float32
        ) * 0.05

    def bn(key, c):
        tensor(f"{key}.weight", (c,))
        tensor(f"{key}.bias", (c,))
        tensor(f"{key}.running_mean", (c,))
        state[f"module.{key}.running_var"] = np.abs(
            rng.randn(c)
        ).astype(np.float32) + 0.5
        state[f"module.{key}.num_batches_tracked"] = np.int64(1000)

    def encoder(p, batch_norm):
        tensor(f"{p}.conv1.weight", (64, 3, 7, 7))
        tensor(f"{p}.conv1.bias", (64,))
        if batch_norm:
            bn(f"{p}.norm1", 64)
        for layer, (cin, cout, stride) in enumerate(
            ((64, 64, 1), (64, 96, 2), (96, 128, 2)), start=1
        ):
            for blk in (0, 1):
                q = f"{p}.layer{layer}.{blk}"
                i = cin if blk == 0 else cout
                s = stride if blk == 0 else 1
                tensor(f"{q}.conv1.weight", (cout, i, 3, 3))
                tensor(f"{q}.conv1.bias", (cout,))
                tensor(f"{q}.conv2.weight", (cout, cout, 3, 3))
                tensor(f"{q}.conv2.bias", (cout,))
                if batch_norm:
                    bn(f"{q}.norm1", cout)
                    bn(f"{q}.norm2", cout)
                if s != 1:
                    tensor(f"{q}.downsample.0.weight", (cout, i, 1, 1))
                    tensor(f"{q}.downsample.0.bias", (cout,))
                    if batch_norm:
                        # self.norm3 is the same module as
                        # downsample[1]; torch serializes both names
                        bn(f"{q}.norm3", cout)
                        for leaf in ("weight", "bias", "running_mean",
                                     "running_var",
                                     "num_batches_tracked"):
                            state[f"module.{q}.downsample.1.{leaf}"] = (
                                state[f"module.{q}.norm3.{leaf}"]
                            )
        tensor(f"{p}.conv2.weight", (256, 128, 1, 1))
        tensor(f"{p}.conv2.bias", (256,))

    encoder("fnet", batch_norm=False)
    encoder("cnet", batch_norm=True)

    u = "update_block"
    cor_planes = 4 * (2 * 4 + 1) ** 2  # 324
    for key, shape in (
        (f"{u}.encoder.convc1.weight", (256, cor_planes, 1, 1)),
        (f"{u}.encoder.convc1.bias", (256,)),
        (f"{u}.encoder.convc2.weight", (192, 256, 3, 3)),
        (f"{u}.encoder.convc2.bias", (192,)),
        (f"{u}.encoder.convf1.weight", (128, 2, 7, 7)),
        (f"{u}.encoder.convf1.bias", (128,)),
        (f"{u}.encoder.convf2.weight", (64, 128, 3, 3)),
        (f"{u}.encoder.convf2.bias", (64,)),
        (f"{u}.encoder.conv.weight", (126, 256, 3, 3)),
        (f"{u}.encoder.conv.bias", (126,)),
        (f"{u}.gru.convz1.weight", (128, 384, 1, 5)),
        (f"{u}.gru.convz1.bias", (128,)),
        (f"{u}.gru.convr1.weight", (128, 384, 1, 5)),
        (f"{u}.gru.convr1.bias", (128,)),
        (f"{u}.gru.convq1.weight", (128, 384, 1, 5)),
        (f"{u}.gru.convq1.bias", (128,)),
        (f"{u}.gru.convz2.weight", (128, 384, 5, 1)),
        (f"{u}.gru.convz2.bias", (128,)),
        (f"{u}.gru.convr2.weight", (128, 384, 5, 1)),
        (f"{u}.gru.convr2.bias", (128,)),
        (f"{u}.gru.convq2.weight", (128, 384, 5, 1)),
        (f"{u}.gru.convq2.bias", (128,)),
        (f"{u}.flow_head.conv1.weight", (256, 128, 3, 3)),
        (f"{u}.flow_head.conv1.bias", (256,)),
        (f"{u}.flow_head.conv2.weight", (2, 256, 3, 3)),
        (f"{u}.flow_head.conv2.bias", (2,)),
        (f"{u}.mask.0.weight", (256, 128, 3, 3)),
        (f"{u}.mask.0.bias", (256,)),
        (f"{u}.mask.2.weight", (64 * 9, 256, 1, 1)),
        (f"{u}.mask.2.bias", (64 * 9,)),
    ):
        tensor(key, shape)
    return state


def test_official_checkpoint_loads_complete_applyable_tree():
    """The loader must turn the true official key set into a params
    tree with EXACTLY the model's structure — and the model must
    apply with it (a missing leaf raises ScopeParamNotFoundError)."""
    state = _official_raft_state()
    loaded = load_torch_raft_state_dict(state)

    model = RAFT(iters=1)
    im = jnp.zeros((1, 16, 16, 3))
    ref = model.init({"params": jax.random.PRNGKey(0)}, im, im)[
        "params"
    ]
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(loaded)[0]
    ref_paths = {
        "/".join(str(k.key) for k in p): v.shape for p, v in ref_flat
    }
    got_paths = {
        "/".join(str(k.key) for k in p): v.shape for p, v in got_flat
    }
    assert got_paths == ref_paths, (
        sorted(set(ref_paths) - set(got_paths))[:6],
        sorted(set(got_paths) - set(ref_paths))[:6],
    )

    rng = np.random.RandomState(9)
    im1 = jnp.asarray(rng.randint(0, 255, (1, 16, 24, 3)), jnp.float32)
    im2 = jnp.asarray(rng.randint(0, 255, (1, 16, 24, 3)), jnp.float32)
    flow = model.apply({"params": loaded}, im1, im2)
    assert flow.shape == (1, 16, 24, 2)
    assert np.isfinite(np.asarray(flow)).all()

    # spot-check a conv kernel round-trips OIHW -> HWIO
    np.testing.assert_array_equal(
        np.asarray(loaded["fnet"]["conv1"]["kernel"]),
        state["module.fnet.conv1.weight"].transpose(2, 3, 1, 0),
    )
    # and a BatchNorm running stat lands on the frozen-BN leaves
    np.testing.assert_array_equal(
        np.asarray(loaded["cnet"]["norm1"]["mean"]),
        state["module.cnet.norm1.running_mean"],
    )


def test_full_model_runs():
    model = RAFT(iters=2)
    rng = np.random.RandomState(4)
    im1 = jnp.asarray(rng.randint(0, 255, (1, 32, 48, 3)), jnp.float32)
    im2 = jnp.asarray(rng.randint(0, 255, (1, 32, 48, 3)), jnp.float32)
    p = model.init({"params": jax.random.PRNGKey(0)}, im1, im2)[
        "params"
    ]
    flow = model.apply({"params": p}, im1, im2)
    assert flow.shape == (1, 32, 48, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_jax_raft_estimator_end_to_end(tmp_path):
    """Official-format .pth (synthesized values, true key set) ->
    native JAX RAFT -> pipeline flow contract, including the /8
    pad/unpad."""
    torch = pytest.importorskip("torch")
    from camradepth_tpu.dataprep.adapters import make_flow_estimator

    state = {
        k: (torch.tensor(v) if isinstance(v, np.ndarray)
            else torch.tensor(int(v)))
        for k, v in _official_raft_state(seed=5).items()
    }
    path = tmp_path / "raft-synth.pth"
    torch.save(state, str(path))

    est = make_flow_estimator("jax-raft", ckpt=str(path), iters=1)
    rng = np.random.RandomState(5)
    im1 = rng.randint(0, 255, (30, 44, 3), dtype=np.uint8)
    im2 = rng.randint(0, 255, (30, 44, 3), dtype=np.uint8)
    flow = est(im1, im2)
    assert flow.shape == (30, 44, 2)
    assert flow.dtype == np.float32
    assert np.isfinite(flow).all()
