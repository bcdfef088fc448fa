"""TPU-variant decoder (ModelConfig.tpu_decoder): the documented
MXU-aligned architecture variant (models/layers.py TPUDecoder /
SubpixelDepthActivation). Not weight-compatible with the reference
(utils.py:231-257) by design; these tests pin the output contract
(shapes/dtypes identical to the parity model), differentiability, and
the subpixel-shuffle round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.models.camradepth import create_model
from camradepth_tpu.models.layers import depth_to_space, space_to_depth


def _variant_cfg(**model_overrides):
    cfg = tiny_test_config()
    from camradepth_tpu.config import ModelConfig

    kw = {f: getattr(cfg.model, f) for f in cfg.model.__dataclass_fields__}
    kw.update(model_overrides, tpu_decoder=True)
    return ModelConfig(**kw)


def test_space_depth_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 12, 5)))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 2), 2)), np.asarray(x)
    )
    # D2S channel convention: channel blocks are (row, col, C)
    y = space_to_depth(x, 2)
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, : 5]), np.asarray(x[0, 0, 0])
    )
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, 5:10]), np.asarray(x[0, 0, 1])
    )
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, 10:15]), np.asarray(x[0, 1, 0])
    )


@pytest.mark.parametrize(
    "sup,unsup", [(False, False), (True, True)], ids=["base", "sup_unsup"]
)
def test_variant_output_contract_matches_parity(sup, unsup):
    """Same nested output dict, same shapes/dtypes as the parity model."""
    mc_t = _variant_cfg(supervised_seg=sup, unsupervised_seg=unsup)
    mc_p = _variant_cfg(supervised_seg=sup, unsupervised_seg=unsup)
    import dataclasses

    mc_p = dataclasses.replace(mc_p, tpu_decoder=False)
    x = jnp.asarray(
        np.random.default_rng(1)
        .standard_normal((2, 64, 128, 7))
        .astype(np.float32)
    )

    outs = {}
    for name, mc in [("tpu", mc_t), ("parity", mc_p)]:
        model = create_model(mc)
        params = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x, deterministic=True)
        )()
        outs[name] = model.apply(params, x, deterministic=True)

    flat_t = jax.tree_util.tree_leaves_with_path(outs["tpu"])
    flat_p = dict(jax.tree_util.tree_leaves_with_path(outs["parity"]))
    assert len(flat_t) == len(flat_p)
    for path, leaf in flat_t:
        other = flat_p[path]
        assert leaf.shape == other.shape, (path, leaf.shape, other.shape)
        assert leaf.dtype == other.dtype, path


def test_variant_grads_flow_and_finite():
    mc = _variant_cfg(supervised_seg=True, unsupervised_seg=True)
    model = create_model(mc)
    x = jnp.asarray(
        np.random.default_rng(2)
        .standard_normal((1, 64, 128, 7))
        .astype(np.float32)
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, deterministic=True)
    )()

    def loss(p):
        out = model.apply(p, x, deterministic=True)
        return (
            jnp.mean(out["depth"]["final_depth"] ** 2)
            + jnp.mean(out["seg"]["final_seg"] ** 2)
            + jnp.mean(out["depth"]["intermediate_depths"][3] ** 2)
        )

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for _, g in leaves)
    # every TPU-decoder stage must receive gradient (no dead branches).
    # unsup_final is exempt: its output feeds only the argmax guidance
    # map, which carries no gradient by reference parity (seg_block).
    nonzero = {
        jax.tree_util.keystr(p)
        for p, g in leaves
        if float(jnp.max(jnp.abs(g))) > 0
    }
    for stage in (
        "depth_upsample_3", "depth_upsample_4", "seg_upsample_1",
        "depth_activation_5", "seg_conv_final",
    ):
        assert any(stage in k for k in nonzero), stage


def test_parity_checkpoint_transfers_encoder():
    """A parity-architecture checkpoint partial-restores into the TPU
    variant: encoder + low-res decoder stages (identical shapes) are
    taken, the swapped subpixel stages keep their init — the documented
    transfer-learning path for the variant."""
    from camradepth_tpu.utils.checkpoint import partial_restore_params

    import dataclasses

    mc_t = _variant_cfg()
    mc_p = dataclasses.replace(mc_t, tpu_decoder=False)
    x = jnp.zeros((1, 64, 128, 7), jnp.float32)
    p_parity = create_model(mc_p).init(
        jax.random.PRNGKey(1), x, deterministic=True
    )["params"]
    p_tpu = create_model(mc_t).init(
        jax.random.PRNGKey(2), x, deterministic=True
    )["params"]

    restored, mismatches = partial_restore_params(
        p_parity, p_tpu, verbose=False
    )
    bad = {k for k, _ in mismatches}
    # encoder and the low-res decoder stages transfer completely
    assert not any("dest_encoder" in k for k in bad)
    assert not any("depth_upsample_0" in k for k in bad)
    assert not any("depth_upsample_2" in k for k in bad)
    np.testing.assert_array_equal(
        np.asarray(
            restored["dest_encoder"]["block1_0"]["attn"]["q"]["kernel"]
        ),
        np.asarray(
            p_parity["dest_encoder"]["block1_0"]["attn"]["q"]["kernel"]
        ),
    )
    # the swapped stages keep their fresh init (no silent bogus load)
    assert any("depth_upsample_4" in k for k in bad)
    assert any("depth_activation_5" in k for k in bad)


def test_variant_trains_through_real_step():
    """The variant drops into the unchanged training recipe
    (train/step.py): 6 diffGradNorm steps on a fixed synthetic batch
    reduce the multitask loss."""
    import dataclasses

    from camradepth_tpu.train.diffgrad import diffgrad_norm
    from camradepth_tpu.train.schedule import onecycle
    from camradepth_tpu.train.step import init_state, make_train_step

    cfg = tiny_test_config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, tpu_decoder=True),
        train=dataclasses.replace(cfg.train, batch_size=2,
                                  desired_batch_size=2,
                                  learning_rate=3e-4),
    )
    model = create_model(cfg.model)
    tx = diffgrad_norm(
        onecycle(cfg.train.learning_rate, total_steps=20,
                 div_factor=cfg.train.div_factor)
    )
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, tx, rng)
    step = jax.jit(make_train_step(cfg, model, tx))
    h, w = cfg.model.img_size
    batch = {
        "features": jax.random.normal(rng, (1, 2, h, w, 7), jnp.float32),
        "gt_depth": jnp.abs(
            jax.random.normal(jax.random.PRNGKey(1), (1, 2, h, w))
        ) * 0.1,
    }
    losses = []
    for i in range(6):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_variant_spatial_parallel_forward_parity():
    """The variant's space-to-depth / depth-to-space reshapes must
    compose with H-axis (sp) sharding: GSPMD halo exchanges +
    reshape resharding reproduce the single-device result bit-for-bit
    within fp32 tolerance on a 2x4 data x sp virtual mesh."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mc = _variant_cfg()
    model = create_model(mc)
    x = jnp.asarray(
        np.random.default_rng(3)
        .standard_normal((2, 64, 128, 7))
        .astype(np.float32)
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, x,
                   deterministic=True)
    ref = model.apply(v, x, deterministic=True)["depth"]["final_depth"]

    mesh = Mesh(np.asarray(devices[:8]).reshape(2, 4), ("data", "sp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
    vs = jax.device_put(v, NamedSharding(mesh, P()))
    fwd = jax.jit(
        lambda v, x: model.apply(v, x, deterministic=True)["depth"][
            "final_depth"
        ],
        out_shardings=NamedSharding(mesh, P("data", "sp")),
    )
    np.testing.assert_allclose(
        np.asarray(fwd(vs, xs)), np.asarray(ref), atol=5e-6
    )


def test_variant_lane_alignment():
    """Every conv in the TPU variant's swapped stages is 128-lane
    aligned (that is the point of the variant)."""
    mc = _variant_cfg()
    model = create_model(mc)
    x = jnp.zeros((1, 64, 128, 7), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    p = params["params"]
    for stage in ("depth_upsample_3", "depth_upsample_4"):
        for conv in ("conv_0", "conv_1", "conv_2"):
            kern = p[stage][conv]["conv"]["kernel"]
            # tiny config mid=32: the final subpixel conv is 4*mid
            assert kern.shape[-1] in (128, 4 * mc.mid_channels,
                                      mc.mid_channels), (
                stage, conv, kern.shape)
