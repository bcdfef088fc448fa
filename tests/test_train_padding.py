"""Microbatch padding (TrainConfig.pad_microbatch_to) exactness.

XLA:TPU space-to-batches convs with batch < 8, making small-microbatch
training ~2.5x slower; the padded step must be a pure performance
transform: dummy samples are invisible to every masked loss, so
parameters after one optimizer step match the unpadded step to fp32
reduction roundoff.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from camradepth_tpu.config import tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.train.diffgrad import diffgrad_norm
from camradepth_tpu.train.schedule import onecycle
from camradepth_tpu.train.step import (
    init_state,
    make_train_step,
    pad_microbatch,
)


def _setup(pad=None, seg=False):
    cfg = tiny_test_config()
    model_kw = dict(compute_dtype="float32")
    if seg:
        model_kw.update(supervised_seg=True)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, **model_kw),
        train=dataclasses.replace(cfg.train, pad_microbatch_to=pad),
    )
    model = CamRaDepth(cfg.model)
    tx = diffgrad_norm(onecycle(1e-4, total_steps=10, div_factor=2.0))
    return cfg, model, tx


def test_padded_step_matches_unpadded():
    cfg0, model, tx = _setup(None)
    cfgp, _, _ = _setup(5)
    mc = cfg0.model
    H, W = mc.img_size
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg0, model, tx, rng)
    micro = {
        "features": jax.random.normal(
            rng, (2, 2, H, W, mc.input_channels), jnp.float32
        ),
        "gt_depth": jnp.abs(
            jax.random.normal(rng, (2, 2, H, W), jnp.float32)
        )
        * 0.1,
    }
    s0, m0 = jax.jit(make_train_step(cfg0, model, tx))(state, micro, rng)
    sp, mp = jax.jit(make_train_step(cfgp, model, tx))(state, micro, rng)
    # fp32 reduction order over the padded tensor shifts the loss by
    # O(1e-9); gradients below carry the same tolerance.
    np.testing.assert_allclose(
        float(m0["loss"]), float(mp["loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(sp.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-7, rtol=1e-6
        )


def test_pad_microbatch_fills():
    micro = {
        "features": jnp.ones((2, 4, 6, 3)),
        "gt_depth": jnp.ones((2, 4, 6)),
        "seg": jnp.zeros((2, 4, 6), jnp.int32),
    }
    out = pad_microbatch(micro, 5)
    assert out["features"].shape == (5, 4, 6, 3)
    assert float(out["features"][2:].sum()) == 0.0
    assert float(out["gt_depth"][2:].sum()) == 0.0  # depth mask: gt > 0
    assert int(out["seg"][2:].min()) == 255  # focal CE ignore_index


def test_padded_step_under_mesh():
    """The padding transform composes with SPMD sharding: the same
    padded step runs under a data x fsdp mesh with the batch sharded,
    matching the single-device padded result."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfgp, model, tx = _setup(4)
    mc = cfgp.model
    H, W = mc.img_size
    rng = jax.random.PRNGKey(0)
    state = init_state(cfgp, model, tx, rng)
    micro = {
        "features": jax.random.normal(
            rng, (1, 2, H, W, mc.input_channels), jnp.float32
        ),
        "gt_depth": jnp.abs(
            jax.random.normal(rng, (1, 2, H, W), jnp.float32)
        )
        * 0.1,
    }
    step = make_train_step(cfgp, model, tx)
    ref_state, ref_m = jax.jit(step)(state, micro, rng)

    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("data",))
    msharding = NamedSharding(mesh, P(None, "data"))
    sharded = jax.jit(
        step, in_shardings=(None, msharding, None)
    )
    sh_state, sh_m = sharded(state, micro, rng)
    np.testing.assert_allclose(
        float(ref_m["loss"]), float(sh_m["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
