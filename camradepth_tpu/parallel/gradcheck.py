"""Sharded-gradient parity checker (training-layout sanitizer).

The reference has no sanitizers (SURVEY §5); this is the rebuild's
equivalent for its actual failure mode: SPMD partitioning silently
producing wrong GRADIENTS while the forward stays exact. We hit this in
practice — jax 0.9.0 / XLA GSPMD miscomputes ``conv_general_dilated``
gradients when spatially-sharded activations are partially replicated
across another nontrivial mesh axis (minimal repro:
tests/test_gradcheck.py::test_upstream_bug_is_present). A training run on
such a layout converges to garbage with no error raised.

``grad_parity`` compares loss + gradients of the full multitask train
objective between an unsharded single-device run and a given mesh layout,
on a tiny model. CI asserts the layouts the Trainer permits are exact and
that the known-bad layouts still fail (when an XLA upgrade fixes them, the
pin flips and the Trainer restrictions can be lifted).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from camradepth_tpu.config import ExperimentConfig, MeshConfig
from camradepth_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_sharding_rule,
)


def _tiny_setup(cfg: ExperimentConfig, batch: int):
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.train.losses import multitask_loss
    from camradepth_tpu.train.step import build_gt

    model = CamRaDepth(cfg.model)
    h, w = cfg.model.img_size
    c = cfg.model.input_channels
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, h, w, c),
                          jnp.float32)
    micro = {
        "features": x,
        "gt_depth": jnp.abs(
            jax.random.normal(jax.random.PRNGKey(2), (batch, h, w))
        ) * 0.5,
        "seg": jnp.zeros((batch, h, w), jnp.int32),
        "seg_inter": jnp.zeros((batch, h // 2, w // 2), jnp.int32),
    }
    params = jax.jit(
        lambda k: model.init({"params": k}, x, deterministic=True)["params"]
    )(jax.random.PRNGKey(0))

    def loss_fn(p, m):
        pred = model.apply(
            {"params": p}, m["features"], deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return multitask_loss(pred, build_gt(m), cfg)[0]

    return params, micro, jax.value_and_grad(loss_fn)


def grad_parity(
    mesh_cfg: MeshConfig,
    cfg: ExperimentConfig = None,
    batch: int = 4,
    min_size: int = 0,
    rel_tol: float = 1e-3,
) -> Dict[str, object]:
    """Compare train-objective gradients: unsharded vs the given mesh.

    Returns {"ok", "max_rel_diff", "bad_leaves", "loss_diff"} where a leaf
    is bad when max|g_sharded - g_ref| / max|g_ref| > rel_tol."""
    from camradepth_tpu.config import tiny_test_config

    if cfg is None:
        cfg = tiny_test_config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, dropout_rate=0.0)
        )
    params, micro, vg = _tiny_setup(cfg, batch)
    l0, g0 = jax.jit(vg)(params, micro)

    n = (
        max(1, mesh_cfg.data_parallel)
        * max(1, mesh_cfg.fsdp_parallel)
        * max(1, mesh_cfg.spatial_parallel)
    )
    mesh = create_mesh(mesh_cfg, jax.devices()[:n])
    rule = param_sharding_rule(mesh, mesh_cfg, min_size=min_size)
    pshard = jax.tree.map(rule, params)
    dspec = batch_sharding(mesh, mesh_cfg)
    l1, g1 = jax.jit(vg, in_shardings=(pshard, dspec))(
        jax.device_put(params, pshard), jax.device_put(micro, dspec)
    )

    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    bad = []
    worst = 0.0
    for (path, a), (_, b) in zip(flat0, flat1):
        d = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(a).max()) + 1e-12
        rel = d / scale
        worst = max(worst, rel)
        if rel > rel_tol:
            bad.append(jax.tree_util.keystr(path))
    return {
        "ok": not bad,
        "max_rel_diff": worst,
        "bad_leaves": bad,
        "loss_diff": abs(float(l1) - float(l0)),
    }
