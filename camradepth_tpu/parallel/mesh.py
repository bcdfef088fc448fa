"""Device mesh + sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
(runner.py:135-136). The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh`` with up to three ICI axes:

  data  — batch (pure data parallel; gradients all-reduce over ICI)
  fsdp  — optional parameter/optimizer-state sharding (ZeRO-style): each
          param's largest divisible axis is sharded; XLA inserts
          all-gathers for use and reduce-scatters for grads.
  sp    — optional spatial parallelism: the image H axis shards across
          chips; GSPMD inserts conv halo exchanges and the cross-shard
          reductions GroupNorm needs (verified bit-consistent to ~5e-7
          against the unsharded forward on a virtual mesh). This is the
          scale-out path for larger-than-chip images.

All collectives are emitted by XLA from sharding annotations — no explicit
communication code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from camradepth_tpu.config import MeshConfig


def create_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = max(1, cfg.fsdp_parallel)
    sp = max(1, cfg.spatial_parallel)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // (fsdp * sp)
    if data * fsdp * sp != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{sp} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, fsdp, sp)
    return Mesh(dev_array, (cfg.data_axis, cfg.fsdp_axis, cfg.sp_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig) -> NamedSharding:
    """Batch axis over data; image H axis over sp when enabled."""
    if mesh.shape.get(cfg.sp_axis, 1) > 1:
        return NamedSharding(mesh, P(cfg.data_axis, cfg.sp_axis))
    return NamedSharding(mesh, P(cfg.data_axis))


def param_sharding_rule(mesh: Mesh, cfg: MeshConfig, min_size: int = 2 ** 16):
    """Returns a fn mapping an abstract param -> NamedSharding.

    ZeRO-ish rule: shard the largest axis divisible by the fsdp size for
    params above ``min_size`` elements; replicate the rest. With
    fsdp_parallel == 1 everything is replicated (pure DP)."""
    fsdp_size = mesh.shape[cfg.fsdp_axis]

    def rule(x) -> NamedSharding:
        if fsdp_size == 1 or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(
            range(x.ndim), key=lambda d: x.shape[d], reverse=True
        )
        for d in dims:
            if x.shape[d] % fsdp_size == 0:
                spec = [None] * x.ndim
                spec[d] = cfg.fsdp_axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def shard_pytree(tree, mesh: Mesh, cfg: MeshConfig):
    """Apply the param rule across a pytree (used for params + optimizer
    state at init / checkpoint-restore)."""
    rule = param_sharding_rule(mesh, cfg)
    return jax.tree.map(lambda x: jax.device_put(x, rule(x)), tree)


def pytree_shardings(tree, mesh: Mesh, cfg: MeshConfig):
    rule = param_sharding_rule(mesh, cfg)
    return jax.tree.map(rule, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
