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

KNOWN UPSTREAM BUG (jax 0.9.0 / XLA GSPMD, minimal repro in
tests/test_gradcheck.py): convolution GRADIENTS are miscomputed when
spatially-sharded activations are partially replicated across another
nontrivial mesh axis (e.g. batch replicated over fsdp while H is sharded
over sp) — a plain ``conv_general_dilated`` grad comes back with O(1)
relative error while the forward stays exact. Verified-correct training
layouts (parallel/gradcheck.py asserts these in CI):

  - data-only meshes (any size);
  - data x fsdp with the batch sharded JOINTLY over both axes and params
    over fsdp;
  - sp=2 as the sole nontrivial axis.

The Trainer therefore shards batches over ``(data, fsdp)`` together and
refuses sp > 1 combined with other axes for training; sp remains fully
supported for inference (forward is exact under any sp layout).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from camradepth_tpu.config import MeshConfig


def create_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    """Build the (data, fsdp, sp) mesh.

    On a real multi-chip TPU slice the axis->device assignment matters:
    a naive row-major reshape can put an axis's collectives on long ICI
    paths, so when building over the full global device set we let
    ``mesh_utils.create_device_mesh`` pick a topology-aware ordering
    (the scaling-book recipe: collectives ride nearest-neighbor ICI).
    Explicit PROPER subsets of the device set (tests, the dryrun's
    ``devices[:2]``) and CPU meshes keep the deterministic linear
    order; an explicit list that covers every device (the Trainer
    passes ``jax.devices()[:n]``) still gets the topology-aware
    ordering. Multi-host pods work through this same function —
    ``jax.devices()`` is the global set after
    ``parallel.multihost.initialize`` — with batch/param placement
    handled by :mod:`parallel.multihost` (process-local shards only)."""
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    n = len(devices)
    fsdp = max(1, cfg.fsdp_parallel)
    sp = max(1, cfg.spatial_parallel)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // (fsdp * sp)
    if data * fsdp * sp != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{sp} does not match {n} devices"
        )
    shape = (data, fsdp, sp)
    # jax.devices() only queried lazily: explicit CPU subsets must not
    # force default-backend init on a machine whose default is the TPU
    if (n > 1 and devices[0].platform == "tpu"
            and (not explicit or n == len(jax.devices()))):
        from jax.experimental import mesh_utils

        try:
            dev_array = mesh_utils.create_device_mesh(
                shape, devices=list(devices)
            )
        except Exception:
            dev_array = np.asarray(devices).reshape(shape)
    else:
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (cfg.data_axis, cfg.fsdp_axis, cfg.sp_axis))


def batch_sharding(mesh: Mesh, cfg: MeshConfig) -> NamedSharding:
    """Batch axis jointly over (data, fsdp); image H axis over sp when
    enabled. Joint batch sharding is the standard dp x fsdp layout AND a
    required workaround for the GSPMD conv-grad bug above (batch left
    replicated over fsdp corrupts gradients)."""
    sp = cfg.sp_axis if mesh.shape.get(cfg.sp_axis, 1) > 1 else None
    return NamedSharding(mesh, P((cfg.data_axis, cfg.fsdp_axis), sp))


def param_sharding_rule(mesh: Mesh, cfg: MeshConfig, min_size: int = 2 ** 16):
    """Returns a fn mapping an abstract param -> NamedSharding.

    ZeRO-ish rule: shard the largest axis divisible by the fsdp size for
    params above ``min_size`` elements; replicate the rest. With
    fsdp_parallel == 1 everything is replicated (pure DP)."""
    fsdp_size = mesh.shape[cfg.fsdp_axis]

    def rule(x) -> NamedSharding:
        if fsdp_size == 1 or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        # Depthwise conv kernels (HWIO with I==1, e.g. the MixFFN 3x3
        # dwconv) stay replicated regardless of size: sharding their
        # channel axis makes GSPMD partition the conv's activations by
        # CHANNEL, which conflicts with the joint batch sharding and
        # produces involuntary-remat resharding around every depthwise
        # conv (spmd_partitioner.cc:652). They are tiny (9*C elements)
        # — ZeRO savings are negligible.
        if x.ndim == 4 and x.shape[2] == 1:
            return NamedSharding(mesh, P())
        if x.ndim == 4:
            # Conv kernels (HWIO): only the channel dims are shardable.
            # The generic largest-axis rule once picked a SPATIAL dim
            # for square kernels (the 8x8x8x8 sr conv), and GSPMD cannot
            # partition spatially-sharded-kernel convolutions — it
            # resharded the weight-grad operands via replicate-then-
            # repartition instead (spmd_partitioner.cc:652).
            dims = [3, 2] if x.shape[3] >= x.shape[2] else [2, 3]
        else:
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


def constrain_batch(x, batch_dim: int = 0):
    """Anchor ``batch_dim`` of an activation to the ambient mesh's batch
    axes (whichever of ``data``/``fsdp`` are nontrivial), leaving every
    other dim UNCONSTRAINED. No-op without a ``with mesh:`` context.

    Why this exists: under the joint data x fsdp batch layout, GSPMD's
    sharding propagation sometimes resolves the COTANGENT of an encoder
    projection to a mixed (data-on-batch, fsdp-on-channel) sharding while
    the forward activation is batch-sharded over both axes. The
    weight-gradient dot then contracts operands whose contracted dims
    disagree, and the partitioner falls back to replicate-then-repartition
    ("[SPMD] Involuntary full rematerialization", spmd_partitioner.cc:652
    — the MULTICHIP_r04 warnings). Constraining the forward tensor also
    constrains its cotangent (with_sharding_constraint transposes to
    itself), so both grad-dot operands agree and XLA emits the cheap
    partial-dot + all-reduce instead.

    Axis names are MeshConfig's defaults; spatial/token dims stay
    UNCONSTRAINED so sp-sharded inference layouts are unaffected. Any
    resolution failure (no mesh, axis conflicts under vmapped trials)
    silently returns x — the constraint is an optimization hint, never
    load-bearing for correctness."""
    try:
        from jax._src import mesh as _mesh_lib

        pm = _mesh_lib.thread_resources.env.physical_mesh
        if pm.empty:
            return x
        axes = tuple(a for a in ("data", "fsdp")
                     if pm.shape.get(a, 1) > 1)
        if not axes:
            return x
        spec = [P.UNCONSTRAINED] * x.ndim
        spec[batch_dim] = axes if len(axes) > 1 else axes[0]
        return jax.lax.with_sharding_constraint(x, P(*spec))
    except Exception:
        return x
