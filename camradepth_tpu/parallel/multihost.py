"""Multi-host (multi-process) SPMD support.

The reference's parallelism ends at single-process ``nn.DataParallel``
(reference src/main/runner.py:135-136). On TPU pods spanning multiple
hosts JAX runs one process per host in multi-controller SPMD: every
process executes the same Python program, ``jax.devices()`` is the
GLOBAL device set, and only ``jax.local_devices()`` are addressable from
this process. The mesh/sharding code in :mod:`parallel.mesh` already
speaks global devices; what multi-host adds is (a) runtime
initialization, (b) building global arrays when each process holds only
part (or a host copy) of the value, and (c) keeping host-side side
effects (run dirs, logs, checkpoints) single-writer.

This module provides exactly those pieces:

``initialize``
    ``jax.distributed.initialize`` wrapper. MUST run before any JAX
    backend touch (before ``jax.devices()``/first jit). On CPU backends
    it selects the gloo cross-process collectives implementation so the
    same code path is testable with virtual CPU devices (tests spawn
    two local processes; see tests/test_multihost.py).

``put_global``
    ``jax.device_put`` replacement that stays valid when the target
    sharding spans non-addressable devices: each process materializes
    only its addressable shards from a host value that every process
    holds identically (our loaders are seed-deterministic, so every
    process computes the same global batch).

``local_batch_to_global``
    The efficient production path: each host loads only its OWN rows of
    the global batch and the global array is assembled from the
    per-process slices without replicated IO. The Trainer's loaders
    partition split rows STRIDED across processes
    (``data/pipeline.py``: ``sel[:n][pid::pc]``), so the assembled
    global batch is a permutation of the canonical row order — harmless
    for training (every row appears exactly once; the batch-mean loss
    and its gradients are permutation-invariant, pinned by the
    single-process parity test). ``process_rows`` below computes the
    CONTIGUOUS partition that maps positionally onto the global array's
    row order, for callers that need position-faithful assembly (the
    multihost tests use it to verify shard placement).

``replicated_host_tree``
    Gather a (possibly cross-host-sharded) train state back to ordinary
    host arrays on every process — used before checkpoint writes so the
    primary process can serialize regardless of the fsdp layout.

Single-process behavior is identical to the plain jax calls, so callers
can use these helpers unconditionally.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-controller runtime. Call before any backend touch.

    On real TPU pods all arguments are auto-detected from the TPU
    metadata (pass nothing); explicit arguments are for CPU tests and
    non-TPU clusters. Selecting the gloo CPU collective implementation
    must also happen pre-init, so it is done here.
    """
    import jax

    try:
        # Only meaningful for the CPU backend; harmless elsewhere. Gloo
        # is the only in-image cross-process CPU collectives impl.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns host-side side effects (run dirs,
    metric writers, checkpoint serialization)."""
    import jax

    return jax.process_index() == 0


def put_global(tree: Any, shardings: Any):
    """``device_put`` that works when shardings span non-addressable
    devices.

    Every process must hold the same host value for each leaf (SPMD
    discipline — seed-deterministic loaders guarantee this for batches,
    deterministic init for params). Each process materializes only the
    shards living on its local devices; nothing is transferred between
    hosts. ``shardings`` is either a single sharding applied to every
    leaf or a matching pytree of shardings.

    In single-process mode this is exactly ``jax.device_put``.
    """
    import jax

    if not is_multiprocess():
        return jax.device_put(tree, shardings)

    import jax.tree_util as jtu

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: x[idx]
        )

    if jtu.treedef_is_leaf(jtu.tree_structure(shardings)):
        return jax.tree.map(lambda x: put(x, shardings), tree)
    return jax.tree.map(put, tree, shardings)


def local_batch_to_global(local_tree: Any, shardings: Any):
    """Assemble a globally-sharded batch from per-process LOCAL rows.

    Each process passes only the rows it loaded; JAX stitches the
    global array from the process-local pieces (process p's rows land
    at p's device positions — see the module docstring for why the
    Trainer's strided loader partition makes the result a
    training-equivalent permutation). The global batch dimension is
    ``local_rows * process_count``. Single-process: plain device_put.
    """
    import jax
    import jax.tree_util as jtu

    if not is_multiprocess():
        return jax.device_put(local_tree, shardings)

    def mk(x, s):
        return jax.make_array_from_process_local_data(s, np.asarray(x))

    if jtu.treedef_is_leaf(jtu.tree_structure(shardings)):
        return jax.tree.map(lambda x: mk(x, shardings), local_tree)
    return jax.tree.map(mk, local_tree, shardings)


def process_rows(n_rows: int) -> range:
    """Contiguous row slice of a length-``n_rows`` global batch/split
    owned by this process. Row order is contiguous-by-process because
    mesh device order enumerates each process's local devices
    contiguously (jax.devices() sorts by process index), matching
    ``make_array_from_process_local_data``'s layout."""
    import jax

    pc, pi = jax.process_count(), jax.process_index()
    if n_rows % pc:
        raise ValueError(
            f"{n_rows} rows do not divide evenly over {pc} processes"
        )
    per = n_rows // pc
    return range(pi * per, (pi + 1) * per)


def replicated_host_tree(tree: Any):
    """Return the tree as ordinary host (numpy) arrays on EVERY process,
    regardless of how leaves are sharded across hosts.

    Fully-addressable leaves (replicated, or sharded only within this
    host) are fetched directly; leaves with non-addressable shards
    (cross-host fsdp) are all-gathered over ICI/DCN first. Used before
    checkpoint writes so serialization does not depend on the training
    layout."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    if not is_multiprocess():
        return jax.device_get(tree)

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # reshard to fully-replicated (XLA all-gather), after which
            # every process holds an addressable copy
            rep = NamedSharding(x.sharding.mesh, PartitionSpec())
            x = jax.jit(lambda a: a, out_shardings=rep)(x)
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


def sync(name: str = "camradepth") -> None:
    """Cross-process barrier (e.g. after the primary wrote a checkpoint
    directory that others will read)."""
    import jax

    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
