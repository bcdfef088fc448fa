"""Child process for tests/test_multihost.py.

Run as: python _multihost_child.py <process_id> <num_processes> <port> <out_dir>

Each process brings 2 virtual CPU devices; the global mesh is
data=1 x fsdp=<2*num_processes>, so parameter shards CROSS the host
boundary (the hardest layout for checkpointing). The child:

  1. joins the multi-controller runtime (gloo CPU collectives),
  2. checks local_batch_to_global against put_global on a small array,
  3. runs ONE real train step (tiny model, diffGradNorm, microbatch
     accumulation) with the batch sharded jointly over (data, fsdp),
  4. prints the loss (the parent asserts cross-process agreement AND
     parity with a single-process run of the same seeds),
  5. gathers the cross-host-sharded state via replicated_host_tree and
     the PRIMARY alone writes a checkpoint; the other process waits on
     the barrier and verifies the directory appeared.
"""

import os
import sys

pid, nproc, port, out_dir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=3000"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from camradepth_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from camradepth_tpu.config import MeshConfig, tiny_test_config  # noqa: E402
from camradepth_tpu.models.camradepth import CamRaDepth  # noqa: E402
from camradepth_tpu.parallel.mesh import (  # noqa: E402
    create_mesh,
    param_sharding_rule,
    replicated,
)
from camradepth_tpu.train.diffgrad import diffgrad_norm  # noqa: E402
from camradepth_tpu.train.schedule import onecycle  # noqa: E402
from camradepth_tpu.train.step import (  # noqa: E402
    TrainState,
    init_state,
    make_train_step,
)
from camradepth_tpu.utils import checkpoint as ckpt_util  # noqa: E402

n_global = len(jax.devices())
assert n_global == 2 * nproc, jax.devices()
assert multihost.is_multiprocess()
assert multihost.is_primary() == (pid == 0)

mesh_cfg = MeshConfig(data_parallel=1, fsdp_parallel=n_global,
                      spatial_parallel=1)
mesh = create_mesh(mesh_cfg, jax.devices())

# --- 2. local_batch_to_global stitches per-process rows correctly ----
rows_spec = NamedSharding(mesh, P((mesh_cfg.data_axis, mesh_cfg.fsdp_axis)))
full = np.arange(n_global * 3, dtype=np.float32).reshape(n_global, 3)
mine = full[list(multihost.process_rows(n_global))]
stitched = multihost.local_batch_to_global(mine, rows_spec)
via_put = multihost.put_global(full, rows_spec)
rep = jax.jit(lambda a: a, out_shardings=replicated(mesh))
np.testing.assert_array_equal(
    np.asarray(rep(stitched)), np.asarray(rep(via_put))
)
print(f"[{pid}] local_batch_to_global OK", flush=True)

# --- 3. one real train step over the cross-host mesh -----------------
cfg = tiny_test_config()
model = CamRaDepth(cfg.model)
tx = diffgrad_norm(onecycle(cfg.train.learning_rate, total_steps=10))
state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
rule = param_sharding_rule(mesh, mesh_cfg, min_size=0)
shardings = TrainState(
    params=jax.tree.map(rule, state.params),
    opt_state=jax.tree.map(rule, state.opt_state),
    step=replicated(mesh),
)
state = multihost.put_global(state, shardings)
# at fsdp == n_global >= 4, some param shards must be non-addressable
assert any(
    not leaf.is_fully_addressable
    for leaf in jax.tree.leaves(state.params)
), "expected cross-host parameter shards"

h, w = cfg.model.img_size
accum, per_step = cfg.train.update_interval, n_global
micro_host = {
    "features": np.asarray(jax.random.normal(
        jax.random.PRNGKey(7),
        (accum, per_step, h, w, cfg.model.input_channels), jnp.float32)),
    "gt_depth": np.full((accum, per_step, h, w), 0.5, np.float32),
    "seg": np.zeros((accum, per_step, h, w), np.int32),
    "seg_inter": np.zeros((accum, per_step, h // 2, w // 2), np.int32),
}
micro_spec = NamedSharding(
    mesh, P(None, (mesh_cfg.data_axis, mesh_cfg.fsdp_axis))
)
micro = multihost.put_global(micro_host, micro_spec)
step = jax.jit(
    make_train_step(cfg, model, tx),
    in_shardings=(shardings, micro_spec, None),
    out_shardings=(shardings, None),
    donate_argnums=(0,),
)
rng = multihost.put_global(jax.random.PRNGKey(1), replicated(mesh))
with mesh:
    state, metrics = step(state, micro, rng)
    jax.block_until_ready(state)
print(f"[{pid}] loss={float(metrics['loss']):.8f}", flush=True)

# --- 5. gather cross-host shards; collective checkpoint save ---------
# orbax's Checkpointer.save is a collective in multi-process runs (it
# syncs global devices internally and coordinates the single writer),
# so every process calls it with the gathered host state.
host_state = multihost.replicated_host_tree(state)
for leaf in jax.tree.leaves(host_state.params):
    assert isinstance(np.asarray(leaf), np.ndarray)
path = ckpt_util.save_checkpoint(out_dir, host_state, 0, 0.5)
print(f"[{pid}] ckpt={path}", flush=True)
multihost.sync("ckpt")
found = ckpt_util.latest_checkpoint(out_dir)
assert found is not None, "checkpoint not visible after save"
print(f"[{pid}] DONE", flush=True)
