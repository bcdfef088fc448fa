"""Multi-host (multi-process) SPMD support.

The reference tops out at single-process DataParallel
(runner.py:135-136); camradepth_tpu scales to multi-host pods via
jax.distributed + the helpers in parallel/multihost.py. Real multi-host
behavior is tested by spawning TWO local processes, each with 2 virtual
CPU devices, joined through gloo collectives — a faithful miniature of
a 2-host pod (global device set, non-addressable shards, cross-process
barriers), exactly like the probe JAX's own multiprocess tests use.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from camradepth_tpu.parallel import multihost

REPO = Path(__file__).resolve().parents[1]


def test_single_process_helpers_degrade_to_plain_jax():
    """In single-process mode every helper must behave like vanilla jax
    (so callers can use them unconditionally)."""
    assert not multihost.is_multiprocess()
    assert multihost.is_primary()
    assert list(multihost.process_rows(6)) == [0, 1, 2, 3, 4, 5]

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:2]
    mesh = Mesh(np.asarray(devs).reshape(2), ("data",))
    sh = NamedSharding(mesh, P("data"))
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    a = multihost.put_global({"x": x}, {"x": sh})
    np.testing.assert_array_equal(np.asarray(a["x"]), x)
    assert a["x"].sharding == sh
    b = multihost.local_batch_to_global(x, sh)
    np.testing.assert_array_equal(np.asarray(b), x)
    # replicated_host_tree == device_get
    host = multihost.replicated_host_tree({"x": a["x"], "y": 3.0})
    np.testing.assert_array_equal(host["x"], x)
    multihost.sync()  # no-op single-process


def test_make_loaders_process_shard_partitions_train_rows(monkeypatch):
    """process_shard=(pid, pc): train rows partition disjointly and
    exhaustively (after truncation to a multiple of pc); val/test stay
    replicated; every shard sees the same number of batches."""
    from camradepth_tpu.config import DataConfig
    from camradepth_tpu.data import pipeline

    n = 11
    fake_rows = np.array(
        [[f"f{i}_{j}" for j in range(7)] for i in range(n)], dtype=object
    )
    monkeypatch.setattr(pipeline, "load_split", lambda p: fake_rows)
    cfg = DataConfig(split_path="unused", train_val_split=(9, 1))

    shards = [
        pipeline.make_loaders(cfg, batch_size=2, process_shard=(pid, 2))
        for pid in range(2)
    ]
    train_rows = [
        [r[0] for r in sh["train"].frames.rows] for sh in shards
    ]
    # 9 train rows truncate to 8, split 4+4, disjoint, covering rows 0..7
    assert len(train_rows[0]) == len(train_rows[1]) == 4
    assert not set(train_rows[0]) & set(train_rows[1])
    assert set(train_rows[0]) | set(train_rows[1]) == {
        f"f{i}_0" for i in range(8)
    }
    assert len(shards[0]["train"]) == len(shards[1]["train"])
    # val/test replicated across shards
    for key in ("val", "test"):
        assert [r[0] for r in shards[0][key].frames.rows] == [
            r[0] for r in shards[1][key].frames.rows
        ]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_oracle_loss() -> float:
    """The same seeds/shapes as tests/_multihost_child.py, unsharded."""
    from camradepth_tpu.config import tiny_test_config
    from camradepth_tpu.models.camradepth import CamRaDepth
    from camradepth_tpu.train.diffgrad import diffgrad_norm
    from camradepth_tpu.train.schedule import onecycle
    from camradepth_tpu.train.step import init_state, make_train_step

    cfg = tiny_test_config()
    model = CamRaDepth(cfg.model)
    tx = diffgrad_norm(onecycle(cfg.train.learning_rate, total_steps=10))
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
    h, w = cfg.model.img_size
    accum, per_step = cfg.train.update_interval, 4  # 2 procs x 2 devices
    micro = {
        "features": jax.random.normal(
            jax.random.PRNGKey(7),
            (accum, per_step, h, w, cfg.model.input_channels), jnp.float32),
        "gt_depth": jnp.full((accum, per_step, h, w), 0.5, jnp.float32),
        "seg": jnp.zeros((accum, per_step, h, w), jnp.int32),
        "seg_inter": jnp.zeros((accum, per_step, h // 2, w // 2), jnp.int32),
    }
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
    _, metrics = step(state, micro, jax.random.PRNGKey(1))
    return float(metrics["loss"])


def test_two_process_train_step_parity(tmp_path):
    """Two real OS processes x 2 virtual devices = a 4-device global mesh
    with CROSS-HOST fsdp parameter shards. Asserts: both processes agree
    on the train-step loss, the loss matches a single-process run of the
    same seeds, cross-host state gathers back to host arrays, and only
    the primary writes the checkpoint (visible to the peer after the
    barrier)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the child pins its own device count
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    script = Path(__file__).parent / "_multihost_child.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=2400)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {i} failed:\n{out[-6000:]}"
        assert f"[{i}] DONE" in out
        assert f"[{i}] local_batch_to_global OK" in out
    losses = [
        float(re.search(r"loss=([-+0-9.eE]+)", out).group(1))
        for out in outs
    ]
    assert losses[0] == losses[1], losses
    assert np.isfinite(losses[0])
    # orbax coordinates the single writer itself; both processes call
    # save and both see the finalized directory
    assert "ckpt=" in outs[0] and "ckpt=" in outs[1]
    assert list(Path(tmp_path).glob("ckpt_epoch_*")), "no checkpoint dir"

    ref = _single_process_oracle_loss()
    # sharded (fsdp=4, cross-host all-gathers/reduce-scatters) vs
    # unsharded: only reduction-order roundoff apart
    np.testing.assert_allclose(losses[0], ref, rtol=5e-5)
