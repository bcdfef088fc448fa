"""Gradient-parity sanitizer: the mesh layouts the Trainer permits produce
EXACT gradients; the layouts it refuses are refused for a reason (an
upstream XLA GSPMD conv-grad bug, pinned by a minimal repro below)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from camradepth_tpu.config import MeshConfig
from camradepth_tpu.parallel.gradcheck import grad_parity


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d[:8]


class TestPermittedLayouts:
    def test_data_only_exact(self, devices):
        r = grad_parity(MeshConfig(data_parallel=4))
        assert r["ok"], r["bad_leaves"][:5]

    def test_data_x_fsdp_exact(self, devices):
        r = grad_parity(MeshConfig(data_parallel=2, fsdp_parallel=2))
        assert r["ok"], r["bad_leaves"][:5]

    def test_sp2_sole_axis_exact(self, devices):
        r = grad_parity(
            MeshConfig(data_parallel=1, spatial_parallel=2)
        )
        assert r["ok"], r["bad_leaves"][:5]


class TestUpstreamBugPin:
    """When an XLA upgrade makes these pass, the Trainer's sp restrictions
    (train/trainer.py::_auto_mesh) can be lifted."""

    def test_upstream_bug_is_present(self, devices):
        """Minimal repro: a PLAIN conv grad is wrong when the batch is
        replicated over one mesh axis while H is sharded over another."""
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 8),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8),
                              jnp.float32) * 0.1

        def loss(w, x):
            z = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return (z ** 2).mean()

        vg = jax.value_and_grad(loss)
        _, g0 = jax.jit(vg)(w, x)
        mesh = Mesh(
            np.array(devices[:4]).reshape(2, 2), ("fsdp", "sp")
        )
        repl = NamedSharding(mesh, P())
        xspec = NamedSharding(mesh, P(None, "sp"))
        _, g1 = jax.jit(vg, in_shardings=(repl, xspec))(
            jax.device_put(w, repl), jax.device_put(x, xspec)
        )
        rel = float(jnp.abs(g0 - g1).max()) / float(jnp.abs(g0).max())
        if rel < 1e-3:
            pytest.fail(
                "XLA conv-grad partial-replication bug appears FIXED in "
                "this jax/XLA build — lift the sp restrictions in "
                "train/trainer.py::_auto_mesh and parallel/mesh.py, and "
                "re-verify fsdp x sp with grad_parity."
            )

    def test_fsdp_x_sp_still_bad(self, devices):
        r = grad_parity(
            MeshConfig(data_parallel=1, fsdp_parallel=2,
                       spatial_parallel=2)
        )
        # forward stays exact even on the bad layout
        assert r["loss_diff"] < 1e-5
        if r["ok"]:
            pytest.fail(
                "fsdp x sp gradients now exact — lift the Trainer "
                "restriction."
            )
