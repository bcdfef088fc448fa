"""Mesh / sharding tests on the 8-device virtual CPU platform: data, fsdp
and spatial axes, forward parity under spatial sharding, sharded train
step via the graft dryrun."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from camradepth_tpu.config import MeshConfig, tiny_test_config
from camradepth_tpu.models.camradepth import CamRaDepth
from camradepth_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_sharding_rule,
)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d[:8]


class TestMesh:
    def test_factorizations(self, devices):
        m = create_mesh(MeshConfig(data_parallel=2, fsdp_parallel=2,
                                   spatial_parallel=2), devices)
        assert m.shape == {"data": 2, "fsdp": 2, "sp": 2}
        m = create_mesh(MeshConfig(data_parallel=-1), devices)
        assert m.shape["data"] == 8
        with pytest.raises(ValueError):
            create_mesh(MeshConfig(data_parallel=3, fsdp_parallel=2),
                        devices)

    def test_param_rule_shards_largest_divisible_axis(self, devices):
        cfg = MeshConfig(data_parallel=2, fsdp_parallel=4,
                         spatial_parallel=1)
        mesh = create_mesh(cfg, devices)
        rule = param_sharding_rule(mesh, cfg, min_size=0)
        s = rule(jnp.zeros((3, 8)))
        assert s.spec == P(None, "fsdp")
        s = rule(jnp.zeros((16, 6)))
        assert s.spec == P("fsdp", None)
        s = rule(jnp.zeros((3, 5)))  # nothing divisible -> replicate
        assert s.spec == P()

    def test_batch_sharding_includes_sp(self, devices):
        cfg = MeshConfig(data_parallel=2, fsdp_parallel=2,
                         spatial_parallel=2)
        mesh = create_mesh(cfg, devices)
        assert batch_sharding(mesh, cfg).spec == P("data", "sp")


class TestSpatialParallelForward:
    def test_matches_unsharded(self, devices):
        cfg = tiny_test_config().model
        model = CamRaDepth(cfg)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 64, 128, 7)),
            jnp.float32,
        )
        v = model.init({"params": jax.random.PRNGKey(0)}, x,
                       deterministic=True)
        ref = model.apply(v, x, deterministic=True)["depth"]["final_depth"]

        mesh = Mesh(np.asarray(devices).reshape(2, 4), ("data", "sp"))
        xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
        vs = jax.device_put(v, NamedSharding(mesh, P()))
        fwd = jax.jit(
            lambda v, x: model.apply(v, x, deterministic=True)["depth"][
                "final_depth"
            ],
            out_shardings=NamedSharding(mesh, P("data", "sp")),
        )
        out = fwd(vs, xs)
        # GSPMD halo exchanges + GN cross-shard reductions must reproduce
        # the single-device result
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-6
        )


class TestGraftDryrun:
    def test_full_step_on_2x2x2(self, devices):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
