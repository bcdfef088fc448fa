"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise pjit/Mesh semantics without claiming the (single, tunneled)
TPU. The environment's axon sitecustomize pins jax_platforms to the TPU
plugin, so we must override both the env var AND the jax config before any
backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the tiny-config train step takes minutes to
# compile on CPU; cache hits make repeat suite runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/camradepth_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
