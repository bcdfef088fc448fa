"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise pjit/Mesh semantics without claiming the (single, tunneled)
TPU. The environment's axon sitecustomize pins jax_platforms to the TPU
plugin, so we must override both the env var AND the jax config before any
backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives have a 40 s rendezvous TERMINATE deadline
# (rendezvous.cc CHECK-aborts the whole process: "Exiting to ensure a
# consistent program state"). On this 1-core box the 8 virtual devices
# are threads competing for one CPU, and under load a partition can
# easily arrive >40 s late at an all-reduce — observed as
# "Fatal Python error: Aborted" inside block_until_ready. Raise the
# deadlines far beyond any plausible scheduling skew.
for f in ("--xla_cpu_collective_call_warn_stuck_timeout_seconds=600",
          "--xla_cpu_collective_call_terminate_timeout_seconds=3000"):
    if f.split("=")[0] not in flags:
        flags += " " + f
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache on the CPU backend: cache entries here are
# XLA:CPU AOT results whose recorded target-machine features can
# mismatch the host ("+prefer-no-scatter is not supported ... could
# lead to execution errors such as SIGILL", cpu_aot_loader.cc), and we
# observed exactly such hard aborts (Fatal Python error: Aborted inside
# block_until_ready) in processes that loaded poisoned entries. Suite
# runs pay the recompiles; the TPU entry points keep their cache.
