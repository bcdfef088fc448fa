"""bench.py backend probe: bounded retry behavior, no backend touched.

The probe exists because axon backend init HANGS (not errors) when the
tunnel is down; the driver's round-end bench run must fail bounded and
loud instead (CLAUDE.md round-3 notes). These tests exercise the retry
machinery with stand-in probe commands — importing bench must never
initialize a JAX backend.
"""

import time

import pytest

import bench


def test_probe_succeeds_immediately():
    t0 = time.perf_counter()
    platform = bench.probe_backend(attempts=3, probe_timeout_s=30,
                                   sleep_s=60, code="print('cpu')")
    assert time.perf_counter() - t0 < 30  # no sleeps on success
    # the probe reports the backend's REAL platform; main() gates the
    # persistent compile cache on this (never enable it on XLA:CPU)
    assert platform == "cpu"


def test_probe_retries_then_raises_on_failure():
    with pytest.raises(SystemExit, match="unreachable after 2 probes"):
        bench.probe_backend(attempts=2, probe_timeout_s=30, sleep_s=0,
                            code="import sys; sys.exit(3)")


def test_probe_bounds_a_hang():
    t0 = time.perf_counter()
    with pytest.raises(SystemExit, match="hung"):
        bench.probe_backend(attempts=1, probe_timeout_s=2, sleep_s=0,
                            code="import time; time.sleep(600)")
    assert time.perf_counter() - t0 < 30
