"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on fake CPU devices
(xla_force_host_platform_device_count) standing in for a pod slice; real-TPU
benchmarking happens in bench.py, not in tests.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests
# must override it — unit tests run on the host CPU with 8 virtual devices.
# NB: a pytest plugin imports jax before this conftest runs, so setting the
# env var alone is not enough; update the live config as well.
# BMTPU_TPU_TESTS=1 keeps the real TPU backend so the tpu-only parity tests
# (test_tpu_msm.py) can run: BMTPU_TPU_TESTS=1 BMTPU_SLOW=1 pytest ...
_TPU_TESTS = os.environ.get("BMTPU_TPU_TESTS") == "1"
if not _TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: the big prover graphs compile once, then every
# later pytest invocation reuses them.
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

import random

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute tests (mesh prover at real shapes, real-pk "
        "integration); enabled with BMTPU_SLOW=1 or -m slow")


def pytest_collection_modifyitems(config, items):
    """Test tiering (VERDICT r3 weak #7): the default suite must stay fast on
    a 2-core host, so slow-marked tests skip unless explicitly requested."""
    if os.environ.get("BMTPU_SLOW") == "1":
        return
    expr = config.getoption("-m") or ""
    if "slow" in expr and "not slow" not in expr:
        return
    skip = pytest.mark.skip(
        reason="slow tier: set BMTPU_SLOW=1 or run -m slow")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)


@pytest.fixture
def rng():
    return random.Random(0xB10C)
