"""Test harness: force the CPU backend with an 8-device virtual mesh so
multi-chip sharding paths compile and execute without TPU hardware
(SURVEY §4 implication).

Note: the environment's axon site-hook imports jax at interpreter startup and
pins the TPU-tunnel platform, so plain env vars are too late here — we must go
through jax.config. host_platform_device_count gives the 8 virtual CPU devices
for Mesh tests.
"""
import os

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the pipeline/BA tests compile large XLA programs
# (~5 min of compile on a cold run); cache executables across test runs.
# The directory is fingerprinted by host CPU — XLA:CPU cache entries hold
# AOT machine code and a cache carried across machines causes SIGILL
# (see slam_eds_tpu/compile_cache.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from slam_eds_tpu.compile_cache import setup_cache  # noqa: E402

setup_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(3141592)
