"""Test configuration: run all tests on the CPU backend with 8 virtual
devices so multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4: SG tests on CPU backend, MG via fake mesh).
"""

import os
import sys

# Force the CPU backend with 8 virtual devices.  The session environment
# presets JAX_PLATFORMS=axon (a single-chip TPU tunnel whose sitecustomize
# re-registers the axon backend in every interpreter); env vars alone are
# overridden by that hook, so set the jax config directly before any
# backend is initialized.  Concurrent test processes must NOT touch the
# TPU: they would serialize on the single chip grant.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# CPU XLA compiles dominate test runtime; cache them across runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cugraph_gnn_tpu.utils.datasets import load_karate, symmetrize  # noqa: E402


@pytest.fixture(scope="session")
def karate():
    return symmetrize(load_karate())


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
