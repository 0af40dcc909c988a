"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding correctness is tested on virtual CPU devices (SURVEY.md
§4); the real TPU chip is only used by bench.py. These env vars must be set
before jax initializes, hence this conftest (imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers the axon TPU PJRT plugin and
# forces jax_platforms=axon at interpreter start; env vars alone don't
# undo that, so override through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REFERENCE_ROOT = os.environ.get("FOREST_SLAM_REFERENCE", "/root/reference")
REFERENCE_RESULTS = os.path.join(
    REFERENCE_ROOT, "ros_ws", "src", "pose_estimation_results"
)


def require_reference():
    if not os.path.isdir(REFERENCE_RESULTS):
        pytest.skip("reference golden trajectories not available")
    return REFERENCE_RESULTS


@pytest.fixture
def reference_results_dir():
    return require_reference()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jit-cache references at module teardown.

    The full suite compiles hundreds of XLA:CPU executables in one
    process; with all of them pinned alive, the run deterministically
    segfaults inside ``backend_compile_and_load`` around test ~136
    (LLVM JIT code-memory exhaustion — the same test passes in
    isolation). Releasing executables between modules keeps the JIT
    footprint bounded; cross-module recompiles are rare because jitted
    functions are module-local.
    """
    yield
    jax.clear_caches()
