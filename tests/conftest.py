"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference has no test suite at all (SURVEY.md §4); we build one that runs
without TPU hardware.  Multi-chip sharding tests use XLA's host-platform
device-count override, per the project testing contract.

These env vars must be set before the first `import jax` anywhere in the test
process, which is why they live at conftest import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Compile-time over run-time for tests: full-model CPU compiles drop ~7x
# (98s -> 14s measured for PCCModel.init) at optimization level 0, and test
# shapes are tiny so the slower generated code is irrelevant.
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Force CPU: the deployment image boots an axon TPU plugin from
# sitecustomize.py and pins JAX_PLATFORMS=axon, so the env var is not enough
# — the config update below overrides it before the first backend query.
# The suite must run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; got " + jax.devices()[0].platform
)

# Verify numerics at full f32 precision; production runs use the backend
# default (bf16 MXU passes on TPU) — a deliberate speed/precision trade,
# not a correctness requirement.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: full-model CPU compiles take minutes on this
# single-core host; caching makes re-runs of unchanged computations instant.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
