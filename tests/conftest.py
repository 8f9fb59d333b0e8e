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
# NOTE: do NOT set --xla_backend_optimization_level=0 here.  It cuts CPU
# compile time ~7x but lowers conv_general_dilated to scalar loops (~45 s
# PER TRAINING STEP of even the tiny test model — measured); with the
# machine-keyed persistent compilation cache below, full-opt compiles are
# paid once and runtime stays ~1 s/step.
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

# The sparse test oracle (ops.sparse / ops.keys) ravels coordinates into
# int64 keys; production code is int32/float32 throughout (explicit dtypes),
# so enabling x64 here affects only the oracle.  The package itself must NOT
# enable x64 (f64 emulation wrecks TPU compile/runtime — see
# pcgcv2_tpu/__init__.py).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: full-model CPU compiles take minutes on this
# single-core host; caching makes re-runs of unchanged computations instant.
# Machine-keyed (pcgcv2_tpu.cache): XLA:CPU AOT artifacts are CPU-feature-
# specialized and poisonous when loaded on a different host.
from pcgcv2_tpu.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
