"""Production-dtype smoke: blockify / conv3 / a train step with x64 OFF.

The suite's conftest enables jax_enable_x64 (for the int64-key sparse
oracle only), but production runs x64-off — a weak-type promotion
(python scalar -> f64) could pass every oracle test yet break the TPU
path, as once happened with the optimizer lr (ADVICE r2).  This test
re-runs the core pipeline in a subprocess with the production config.
"""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")

SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64
import numpy as np

from pcgcv2_tpu.config import BlockPlan, TrainConfig
from pcgcv2_tpu.data.synthetic import torus_cloud
from pcgcv2_tpu.ops import blocks as B
from tests._tiny import TINY_MODEL

# blockify + conv3 with production (x64-off) dtypes
cloud = torus_cloud(40, density=1.0, seed=0)
rows = np.concatenate(
    [np.zeros((len(cloud), 1), np.int32), cloud.astype(np.int32)], axis=1
)
import jax.numpy as jnp
bg = B.blockify(
    jnp.asarray(rows), jnp.ones((len(rows), 1), jnp.float32),
    jnp.ones((len(rows),), bool), nb_cap=256, stride=1, res=64,
    num_batches=1,
)
nbrs = B.neighbor_rows(bg)
w = jnp.ones((3, 3, 3, 1, 4), jnp.float32) * 0.1
out = B.conv3(bg, nbrs, w, jnp.zeros((4,), jnp.float32))
assert out.feats.dtype == jnp.float32, out.feats.dtype

# one tiny train step, production dtypes
from pcgcv2_tpu.train.trainer import Trainer
cfg = TrainConfig(alpha=1.0, beta=1.0, lr=1e-3, batch_size=2, epochs=1)
plan = BlockPlan.for_training(32768, 64, 2)
import tempfile
with tempfile.TemporaryDirectory() as td:
    tr = Trainer(cfg, plan, 32768, logdir=td, ckptdir=td,
                 model_config=TINY_MODEL)
    clouds = [torus_cloud(40, density=1.0, seed=s) for s in (1, 2)]
    tr.train([clouds])
print("X64_OFF_SMOKE_OK")
"""


def test_x64_off_production_dtypes():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "X64_OFF_SMOKE_OK" in proc.stdout
