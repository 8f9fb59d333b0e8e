"""Device mesh helpers.

The reference is strictly single-GPU (no torch.distributed anywhere —
SURVEY.md §2c); parallelism here is new, TPU-native capability: a 1-D data
parallel mesh over ICI with gradients all-reduced by `psum` under shard_map.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis: str = DP_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
