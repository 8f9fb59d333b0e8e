"""Host-side batching of raw integer point sets into padded voxel rows.

Mirrors the reference's load/collate path (`load_sparse_tensor`,
`scale_sparse_tensor`, `sparse_collate` — data_utils.py:103-118,
data_loader.py:42-56) but produces static-capacity padded arrays; all
structure building (the dense-block grid) happens on device inside the
jitted model via `ops.blocks.blockify`.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np


def bucket_capacity(n: int, round_to: int = 65536, slack: float = 1.0) -> int:
    """Round a row count up to a bucket so jit recompiles stay rare."""
    return int(math.ceil(max(n * slack, 1) / round_to)) * round_to


def collate(
    coords_list: Sequence[np.ndarray],
    capacity: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch [N_i, 3] integer coord arrays into padded voxel rows.

    Returns (coords [cap, 4] int32 with a leading batch column, valid [cap]
    bool).  The feature vector is implicit all-ones [N, 1], as in the
    reference (data_utils.py:104, data_loader.py:79); the model derives it
    from `valid`.
    """
    total = sum(len(c) for c in coords_list)
    cap = capacity or bucket_capacity(total)
    if total > cap:
        raise ValueError(f"batch of {total} voxels exceeds capacity {cap}")
    rows = np.zeros((cap, 4), dtype=np.int32)
    valid = np.zeros((cap,), dtype=bool)
    ofs = 0
    for b, c in enumerate(coords_list):
        n = len(c)
        rows[ofs : ofs + n, 0] = b
        rows[ofs : ofs + n, 1:] = c
        ofs += n
    valid[:ofs] = True
    return rows, valid


def scale_coords(coords: np.ndarray, factor: float) -> np.ndarray:
    """Lossy pre-scaling: round(coords * factor), deduplicated — the vox12
    path (ref scale_sparse_tensor, data_utils.py:112-118; README.md:39-40)."""
    scaled = np.round(coords.astype(np.float64) * factor).astype(np.int32)
    return np.unique(scaled, axis=0)
