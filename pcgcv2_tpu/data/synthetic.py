"""Synthetic voxelized surfaces for tests and benchmarks.

The reference benchmarks on 8iVFB scans (not redistributable); these
generators produce surface-like voxel sets with comparable occupancy
statistics (a 2-D manifold embedded in a 3-D grid) at any resolution.
"""

from __future__ import annotations

import numpy as np


def sphere_cloud(
    resolution: int = 128, density: float = 4.0, seed: int = 0
) -> np.ndarray:
    """Voxelized sphere surface; returns unique int32 [N, 3] coords."""
    rng = np.random.RandomState(seed)
    r = resolution * 0.45
    n = int(density * 4 * np.pi * r * r)
    u = rng.randn(n, 3)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = np.round(u * r + resolution / 2).astype(np.int32)
    pts = np.clip(pts, 0, resolution - 1)
    return np.unique(pts, axis=0)


def torus_cloud(
    resolution: int = 1024, density: float = 4.0, seed: int = 0
) -> np.ndarray:
    """Voxelized torus surface — at resolution 1024 and density 4 this yields
    ~0.8-1M voxels, the size class of an 8iVFB vox10 frame
    (ref BASELINE.md: longdress 857,966 points @ 1024)."""
    rng = np.random.RandomState(seed)
    big_r = resolution * 0.30
    small_r = resolution * 0.14
    area = 4 * np.pi * np.pi * big_r * small_r
    n = int(density * area)
    theta = rng.uniform(0, 2 * np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    x = (big_r + small_r * np.cos(phi)) * np.cos(theta)
    y = (big_r + small_r * np.cos(phi)) * np.sin(theta)
    z = small_r * np.sin(phi)
    pts = np.stack([x, y, z], axis=1) + resolution / 2
    pts = np.clip(np.round(pts), 0, resolution - 1).astype(np.int32)
    return np.unique(pts, axis=0)
