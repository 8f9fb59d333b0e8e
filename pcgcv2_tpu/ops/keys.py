"""Raveled coordinate keys — the canonical ordering of the sparse voxel world.

The reference treats the mixed-radix ravel of integer coordinates as the
canonical sort order and set-membership key (`array2vector`,
/root/reference/data_utils.py:55-61; sort contract between encoder and decoder
at /root/reference/coder.py:84,98-99).  Here the same idea becomes the core
data-structure invariant: every `SparseVoxels` keeps its rows sorted by the
int64 ravel of (batch, x, y, z), padding rows carry the maximal PAD_KEY so they
sort to the end, and every neighborhood/set operation is a `searchsorted` over
that sorted key vector — fully on device, with static shapes.

Unlike the reference (which recomputes a data-dependent radix `max()+1` per
call), we use a fixed radix R = 2**COORD_BITS per axis so keys are stable
across calls, strides and scales, and never require a host sync.

NOTE: int64 keys require `jax_enable_x64` (tests/conftest.py turns it on);
the production block backend (ops/blocks.py) is int32-native and the package
deliberately leaves x64 off — this module is test-oracle support only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Per-axis coordinate budget.  vox12 content spans [0, 4096); strides reach 8;
# 2**14 = 16384 leaves headroom for any supported resolution.
COORD_BITS = 14
R = 1 << COORD_BITS  # 16384

# Padding rows use this batch index; its key ravels above every real key.
PAD_BATCH = (1 << 17) - 1  # 131071, far above any real batch size
# Padding coordinate row (batch, x, y, z).
PAD_COORD = (PAD_BATCH, R - 1, R - 1, R - 1)


def ravel(coords: jax.Array) -> jax.Array:
    """[N, 4] int coords (batch, x, y, z) -> [N] int64 keys.

    Key = ((b * R + x) * R + y) * R + z: lexicographic in (b, x, y, z).
    Replaces the reference's `array2vector` (data_utils.py:55) with a fixed
    radix (no data-dependent `max()+1`, no host transfer).
    """
    c = coords.astype(jnp.int64)
    return ((c[..., 0] * R + c[..., 1]) * R + c[..., 2]) * R + c[..., 3]


# Key of a padding row; every real key is strictly smaller.
PAD_KEY = int(((PAD_BATCH * R + (R - 1)) * R + (R - 1)) * R + (R - 1))


def unravel(keys: jax.Array) -> jax.Array:
    """[N] int64 keys -> [N, 4] int32 coords. Inverse of `ravel`."""
    z = keys % R
    rem = keys // R
    y = rem % R
    rem = rem // R
    x = rem % R
    b = rem // R
    return jnp.stack([b, x, y, z], axis=-1).astype(jnp.int32)


def sort_by_key(keys: jax.Array, *payloads: jax.Array):
    """Sort rows by key; returns (sorted_keys, *gathered_payloads).

    Payloads are gathered through the sorting permutation (cheaper than
    carrying wide float payloads through the sort network itself).
    """
    n = keys.shape[0]
    perm = jnp.argsort(keys)
    out = tuple(p[perm] for p in payloads)
    return (keys[perm],) + out


def searchsorted(sorted_keys: jax.Array, queries: jax.Array) -> jax.Array:
    """Index of first element >= query in `sorted_keys`. int32, any query shape."""
    return jnp.searchsorted(sorted_keys, queries, side="left").astype(jnp.int32)


def lookup(sorted_keys: jax.Array, queries: jax.Array):
    """(idx, hit) for each query key against a sorted key vector.

    `idx` is clamped into range; `hit` is True iff the exact key is present
    and is not the PAD_KEY sentinel.  This is the device-side replacement for
    the reference's CPU/numpy `isin` (data_utils.py:63-75).
    """
    n = sorted_keys.shape[0]
    idx = searchsorted(sorted_keys, queries)
    idx = jnp.minimum(idx, n - 1)
    hit = (sorted_keys[idx] == queries) & (queries < PAD_KEY)
    return idx, hit


def isin(sorted_keys: jax.Array, queries: jax.Array) -> jax.Array:
    """Boolean membership of `queries` in sorted `sorted_keys` (PAD excluded)."""
    return lookup(sorted_keys, queries)[1]
