"""TPU-native sparse voxel tensor and convolution ops — the TEST ORACLE.

Role: this per-voxel backend is the semantic ground truth that the
production dense-block backend (`ops/blocks.py`) is validated against in
`tests/test_blocks.py`.  It is not on the model's hot path (per-voxel
gathers measure ~10x slower than block-dense MXU convs at vox10 scale on a
TPU chip); keep it in sync with `ops/blocks.py` semantics, not performance.

This module is the replacement for MinkowskiEngine (the reference's entire
C++/CUDA sparse-conv runtime — usage sites: /root/reference/autoencoder.py,
coder.py:102, data_utils.py:77-118).  Design, TPU-first:

* **Static shapes.** A `SparseVoxels` has a fixed row capacity; `count` rows
  are valid, the rest are padding with coords = PAD_COORD, feats = 0, and
  key = PAD_KEY.  Every op is shape-stable and jit/grad/vmap/shard_map safe.

* **Sorted-key invariant.** Rows are always sorted by the int64 ravel of
  (batch, x, y, z) (see ops/keys.py).  Because PAD_KEY is maximal, valid rows
  are compact at the front.  This single invariant replaces ME's coordinate
  manager + GPU hash maps: every neighborhood query is a `searchsorted`.

* **Kernel maps are explicit and reusable.** A kernel map for a 3x3x3 stencil
  is (neighbor_index, hit_mask) of shape [N, 27].  All stride-1 convs at the
  same scale share one kernel map (the reference rebuilds/caches these inside
  ME's coordinate manager; here reuse is explicit in the model code).

* **MXU-friendly compute.** A sparse conv is gather -> one [N, k*Cin] x
  [k*Cin, Cout] matmul per offset group -> accumulate.  No scatter is needed
  for stride-1 convs (output coords == input coords).  Generative transposed
  conv is a single [N, Cin] x [Cin, 8*Cout] matmul followed by a key sort.

* **No host syncs.** Top-k pruning, set-membership (`isin`) and per-batch
  counts — all CPU round-trips in the reference (data_utils.py:63-89) — run
  on device.
"""

from __future__ import annotations

import itertools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pcgcv2_tpu.ops import keys as K

# numpy, not jnp: a module-level jnp constant would initialize the JAX
# backend at import time (blocking on the TPU tunnel in axon setups and
# defeating later jax_platforms selection); jnp.where/broadcast_to
# convert it on first use inside jit.
PAD_COORD_ARR = np.array(K.PAD_COORD, dtype=np.int32)


@struct.dataclass
class SparseVoxels:
    """A batch of sparse voxel sets as one padded, key-sorted COO tensor.

    coords : int32 [capacity, 4]  — (batch, x, y, z); padding rows = PAD_COORD
    feats  : float [capacity, C]  — padding rows are all-zero
    keys   : int64 [capacity]     — ravel(coords), ascending; padding = PAD_KEY
    count  : int32 []             — number of valid rows (always <= capacity)
    stride : static int           — voxel stride (1 at full resolution)
    """

    coords: jax.Array
    feats: jax.Array
    keys: jax.Array
    count: jax.Array
    stride: int = struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def channels(self) -> int:
        return self.feats.shape[1]

    @property
    def valid(self) -> jax.Array:
        """[capacity] bool — True for real rows (compact at the front)."""
        return (
            jnp.arange(self.capacity, dtype=jnp.int32) < self.count.astype(jnp.int32)
        )

    def with_feats(self, feats: jax.Array) -> "SparseVoxels":
        """Same coordinate set, new features (zeroed on padding rows)."""
        feats = jnp.where(self.valid[:, None], feats, 0)
        return self.replace(feats=feats)

    def num_per_batch(self, num_batches: int) -> jax.Array:
        """Valid-row count per batch item, on device.

        Replaces `decomposed_coordinates` length queries
        (/root/reference/pcc_model.py:31), which force a GPU->CPU sync.
        """
        b = self.coords[:, 0].astype(jnp.int64)
        # Rows are batch-major sorted; PAD_BATCH sorts after all real batches.
        bounds = jnp.searchsorted(
            b, jnp.arange(num_batches + 1, dtype=jnp.int64), side="left"
        )
        return jnp.diff(bounds).astype(jnp.int32)


def _pad_rows(coords, feats, keys, valid):
    coords = jnp.where(valid[:, None], coords, PAD_COORD_ARR[None, :])
    feats = jnp.where(valid[:, None], feats, 0)
    keys = jnp.where(valid, keys, K.PAD_KEY)
    return coords, feats, keys


def build(
    coords: jax.Array,
    feats: jax.Array,
    count: Optional[jax.Array] = None,
    stride: int = 1,
    dedupe: bool = False,
    capacity: Optional[int] = None,
    valid_mask: Optional[jax.Array] = None,
) -> SparseVoxels:
    """Construct a SparseVoxels from (possibly unsorted) padded rows.

    `coords` [N, 4] int32 with `count` valid rows at arbitrary positions is
    sorted into the canonical key order.  With `dedupe=True` duplicate
    coordinates are merged (first feature row wins), which is the semantics
    of `ME.utils.sparse_collate` after `scale_sparse_tensor` rounding
    (/root/reference/data_utils.py:112-118).  Validity is either the first
    `count` rows or an explicit boolean `valid_mask` (e.g. for in-jit
    collation of per-item padded batches, where valid rows are scattered).
    """
    n = coords.shape[0]
    cap = capacity or n
    if valid_mask is not None:
        valid = valid_mask
        count = jnp.sum(valid.astype(jnp.int32))
    else:
        assert count is not None
        valid = jnp.arange(n, dtype=jnp.int32) < count
    raw_keys = K.ravel(coords)
    raw_keys = jnp.where(valid, raw_keys, K.PAD_KEY)
    skeys, scoords, sfeats = K.sort_by_key(raw_keys, coords, feats)
    if dedupe:
        skeys, scoords, sfeats, count = _unique_compact(skeys, sfeats, cap)
        coords, feats, keys = scoords, sfeats, skeys
    else:
        coords, feats, keys = _resize_rows(scoords, sfeats, skeys, cap)
    valid = jnp.arange(cap, dtype=jnp.int32) < count
    coords, feats, keys = _pad_rows(coords, feats, keys, valid)
    return SparseVoxels(
        coords=coords, feats=feats, keys=keys,
        count=count.astype(jnp.int32), stride=stride,
    )


def _resize_rows(coords, feats, keys, cap):
    n = keys.shape[0]
    if cap == n:
        return coords, feats, keys
    if cap < n:
        return coords[:cap], feats[:cap], keys[:cap]
    pc = jnp.broadcast_to(PAD_COORD_ARR, (cap - n, 4))
    coords = jnp.concatenate([coords, pc], axis=0)
    feats = jnp.concatenate(
        [feats, jnp.zeros((cap - n, feats.shape[1]), feats.dtype)], axis=0
    )
    keys = jnp.concatenate(
        [keys, jnp.full((cap - n,), K.PAD_KEY, dtype=keys.dtype)], axis=0
    )
    return coords, feats, keys


def _unique_compact(sorted_keys, sorted_feats, cap):
    """Deduplicate a sorted key vector, compacting into `cap` rows."""
    n = sorted_keys.shape[0]
    valid = sorted_keys < K.PAD_KEY
    first = jnp.concatenate(
        [jnp.array([True]), sorted_keys[1:] != sorted_keys[:-1]]
    ) & valid
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    count = jnp.maximum(jnp.sum(first.astype(jnp.int32)), 0)
    pos = jnp.where(first, pos, cap)  # out-of-range -> dropped by scatter
    out_keys = jnp.full((cap,), K.PAD_KEY, dtype=sorted_keys.dtype)
    out_keys = out_keys.at[pos].set(sorted_keys, mode="drop")
    out_feats = jnp.zeros((cap, sorted_feats.shape[1]), sorted_feats.dtype)
    out_feats = out_feats.at[pos].set(sorted_feats, mode="drop")
    out_coords = K.unravel(out_keys)
    count = jnp.minimum(count, cap)
    return out_keys, out_coords, out_feats, count


# ---------------------------------------------------------------------------
# Stencils and kernel maps
# ---------------------------------------------------------------------------


def stencil_offsets(kernel_size: int, stride_units: int) -> jnp.ndarray:
    """Integer coordinate offsets of a cubic stencil, fixed enumeration order.

    kernel_size=3 -> 27 offsets in {-s, 0, s}^3 (stride-1 conv neighborhoods,
    ref ME.MinkowskiConvolution kernel_size=3 at autoencoder.py:13).
    kernel_size=2 -> 8 offsets in {0, s}^3 (down-conv / generative up-conv
    child positions, ref autoencoder.py:78,155).
    """
    if kernel_size == 3:
        rng = (-stride_units, 0, stride_units)
    elif kernel_size == 2:
        rng = (0, stride_units)
    else:
        raise ValueError(f"unsupported kernel_size {kernel_size}")
    offs = list(itertools.product(rng, rng, rng))
    return jnp.array(offs, dtype=jnp.int32)


def build_kernel_map(
    sv: SparseVoxels,
    offsets: jax.Array,
    query_coords: Optional[jax.Array] = None,
    query_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(neighbor_idx [Nq, K] int32, hit [Nq, K] bool) for a stencil.

    For each query coordinate q and offset d, finds the input row with
    coordinate q + d via searchsorted over the sorted key vector.  This is
    the device-side replacement for ME's kernel-map hash construction.
    Queries default to the tensor's own coordinates (stride-1 convs).
    """
    if query_coords is None:
        query_coords = sv.coords
        query_valid = sv.valid
    nq = query_coords.shape[0]
    q_xyz = query_coords[:, None, 1:] + offsets[None, :, :]  # [Nq, K, 3]
    q_b = jnp.broadcast_to(
        query_coords[:, None, :1], (nq, offsets.shape[0], 1)
    )
    in_range = jnp.all((q_xyz >= 0) & (q_xyz < K.R), axis=-1)
    if query_valid is not None:
        in_range = in_range & query_valid[:, None]
    q = jnp.concatenate([q_b, q_xyz], axis=-1)
    qkeys = jnp.where(in_range, K.ravel(q), K.PAD_KEY)
    idx, hit = K.lookup(sv.keys, qkeys)
    return idx, hit


def apply_kernel_map(
    feats: jax.Array,
    nbr_idx: jax.Array,
    hit: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    group_size: int = 9,
    accum_dtype=jnp.float32,
) -> jax.Array:
    """Gather-GEMM sparse convolution given a prebuilt kernel map.

    weight: [K, Cin, Cout].  Offsets are processed in groups: each group is a
    single [N, g*Cin] x [g*Cin, Cout] matmul (MXU-shaped), with the group size
    bounding the gathered-activation transient in HBM.
    """
    n, kk = nbr_idx.shape
    cin = feats.shape[1]
    cout = weight.shape[-1]
    acc = jnp.zeros((n, cout), dtype=accum_dtype)
    for g0 in range(0, kk, group_size):
        g1 = min(g0 + group_size, kk)
        g = feats[nbr_idx[:, g0:g1]]  # [N, g, Cin]
        g = jnp.where(hit[:, g0:g1, None], g, 0)
        w = weight[g0:g1].reshape((g1 - g0) * cin, cout)
        acc = acc + jnp.dot(
            g.reshape(n, (g1 - g0) * cin), w.astype(feats.dtype),
            preferred_element_type=accum_dtype,
        )
    if bias is not None:
        acc = acc + bias
    return acc.astype(feats.dtype)


def conv(
    sv: SparseVoxels,
    kmap: Tuple[jax.Array, jax.Array],
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    group_size: int = 9,
) -> SparseVoxels:
    """Stride-1 sparse convolution: output coords == input coords."""
    out = apply_kernel_map(sv.feats, kmap[0], kmap[1], weight, bias, group_size)
    return sv.with_feats(out)


# ---------------------------------------------------------------------------
# Resolution-changing convolutions
# ---------------------------------------------------------------------------


def downsample_coords(sv: SparseVoxels, out_capacity: int):
    """Unique parent coordinates at stride 2s (kernel=2, stride=2 down-conv).

    Output coordinate set of ME.MinkowskiConvolution(kernel_size=2, stride=2)
    (ref autoencoder.py:78-84): each input voxel maps to the even multiple of
    2*stride containing it; output rows are the unique parents, key-sorted.
    Returns (parent_coords [cap,4], parent_keys, parent_valid, count).
    """
    s2 = 2 * sv.stride
    parent_xyz = (sv.coords[:, 1:] // s2) * s2
    parent = jnp.concatenate([sv.coords[:, :1], parent_xyz], axis=-1)
    parent = jnp.where(sv.valid[:, None], parent, PAD_COORD_ARR[None, :])
    pkeys = jnp.where(sv.valid, K.ravel(parent), K.PAD_KEY)
    skeys = jnp.sort(pkeys)
    dummy = jnp.zeros((skeys.shape[0], 1), dtype=sv.feats.dtype)
    out_keys, out_coords, _, count = _unique_compact(skeys, dummy, out_capacity)
    out_valid = jnp.arange(out_capacity, dtype=jnp.int32) < count
    return out_coords, out_keys, out_valid, count


def conv_down(
    sv: SparseVoxels,
    weight: jax.Array,
    bias: Optional[jax.Array],
    out_capacity: int,
    group_size: int = 8,
) -> SparseVoxels:
    """Strided down-convolution (kernel=2, stride=2): stride s -> 2s.

    weight: [8, Cin, Cout] indexed by the {0, s}^3 child-offset stencil.
    """
    out_coords, out_keys, out_valid, count = downsample_coords(sv, out_capacity)
    offsets = stencil_offsets(2, sv.stride)
    nbr, hit = build_kernel_map(sv, offsets, out_coords, out_valid)
    feats = apply_kernel_map(sv.feats, nbr, hit, weight, bias, group_size)
    feats = jnp.where(out_valid[:, None], feats, 0)
    return SparseVoxels(
        coords=out_coords, feats=feats, keys=out_keys,
        count=count.astype(jnp.int32), stride=2 * sv.stride,
    )


def conv_up_generative(
    sv: SparseVoxels,
    weight: jax.Array,
    bias: Optional[jax.Array],
) -> SparseVoxels:
    """Generative transposed convolution (kernel=2, stride=2): stride 2s -> s.

    Every valid parent emits all 8 children at parent + {0, s}^3 — the
    upsampling that *creates* coordinates (ref
    ME.MinkowskiGenerativeConvolutionTranspose, autoencoder.py:155,182,209).
    Parents are unique at stride 2s, so children are unique by construction;
    output capacity is exactly 8x the input capacity.  The child feature
    computation is one [N, Cin] x [Cin, 8*Cout] matmul.
    """
    assert sv.stride % 2 == 0, "generative up-conv needs even stride"
    s_out = sv.stride // 2
    n = sv.capacity
    cin = sv.channels
    cout = weight.shape[-1]
    deltas = stencil_offsets(2, s_out)  # [8, 3]

    child_xyz = sv.coords[:, None, 1:] + deltas[None, :, :]  # [N, 8, 3]
    child_b = jnp.broadcast_to(sv.coords[:, None, :1], (n, 8, 1))
    child = jnp.concatenate([child_b, child_xyz], axis=-1)
    child = jnp.where(sv.valid[:, None, None], child, PAD_COORD_ARR[None, None, :])

    w = weight.transpose(1, 0, 2).reshape(cin, 8 * cout)  # [Cin, 8*Cout]
    cf = jnp.dot(
        sv.feats, w.astype(sv.feats.dtype), preferred_element_type=jnp.float32
    ).reshape(n, 8, cout)
    if bias is not None:
        cf = cf + bias
    cf = jnp.where(sv.valid[:, None, None], cf, 0).astype(sv.feats.dtype)

    flat_coords = child.reshape(8 * n, 4)
    flat_feats = cf.reshape(8 * n, cout)
    flat_keys = jnp.where(
        sv.valid[:, None], K.ravel(child), K.PAD_KEY
    ).reshape(8 * n)
    skeys, scoords, sfeats = K.sort_by_key(flat_keys, flat_coords, flat_feats)
    return SparseVoxels(
        coords=scoords, feats=sfeats, keys=skeys,
        count=(8 * sv.count).astype(jnp.int32), stride=s_out,
    )


# ---------------------------------------------------------------------------
# Pruning (top-k occupancy selection)
# ---------------------------------------------------------------------------

# plain int, not jnp.int64: module-level device scalars initialize the JAX
# backend at import time (see PAD_COORD_ARR note above)
_COMPACT_OFFSET = 1 << 61


def topk_mask(
    sv: SparseVoxels,
    scores: jax.Array,
    nums: jax.Array,
    num_batches: int,
) -> jax.Array:
    """Per-batch-item top-k mask over `scores`, fully on device.

    Replaces the reference's `istopk` (data_utils.py:77-89), which loops over
    batch items and runs `torch.topk` on CPU.  `nums` is int32 [num_batches];
    k is implicitly min(k, rows available in that batch item), matching the
    reference's `min(len(row_indices), N*rho)`.
    """
    n = sv.capacity
    b = jnp.where(sv.valid, sv.coords[:, 0], jnp.int32(num_batches)).astype(
        jnp.int32
    )
    neg = jnp.where(sv.valid, -scores.reshape(n), jnp.inf).astype(jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)
    sb, _, sidx = jax.lax.sort((b, neg, idx), num_keys=2)
    starts = jnp.searchsorted(
        sb, jnp.arange(num_batches, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    sb_c = jnp.clip(sb, 0, num_batches - 1)
    rank = idx - starts[sb_c]
    k_row = jnp.where(sb < num_batches, nums[sb_c], 0)
    keep_sorted = rank < k_row
    keep = jnp.zeros((n,), dtype=bool).at[sidx].set(keep_sorted)
    return keep & sv.valid


def prune(sv: SparseVoxels, keep: jax.Array, out_capacity: int) -> SparseVoxels:
    """Compact rows where `keep` is True into a (possibly smaller) tensor.

    Replaces ME.MinkowskiPruning (ref autoencoder.py:237,247).  Kept rows
    stay key-sorted; dropped and padding rows are sorted past them via a
    single combined-key sort, then truncated to `out_capacity`.
    """
    keep = keep & sv.valid
    ckey = sv.keys + jnp.where(keep, jnp.int64(0), _COMPACT_OFFSET)
    skeys, scoords, sfeats = K.sort_by_key(ckey, sv.coords, sv.feats)
    count = jnp.sum(keep.astype(jnp.int32))
    count = jnp.minimum(count, out_capacity)
    coords, feats, keysv = _resize_rows(scoords, sfeats, skeys, out_capacity)
    valid = jnp.arange(out_capacity, dtype=jnp.int32) < count
    coords, feats, keysv = _pad_rows(coords, feats, keysv, valid)
    return SparseVoxels(
        coords=coords, feats=feats, keys=keysv, count=count, stride=sv.stride
    )


def cat_feats(a: SparseVoxels, b: SparseVoxels) -> SparseVoxels:
    """Channel-concatenate two tensors sharing the same coordinate set
    (ref ME.cat, autoencoder.py:55)."""
    return a.replace(feats=jnp.concatenate([a.feats, b.feats], axis=-1))
