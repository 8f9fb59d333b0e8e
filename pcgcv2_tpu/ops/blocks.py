"""Dense-block sparse voxel backend — the TPU-native compute core.

The reference's MinkowskiEngine runtime (usage: /root/reference/autoencoder.py,
coder.py:102) is a GPU hash-map + gather-GEMM design.  A direct translation
(per-voxel kernel maps via searchsorted, row gathers) measures ~14 s per
kernel-map build at vox10 scale on a v5e chip — TPU gathers are scalar-ish and
int64 is emulated.  This module is the TPU-first redesign:

* **Space is partitioned into BS^3 dense blocks.**  A `BlockGrid` stores the
  occupied blocks' features as one dense tensor [nb, BS^3, C] plus a per-slot
  occupancy mask.  Surface scans fill ~5-10% of their blocks' slots, so dense
  block compute costs ~10-20x the sparse FLOPs — and the MXU is ~100x faster
  at dense conv than the VPU is at per-voxel gathers.  Net win >10x, measured.

* **All structure ops are block-level.**  A dense lookup table (one int32 per
  block-space cell) maps block coordinates to block rows.  Neighbor maps are
  27 table gathers per *block* (not per voxel); 3^3 convolutions assemble a
  (BS+2)^3 halo from neighbor-block slabs and run `lax.conv_general_dilated`
  (MXU); stride-2 down/up convolutions are pure reshapes + matmuls that move
  whole octants between block scales.  Per-voxel work happens exactly twice
  per frame: scattering points into blocks and extracting them back out.

* **Static shapes everywhere.**  Block capacity `nb_cap` is bucketed per
  scale; invalid block rows hold zeros (features AND mask), and lookup-table
  misses point at an invalid row, so out-of-set reads contribute zeros — the
  exact semantics of sparse convolution over missing neighbors.

* **Block rows are kept sorted** by flat block key (batch-major), so
  per-batch-item segments are contiguous (top-k, counts) and extraction
  yields a canonical block-scan order.

Block size defaults to 16 (4096 slots): the halo overhead (18^3/16^3 ~
1.42x) beats 8^3 blocks (10^3/8^3 ~ 1.95x), slab gathers are 8x fewer and
8x bigger (gather row count, not bytes, dominated the 8^3 conv3 on v5e),
and the dense lookup table shrinks 8x.  `PCGC_BLOCK_SIZE=8` restores the
smaller blocks (tests cross-validate both against the sparse oracle).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Block side.  16 is the measured sweet spot on v5e: vs 8 it cuts halo
# overhead from (10/8)^3 = 1.95x to (18/16)^3 = 1.42x, runs 8x fewer (and
# 8x bigger) slab gathers per 3^3 conv, and shrinks the dense lookup table
# 8x (vox11 whole-frame headroom) — at the cost of ~2x dense slots (surface
# occupancy ~5% vs ~10%), which the MXU absorbs.  Env-overridable so the
# test suite can cross-validate both sizes against the sparse oracle.
BS = int(os.environ.get("PCGC_BLOCK_SIZE", "16"))
VOL = BS ** 3       # slots per block

# Dtype for conv/matmul inputs (halos, windows).  Storage (BlockGrid.feats)
# stays float32.  In bfloat16 mode the conv's requested output dtype is also
# bf16 (see _conv3_dense: a widening bf16->f32 conv has no transpose rule);
# the MXU still accumulates each 128-wide dot in f32 internally before the
# bf16 store.  bfloat16 halves the HBM traffic of the halo-dominated 3^3
# convs — the production codec/training scripts opt in; tests keep float32
# so oracle comparisons stay exact.  Read at TRACE time: call
# set_compute_dtype BEFORE building any jit, or stale dtypes get baked in.
COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    """Set the global conv compute dtype ('float32' or 'bfloat16')."""
    global COMPUTE_DTYPE
    COMPUTE_DTYPE = jnp.dtype(dtype)

# Dense lookup-table budget: B * G^3 int32 cells.  2^27 cells = 512 MB of
# int32 + 128 MB of bool occupancy — the practical single-chip ceiling.
# Unscaled vox12 (res 4096 -> G = 512 -> 134M cells/batch-item) fits for
# batch 1 only; anything larger must pre-scale (the reference does the same:
# scaling_factor=0.375 for vox12, README.md:39-40, data_utils.py:112-118).
MAX_TABLE_CELLS = 1 << 27


def grid_dim(res: int) -> int:
    """Blocks per axis for a coordinate space of size `res` (grid coords)."""
    return max(1, -(-res // BS))


def check_table_size(res: int, num_batches: int) -> None:
    """Static guard on the dense block-lookup table (see MAX_TABLE_CELLS)."""
    g = grid_dim(res)
    cells = num_batches * g ** 3
    if cells > MAX_TABLE_CELLS:
        raise ValueError(
            f"dense block table needs {cells} cells "
            f"({num_batches} x {g}^3) > {MAX_TABLE_CELLS} budget at res "
            f"{res}; pre-scale coordinates (scaling_factor, ref "
            f"README.md:39-40) or reduce the batch size"
        )


@struct.dataclass
class BlockGrid:
    """Occupied BS^3 blocks of a sparse voxel set at one scale.

    coords : int32 [nb_cap, 4]  — (batch, bx, by, bz) of each block; invalid
             rows are (0, 0, 0, 0) and distinguishable only via `valid`.
    feats  : float [nb_cap, VOL, C] — dense in-block features; zeros at
             unoccupied slots and invalid blocks.
    mask   : bool  [nb_cap, VOL] — per-slot occupancy.
    table  : int32 [B * G^3] — flat block coord -> block row; misses hold
             nb_cap - 1 (an invalid, all-zero row; `count` < nb_cap always).
    count  : int32 [] — number of valid block rows (sorted-prefix).
    dropped: int32 [] — cumulative occupied blocks silently dropped by
             capacity overflow anywhere upstream; 0 means the grid holds the
             exact voxel set (ME never drops — a nonzero value here must be
             surfaced by codec/training callers as an error).
    stride : static — voxel stride (coords of the underlying voxels are
             multiples of this; block grid covers coords // stride).
    res    : static — grid resolution (max grid coordinate + 1 bound).
    num_batches : static — batch dimension bound B.
    """

    coords: jax.Array
    feats: jax.Array
    mask: jax.Array
    table: jax.Array
    count: jax.Array
    dropped: jax.Array
    stride: int = struct.field(pytree_node=False, default=1)
    res: int = struct.field(pytree_node=False, default=1024)
    num_batches: int = struct.field(pytree_node=False, default=1)

    @property
    def nb_cap(self) -> int:
        return self.coords.shape[0]

    @property
    def channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def G(self) -> int:
        return grid_dim(self.res)

    @property
    def valid(self) -> jax.Array:
        return jnp.arange(self.nb_cap, dtype=jnp.int32) < self.count

    @property
    def blocks(self) -> jax.Array:
        """feats viewed as [nb_cap, BS, BS, BS, C]."""
        return self.feats.reshape(self.nb_cap, BS, BS, BS, self.channels)

    def with_feats(self, feats: jax.Array) -> "BlockGrid":
        """Same structure, new features (zeroed outside the occupancy mask)."""
        feats = feats.reshape(self.nb_cap, VOL, -1)
        feats = jnp.where(self.mask[:, :, None], feats, 0)
        return self.replace(feats=feats)

    def voxel_count(self) -> jax.Array:
        return jnp.sum((self.mask & self.valid[:, None]).astype(jnp.int32))

    def voxels_per_batch(self) -> jax.Array:
        """[num_batches] valid-voxel count per batch item (on device)."""
        per_block = jnp.sum(self.mask, axis=1, dtype=jnp.int32)
        b = jnp.where(
            self.valid, self.coords[:, 0], jnp.int32(self.num_batches)
        ).astype(jnp.int32)
        seg = jnp.zeros((self.num_batches + 1,), jnp.int32).at[b].add(per_block)
        return seg[: self.num_batches]


def _flat_block_key(coords: jax.Array, g: int, num_batches: int) -> jax.Array:
    """(b, bx, by, bz) int32 -> flat int32 key in [0, B*G^3)."""
    c = coords.astype(jnp.int32)
    return ((c[..., 0] * g + c[..., 1]) * g + c[..., 2]) * g + c[..., 3]


def _unflatten_key(key: jax.Array, g: int) -> jax.Array:
    bz = key % g
    r = key // g
    by = r % g
    r = r // g
    bx = r % g
    b = r // g
    return jnp.stack([b, bx, by, bz], axis=-1).astype(jnp.int32)


def _compact_from_occupancy(occ: jax.Array, g: int, nb_cap: int):
    """occupancy [B*G^3] bool -> (coords [nb_cap,4] sorted, table, count,
    n_over).

    Ranks are assigned in flat-key order, so block rows come out sorted by
    (batch, bx, by, bz).  Misses in `table` point at nb_cap - 1.  `n_over`
    is the number of occupied cells that did not fit (callers must propagate
    it into BlockGrid.dropped so silent loss is detectable).
    """
    rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
    true_count = jnp.maximum(rank[-1] + 1, 0)
    # Row nb_cap - 1 is reserved as the always-invalid miss target (the
    # zero-contribution invariant), so usable capacity is nb_cap - 1 and
    # overflow blocks are dropped rather than aliasing the sentinel.
    fits = occ & (rank < nb_cap - 1)
    count = jnp.minimum(true_count, nb_cap - 1)
    n_over = (true_count - count).astype(jnp.int32)
    table = jnp.where(fits, rank, nb_cap - 1).astype(jnp.int32)
    flat = jnp.arange(occ.shape[0], dtype=jnp.int32)
    pos = jnp.where(fits, rank, nb_cap + flat)  # out of range -> dropped
    keys = jnp.zeros((nb_cap,), jnp.int32).at[pos].set(
        flat, mode="drop", unique_indices=True
    )
    coords = _unflatten_key(keys, g)
    valid = jnp.arange(nb_cap, dtype=jnp.int32) < count
    coords = jnp.where(valid[:, None], coords, 0)
    return coords, table, count.astype(jnp.int32), n_over


def blockify(
    coords: jax.Array,
    feats: jax.Array,
    valid: jax.Array,
    nb_cap: int,
    stride: int,
    res: int,
    num_batches: int,
) -> BlockGrid:
    """Scatter padded voxel rows into a BlockGrid (the per-voxel entry point).

    coords: int32 [N, 4] (batch, x, y, z) voxel coords (multiples of stride);
    feats: [N, C]; valid: [N] bool.  Replaces the per-voxel coordinate-manager
    work of ME.SparseTensor construction (ref coder.py:102, trainer.py:122).
    """
    check_table_size(res, num_batches)
    g = grid_dim(res)
    c = coords.astype(jnp.int32)
    gxyz = c[:, 1:] // stride
    bxyz = gxyz // BS
    slot = gxyz % BS
    slot_id = (slot[:, 0] * BS + slot[:, 1]) * BS + slot[:, 2]
    bkey = _flat_block_key(
        jnp.concatenate([c[:, :1], bxyz], axis=-1), g, num_batches
    )
    bkey = jnp.where(valid, bkey, 0)

    occ = jnp.zeros((num_batches * g ** 3,), bool)
    occ = occ.at[jnp.where(valid, bkey, num_batches * g ** 3)].set(
        True, mode="drop"
    )
    bcoords, table, count, n_over = _compact_from_occupancy(occ, g, nb_cap)

    # Voxels of dropped (overflowed) blocks get bidx == nb_cap - 1, the
    # reserved all-zero miss row — route them out of range instead of
    # corrupting the sentinel invariant.
    bidx = table[bkey]
    ok = valid & (bidx < nb_cap - 1)
    n_rows = coords.shape[0]
    pos = jnp.where(
        ok,
        bidx * VOL + slot_id,
        nb_cap * VOL + jnp.arange(n_rows, dtype=jnp.int32),
    )
    ch = feats.shape[-1]
    bf = jnp.zeros((nb_cap * VOL, ch), feats.dtype).at[pos].set(
        feats, mode="drop", unique_indices=True
    )
    bm = jnp.zeros((nb_cap * VOL,), bool).at[pos].set(
        True, mode="drop", unique_indices=True
    )
    return BlockGrid(
        coords=bcoords,
        feats=bf.reshape(nb_cap, VOL, ch),
        mask=bm.reshape(nb_cap, VOL),
        table=table,
        count=count,
        dropped=n_over,
        stride=stride,
        res=res,
        num_batches=num_batches,
    )


def slot_coords(bg: BlockGrid) -> jax.Array:
    """Voxel coords of every slot: int32 [nb_cap, VOL, 4] (batch, x, y, z)."""
    s = jnp.arange(VOL, dtype=jnp.int32)
    lx, ly, lz = s // (BS * BS), (s // BS) % BS, s % BS
    base = bg.coords[:, None, 1:] * BS  # [nb, 1, 3] grid coords of block org
    local = jnp.stack([lx, ly, lz], axis=-1)[None, :, :]
    xyz = (base + local) * bg.stride
    b = jnp.broadcast_to(bg.coords[:, None, :1], (bg.nb_cap, VOL, 1))
    return jnp.concatenate([b, xyz], axis=-1)


def extract(
    bg: BlockGrid, out_cap: int, with_feats: bool = True
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Compact occupied slots to rows: (coords [out_cap,4], feats, count).

    Rows come out in block-scan order (sorted blocks, slot-raveled within) —
    the backend's canonical order.  The per-voxel exit point (used for the
    bottleneck bitstream and the decoded point set).

    Scatter-light formulation: only an int32 flat slot index is scattered
    into the compact row table; coords are recomputed arithmetically from it
    and feats are row-gathered.  (A wide-payload scatter of coords+feats
    lowered to >1 s at vox10 scale on v5e; the index scatter plus gathers is
    bandwidth-bound.)  Unused rows point at the reserved invalid block
    (nb_cap - 1, all zeros), so they come out as zero coords/feats exactly
    like the scatter version.
    """
    flat_mask = (bg.mask & bg.valid[:, None]).reshape(-1)
    n_all = flat_mask.shape[0]
    pos = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    count = jnp.maximum(pos[-1] + 1, 0).astype(jnp.int32)
    pos = jnp.where(
        flat_mask, pos, out_cap + jnp.arange(n_all, dtype=jnp.int32)
    )
    sentinel = jnp.int32((bg.nb_cap - 1) * VOL)  # invalid row, slot 0
    idx = jnp.full((out_cap,), sentinel, jnp.int32).at[pos].set(
        jnp.arange(n_all, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    row = idx // VOL
    slot = idx % VOL
    bc = bg.coords[row]  # [out_cap, 4]; invalid row -> (0, 0, 0, 0)
    local = jnp.stack(
        [slot // (BS * BS), (slot // BS) % BS, slot % BS], axis=-1
    )
    xyz = (bc[:, 1:] * BS + local) * bg.stride
    out_c = jnp.concatenate([bc[:, :1], xyz], axis=-1)
    out_f = None
    if with_feats:
        out_f = bg.feats.reshape(-1, bg.channels)[idx]
    count = jnp.minimum(count, out_cap)
    return out_c, out_f, count


def pack_occupancy(bg: BlockGrid) -> Tuple[jax.Array, jax.Array]:
    """Bit-pack the valid occupancy for host-side extraction.

    Returns (block xyz coords uint16 [nb_cap, 3], slot bits uint8
    [nb_cap, VOL // 8]).  The decode path's device-side `extract` was the
    single hottest op of the decode jit (a 23M-row index scatter, ~107 ms
    at vox10 — round-5 trace); shipping the mask as packed bits (~VOL/8
    bytes per block, 2.9 MB at vox10) and expanding on the host via
    np.unpackbits + nonzero costs ~25 ms of host time instead and halves
    the D2H volume.  Bit order matches np.unpackbits(bitorder='big');
    np.nonzero's row-major order reproduces `extract`'s canonical
    block-scan order exactly.
    """
    m = bg.mask & bg.valid[:, None]
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    bits = jnp.sum(
        m.reshape(bg.nb_cap, VOL // 8, 8).astype(jnp.uint8) * w,
        axis=-1, dtype=jnp.uint8,
    )
    return bg.coords[:, 1:].astype(jnp.uint16), bits


# byte -> set-bit-position lookup tables for host_extract (MSB-first to
# match np.packbits/unpackbits 'big' order)
_BIT_CNT = np.array([bin(v).count("1") for v in range(256)], np.int32)
_BIT_OFF = np.zeros(257, np.int32)
_BIT_POS = []
for _v in range(256):
    _p = sorted(7 - i for i in range(8) if (_v >> i) & 1)
    _BIT_POS.append(np.array(_p, np.int32))
    _BIT_OFF[_v + 1] = _BIT_OFF[_v] + len(_p)
_BIT_POS = (np.concatenate(_BIT_POS) if _BIT_POS
            else np.zeros(0, np.int32)).astype(np.int32)
del _v, _p

_LOG_BS = int(BS).bit_length() - 1


def host_extract(bcoords: np.ndarray, bits: np.ndarray,
                 stride: int = 1) -> np.ndarray:
    """Host twin of `extract` (coords only): expand `pack_occupancy` output
    to int32 [n, 3] voxel coords in canonical block-scan order.

    Native bit-scan first (native/coding.cpp::extract_coords, ~10 ms at
    vox10), falling back to the LUT formulation (nonzero bytes -> per-byte
    bit positions; 60 ms) which itself replaced unpackbits + nonzero over
    all nb*VOL slots (180 ms).  All three produce identical output
    (tests/test_blocks.py::test_host_extract_native_matches_numpy)."""
    from pcgcv2_tpu.codec import native as _native

    out = _native.extract_coords(bcoords, np.asarray(bits), _LOG_BS, stride)
    if out is not None:
        return out
    flat = np.asarray(bits).reshape(-1)
    nzb = np.flatnonzero(flat).astype(np.int32)
    vals = flat[nzb]
    k = _BIT_CNT[vals]
    seg_end = np.cumsum(k, dtype=np.int32)
    total = int(seg_end[-1]) if len(seg_end) else 0
    if total == 0:
        return np.zeros((0, 3), np.int32)
    seg_start = np.repeat(seg_end - k, k)
    within = np.arange(total, dtype=np.int32) - seg_start
    bitpos = _BIT_POS[np.repeat(_BIT_OFF[vals], k) + within]
    flatbit = (np.repeat(nzb, k) << 3) + bitpos
    rows = flatbit >> (3 * _LOG_BS)
    slots = flatbit & (VOL - 1)
    bc = np.asarray(bcoords, np.int32)
    out = np.empty((total, 3), np.int32)
    out[:, 0] = (bc[rows, 0] << _LOG_BS) + (slots >> (2 * _LOG_BS))
    out[:, 1] = (bc[rows, 1] << _LOG_BS) + ((slots >> _LOG_BS) & (BS - 1))
    out[:, 2] = (bc[rows, 2] << _LOG_BS) + (slots & (BS - 1))
    if stride != 1:
        out *= stride
    return out


# ---------------------------------------------------------------------------
# Neighborhood structure and 3^3 convolution
# ---------------------------------------------------------------------------


def neighbor_rows(bg: BlockGrid) -> jax.Array:
    """int32 [nb_cap, 3, 3, 3] — block row index of each neighbor block.

    Misses (outside the grid or unoccupied) point at row nb_cap - 1, which is
    invalid and all-zero.  Built once per scale, shared by every 3^3 conv at
    that scale (the reference caches the analogous kernel maps inside ME's
    coordinate manager).
    """
    g = bg.G
    d = jnp.arange(-1, 2, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1)  # [3,3,3,3]
    nxyz = bg.coords[:, None, None, None, 1:] + off[None]
    in_rng = jnp.all((nxyz >= 0) & (nxyz < g), axis=-1)
    in_rng = in_rng & bg.valid[:, None, None, None]
    b = jnp.broadcast_to(
        bg.coords[:, None, None, None, :1], (*nxyz.shape[:-1], 1)
    )
    key = _flat_block_key(
        jnp.concatenate([b, jnp.clip(nxyz, 0, g - 1)], axis=-1),
        g, bg.num_batches,
    )
    rows = bg.table[key]
    return jnp.where(in_rng, rows, bg.nb_cap - 1)


# Blocks per lax.map chunk in the large-grid conv3 path: keeps the MXU
# batch large while bounding the per-chunk halo to
# CHUNK * (BS+2)^3 * C floats (~1 GB at C=64 f32) regardless of grid size.
CONV3_CHUNK = max(256, 4096 * 512 // VOL)

# Inference-only escape hatch from the chunked conv3 path.  The lax.map
# chunking bounds halo HBM (vital in training where the batch multiplies
# block counts and backward keeps remat chunks alive), but costs a storm of
# tiny per-chunk ops: the round-4 trace showed the decode jit spending
# ~170 ms/frame in while-loop overhead at vox10 shapes whose WHOLE halo is
# only ~1 GB.  Codec entry points wrap their traces in
# `conv3_direct_bytes(...)` so any conv whose full halo fits the budget runs
# monolithically; training never sets it, so its memory profile is
# unchanged.  Trace-time state (a plain global read while jit traces).
_DIRECT_HALO_BYTES = 0


class conv3_direct_bytes:
    """Context manager: allow monolithic (un-chunked) conv3 up to `n` halo
    bytes during tracing.  Inference only — the direct path saves full
    halos for backward, which defeats the training remat."""

    def __init__(self, n: int):
        self.n = n

    def __enter__(self):
        global _DIRECT_HALO_BYTES
        self.prev = _DIRECT_HALO_BYTES
        _DIRECT_HALO_BYTES = self.n

    def __exit__(self, *exc):
        global _DIRECT_HALO_BYTES
        _DIRECT_HALO_BYTES = self.prev

_SL = {0: (BS - 1, BS), 1: (0, BS), 2: (0, 1)}  # neighbor-offset -> slab slice


def _halo_slabs(blk: jax.Array, ch: int):
    """Pre-slice the 26 boundary slab tensors (faces/edges/corners) from
    the folded block tensor `blk` [nb, BS, BS, BS*ch].

    Key perf fact (measured on v5e): a fused `blk[rows][:, thin_slice]`
    lowers as gather-THEN-slice — every thin face gather reads the full
    block row (~16-30x amplification; 73 ms per conv3 at vox10).  Slicing
    the slab out of ALL rows first (static, contiguous, ~0.95x feats bytes
    total) and then row-gathering from the compact slab tensor reads only
    what the halo needs.  The barrier pins the slabs so XLA cannot fuse
    them back into the gathers.
    """
    slabs = {}
    for dx in (0, 1, 2):
        x0, x1 = _SL[dx]
        for dy in (0, 1, 2):
            y0, y1 = _SL[dy]
            for dz in (0, 1, 2):
                if dx == dy == dz == 1:
                    continue  # center: gathered whole, no pre-slice
                z0, z1 = _SL[dz]
                slabs[(dx, dy, dz)] = blk[
                    :, x0:x1, y0:y1, z0 * ch:z1 * ch
                ]
    keys = sorted(slabs)
    vals = jax.lax.optimization_barrier([slabs[k] for k in keys])
    return dict(zip(keys, vals))


def _halo_chunk(
    blk: jax.Array, nbrs: jax.Array, ch: int, slabs=None
) -> jax.Array:
    """Assemble [m, BS+2, BS+2, BS+2, C] halos for a set of blocks.

    blk: [nb, BS, BS, BS*ch] (folded z*C lanes); nbrs: [m, 3, 3, 3] rows.
    slabs: pre-sliced boundary tensors from `_halo_slabs` (built here if
    absent).  Each piece is a dense row gather from its compact slab
    tensor (or from blk for the center) — see `_halo_slabs` for why.
    No cross-row dependencies, so it works on an arbitrary row subset —
    both the big-grid chunking primitive and the direct small-grid path.
    """
    if slabs is None:
        slabs = _halo_slabs(blk, ch)
    parts_x = []
    for dx in (0, 1, 2):
        parts_y = []
        for dy in (0, 1, 2):
            parts_z = []
            for dz in (0, 1, 2):
                rows = nbrs[:, dx, dy, dz]
                if dx == dy == dz == 1:
                    piece = blk[rows]
                else:
                    piece = slabs[(dx, dy, dz)][rows]
                parts_z.append(piece)
            parts_y.append(jnp.concatenate(parts_z, axis=3))
        parts_x.append(jnp.concatenate(parts_y, axis=2))
    return jnp.concatenate(parts_x, axis=1)  # [m, BS+2, BS+2, (BS+2)*ch]


def _zfold_g(co: int) -> int:
    """z-group size for the banded conv: smallest power of 2 (<= BS) whose
    folded output lane width g*co reaches 128."""
    g = 1
    while g < BS and g * co < 128:
        g *= 2
    return g


def _banded_weight(w: jax.Array, g: int, compute_dtype) -> jax.Array:
    """[3,3,3,ci,co] -> z-band-folded conv2d weight [3,3,(g+2)*ci, g*co].

    Column block zo (outputs for local z = zo) reads input z in
    [zo, zo+3): rows zo*ci..(zo+3)*ci hold w[:, :, 0..2], zeros elsewhere.
    A pure (differentiable) relayout of w, built at trace time.
    """
    ci, co = w.shape[3], w.shape[4]
    w = w.astype(compute_dtype)
    cols = []
    for zo in range(g):
        parts = []
        if zo:
            parts.append(jnp.zeros((3, 3, zo * ci, co), compute_dtype))
        parts.extend([w[:, :, 0], w[:, :, 1], w[:, :, 2]])
        if g - 1 - zo:
            parts.append(
                jnp.zeros((3, 3, (g - 1 - zo) * ci, co), compute_dtype)
            )
        cols.append(jnp.concatenate(parts, axis=2))
    return jnp.concatenate(cols, axis=3)


# Banded-conv lowering: "conv" = lax.conv_general_dilated per z-group;
# "dot" = explicit 9-tap dot_general accumulation (same band matrices, same
# FLOPs, but M = m*BS*BS rows per matmul instead of XLA's small-spatial conv
# tiling).  Env-selectable for A/B on chip; default set by measurement:
# chip A/B at the codec's 12 real per-stage shapes (scripts/
# ab_conv_lowering.py, v5e, 2026-08-20) measured dot at 0.66-1.06x conv
# (0.82x overall) — the 9 separate halo-window reads cost more HBM traffic
# than the conv2d's poor MXU tiling costs FLOP efficiency, so "conv" stays.
CONV3_LOWERING = os.environ.get("PCGC_CONV3_LOWERING", "conv")


def _conv3_dense(h: jax.Array, weight, bias, compute_dtype):
    """Dense 3^3 conv on a FOLDED halo [m, BS+2, BS+2, (BS+2)*ci] ->
    folded output [m, BS, BS, BS*co].

    The z axis stays folded into the lane dim end-to-end: bf16 tiles are
    (16, 128), so an unfolded [., BS+2, BS+2, BS+2, C] halo at C=16 pads
    8x in HBM (measured: a 2.3 GB nominal halo materialized as 24 GB) and
    the conv becomes HBM-bound on padding.  Instead the z convolution is
    expressed as a BAND matrix over the folded (z, C) lanes: outputs fold
    z in groups of g (g*co >= 128 full output lanes), each group a 3x3
    conv2d with Cin=(g+2)*ci, Cout=g*co — MXU-shaped on both sides.  FLOP
    overhead (g+2)/3 (the band's zeros) buys the 8x traffic cut.

    preferred_element_type must MATCH the input dtype: a widening conv
    (bf16 -> f32) has no valid transpose rule.  MXU accumulation is f32
    internally either way.
    """
    ci, co = weight.shape[3], weight.shape[4]
    g = _zfold_g(co)
    wb = _banded_weight(weight, g, compute_dtype)
    if CONV3_LOWERING == "dot":
        return _conv3_dense_dot(h, wb, bias, ci, co, g, compute_dtype)
    outs = []
    for zg in range(BS // g):
        xs = jax.lax.slice_in_dim(
            h, zg * g * ci, (zg * g + g + 2) * ci, axis=3
        )
        outs.append(jax.lax.conv_general_dilated(
            xs, wb, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=compute_dtype,
        ))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=3)
    if bias is not None:
        out = out + jnp.tile(bias.astype(compute_dtype), BS)
    return out


def _conv3_dense_dot(h, wb, bias, ci, co, g, compute_dtype):
    """9-tap dot_general lowering of the banded conv (see _conv3_dense).

    Identical math to the conv_general path — same band matrices wb
    [3, 3, (g+2)*ci, g*co], same (g+2)/3 FLOP overhead — but each (dx, dy)
    tap is one big matmul over ALL m*BS*BS output cells at once
    (dot_general contracting the lane slice), instead of a 3x3 conv2d
    whose 18x18 spatial extent XLA tiles poorly at these shapes.  Fully
    differentiable (slice + dot), so it serves training as well.
    """
    outs = []
    for zg in range(BS // g):
        xs = jax.lax.slice_in_dim(
            h, zg * g * ci, (zg * g + g + 2) * ci, axis=3
        )
        acc = None
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                win = jax.lax.slice(
                    xs, (0, dx, dy, 0),
                    (xs.shape[0], dx + BS, dy + BS, xs.shape[3]),
                )
                part = jax.lax.dot_general(
                    win, wb[dx, dy],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=compute_dtype,
                )
                acc = part if acc is None else acc + part
        outs.append(acc)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=3)
    if bias is not None:
        out = out + jnp.tile(bias.astype(compute_dtype), BS)
    return out


def conv3(
    bg: BlockGrid,
    nbrs: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    compute_dtype=None,
) -> BlockGrid:
    """3^3 stride-1 sparse convolution: halo assembly + dense MXU conv.

    weight: [3, 3, 3, Cin, Cout].  Unoccupied slots hold zero features, so
    the dense convolution reproduces sparse-conv semantics exactly; outputs
    are re-masked to the (unchanged) occupancy set.  Replaces
    ME.MinkowskiConvolution(kernel_size=3) (ref autoencoder.py:13).

    Inputs with fewer than 16 channels are zero-padded to 16 (with matching
    zero weight rows) so the halo's folded lane axis is >= 128 wide — narrow
    lanes pad up to 16x in HBM on TPU.

    Grids larger than 2 * CONV3_CHUNK blocks are processed in lax.map
    chunks: the [nb, 10^3, C] halo of a vox10-scale grid is several HBM's
    worth if materialized whole (11 GB at 172k blocks, C=16), but each
    chunk's halo is bounded and the full feats tensor stays resident once.
    Each chunk body is jax.checkpoint'ed so the backward pass re-assembles
    halos per chunk instead of saving them all.
    """
    if compute_dtype is None:
        compute_dtype = COMPUTE_DTYPE
    if os.environ.get("PCGC_PALLAS_CONV") == "1":
        # Fused halo+conv Pallas kernel (ops/pallas_conv.py): ~2.3x less
        # HBM traffic per conv.  FORWARD-ONLY — enable for codec/inference
        # processes, never training (no VJP).
        from pcgcv2_tpu.ops.pallas_conv import conv3_pallas

        return conv3_pallas(bg, nbrs, weight, bias, compute_dtype)
    ch = bg.channels
    ch_min = max(1, 128 // BS)  # folded z*C lane axis >= 128 wide
    if ch < ch_min:
        bg = bg.replace(
            feats=jnp.pad(bg.feats, ((0, 0), (0, 0), (0, ch_min - ch)))
        )
        weight = jnp.pad(
            weight, ((0, 0), (0, 0), (0, 0), (0, ch_min - ch), (0, 0))
        )
        ch = ch_min
    nb = bg.nb_cap
    blk = bg.feats.astype(compute_dtype).reshape(nb, BS, BS, BS * ch)
    slabs = _halo_slabs(blk, ch)  # shared by every chunk (loop-invariant)
    halo_bytes = (
        nb * (BS + 2) ** 3 * ch * jnp.dtype(compute_dtype).itemsize
    )
    if nb <= 2 * CONV3_CHUNK or halo_bytes <= _DIRECT_HALO_BYTES:
        h = _halo_chunk(blk, nbrs, ch, slabs)
        out = _conv3_dense(h, weight, bias, compute_dtype)
        out = out.reshape(nb, VOL, -1)
    else:
        n_chunks = -(-nb // CONV3_CHUNK)
        pad_rows = n_chunks * CONV3_CHUNK - nb
        # padding rows point at the invalid all-zero row; their outputs are
        # sliced off below
        nbrs_p = jnp.pad(
            nbrs, ((0, pad_rows), (0, 0), (0, 0), (0, 0)),
            constant_values=nb - 1,
        ).reshape(n_chunks, CONV3_CHUNK, 3, 3, 3)

        @jax.checkpoint
        def body(nc):
            h = _halo_chunk(blk, nc, ch, slabs)
            o = _conv3_dense(h, weight, bias, compute_dtype)
            return o.reshape(CONV3_CHUNK, VOL, -1)

        out = jax.lax.map(body, nbrs_p)
        out = out.reshape(n_chunks * CONV3_CHUNK, VOL, -1)[:nb]
    return bg.with_feats(out.astype(bg.feats.dtype))


# ---------------------------------------------------------------------------
# Scale changes (stride-2 down-conv / generative up-conv)
# ---------------------------------------------------------------------------


def _child_rows(bg: BlockGrid, parent_coords: jax.Array, parent_valid):
    """Block rows of the 8 child blocks (2x2x2) of each parent block.

    Children live in `bg` (the finer grid, G = 2 * Gp).  Returns int32
    [npb_cap, 2, 2, 2]; misses -> bg.nb_cap - 1.
    """
    g = bg.G
    d = jnp.arange(2, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1)  # [2,2,2,3]
    cxyz = parent_coords[:, None, None, None, 1:] * 2 + off[None]
    ok = jnp.all(cxyz < g, axis=-1) & parent_valid[:, None, None, None]
    b = jnp.broadcast_to(
        parent_coords[:, None, None, None, :1], (*cxyz.shape[:-1], 1)
    )
    key = _flat_block_key(
        jnp.concatenate([b, jnp.clip(cxyz, 0, g - 1)], axis=-1),
        g, bg.num_batches,
    )
    rows = bg.table[key]
    return jnp.where(ok, rows, bg.nb_cap - 1)


def conv_down(
    bg: BlockGrid,
    weight: jax.Array,
    bias: Optional[jax.Array],
    nb_cap_out: int,
    compute_dtype=None,
) -> BlockGrid:
    """Strided down-convolution (kernel=2, stride=2): stride s -> 2s.

    weight: [8, Cin, Cout] indexed by the {0,1}^3 child-offset stencil in
    (x, y, z) raveled order (matches ops.sparse.stencil_offsets(2, s)).
    Within a block the 2^3 windows are axis-aligned, so the conv is a pure
    reshape + matmul; 8 sibling blocks then assemble into one parent block
    (a block-level gather).  Replaces ME.MinkowskiConvolution(kernel_size=2,
    stride=2) (ref autoencoder.py:78).
    """
    if compute_dtype is None:
        compute_dtype = COMPUTE_DTYPE
    nb, ch = bg.nb_cap, bg.channels
    cout = weight.shape[-1]
    check_table_size(bg.res // 2, bg.num_batches)
    gp = grid_dim(bg.res // 2)

    # In-block 2x2x2 window conv -> [nb, 4, 4, 4, Cout] as a native strided
    # convolution.  NOT a reshape-transpose-matmul: the 8-D transpose that
    # formulation needs gets materialized (and remat-copied in backward)
    # with tiny (2, C) minor dims that TPU tiling pads up to 8x — a 4 GB
    # temp at training scale (observed OOM).
    x = bg.blocks.astype(compute_dtype)  # [nb, 8, 8, 8, ch]
    w = weight.astype(compute_dtype).reshape(2, 2, 2, ch, cout)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=compute_dtype,
    )  # [nb, BS/2, BS/2, BS/2, cout]
    if bias is not None:
        y = y + bias.astype(compute_dtype)
    hh = BS // 2
    # Three contiguous-stride reduces instead of one 3-axis strided any
    # (the strided form cost ~12 ms/frame at vox10 — round-5 trace):
    # z-pairs are lane-adjacent, then y, then x.
    m_z = bg.mask.reshape(nb, BS, BS, hh, 2).any(axis=4)
    m_y = m_z.reshape(nb, BS, hh, 2, hh).any(axis=3)
    m_down = m_y.reshape(nb, hh, 2, hh, hh).any(axis=2)  # [nb, hh, hh, hh]
    # No masking of y here: bias-polluted values at unoccupied cells and
    # invalid rows are zeroed by the single post-gather mask below (pf via
    # pm) — the same slots, one full-tensor pass saved (trace round 5).
    y = y.astype(bg.feats.dtype)

    # parent block set: parent coord = block coord // 2
    pkey = _flat_block_key(
        jnp.concatenate(
            [bg.coords[:, :1], bg.coords[:, 1:] // 2], axis=-1
        ), gp, bg.num_batches,
    )
    occ = jnp.zeros((bg.num_batches * gp ** 3,), bool)
    occ = occ.at[jnp.where(bg.valid, pkey, bg.num_batches * gp ** 3)].set(
        True, mode="drop"
    )
    pcoords, ptable, pcount, p_over = _compact_from_occupancy(
        occ, gp, nb_cap_out
    )
    pvalid = jnp.arange(nb_cap_out, dtype=jnp.int32) < pcount

    # Gather each parent's 8 children octants (children live at this scale's
    # *input* block grid; their down-convolved [4,4,4] tensors are in `y`).
    # Misses point at row nb-1, which is invalid and all-zero by invariant.
    # Assembly is 8 per-octant row gathers concatenated along the folded
    # axes — zero transposes, zero scatter/slice-updates (8 full-tensor
    # slice writes measured 150+ ms at vox10; concat-of-gathers fuses).
    ch_rows = _child_rows(bg, pcoords, pvalid)  # [nbp, 2, 2, 2]
    h = BS // 2
    y_f = y.reshape(nb, h, h, h * cout)  # fold (z, C) lanes
    fx, mx = [], []
    for ox in (0, 1):
        fy, my = [], []
        for oy in (0, 1):
            fz, mz = [], []
            for oz in (0, 1):
                rows = ch_rows[:, ox, oy, oz]
                fz.append(y_f[rows])
                mz.append(m_down[rows])
            fy.append(jnp.concatenate(fz, axis=3))
            my.append(jnp.concatenate(mz, axis=3))
        fx.append(jnp.concatenate(fy, axis=2))
        mx.append(jnp.concatenate(my, axis=2))
    pf = jnp.concatenate(fx, axis=1).reshape(nb_cap_out, VOL, cout)
    pm = jnp.concatenate(mx, axis=1).reshape(nb_cap_out, VOL)
    pf = jnp.where(pvalid[:, None, None], pf, 0)
    pm = pm & pvalid[:, None]
    pf = jnp.where(pm[:, :, None], pf, 0)
    return BlockGrid(
        coords=pcoords, feats=pf, mask=pm, table=ptable, count=pcount,
        dropped=bg.dropped + p_over,
        stride=bg.stride * 2, res=bg.res // 2, num_batches=bg.num_batches,
    )


def conv_up_generative(
    bg: BlockGrid,
    weight: jax.Array,
    bias: Optional[jax.Array],
    nb_cap_out: int,
    compute_dtype=None,
) -> BlockGrid:
    """Generative transposed conv (kernel=2, stride=2): stride 2s -> s.

    Every occupied voxel emits all 8 children (ref
    ME.MinkowskiGenerativeConvolutionTranspose, autoencoder.py:155).
    weight: [8, Cin, Cout] in (x, y, z)-raveled child-offset order.
    One einsum computes all 8 children per voxel; each parent block then
    expands into 8 child blocks, written with a single block-row scatter
    (unique rows — TPU-vectorizable), never per-voxel indexing.
    """
    if compute_dtype is None:
        compute_dtype = COMPUTE_DTYPE
    nb, ch = bg.nb_cap, bg.channels
    cout = weight.shape[-1]
    res_out = bg.res * 2
    check_table_size(res_out, bg.num_batches)
    g_out = grid_dim(res_out)

    # Native transposed convolution: every occupied voxel broadcasts into
    # its 2^3 children in a [16, 16, 16] double-resolution block, then the 8
    # child blocks are folded-lane SLICES of it — zero transposes, zero
    # per-voxel indexing.  (Earlier formulations — an einsum with a batch-8
    # axis, or per-octant 8-D transposes — materialize lane-padded buffers
    # that blow up 4-8x in HBM and OOM'd at vox10 scale.)
    x = bg.blocks.astype(compute_dtype)  # [nb, 8, 8, 8, ch]
    # conv_transpose applies the kernel mirrored relative to our child-offset
    # stencil convention (w[k] = weight of child (dx,dy,dz), x-major); flip
    # the spatial axes so child (dx,dy,dz) = parent * 2 + (dx,dy,dz) gets
    # w[dx,dy,dz] exactly (validated against the sparse oracle).
    w = weight.astype(compute_dtype).reshape(2, 2, 2, ch, cout)
    w = w[::-1, ::-1, ::-1]
    y_big = jax.lax.conv_transpose(
        x, w, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=compute_dtype,
    )  # [nb, 2*BS, 2*BS, 2*BS, cout]
    if bias is not None:
        y_big = y_big + bias.astype(compute_dtype)
    # child-voxel mask: each parent voxel's 8 children are occupied
    d2 = 2 * BS
    # No masking of y_big: the post-scatter mask below (of via om) zeros the
    # same slots — bias-on-empty, invalid parent rows AND sentinel-row
    # clobber from overflow-dropped child blocks (om & ovalid) — saving one
    # pass over the 8x-block-size candidate tensor (trace round 5).
    y_big = y_big.astype(bg.feats.dtype)
    y_fold = y_big.reshape(nb, d2, d2, d2 * cout)

    # Child block (ox,oy,oz) slot (u,v,w) maps to parent slot
    # (h*ox + u//2, ...): build each octant's mask from an [nb, h, h, h]
    # slice of the parent mask broadcast 2x per axis — never materializing
    # the 8x-block-size m_big tensor (round-5 trace: ~13 ms/frame).
    h = BS // 2
    m3 = bg.mask.reshape(nb, BS, BS, BS)
    child_f_parts = []
    child_m_parts = []
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                child_f_parts.append(
                    y_fold[
                        :, ox * BS:(ox + 1) * BS, oy * BS:(oy + 1) * BS,
                        oz * BS * cout:(oz * BS + BS) * cout,
                    ].reshape(nb, VOL, cout)
                )
                mh = m3[:, ox * h:(ox + 1) * h, oy * h:(oy + 1) * h,
                        oz * h:(oz + 1) * h]
                child_m_parts.append(
                    jnp.broadcast_to(
                        mh.reshape(nb, h, 1, h, 1, h, 1),
                        (nb, h, 2, h, 2, h, 2),
                    ).reshape(nb, VOL)
                )
    # [nb, 8(oct, ox-major), VOL, C] -> [nb*8, VOL, C]
    child_f = jnp.stack(child_f_parts, axis=1).reshape(nb * 8, VOL, cout)
    child_m = jnp.stack(child_m_parts, axis=1).reshape(nb * 8, VOL)

    # child block coordinates: parent*2 + octant, octant axis ravels (ox-major)
    d = jnp.arange(2, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1)  # [2,2,2,3]
    cxyz = (
        bg.coords[:, None, 1:] * 2 + off.reshape(1, 8, 3)
    )  # [nb, 8, 3]
    cb = jnp.broadcast_to(bg.coords[:, None, :1], (nb, 8, 1))
    ckey = _flat_block_key(
        jnp.concatenate([cb, cxyz], axis=-1), g_out, bg.num_batches
    ).reshape(-1)
    # Only child blocks that actually contain occupied slots become output
    # blocks: a parent block's surface typically crosses ~4 of its 8 child
    # blocks, so this keeps true output block counts (and therefore viable
    # nb_cap_out values) ~2x smaller than the all-8 static worst case.
    cvalid = (
        jnp.broadcast_to(bg.valid[:, None], (nb, 8)).reshape(-1)
        & child_m.any(axis=1)
    )
    occ = jnp.zeros((bg.num_batches * g_out ** 3,), bool)
    occ = occ.at[
        jnp.where(cvalid, ckey, bg.num_batches * g_out ** 3)
    ].set(True, mode="drop")
    ocoords, otable, ocount, o_over = _compact_from_occupancy(
        occ, g_out, nb_cap_out
    )

    # block-row scatter of the child blocks into their output rows
    crow = jnp.where(
        cvalid, otable[ckey],
        nb_cap_out + jnp.arange(nb * 8, dtype=jnp.int32),
    )
    of = jnp.zeros((nb_cap_out, VOL, cout), child_f.dtype).at[crow].set(
        child_f, mode="drop", unique_indices=True
    )
    om = jnp.zeros((nb_cap_out, VOL), bool).at[crow].set(
        child_m, mode="drop", unique_indices=True
    )
    ovalid = jnp.arange(nb_cap_out, dtype=jnp.int32) < ocount
    om = om & ovalid[:, None]
    of = jnp.where(om[:, :, None], of, 0)
    return BlockGrid(
        coords=ocoords, feats=of, mask=om, table=otable, count=ocount,
        dropped=bg.dropped + o_over,
        stride=bg.stride // 2, res=res_out, num_batches=bg.num_batches,
    )


def conv_up_structure(bg: BlockGrid, nb_cap_out: int) -> BlockGrid:
    """Structure-only generative up-conv: the output grid's coords / mask /
    table / count exactly as `conv_up_generative` would produce, with
    1-channel zero features (no conv, no weight).

    Lets a streamed or sharded decoder know the full candidate-grid
    structure (needed for the global top-k) without materializing candidate
    features — the HBM hog at vox11+ scale.
    """
    nb = bg.nb_cap
    res_out = bg.res * 2
    check_table_size(res_out, bg.num_batches)
    g_out = grid_dim(res_out)
    h = BS // 2
    m3 = bg.mask.reshape(nb, BS, BS, BS)
    child_m_parts = []
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                mh = m3[:, ox * h:(ox + 1) * h, oy * h:(oy + 1) * h,
                        oz * h:(oz + 1) * h]
                child_m_parts.append(
                    jnp.broadcast_to(
                        mh.reshape(nb, h, 1, h, 1, h, 1),
                        (nb, h, 2, h, 2, h, 2),
                    ).reshape(nb, VOL)
                )
    child_m = jnp.stack(child_m_parts, axis=1).reshape(nb * 8, VOL)
    d = jnp.arange(2, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(d, d, d, indexing="ij"), axis=-1)
    cxyz = bg.coords[:, None, 1:] * 2 + off.reshape(1, 8, 3)
    cb = jnp.broadcast_to(bg.coords[:, None, :1], (nb, 8, 1))
    ckey = _flat_block_key(
        jnp.concatenate([cb, cxyz], axis=-1), g_out, bg.num_batches
    ).reshape(-1)
    cvalid = (
        jnp.broadcast_to(bg.valid[:, None], (nb, 8)).reshape(-1)
        & child_m.any(axis=1)
    )
    occ = jnp.zeros((bg.num_batches * g_out ** 3,), bool)
    occ = occ.at[
        jnp.where(cvalid, ckey, bg.num_batches * g_out ** 3)
    ].set(True, mode="drop")
    ocoords, otable, ocount, o_over = _compact_from_occupancy(
        occ, g_out, nb_cap_out
    )
    crow = jnp.where(
        cvalid, otable[ckey],
        nb_cap_out + jnp.arange(nb * 8, dtype=jnp.int32),
    )
    om = jnp.zeros((nb_cap_out, VOL), bool).at[crow].set(
        child_m, mode="drop", unique_indices=True
    )
    ovalid = jnp.arange(nb_cap_out, dtype=jnp.int32) < ocount
    om = om & ovalid[:, None]
    return BlockGrid(
        coords=ocoords,
        feats=jnp.zeros((nb_cap_out, VOL, 1), jnp.float32),
        mask=om, table=otable, count=ocount,
        dropped=bg.dropped + o_over,
        stride=bg.stride // 2, res=res_out, num_batches=bg.num_batches,
    )


# ---------------------------------------------------------------------------
# Top-k occupancy pruning
# ---------------------------------------------------------------------------


def _monotone_bits(x: jax.Array) -> jax.Array:
    """float32 -> uint32 with the same total order (for radix threshold)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    sign = (b >> 31).astype(jnp.uint32)
    return jnp.where(
        sign == 1, ~b, b | jnp.uint32(0x80000000)
    )


def topk_mask(
    bg: BlockGrid,
    scores: jax.Array,
    nums: jax.Array,
    live_mask: Optional[jax.Array] = None,
    psum_axis: Optional[str] = None,
) -> jax.Array:
    """[nb_cap, VOL] bool — per-batch-item top-k over occupied slots.

    Replaces the reference's CPU `istopk` (data_utils.py:77-89) with a
    sort-free radix threshold search: 32 rounds of masked popcounts find the
    exact k-th score bit pattern per batch item, then ties at the threshold
    are broken in block-scan order.  k is min(k, available), matching the
    reference.  O(32 * nb * VOL) VPU work, no per-voxel sort.

    live_mask restricts candidates to a subset of occupied slots (e.g. the
    interior of a spatial shard).  psum_axis makes the top-k GLOBAL across a
    shard_map mesh axis: every round's candidate count is all-reduced, and
    threshold ties are ranked in global block-scan order (device order along
    the axis must follow the spatial sort — x-slabs in axis_index order).
    """
    nbatch = bg.num_batches
    live = bg.mask & bg.valid[:, None]
    if live_mask is not None:
        live = live & live_mask
    u = _monotone_bits(scores.reshape(bg.nb_cap, VOL))
    u = jnp.where(live, u, jnp.uint32(0))
    # one-hot batch matrix [nb, B] (block rows are batch-pure)
    brow = jnp.where(bg.valid, bg.coords[:, 0], nbatch)
    onehot = (
        brow[:, None] == jnp.arange(nbatch, dtype=brow.dtype)[None, :]
    ).astype(jnp.float32)
    k = jnp.asarray(nums, jnp.int32)

    brow_c = jnp.clip(brow, 0, nbatch - 1)

    def count_ge(t):
        """[B] — occupied slots with score bits >= t (t: [B] uint32).

        Each block row is batch-pure, so every slot only needs comparing
        against its OWN batch's threshold — [nb, VOL] work, not the
        [nb, VOL, B] broadcast (which at training shape B=8 was 8x the
        VPU traffic of the whole prune)."""
        ge = (u >= t[brow_c][:, None]) & live
        per_block = jnp.sum(ge.astype(jnp.float32), axis=1)  # [nb]
        # route each block's count to its own batch column
        c = jnp.sum(per_block[:, None] * onehot, axis=0).astype(jnp.int32)
        if psum_axis is not None:
            c = jax.lax.psum(c, psum_axis)
        return c

    def body(i, t):
        bit = jnp.uint32(1) << jnp.uint32(31 - i)
        cand = t | bit
        c = count_ge(cand)
        return jnp.where(c >= k, cand, t)

    thresh = jax.lax.fori_loop(0, 32, body, jnp.zeros((nbatch,), jnp.uint32))
    # thresh = largest t with count_ge(t) >= k  (if k==0 -> all-ones wraps to
    # keep nothing below)
    t_row = thresh[jnp.clip(brow, 0, nbatch - 1)]
    gt = (u > t_row[:, None]) & live
    eq = (u == t_row[:, None]) & live
    n_gt = jnp.sum(
        jnp.sum(gt.astype(jnp.float32), axis=1)[:, None] * onehot, axis=0
    ).astype(jnp.int32)
    tie_prefix = jnp.zeros((nbatch,), jnp.int32)
    if psum_axis is not None:
        n_gt = jax.lax.psum(n_gt, psum_axis)
        # global tie ranking: ties on lower-x devices come first (device
        # order along the axis follows the spatial sort)
        n_eq = jnp.sum(
            jnp.sum(eq.astype(jnp.float32), axis=1)[:, None] * onehot,
            axis=0,
        ).astype(jnp.int32)
        all_eq = jax.lax.all_gather(n_eq, psum_axis)  # [n_dev, B]
        me = jax.lax.axis_index(psum_axis)
        before = (
            jnp.arange(all_eq.shape[0], dtype=jnp.int32) < me
        )
        tie_prefix = jnp.sum(
            all_eq * before[:, None].astype(jnp.int32), axis=0
        )
    quota = jnp.maximum(k - n_gt, 0)  # ties to admit per batch
    # per-batch running rank of ties in block-scan order (blocks sorted by
    # batch, so each batch's ties are contiguous across rows)
    flat_eq = eq.reshape(-1)
    csum = jnp.cumsum(flat_eq.astype(jnp.int32))
    # subtract the cumsum at each batch's segment start
    row_b = jnp.repeat(brow, VOL)
    # batch segment starts via searchsorted over the (sorted) row batches
    starts = jnp.searchsorted(
        row_b, jnp.arange(nbatch, dtype=row_b.dtype), side="left"
    )
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum])[starts]
    rank = csum - 1 - base[jnp.clip(row_b, 0, nbatch - 1)]
    rank = rank + tie_prefix[jnp.clip(row_b, 0, nbatch - 1)]
    admit = flat_eq & (
        rank < quota[jnp.clip(row_b, 0, nbatch - 1)]
    )
    keep = gt | admit.reshape(bg.nb_cap, VOL)
    # k == 0 edge: thresh search yields max pattern; gt empty, quota 0 — ok
    return keep & live


def prune(bg: BlockGrid, keep: jax.Array) -> BlockGrid:
    """Restrict occupancy to `keep` (mask update only — no data movement).

    Replaces ME.MinkowskiPruning (ref autoencoder.py:237,247).  Blocks left
    empty stay allocated; call `compact` before the next scale change to
    drop them.
    """
    m = bg.mask & keep
    return bg.replace(mask=m, feats=jnp.where(m[:, :, None], bg.feats, 0))


def compact_where(
    bg: BlockGrid, block_keep: jax.Array, nb_cap_out: int
) -> BlockGrid:
    """Restrict to blocks where `block_keep` [nb_cap] holds, then compact.

    The slab-decomposition primitive: selecting an x-range of blocks (plus
    a 1-block halo) yields a small sub-grid that shares the full grid's
    coordinate space (res/table dims unchanged — the dense table is cheap at
    BS=16; features are the memory hog, and the sub-grid holds only the
    slab's).  Used by the streamed single-chip decode of large frames and
    the multi-chip spatial decode (SURVEY §2c).
    """
    m = bg.mask & (block_keep & bg.valid)[:, None]
    return compact(bg.replace(mask=m), nb_cap_out)


def compact(bg: BlockGrid, nb_cap_out: int) -> BlockGrid:
    """Drop empty blocks, re-rank the survivors (block-level, sorted)."""
    g = bg.G
    occ_block = bg.mask.any(axis=1) & bg.valid
    key = _flat_block_key(bg.coords, g, bg.num_batches)
    occ = jnp.zeros((bg.num_batches * g ** 3,), bool)
    occ = occ.at[
        jnp.where(occ_block, key, bg.num_batches * g ** 3)
    ].set(True, mode="drop")
    coords, table, count, c_over = _compact_from_occupancy(occ, g, nb_cap_out)
    valid = jnp.arange(nb_cap_out, dtype=jnp.int32) < count
    rows = jnp.where(valid, bg.table[
        _flat_block_key(coords, g, bg.num_batches)
    ], bg.nb_cap - 1)
    feats = bg.feats[rows]
    mask = bg.mask[rows] & valid[:, None]
    feats = jnp.where(mask[:, :, None], feats, 0)
    return BlockGrid(
        coords=coords, feats=feats, mask=mask, table=table, count=count,
        dropped=bg.dropped + c_over,
        stride=bg.stride, res=bg.res, num_batches=bg.num_batches,
    )


# ---------------------------------------------------------------------------
# Set membership (ground-truth occupancy lookups)
# ---------------------------------------------------------------------------


def isin(bg: BlockGrid, gt: BlockGrid) -> jax.Array:
    """[nb_cap, VOL] bool — slot-wise membership of bg's voxels in gt.

    Both grids must be at the same stride/res.  One block-level table gather
    per query block; replaces the reference's CPU numpy isin
    (data_utils.py:63-75).
    """
    assert bg.res == gt.res and bg.stride == gt.stride
    key = _flat_block_key(bg.coords, bg.G, bg.num_batches)
    rows = jnp.where(bg.valid, gt.table[key], gt.nb_cap - 1)
    gt_mask = gt.mask[rows]
    # table miss may alias a real block: verify coords match
    same = jnp.all(gt.coords[rows] == bg.coords, axis=-1) & (
        rows < gt.count
    )
    return bg.mask & gt_mask & same[:, None] & bg.valid[:, None]
