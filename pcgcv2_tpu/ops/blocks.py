"""Dense-block sparse voxel backend — the TPU-native compute core.

The reference's MinkowskiEngine runtime (usage: /root/reference/autoencoder.py,
coder.py:102) is a GPU hash-map + gather-GEMM design.  A direct translation
(per-voxel kernel maps via searchsorted, row gathers) measures ~14 s per
kernel-map build at vox10 scale on a v5e chip — TPU gathers are scalar-ish and
int64 is emulated.  This module is the TPU-first redesign:

* **Space is partitioned into 8^3 dense blocks.**  A `BlockGrid` stores the
  occupied blocks' features as one dense tensor [nb, 512, C] plus a per-slot
  occupancy mask.  Surface scans fill ~10% of their blocks' slots, so dense
  block compute costs ~10x the sparse FLOPs — and the MXU is ~100x faster at
  dense conv than the VPU is at per-voxel gathers.  Net win >10x, measured.

* **All structure ops are block-level.**  A dense lookup table (one int32 per
  block-space cell) maps block coordinates to block rows.  Neighbor maps are
  27 table gathers per *block* (not per voxel); 3^3 convolutions assemble a
  10^3 halo from neighbor-block slabs and run `lax.conv_general_dilated`
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

Block size is fixed at 8 (BS=8, 512 slots): the halo overhead (10^3/8^3 ~
1.95x) beats 4^3 blocks (6^3/4^3 ~ 3.4x), and [*, 512, C] tensors tile the
MXU/VPU lanes well.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

BS = 8              # block side
VOL = BS ** 3       # 512 slots per block

# Dtype for conv/matmul inputs (halos, windows).  Storage (BlockGrid.feats)
# stays float32; accumulation is always float32 (preferred_element_type).
# bfloat16 halves the HBM traffic of the halo-dominated 3^3 convs — the
# production codec/training scripts opt in; tests keep float32 so oracle
# comparisons stay exact.  Read at TRACE time: set before building a jit.
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
    """Occupied 8^3 blocks of a sparse voxel set at one scale.

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
        """feats viewed as [nb_cap, 8, 8, 8, C]."""
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
    bottleneck bitstream and the decoded point set).  Positions are made
    globally unique (dropped rows get distinct out-of-range slots) so the
    scatter vectorizes on TPU; coords and feats ride one fused scatter.
    """
    flat_mask = (bg.mask & bg.valid[:, None]).reshape(-1)
    n_all = flat_mask.shape[0]
    pos = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    count = jnp.maximum(pos[-1] + 1, 0).astype(jnp.int32)
    pos = jnp.where(
        flat_mask, pos, out_cap + jnp.arange(n_all, dtype=jnp.int32)
    )
    coords_all = slot_coords(bg).reshape(-1, 4)
    if with_feats:
        ch = bg.channels
        payload = jnp.concatenate(
            [
                coords_all.astype(jnp.float32),
                bg.feats.reshape(-1, ch).astype(jnp.float32),
            ],
            axis=-1,
        )
        out = jnp.zeros((out_cap, 4 + ch), jnp.float32).at[pos].set(
            payload, mode="drop", unique_indices=True
        )
        out_c = out[:, :4].astype(jnp.int32)
        out_f = out[:, 4:].astype(bg.feats.dtype)
    else:
        out_c = jnp.zeros((out_cap, 4), jnp.int32).at[pos].set(
            coords_all, mode="drop", unique_indices=True
        )
        out_f = None
    count = jnp.minimum(count, out_cap)
    return out_c, out_f, count


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


# Blocks per lax.map chunk in the large-grid conv3 path.  4096 blocks keep
# the MXU batch large while bounding the per-chunk halo to
# 4096 * 10^3 * C floats (~1 GB at C=64 f32) regardless of grid size.
CONV3_CHUNK = 4096

_SL = {0: (BS - 1, BS), 1: (0, BS), 2: (0, 1)}  # neighbor-offset -> slab slice


def _halo_chunk(blk: jax.Array, nbrs: jax.Array, ch: int) -> jax.Array:
    """Assemble [m, 10, 10, 10, C] halos for a set of blocks by gathering
    27 slabs per block from the full folded block tensor.

    blk: [nb, BS, BS, BS*ch] (folded z*C lanes); nbrs: [m, 3, 3, 3] rows.
    No cross-row dependencies, so it works on an arbitrary row subset —
    both the big-grid chunking primitive and the direct small-grid path.

    NOTE on alternatives (both measured SLOWER end-to-end at vox10 on v5e):
    * a separable 6-copy assembly with optimization_barrier'd full-block
      gathers (~13x memory-bound amplification from the materialized
      copies);
    * a single z-line gather ([m,10,10]-indexed rows of 8C) + thin z-end
      gathers — the 2-D-batched gather lowers worse than these 27
      fused slice-gathers (bench 14.2 s vs 11.1 s per frame).
    """
    parts_x = []
    for dx in (0, 1, 2):
        x0, x1 = _SL[dx]
        parts_y = []
        for dy in (0, 1, 2):
            y0, y1 = _SL[dy]
            parts_z = []
            for dz in (0, 1, 2):
                z0, z1 = _SL[dz]
                rows = nbrs[:, dx, dy, dz]
                piece = blk[rows][:, x0:x1, y0:y1, z0 * ch:z1 * ch]
                parts_z.append(piece)
            parts_y.append(jnp.concatenate(parts_z, axis=3))
        parts_x.append(jnp.concatenate(parts_y, axis=2))
    h = jnp.concatenate(parts_x, axis=1)  # [m, 10, 10, 10*ch]
    return h.reshape(h.shape[0], BS + 2, BS + 2, BS + 2, ch)


def _conv3_dense(h: jax.Array, weight, bias, compute_dtype):
    # preferred_element_type must MATCH the input dtype: a widening conv
    # (bf16 -> f32) has no valid transpose rule (the f32 cotangent meets the
    # bf16 weight and lax.conv rejects mixed dtypes).  MXU accumulation is
    # f32 internally either way; the cast to storage dtype happens in the
    # caller.
    out = jax.lax.conv_general_dilated(
        h, weight.astype(compute_dtype),
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=compute_dtype,
    )
    if bias is not None:
        out = out + bias.astype(compute_dtype)
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
    ch = bg.channels
    if ch < 16:
        bg = bg.replace(
            feats=jnp.pad(bg.feats, ((0, 0), (0, 0), (0, 16 - ch)))
        )
        weight = jnp.pad(
            weight, ((0, 0), (0, 0), (0, 0), (0, 16 - ch), (0, 0))
        )
        ch = 16
    nb = bg.nb_cap
    if nb <= 2 * CONV3_CHUNK:
        blk = bg.feats.astype(compute_dtype).reshape(nb, BS, BS, BS * ch)
        h = _halo_chunk(blk, nbrs, ch)
        out = _conv3_dense(h, weight, bias, compute_dtype)
        out = out.reshape(nb, VOL, -1)
    else:
        blk = bg.feats.astype(compute_dtype).reshape(nb, BS, BS, BS * ch)
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
            h = _halo_chunk(blk, nc, ch)
            o = _conv3_dense(h, weight, bias, compute_dtype)
            return o.reshape(CONV3_CHUNK, VOL, o.shape[-1])

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
    )  # [nb, 4, 4, 4, cout]
    if bias is not None:
        y = y + bias.astype(compute_dtype)
    m = bg.mask.reshape(nb, 4, 2, 4, 2, 4, 2)
    m_down = m.any(axis=(2, 4, 6))  # [nb, 4, 4, 4]
    y = jnp.where(m_down[..., None], y, 0).astype(bg.feats.dtype)

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
    # Assembly is 8 per-octant row gathers + folded slice writes — zero
    # transposes (a transposed assembly materializes tiny-minor-dim buffers
    # that TPU tiling pads 4-8x).
    ch_rows = _child_rows(bg, pcoords, pvalid)  # [nbp, 2, 2, 2]
    y_f = y.reshape(nb, 4, 4, 4 * cout)  # fold (z, C) lanes
    pf = jnp.zeros((nb_cap_out, BS, BS, BS * cout), y.dtype)
    pm = jnp.zeros((nb_cap_out, BS, BS, BS), bool)
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                rows = ch_rows[:, ox, oy, oz]
                pf = pf.at[
                    :, ox * 4:ox * 4 + 4, oy * 4:oy * 4 + 4,
                    oz * 4 * cout:(oz + 1) * 4 * cout,
                ].set(y_f[rows])
                pm = pm.at[
                    :, ox * 4:ox * 4 + 4, oy * 4:oy * 4 + 4,
                    oz * 4:oz * 4 + 4,
                ].set(m_down[rows])
    pf = pf.reshape(nb_cap_out, VOL, cout)
    pm = pm.reshape(nb_cap_out, VOL)
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
    )  # [nb, 16, 16, 16, cout]
    if bias is not None:
        y_big = y_big + bias.astype(compute_dtype)
    # child-voxel mask: each parent voxel's 8 children are occupied
    m = bg.mask.reshape(nb, BS, 1, BS, 1, BS, 1)
    m_big = jnp.broadcast_to(
        m, (nb, BS, 2, BS, 2, BS, 2)
    ).reshape(nb, 16, 16, 16)
    y_big = jnp.where(m_big[..., None], y_big, 0).astype(bg.feats.dtype)
    y_fold = y_big.reshape(nb, 16, 16, 16 * cout)

    child_f_parts = []
    child_m_parts = []
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                child_f_parts.append(
                    y_fold[
                        :, ox * 8:ox * 8 + 8, oy * 8:oy * 8 + 8,
                        oz * 8 * cout:(oz + 1) * 8 * cout,
                    ].reshape(nb, VOL, cout)
                )
                child_m_parts.append(
                    m_big[
                        :, ox * 8:ox * 8 + 8, oy * 8:oy * 8 + 8,
                        oz * 8:oz * 8 + 8,
                    ].reshape(nb, VOL)
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
) -> jax.Array:
    """[nb_cap, VOL] bool — per-batch-item top-k over occupied slots.

    Replaces the reference's CPU `istopk` (data_utils.py:77-89) with a
    sort-free radix threshold search: 32 rounds of masked popcounts find the
    exact k-th score bit pattern per batch item, then ties at the threshold
    are broken in block-scan order.  k is min(k, available), matching the
    reference.  O(32 * nb * VOL) VPU work, no per-voxel sort.
    """
    nbatch = bg.num_batches
    live = bg.mask & bg.valid[:, None]
    u = _monotone_bits(scores.reshape(bg.nb_cap, VOL))
    u = jnp.where(live, u, jnp.uint32(0))
    # one-hot batch matrix [nb, B] (block rows are batch-pure)
    brow = jnp.where(bg.valid, bg.coords[:, 0], nbatch)
    onehot = (
        brow[:, None] == jnp.arange(nbatch, dtype=brow.dtype)[None, :]
    ).astype(jnp.float32)
    k = jnp.asarray(nums, jnp.int32)

    def count_ge(t):
        """[B] — occupied slots with score bits >= t (t: [B] uint32)."""
        ge = (u[:, :, None] >= t[None, None, :]) & live[:, :, None]
        per_block = jnp.sum(ge.astype(jnp.float32), axis=1)  # [nb, B-thresh]
        # route each block's count to its own batch column
        return jnp.sum(per_block * onehot, axis=0).astype(jnp.int32)

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
