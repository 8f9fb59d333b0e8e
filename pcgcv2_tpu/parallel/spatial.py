"""Spatially-sharded decode over a device mesh — the TPU-native scale-out
path for large frames (SURVEY §2c: "spatial-block sharding ... partition by
coordinate range; halo exchange of 1-voxel boundary for 3^3 convs over ICI").

Design: **overlap decomposition, not per-conv halo exchange.**  The final
decoder stage's receptive field is 8 voxels (3^3 conv + three 2-deep IRN
blocks + cls head) — at most one 16^3 block — so each device can compute its
x-slab's cls logits from slab + 1-block-halo inputs with ZERO communication
inside the conv stack (overlapped compute beats 11 ppermute halo exchanges
per stage: the halo recompute is ~2/w of a slab's FLOPs for w-block slabs,
while per-conv exchanges serialize 22 ICI hops into the critical path).

Communication happens exactly three times per frame:
  1. the (tiny) bottleneck + coarse stages are REPLICATED — stages 0-1 are
     ~6% of decode FLOPs at vox10 and shrink relatively further with scale;
  2. the global per-batch top-k: a 32-round radix threshold search whose
     per-round candidate counts are `psum`'d over the mesh axis
     (ops.blocks.topk_mask(psum_axis=...)), plus one all_gather of
     per-device tie counts ([B] int32) for global tie ranking;
  3. the decoded coordinates: each device extracts its interior survivors;
     shard_map stacks the per-device rows (out_specs P(axis)).

Per-device memory is the replicated coarse stages plus ONE slab's candidate
features — a vox11 frame that needs ~11 GB of candidate features fits 8
devices at ~1.4 GB each.  The same decomposition runs single-chip as the
sequential streamed decode (codec.coder._decode_streamed_fn); this module is
its shard_map twin, bit-compatible on the interior (verified in
tests/test_spatial.py on the 8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pcgcv2_tpu.config import BlockPlan
from pcgcv2_tpu.models.pcc import PCCModel
from pcgcv2_tpu.ops import blocks as B

SP_AXIS = "sp"


def make_spatial_decode_fn(
    model: PCCModel,
    plan: BlockPlan,
    mesh,
    out_cap: int,
    axis: str = SP_AXIS,
):
    """Build the jitted spatially-sharded decode.

    model/plan: as in the single-chip codec path (num_batches=1 bottleneck).
    Returns fn(params, rows, feats, valid, nums) -> (coords [n_dev *
    local_cap, 4], counts [n_dev], dropped) where rows/feats/valid are the
    REPLICATED padded bottleneck voxel rows (stride 8) and nums the 3
    per-scale point counts (rho already applied to nums[2] by the caller).
    Device d owns x-slab d of the final stage; the stacked output holds each
    device's interior survivors in its segment (block-scan order within).
    """
    n_dev = mesh.shape[axis]
    nb3 = plan.nb[3]
    res_y = max(1, plan.res // 8)
    # Per-device slab capacities scale with the plan, not fixed floors: a
    # 1024-block floor is 4.2M slots PER DEVICE at BS=16 — ~50 GB across an
    # 8-device CPU test mesh for a toy frame (the round-3 suite abort).
    local_cap = max(256, -(-out_cap // n_dev) * 4)
    sub_in_cap = max(32, plan.dec_nb[1] * 4 // n_dev)
    sub_cand_cap = plan.up_factors[2] * sub_in_cap

    def local_fn(params, rows, feats, valid, nums):
        feats = feats.astype(B.COMPUTE_DTYPE)
        y = B.blockify(
            rows, feats, valid, nb3, stride=8, res=res_y, num_batches=1
        )
        out = model.apply(
            params, y, [nums[0:1], nums[1:2]],
            method=PCCModel.decode_coarse_fn,
        )
        g_in = B.grid_dim(out.res)
        i = jax.lax.axis_index(axis)
        ia = i * g_in // n_dev
        ib = (i + 1) * g_in // n_dev
        bx = out.coords[:, 1]
        sub = B.compact_where(
            out, (bx >= ia - 1) & (bx < ib + 1), sub_in_cap
        )
        sub_cls = model.apply(
            params, sub, sub_cand_cap, method=PCCModel.decode_stage2_fn
        )
        cx = sub_cls.coords[:, 1]
        interior = (
            ((cx >= 2 * ia) & (cx < 2 * ib) & sub_cls.valid)[:, None]
        )
        keep = B.topk_mask(
            sub_cls, sub_cls.feats[:, :, 0].astype(jnp.float32),
            nums[2:3], live_mask=interior, psum_axis=axis,
        )
        pruned = B.prune(sub_cls, keep & interior)
        oc, _, cnt = B.extract(pruned, local_cap, with_feats=False)
        dropped = jax.lax.psum(sub_cls.dropped - out.dropped, axis)
        return oc, cnt[None], out.dropped + dropped

    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def assemble_decoded(coords, counts, n_dev: int):
    """Host-side: stacked per-device rows -> one [N, 3] xyz array (device
    segments concatenated in slab order = global block-scan order)."""
    import numpy as np

    coords = np.asarray(coords)
    counts = np.asarray(counts).reshape(-1)
    local_cap = coords.shape[0] // n_dev
    parts = [
        coords[d * local_cap: d * local_cap + int(counts[d]), 1:]
        for d in range(n_dev)
    ]
    return np.concatenate(parts, axis=0)
