"""Fused halo-assembly + 3^3 conv Pallas TPU kernel (SURVEY §7.1).

The XLA path (ops.blocks.conv3) materializes every chunk's 18^3 halo in HBM:
per conv it pre-slices 26 boundary slab tensors, row-gathers 27 pieces into
an [m, 18, 18, 18*C] halo, writes it back to HBM, then reads it again for
the banded conv2d — ~5.6x the block bytes of HBM traffic per conv.  This
kernel fuses the whole pipeline per block: the 27 neighbor slabs are DMA'd
HBM->VMEM directly (reading only the ~1.42x halo bytes), assembled in a VMEM
scratch, and convolved on the MXU as z-band matmuls without ever
materializing the halo in HBM — ~2.3x less HBM traffic per conv.

The z-band formulation matches ops.blocks._conv3_dense: outputs fold z in
groups of g (g*co >= 128 full output lanes); each group is 9 (dx, dy) taps
of a [BS*BS, (g+2)*ci] @ [(g+2)*ci, g*co] matmul.  The band matrix is the
same for every z-group (z-translation invariance), so weights live in VMEM
once per kernel instance.

Forward-only (inference/codec path): the banded XLA path remains the
training implementation (it has a full VJP through the gathers).

STATUS (round 4, measured on the real v5e chip): Mosaic REJECTS this
kernel — HBM memref slices must be aligned to the (8, 128) tile on the
last two dims, and the halo face/edge/corner slabs are 1 cell wide
("Slice shape along dimension 2 must be aligned to tiling (8), but is 1",
scripts/pallas_chip_ab.py).  The fine-grained 27-slab DMA design is
therefore not compilable on current Mosaic; a workable variant would have
to over-fetch 8-aligned sub-boxes (~3.5x block bytes vs this kernel's
1.42x, vs the XLA path's 5.6x) and select in VMEM.

STATUS UPDATE (round 5, measured on the real v5e chip): the premise
weakened.  After the round-5 traffic fixes (host-side packed-bit
extraction, no pre-mask passes, sliced child masks, contiguous mask
reduces) the banded conv runs FLOP-bound at ~19 TF/s on its band matmuls
(scripts/ab_conv_split_r5.py: gathers ~6 ms vs band conv ~27 ms per
stage-2 pass), and an un-chunked direct-halo A/B was SLOWER than the
chunked banded path (81 vs 59 ms, scripts/ab_conv_r5.py) — so the
over-fetch kernel's remaining upside is the band-zeros FLOP waste, not
HBM traffic, and it stays unbuilt.  The XLA banded path is the
production conv everywhere; this kernel remains
interpret-mode-validated documentation of the design.

Miss handling relies on the BlockGrid contract that row nb_cap-1 is invalid
and all-zero (ops.blocks.neighbor_rows points misses there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcgcv2_tpu.ops import blocks as B

# cell-range maps shared with ops.blocks._halo_slabs: neighbor offset d in
# {0,1,2} -> (src cell slice in the neighbor block, dst cell slice in halo)
_SRC = {0: (B.BS - 1, B.BS), 1: (0, B.BS), 2: (0, 1)}
_DST = {0: (0, 1), 1: (1, B.BS + 1), 2: (B.BS + 1, B.BS + 2)}


def _kernel(nbrs_ref, blk_ref, wb_ref, out_ref, halo, acc, sems, *, ci, co,
            g):
    i = pl.program_id(0)
    hs = B.BS + 2

    # 27 slab DMAs: each copies exactly the halo cells this block needs
    # from the corresponding neighbor block (or the all-zero miss row).
    dmas = []
    k = 0
    for dx in (0, 1, 2):
        sx0, sx1 = _SRC[dx]
        dx0, dx1 = _DST[dx]
        for dy in (0, 1, 2):
            sy0, sy1 = _SRC[dy]
            dy0, dy1 = _DST[dy]
            for dz in (0, 1, 2):
                sz0, sz1 = _SRC[dz]
                dz0, dz1 = _DST[dz]
                row = nbrs_ref[i * 27 + k]
                dma = pltpu.make_async_copy(
                    blk_ref.at[
                        row, sx0:sx1, sy0:sy1, sz0 * ci:sz1 * ci
                    ],
                    halo.at[dx0:dx1, dy0:dy1, dz0 * ci:dz1 * ci],
                    sems.at[k],
                )
                dma.start()
                dmas.append(dma)
                k += 1
    for dma in dmas:
        dma.wait()

    # z-band matmuls: for each z-group, 9 (dx, dy) taps accumulate into
    # [BS*BS, g*co]; the band matrix wb is shared across groups.
    n_groups = B.BS // g
    for zg in range(n_groups):
        first = True
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                xs = halo[dx:dx + B.BS, dy:dy + B.BS,
                          zg * g * ci:(zg * g + g + 2) * ci]
                xs2 = xs.reshape(B.BS * B.BS, (g + 2) * ci)
                part = jnp.dot(
                    xs2, wb_ref[dx * 3 + dy],
                    preferred_element_type=jnp.float32,
                )
                if first:
                    acc[:] = part
                    first = False
                else:
                    acc[:] = acc[:] + part
        out_ref[0, :, :, zg * g * co:(zg + 1) * g * co] = (
            acc[:].reshape(B.BS, B.BS, g * co).astype(out_ref.dtype)
        )


def conv3_pallas(
    bg: "B.BlockGrid",
    nbrs: jax.Array,
    weight: jax.Array,
    bias=None,
    compute_dtype=None,
    interpret: bool = False,
) -> "B.BlockGrid":
    """Drop-in forward twin of ops.blocks.conv3 (inference path).

    bg: BlockGrid; nbrs: [nb, 3, 3, 3] neighbor rows (misses -> nb-1);
    weight: [3, 3, 3, ci, co]."""
    if compute_dtype is None:
        compute_dtype = B.COMPUTE_DTYPE
    ci = bg.channels
    ch_min = max(1, 128 // B.BS)
    if ci < ch_min:  # same narrow-lane padding contract as conv3
        bg = bg.replace(
            feats=jnp.pad(bg.feats, ((0, 0), (0, 0), (0, ch_min - ci)))
        )
        weight = jnp.pad(
            weight, ((0, 0), (0, 0), (0, 0), (0, ch_min - ci), (0, 0))
        )
        ci = ch_min
    co = weight.shape[4]
    nb = bg.nb_cap
    g = B._zfold_g(co)
    blk = bg.feats.astype(compute_dtype).reshape(nb, B.BS, B.BS, B.BS * ci)
    # [9, (g+2)*ci, g*co] band matrices, one per (dx, dy) tap
    wb = B._banded_weight(weight, g, compute_dtype).reshape(
        9, (g + 2) * ci, g * co
    )
    hs = B.BS + 2

    out = pl.pallas_call(
        functools.partial(_kernel, ci=ci, co=co, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # blk stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # band weights
            ],
            out_specs=pl.BlockSpec(
                (1, B.BS, B.BS, B.BS * co),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((hs, hs, hs * ci), compute_dtype),
                pltpu.VMEM((B.BS * B.BS, g * co), jnp.float32),
                pltpu.SemaphoreType.DMA((27,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb, B.BS, B.BS, B.BS * co), compute_dtype
        ),
        interpret=interpret,
    )(nbrs.reshape(-1).astype(jnp.int32), blk, wb)

    out = out.reshape(nb, B.VOL, co)
    if bias is not None:
        out = out + bias.astype(compute_dtype)
    return bg.with_feats(out.astype(bg.feats.dtype))
