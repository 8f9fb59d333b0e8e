"""A/B the two banded-conv lowerings (ops.blocks.CONV3_LOWERING) at the
codec's true per-stage conv shapes.

RESULT (v5e chip, 2026-08-20): dot is 0.66-1.06x conv per case, 0.82x
overall (599.7 ms conv vs 727.3 ms dot across one pass of all 12 shapes)
— the conv2d lowering stays production.  The dot path's 9 overlapping
halo-window reads re-fetch ~9x the halo bytes; XLA does not CSE the
overlapping slices into one resident tile, so the lowering is
traffic-bound before its better matmul shapes can pay off.

"conv": lax.conv_general_dilated per z-group (round-3..5 production) —
measured ~19 TF/s effective on its band matmuls (scripts/ab_conv_split_r5.py),
i.e. ~10% of v5e bf16 peak: XLA tiles the 18x18-spatial conv2d poorly.
"dot": the same band matrices as nine [m*BS*BS, (g+2)ci] @ [(g+2)ci, g*co]
dot_generals (one per (dx, dy) tap) — canonical MXU matmul shapes.

Shapes below are the vox10 frame's real decoder/encoder conv inventory
(nb from the bench frame's stage grids; (ci, co) from the model channels
(1,16,32,64,32,8)/(8,64,32,16) + IRN ch->ch/4->ch/2 branches, ref
autoencoder.py:68,150,7):

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_conv_lowering.py
"""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, reps=3):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return out, compile_s, best


def main():
    import jax
    import jax.numpy as jnp

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    print("devices:", jax.devices(), flush=True)

    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import collate
    from pcgcv2_tpu.ops import blocks as B

    B.set_compute_dtype("bfloat16")
    rng = np.random.RandomState(0)

    cloud = torus_cloud(684, density=4.0, seed=0)
    coords, valid = collate([cloud], capacity=917504)

    # (nb_cap, ci, [co...]) — the conv3 inventory per stage grid.  ci=4
    # convs run at ci=8 (narrow-lane pad, conv3's ch_min) so they are
    # listed as ci=8.
    cases = [
        (5632, 16, [16, 4, 1]),   # dec stage-3 grid: conv2, IRN(16), cls
        (5632, 8, [8, 16]),       # IRN(16) branch convs at padded ci
        (1536, 32, [32, 8, 1]),   # dec stage-2 / enc scale-1
        (1536, 8, [8, 16]),       # IRN(32) branch convs
        (512, 64, [64, 16, 1]),   # dec stage-1 / enc scale-2
        (512, 16, [16, 32]),      # IRN(64) branch convs
    ]

    grids = {}
    for nb_cap, ci, _ in cases:
        if (nb_cap, ci) in grids:
            continue
        bg = jax.jit(lambda c, v, _n=nb_cap: B.blockify(
            c, v[:, None].astype(jnp.bfloat16), v, _n,
            stride=1, res=1024, num_batches=1))(
                jnp.asarray(coords), jnp.asarray(valid))
        bg = bg.replace(feats=jnp.asarray(
            rng.randn(nb_cap, B.VOL, ci).astype(np.float32),
            dtype=jnp.bfloat16) * bg.mask[:, :, None])
        nbrs = jax.jit(B.neighbor_rows)(bg)
        sync(nbrs)
        grids[(nb_cap, ci)] = (bg, nbrs)

    tot = {"conv": 0.0, "dot": 0.0}
    print(f"{'case':<28s} {'conv ms':>10s} {'dot ms':>10s} {'speedup':>8s}",
          flush=True)
    for nb_cap, ci, cos in cases:
        bg, nbrs = grids[(nb_cap, ci)]
        for co in cos:
            w = jnp.asarray(
                rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
            ms = {}
            outs = {}
            for mode in ("conv", "dot"):
                B.CONV3_LOWERING = mode
                fn = jax.jit(lambda g_, n_, w_: B.conv3(g_, n_, w_, None))
                outs[mode], _, best = timed(fn, bg, nbrs, w)
                ms[mode] = best * 1e3
                tot[mode] += best * 1e3
            err = float(jnp.max(jnp.abs(
                outs["conv"].feats.astype(jnp.float32)
                - outs["dot"].feats.astype(jnp.float32))))
            print(f"nb={nb_cap:<5d} ci={ci:<3d} co={co:<3d}      "
                  f"{ms['conv']:10.2f} {ms['dot']:10.2f} "
                  f"{ms['conv'] / ms['dot']:7.2f}x  maxerr={err:.3g}",
                  flush=True)
    B.CONV3_LOWERING = "conv"
    print(f"{'TOTAL (one pass each)':<28s} {tot['conv']:10.2f} "
          f"{tot['dot']:10.2f} {tot['conv'] / tot['dot']:7.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
