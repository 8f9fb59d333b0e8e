"""A/B measurement of conv3 formulations + decode-op costs on the real chip.

Motivated by profile_codec.py round-3 findings: decode jit = 2.27 s at vox10
with device-resident I/O, consistent with the decoder's C=16/32 convs using
only 16-32 of the MXU's 128 output lanes.  This script measures, in ONE
process (the tunnel recompiles per process):

  1. matmul rate ceilings for the candidate formulations' shapes
  2. conv3 split: halo assembly alone vs dense conv alone vs fused
  3. banded z-fold conv2d variant (folds z into lanes: Cin=(g+2)C, Cout=gC)
  4. decoder structure ops at the vox10 plan's true shapes
  5. H2D transfer variants (packing strategy for the codec host path)

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_conv_ab.py
"""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[:1])


def first_leaf(out):
    import jax

    return jax.tree_util.tree_leaves(out)[0]


def timed(label, fn, *args, reps=3, flops=0):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(first_leaf(out))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(first_leaf(out))
        best = min(best, time.perf_counter() - t0)
    extra = f"  {flops / best / 1e12:7.1f} TF/s" if flops else ""
    print(f"  {label:<52s} c{compile_s:6.1f}s  {best * 1e3:9.2f} ms{extra}",
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    # --- 1. matmul ceilings ----------------------------------------------
    print("== matmul ceilings (bf16) ==", flush=True)
    R = 1 << 20
    mm = jax.jit(lambda a, b: a @ b)
    X1 = jnp.asarray(rng.randn(R, 432).astype(np.float32), dtype=bf)
    W1 = jnp.asarray(rng.randn(432, 16).astype(np.float32), dtype=bf)
    timed("[1M,432]@[432,16]  (im2col, pos-major)", mm, X1, W1,
          flops=2 * R * 432 * 16)
    X2 = jnp.asarray(rng.randn(432, R).astype(np.float32), dtype=bf)
    W2 = jnp.asarray(rng.randn(16, 432).astype(np.float32), dtype=bf)
    timed("[16,432]@[432,1M]  (im2col, ch-major)", mm, W2, X2,
          flops=2 * R * 432 * 16)
    W3 = jnp.asarray(rng.randn(128, 432).astype(np.float32), dtype=bf)
    timed("[128,432]@[432,1M]", mm, W3, X2, flops=2 * R * 432 * 128)
    X4 = jnp.asarray(rng.randn(R, 16).astype(np.float32), dtype=bf)
    W4 = jnp.asarray(rng.randn(16, 16).astype(np.float32), dtype=bf)
    timed("[1M,16]@[16,16]    (single-tap)", mm, X4, W4,
          flops=2 * R * 16 * 16)

    # --- 2/3. conv variants at decoder shapes -----------------------------
    from pcgcv2_tpu.config import BlockPlan
    from pcgcv2_tpu.ops import blocks as B

    B.set_compute_dtype("bfloat16")
    assert B.BS == 16
    plan = BlockPlan.for_cloud(917504, 1024)
    print(f"plan: {plan}  up_caps: {[plan.up_cap(s) for s in range(3)]}",
          flush=True)

    def banded_weights(W, g):
        """W [3,3,3,Ci,Co] -> Wb [3,3,(g+2)Ci, g.Co] z-band fold."""
        W = np.asarray(W, np.float32)
        Ci, Co = W.shape[3], W.shape[4]
        Wb = np.zeros((3, 3, (g + 2) * Ci, g * Co), np.float32)
        for zo in range(g):
            for dz in range(3):
                Wb[:, :, (zo + dz) * Ci:(zo + dz + 1) * Ci,
                   zo * Co:(zo + 1) * Co] = W[:, :, dz]
        return Wb

    def make_banded_fn(g, Ci, Co):
        def fn(h, Wb):
            m = h.shape[0]
            hf = h.reshape(m, 18, 18, 18 * Ci)
            outs = []
            for zg in range(16 // g):
                xs = lax.slice_in_dim(
                    hf, zg * g * Ci, (zg * g + g + 2) * Ci, axis=3)
                o = lax.conv_general_dilated(
                    xs, Wb, window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=h.dtype)
                outs.append(o)
            out = jnp.concatenate(outs, axis=3)
            return out.reshape(m, 16, 16, 16, Co)
        return jax.jit(fn)

    conv3d = jax.jit(
        lambda h, W: B._conv3_dense(h, W, None, bf))

    for ch, nbc, g in ((16, plan.up_cap(2), 8), (32, plan.up_cap(1), 4),
                       (64, plan.up_cap(0), 2)):
        m = 2048  # per-chunk size; times scale ~linearly in m
        h = jnp.asarray(
            rng.randn(m, 18, 18, 18, ch).astype(np.float32), dtype=bf)
        W = rng.randn(3, 3, 3, ch, ch).astype(np.float32) * 0.05
        Wj = jnp.asarray(W, dtype=bf)
        useful = 2 * m * 4096 * 27 * ch * ch
        print(f"-- ch {ch} (candidate nb_cap {nbc}; timing m={m}) --",
              flush=True)
        timed(f"conv3d VALID [m,18^3,{ch}]", conv3d, h, Wj, flops=useful)
        Wb = jnp.asarray(banded_weights(W, g), dtype=bf)
        timed(f"banded z-fold g={g} conv2d", make_banded_fn(g, ch, ch),
              h, Wb, flops=useful)

    # assembly vs conv split at final-stage channel width, real grid
    print("-- full conv3 split (real candidate-like grid, ch=16) --",
          flush=True)
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import collate

    cloud = torus_cloud(684, density=4.0, seed=0)
    cap = 917504
    coords, valid = collate([cloud], capacity=cap)
    nb0 = plan.up_cap(2)
    bg = jax.jit(lambda c, f, v: B.blockify(
        c, f, v, nb0, stride=1, res=1024, num_batches=1))(
        jnp.asarray(coords),
        jnp.asarray(rng.randn(cap, 16).astype(np.float32)),
        jnp.asarray(valid))
    sync(bg.count)
    print(f"  [occupied blocks {int(bg.count)} / cap {nb0}; "
          f"{int(bg.voxel_count())} voxels]", flush=True)
    nbrs = jax.jit(B.neighbor_rows)(bg)
    sync(nbrs)
    W16 = jnp.asarray(rng.randn(3, 3, 3, 16, 16).astype(np.float32) * .05)
    useful_full = 2 * nb0 * 4096 * 27 * 16 * 16

    halo_fn = jax.jit(lambda f_, nb_: B._halo_chunk(
        f_.astype(bf).reshape(nb0, 16, 16, 16 * 16), nb_, 16))
    timed("halo assembly alone (slabs + gather)", halo_fn, bg.feats, nbrs)
    conv3_fn = jax.jit(lambda g_, nb_, w_: B.conv3(g_, nb_, w_, None))
    timed("conv3 fused (assembly + conv, chunked)", conv3_fn, bg, nbrs,
          W16, flops=useful_full)

    # --- 4. decoder structure ops at true shapes --------------------------
    print("== decoder structure ops ==", flush=True)
    n = len(cloud)
    jc, jv = jnp.asarray(coords), jnp.asarray(valid)
    timed(f"blockify [{cap} rows]",
          jax.jit(lambda c, f_, v: B.blockify(
              c, f_, v, plan.nb[0], stride=1, res=1024, num_batches=1)),
          jc, jv[:, None].astype(jnp.float32), jv)
    timed("neighbor_rows", jax.jit(B.neighbor_rows), bg)
    timed("topk_mask",
          jax.jit(lambda g_, s, k: B.topk_mask(g_, s, k)),
          bg, bg.feats[:, :, 0], jnp.array([n]))
    timed("prune+compact",
          jax.jit(lambda g_: B.compact(
              B.prune(g_, g_.mask & (g_.feats[:, :, 0] > 0)),
              plan.dec_nb[2])), bg)
    timed(f"extract [{cap}]",
          jax.jit(lambda g_: B.extract(g_, cap)), bg)
    wu = jnp.asarray(rng.randn(8, 16, 16).astype(np.float32) * 0.05)
    small = jax.jit(lambda g_: B.compact(g_, plan.dec_nb[1]))(bg)
    sync(small.count)
    timed("conv_up_generative 16->16 (dec_nb1 -> up_cap2)",
          jax.jit(lambda g_, w_: B.conv_up_generative(
              g_, w_, None, plan.up_cap(2))), small, wu)

    # --- 5. H2D variants --------------------------------------------------
    print("== H2D variants ==", flush=True)
    rows = np.zeros((cap, 4), np.int32)
    for lbl, f in (
        ("device_put rows 14MB int32", lambda: jax.device_put(rows)),
        ("device_put again (steady)", lambda: jax.device_put(rows)),
        ("device_put [cap,3] uint16",
         lambda: jax.device_put(np.ascontiguousarray(
             rows[:, 1:]).astype(np.uint16))),
        ("device_put 4-array tree", lambda: jax.device_put(
            (np.ascontiguousarray(rows[:, 0]),
             np.ascontiguousarray(rows[:, 1]),
             np.ascontiguousarray(rows[:, 2]),
             np.ascontiguousarray(rows[:, 3])))),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            d = f()
            for leaf in jax.tree_util.tree_leaves(d):
                sync(leaf)
            best = min(best, time.perf_counter() - t0)
        print(f"  {lbl:<52s} {best * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
