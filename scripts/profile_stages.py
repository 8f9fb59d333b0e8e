"""Stage-by-stage TPU timing of the block-backend codec pipeline at vox10
scale (the numbers behind the perf claims in ops/blocks.py — VERDICT r1 asked
for committed evidence).

Times compile and steady-state runtime of each building block separately so
optimization effort lands where the wall-clock goes.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_stages.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, reps=3):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} compile {compile_s:7.2f}s   run {best * 1e3:9.2f}ms")
    return out


def main():
    from pcgcv2_tpu.cache import enable_persistent_cache
    from pcgcv2_tpu.config import BlockPlan
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import collate
    from pcgcv2_tpu.ops import blocks as B

    enable_persistent_cache(jax)
    import os

    if os.environ.get("BENCH_DTYPE"):
        B.set_compute_dtype(os.environ["BENCH_DTYPE"])
    print("devices:", jax.devices(), "BS:", B.BS,
          "dtype:", B.COMPUTE_DTYPE)
    cloud = torus_cloud(684, density=4.0, seed=0)
    n = len(cloud)
    print(f"cloud: {n} voxels @ res 1024")
    cap = 917504
    plan = BlockPlan.for_cloud(cap, 1024)
    print("plan:", plan)
    coords, valid = collate([cloud], capacity=cap)
    coords, valid = jnp.asarray(coords), jnp.asarray(valid)

    feats1 = valid[:, None].astype(jnp.float32)
    bg = timed(
        f"blockify [cap={cap}] -> nb {plan.nb[0]}",
        jax.jit(lambda c, f, v: B.blockify(
            c, f, v, plan.nb[0], stride=1, res=1024, num_batches=1)),
        coords, feats1, valid,
    )
    print(f"  occupied blocks: {int(bg.count)}  "
          f"({int(bg.voxel_count())} voxels, "
          f"{int(bg.voxel_count()) / max(int(bg.count), 1):.0f} per block)")

    nbrs = timed("neighbor_rows (27 block gathers)",
                 jax.jit(B.neighbor_rows), bg)

    rng = np.random.RandomState(0)
    bg16 = bg.with_feats(
        jnp.asarray(rng.randn(bg.nb_cap, B.VOL, 16).astype(np.float32))
    )
    # channel width at the block count of the scale where it actually occurs
    # in the model (channels (1,16,32,64,...) at strides (1,2,4)):
    for ch, nb_s, stride_s in ((16, plan.nb[0], 1), (32, plan.nb[1], 2),
                               (64, plan.nb[2], 4)):
        sub = np.unique((cloud // stride_s) * stride_s, axis=0)
        c_s, v_s = collate([sub], capacity=len(sub))
        bgc = jax.jit(lambda c, f, v, nb_s=nb_s, stride_s=stride_s:
                      B.blockify(c, f, v, nb_s, stride=stride_s,
                                 res=1024 // stride_s, num_batches=1))(
            jnp.asarray(c_s),
            jnp.asarray(rng.randn(len(sub), ch).astype(np.float32)),
            jnp.asarray(v_s))
        nbrs_c = jax.jit(B.neighbor_rows)(bgc)
        w = jnp.asarray(rng.randn(3, 3, 3, ch, ch).astype(np.float32) * 0.05)
        fn = jax.jit(lambda g, nb, w: B.conv3(g, nb, w, None))
        out = timed(f"conv3 {ch}->{ch} @ nb_cap {nb_s}", fn, bgc, nbrs_c, w)
        # FLOPs: 2 * slots_in_halo * 27 * ch * ch
        flops = 2 * nb_s * 1000 * 27 * ch * ch
        t0 = time.perf_counter()
        jax.block_until_ready(fn(bgc, nbrs_c, w))
        dt = time.perf_counter() - t0
        print(f"  ~{flops / dt / 1e12:.2f} TFLOP/s effective")
        del bgc, nbrs_c, out

    wd = jnp.asarray(rng.randn(8, 16, 32).astype(np.float32) * 0.05)
    dn = timed("conv_down 16->32 (reshape-matmul + octant merge)",
               jax.jit(lambda g, w: B.conv_down(g, w, None, plan.nb[1])),
               bg16, wd)

    wu = jnp.asarray(rng.randn(16, 32, 16).astype(np.float32)[:8] * 0.05)
    timed("conv_up_generative 32->16 (8 children/voxel)",
          jax.jit(lambda g, w: B.conv_up_generative(g, w, None, plan.nb[0])),
          dn, wu)

    scores = bg16.feats[:, :, 0]
    timed("topk_mask (radix threshold, 32 rounds)",
          jax.jit(lambda g, s: B.topk_mask(g, s, jnp.array([n // 2]))),
          bg16, scores)

    keep = bg16.mask & (scores > 0)
    pr = B.prune(bg16, keep)
    timed("compact (drop empty blocks)",
          jax.jit(lambda g: B.compact(g, plan.nb[0])), pr)

    timed("extract (coords+feats rows)",
          jax.jit(lambda g: B.extract(g, cap)), bg16)

    # --- full transforms + host entropy coding ------------------------------
    from pcgcv2_tpu.codec import native
    from pcgcv2_tpu.models import PCCModel
    from pcgcv2_tpu.models.pcc import PCCModel as M

    model = PCCModel(plan=plan, num_batches=1)
    small_c, small_v = coords, valid
    params = jax.jit(lambda k1, k2: model.init(
        {"params": k1, "noise": k2}, small_c, small_v, True))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1))

    enc = jax.jit(lambda p, c, v: model.apply(p, c, v, method=M.encode_fn))
    y, nums, n_in = timed("encode_fn (analysis transform)",
                          enc, params, coords, valid)
    print(f"  bottleneck: {int(y.voxel_count())} voxels in "
          f"{int(y.count)} blocks; dropped={int(y.dropped)}")

    yc, yf, ny = jax.block_until_ready(
        jax.jit(lambda g: B.extract(g, cap))(y))
    ny = int(ny)
    vals = np.round(np.asarray(yf)[:ny]).astype(np.int32)
    pmf = np.full((8, 16), 1.0 / 16, dtype=np.float64)
    cdf = native.quantize_cdf(pmf)
    syms = np.clip(vals - vals.min(), 0, 15).reshape(-1)
    t0 = time.perf_counter()
    blob = native.rans_encode(cdf, syms)
    t1 = time.perf_counter()
    native.rans_decode(cdf, blob, len(syms))
    t2 = time.perf_counter()
    print(f"{'rANS encode (host, ' + str(len(syms)) + ' syms)':46s} "
          f"{'':>18s} run {(t1 - t0) * 1e3:9.2f}ms")
    print(f"{'rANS decode (host)':46s} {'':>18s} run {(t2 - t1) * 1e3:9.2f}ms")


if __name__ == "__main__":
    main()
