"""Stage-by-stage TPU timing of the codec pipeline at vox10 scale.

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
    print(f"{label:42s} compile {compile_s:7.2f}s   run {best * 1e3:9.2f}ms")
    return out


def main():
    from pcgcv2_tpu import ops
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import collate
    from pcgcv2_tpu.ops import keys as K

    print("devices:", jax.devices())
    cloud = torus_cloud(684, density=4.0, seed=0)
    n = len(cloud)
    print(f"cloud: {n} voxels")
    cap = 917504
    x = collate([cloud], capacity=cap)
    x = jax.block_until_ready(x)

    # --- primitive micro-benches at full-res capacity -----------------------
    keys = x.keys
    timed("sort int64 [cap]", jax.jit(jnp.sort), keys)

    feats16 = jnp.ones((cap, 16), jnp.float32)
    perm = jnp.argsort(keys)
    timed("argsort+gather int64 [cap] +16ch payload",
          jax.jit(lambda k, f: K.sort_by_key(k, f)[1]), keys, feats16)

    off3 = ops.stencil_offsets(3, 1)
    kmap = timed("kernel map 27 offsets [cap]",
                 jax.jit(lambda sv: ops.build_kernel_map(sv, off3)), x)

    w = jnp.ones((27, 16, 16), jnp.float32) * 0.01
    sv16 = x.with_feats(feats16)

    def conv_g(sv, nbr, hit, w, g):
        return ops.apply_kernel_map(sv.feats, nbr, hit, w, group_size=g)

    for g in (1, 3, 9, 27):
        try:
            timed(f"conv 16->16 group_size={g} [cap]",
                  jax.jit(lambda sv, nbr, hit, w, g=g: conv_g(sv, nbr, hit, w, g)),
                  sv16, kmap[0], kmap[1], w)
        except Exception as e:  # noqa: BLE001
            print(f"conv group_size={g} FAILED: {type(e).__name__}")

    timed("topk_mask [cap] b=1",
          jax.jit(lambda sv, s: ops.topk_mask(sv, s, jnp.array([n // 2]), 1)),
          sv16, feats16[:, 0])

    timed("prune to cap/2",
          jax.jit(lambda sv, kp: ops.prune(sv, kp, cap // 2)),
          sv16, x.valid)

    wup = jnp.ones((8, 16, 16), jnp.float32) * 0.01
    sv16_s2 = ops.SparseVoxels(
        coords=x.coords * jnp.array([1, 2, 2, 2], jnp.int32),
        feats=feats16,
        keys=K.ravel(x.coords * jnp.array([1, 2, 2, 2], jnp.int32)),
        count=x.count, stride=2,
    )
    # fix pad rows after coord scaling
    sv16_s2 = ops.build(sv16_s2.coords, feats16, x.count, stride=2)
    sv16_s2 = jax.block_until_ready(sv16_s2)
    timed("gen-up conv 16->16 (8x rows + sort)",
          jax.jit(lambda sv, w: ops.conv_up_generative(sv, w, None)), sv16_s2, wup)

    wd = jnp.ones((8, 16, 16), jnp.float32) * 0.01
    timed("down-conv 16->16",
          jax.jit(lambda sv, w: ops.conv_down(sv, w, None, cap // 2)), sv16, wd)


if __name__ == "__main__":
    main()
