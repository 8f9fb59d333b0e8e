"""A/B the conv3 execution strategies at the vox10 decoder's true shapes:
default chunked (CONV3_CHUNK=512), bigger chunks (1024 / 2048), and the
fully direct (un-chunked) halo path — plus pack_occupancy and gen-up costs.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_conv_r5.py
"""

from __future__ import annotations

import time

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def timed(label, fn, *args, reps=3):
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
    print(f"  {label:<52s} c{compile_s:7.1f}s  {best * 1e3:9.2f} ms",
          flush=True)
    return out


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

    # stage-2 shaped grid: the vox10 candidate grid (~5632 blocks, 16 ch)
    cloud = torus_cloud(684, density=4.0, seed=0)
    coords, valid = collate([cloud], capacity=917504)
    for nb_cap, ch in ((5632, 16), (1536, 32), (512, 64)):
        bg = jax.jit(lambda c, v, _n=nb_cap: B.blockify(
            c, v[:, None].astype(jnp.bfloat16), v, _n,
            stride=1, res=1024, num_batches=1))(
                jnp.asarray(coords), jnp.asarray(valid))
        # give it ch channels of data
        bg = bg.replace(feats=jnp.asarray(
            rng.randn(nb_cap, B.VOL, ch).astype(np.float32),
            dtype=jnp.bfloat16) * bg.mask[:, :, None])
        nbrs = jax.jit(B.neighbor_rows)(bg)
        sync(nbrs)
        w = jnp.asarray(rng.randn(3, 3, 3, ch, ch).astype(np.float32) * .1)
        print(f"== conv3 nb={nb_cap} ch={ch} ==", flush=True)

        outs = {}
        for mode, setup in (
            ("chunk512", lambda: setattr(B, "CONV3_CHUNK", 512)),
            ("chunk1024", lambda: setattr(B, "CONV3_CHUNK", 1024)),
            ("chunk2048", lambda: setattr(B, "CONV3_CHUNK", 2048)),
        ):
            setup()
            fn = jax.jit(lambda g, n_, w_: B.conv3(g, n_, w_, None))
            outs[mode] = timed(f"conv3 {mode}", fn, bg, nbrs, w)
        B.CONV3_CHUNK = 512

        def direct(g, n_, w_):
            with B.conv3_direct_bytes(4 << 30):
                return B.conv3(g, n_, w_, None)

        outs["direct"] = timed("conv3 direct", jax.jit(direct), bg, nbrs, w)
        a = np.asarray(outs["chunk512"].feats, np.float32)
        b = np.asarray(outs["direct"].feats, np.float32)
        print(f"  [direct vs chunk512 max|diff| = "
              f"{np.max(np.abs(a - b)):.2e}]", flush=True)

    # structure ops at stage-2 scale
    bg16 = jax.jit(lambda c, v: B.blockify(
        c, v[:, None].astype(jnp.bfloat16), v, 5632,
        stride=1, res=1024, num_batches=1))(
            jnp.asarray(coords), jnp.asarray(valid))
    timed("pack_occupancy (5632 blocks)",
          jax.jit(B.pack_occupancy), bg16)
    timed("extract (device scatter, 917504)",
          jax.jit(lambda g: B.extract(g, 917504, with_feats=False)), bg16)
    nums = jnp.asarray([858862], jnp.int32)
    sc = jnp.asarray(
        rng.randn(5632, B.VOL).astype(np.float32), dtype=jnp.float32)
    timed("topk_mask (5632 blocks)",
          jax.jit(B.topk_mask), bg16, sc, nums)


if __name__ == "__main__":
    main()
