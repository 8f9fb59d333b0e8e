"""Split conv3's cost into halo-gather vs MXU-conv at decoder shapes, and
A/B candidate fusions (IRN branch-merged conv, wider-M band variants).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_conv_split_r5.py
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
    print(f"  {label:<56s} c{compile_s:6.1f}s  {best * 1e3:9.2f} ms",
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
    bf = jnp.bfloat16

    cloud = torus_cloud(684, density=4.0, seed=0)
    coords, valid = collate([cloud], capacity=917504)

    # dispatch+sync floor for calibration
    one = jnp.ones((8, 128), bf)
    sync(one)
    timed("dispatch floor (tiny add)", jax.jit(lambda x: x + 1), one, reps=5)

    for nb_cap, ci, co in ((5632, 16, 16), (5632, 16, 4), (1536, 32, 32)):
        bg = jax.jit(lambda c, v, _n=nb_cap: B.blockify(
            c, v[:, None].astype(bf), v, _n,
            stride=1, res=1024, num_batches=1))(
                jnp.asarray(coords), jnp.asarray(valid))
        bg = bg.replace(feats=jnp.asarray(
            rng.randn(nb_cap, B.VOL, ci).astype(np.float32),
            dtype=bf) * bg.mask[:, :, None])
        nbrs = jax.jit(B.neighbor_rows)(bg)
        sync(nbrs)
        w = jnp.asarray(
            rng.randn(3, 3, 3, ci, co).astype(np.float32) * .1, dtype=bf)
        print(f"== nb={nb_cap} ci={ci} co={co} ==", flush=True)

        n_chunks = -(-nb_cap // B.CONV3_CHUNK)
        pad_rows = n_chunks * B.CONV3_CHUNK - nb_cap

        def halos_only(g, n_):
            blk = g.feats.astype(bf).reshape(g.nb_cap, B.BS, B.BS, -1)
            ch = g.channels
            slabs = B._halo_slabs(blk, ch)
            nbrs_p = jnp.pad(
                n_, ((0, pad_rows), (0, 0), (0, 0), (0, 0)),
                constant_values=g.nb_cap - 1,
            ).reshape(n_chunks, B.CONV3_CHUNK, 3, 3, 3)

            def body(nc):
                h = B._halo_chunk(blk, nc, ch, slabs)
                # cheap reduction so the halo isn't DCE'd but no conv runs
                return jnp.sum(h, axis=(1, 2, 3))

            return jax.lax.map(body, nbrs_p)

        timed("halo gathers only (chunked, sum-reduced)",
              jax.jit(halos_only), bg, nbrs)

        # MXU only: prebuilt halo chunk, conv across all chunks
        h_chunk = jnp.asarray(rng.randn(
            B.CONV3_CHUNK, B.BS + 2, B.BS + 2,
            (B.BS + 2) * ci).astype(np.float32), dtype=bf)

        def conv_only(h, w_):
            def body(i, acc):
                o = B._conv3_dense(h, w_, None, bf)
                return acc + jnp.sum(o)

            return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((), bf))

        timed(f"banded conv only x{n_chunks} chunks",
              jax.jit(conv_only), h_chunk, w)

        timed("full conv3 (chunk512)",
              jax.jit(lambda g, n_, w_: B.conv3(g, n_, w_, None)),
              bg, nbrs, w)

    # IRN-fused candidate: one 20ch halo producing both branch convs
    print("== IRN fusion candidate (nb=5632, ch=16) ==", flush=True)
    bg = jax.jit(lambda c, v: B.blockify(
        c, v[:, None].astype(bf), v, 5632,
        stride=1, res=1024, num_batches=1))(
            jnp.asarray(coords), jnp.asarray(valid))
    bg16 = bg.replace(feats=jnp.asarray(
        rng.randn(5632, B.VOL, 16).astype(np.float32), dtype=bf)
        * bg.mask[:, :, None])
    nbrs = jax.jit(B.neighbor_rows)(bg16)
    sync(nbrs)
    w00 = jnp.asarray(rng.randn(3, 3, 3, 16, 4).astype(np.float32) * .1, bf)
    w11 = jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * .1, bf)
    w10 = jnp.asarray(rng.randn(16, 4).astype(np.float32) * .1, bf)

    def irn_separate(g, n_):
        a = B.conv3(g, n_, w00, None)                      # 16 -> 4
        b1 = g.with_feats(jax.nn.relu(
            jnp.einsum("bvc,cd->bvd", g.feats.astype(bf), w10)))
        b = B.conv3(b1, n_, w11, None)                     # 4 -> 4
        return a.feats + 0 * b.feats[:, :, :4], b.feats

    def irn_fused(g, n_):
        b1 = jax.nn.relu(
            jnp.einsum("bvc,cd->bvd", g.feats.astype(bf), w10))
        cat = g.with_feats(jnp.concatenate(
            [g.feats.astype(bf), b1], axis=-1))            # 20 ch
        wz = jnp.zeros((3, 3, 3, 16, 4), bf)
        wz2 = jnp.zeros((3, 3, 3, 4, 4), bf)
        wcat = jnp.concatenate([
            jnp.concatenate([w00, wz2 * 0 + 0], axis=3)[..., :, :],
        ], axis=4) if False else jnp.concatenate([
            jnp.concatenate([w00, jnp.zeros((3, 3, 3, 4, 4), bf)], axis=3),
            jnp.concatenate([jnp.zeros((3, 3, 3, 16, 4), bf), w11], axis=3),
        ], axis=4)                                          # [3,3,3,20,8]
        out = B.conv3(cat, n_, wcat, None)
        return out.feats[:, :, :4], out.feats[:, :, 4:]

    a0, b0 = timed("IRN branches: two conv3", jax.jit(irn_separate),
                   bg16, nbrs)
    a1, b1 = timed("IRN branches: fused 20ch conv3", jax.jit(irn_fused),
                   bg16, nbrs)
    print(f"  [fused vs separate max|diff| = "
          f"{np.max(np.abs(np.asarray(b0, np.float32) - np.asarray(b1, np.float32))):.2e}]",
          flush=True)


if __name__ == "__main__":
    main()
