"""One-process codec profiling on the real chip: tunnel characteristics
(dispatch latency, H2D/D2H bandwidth) plus a per-phase breakdown of
Coder.encode / Coder.decode at vox10 scale.

The axon tunnel recompiles per process (5-20 min cold), so ALL measurements
ride one process.  `block_until_ready` returns early on this backend; every
timing below forces a tiny D2H sync instead.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_codec.py \
        [--ckpt ckpts/base/base_final.ckpt]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def sync(x):
    """Force completion: tiny D2H."""
    import jax.numpy as jnp

    np.asarray(jnp.ravel(x)[:1])


def timed(label, fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:<42s} {best * 1e3:9.1f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="trained checkpoint (else "
                    "random-init small model params)")
    ap.add_argument("--skip_tunnel", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    print(f"backend: {jax.devices()[0].platform}", flush=True)

    # --- tunnel characteristics ------------------------------------------
    if not args.skip_tunnel:
        print("== tunnel ==", flush=True)
        one = jnp.ones((8, 128), jnp.float32)
        sync(one)
        timed("dispatch+sync floor (tiny add)", lambda: sync(one + 1.0),
              reps=5)
        for mb in (1, 4, 16):
            host = np.ones((mb * 1024 * 1024 // 4,), np.float32)
            t0 = time.perf_counter()
            d = jnp.asarray(host)
            sync(d)
            up = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(d)
            down = time.perf_counter() - t0
            print(f"  {mb:3d} MB  H2D {mb / up:7.1f} MB/s ({up * 1e3:.0f} ms)"
                  f"   D2H {mb / down:7.1f} MB/s ({down * 1e3:.0f} ms)",
                  flush=True)

    # --- codec phase breakdown -------------------------------------------
    from pcgcv2_tpu.codec.coder import (Coder, _bucket, block_counts,
                                        canonical_order)
    from pcgcv2_tpu.config import BlockPlan
    from pcgcv2_tpu.data.synthetic import sphere_cloud, torus_cloud
    from pcgcv2_tpu.data.voxelize import collate, unique_rows
    from pcgcv2_tpu.models import PCCModel
    from pcgcv2_tpu.ops import blocks as B

    B.set_compute_dtype("bfloat16")

    cloud = torus_cloud(684, density=4.0, seed=0)
    print(f"== codec phases ({len(cloud)} voxels @ res 1024) ==", flush=True)

    if args.ckpt:
        from pcgcv2_tpu.train.trainer import load_params

        params = load_params(args.ckpt)
        print(f"params: {args.ckpt}", flush=True)
    else:
        small = sphere_cloud(48, density=1.0, seed=1)
        coords, valid = collate([small], capacity=8192)
        model = PCCModel(plan=BlockPlan(res=64, nb=(512, 256, 128, 64)),
                         num_batches=1)
        params = model.init(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)},
            coords, valid, True,
        )
        print("params: random init", flush=True)

    import tempfile

    td = tempfile.mkdtemp()
    coder = Coder(params, td + "/frame", res=1024)

    # ---- encode phases (mirrors Coder.encode, coder.py) ----
    t0 = time.perf_counter()
    ucoords = unique_rows(np.asarray(cloud, dtype=np.int32))
    print(f"  unique_rows                                "
          f"{(time.perf_counter() - t0) * 1e3:9.1f} ms", flush=True)
    n = len(ucoords)
    t0 = time.perf_counter()
    counts = block_counts(ucoords)
    print(f"  block_counts (exact-fit plan input)        "
          f"{(time.perf_counter() - t0) * 1e3:9.1f} ms", flush=True)
    plan = coder._plan_from_counts(counts)
    cap = _bucket(n, coder.input_granularity)
    y_cap = _bucket(max(n // 16, 1), coder.prune_granularity)

    pack = Coder._pack_input(ucoords, cap, plan.res)
    n_arr = np.array([n], dtype=np.int32)
    enc_fn = coder._encode_fn(plan, cap, y_cap)
    print("  [compiling encode...]", flush=True)
    t0 = time.perf_counter()
    out = enc_fn(coder.params, pack, n_arr)
    sync(out)
    print(f"  encode compile+first run                   "
          f"{(time.perf_counter() - t0):9.1f} s", flush=True)

    def up_pack():
        d = jax.device_put(pack)
        sync(d)

    timed(f"H2D pack ({pack.nbytes / 1e6:.1f} MB)", up_pack)
    dpack = jax.device_put(pack)
    sync(dpack)

    dn = jax.device_put(n_arr)

    def run_enc():
        out = enc_fn(coder.params, dpack, dn)
        sync(out)

    timed("encode jit (device-resident in)", run_enc)
    out = enc_fn(coder.params, dpack, dn)
    sync(out)
    host_out = np.asarray(out)
    ny = int(host_out[-1, 0])
    print(f"  [bottleneck ny = {ny}]", flush=True)
    timed(f"D2H packed [{out.shape[0]},{out.shape[1]}] f32 "
          f"({np.prod(out.shape) * 4 / 1e6:.1f} MB)",
          lambda: np.asarray(out))

    host_packed = host_out[:ny]
    ds_s = host_packed[:, :3].astype(np.int32)
    f_s = host_packed[:, 3:]
    timed("feature rANS encode (host pmf + rANS)",
          lambda: coder.feature_coder.encode(f_s, "_p"))
    timed("octree coordinate encode",
          lambda: coder.coordinate_coder.encode(ds_s, "_p"))

    # ---- decode phases (mirrors Coder.decode) ----
    coder.encode(cloud, postfix="_d")
    t0 = time.perf_counter()
    coder.decode(postfix="_d")
    print(f"  decode compile+first run                   "
          f"{(time.perf_counter() - t0):9.1f} s", flush=True)

    timed("octree coordinate decode",
          lambda: coder.coordinate_coder.decode("_d"))
    dcoords = coder.coordinate_coder.decode("_d")
    timed("host lexsort coords", lambda: canonical_order(dcoords))
    dcoords = dcoords[canonical_order(dcoords)]
    timed("feature rANS decode (host pmf + rANS)",
          lambda: coder.feature_coder.decode("_d"))
    dfeats = coder.feature_coder.decode("_d")

    m = len(dcoords)
    with open(coder.filename + "_d_num_points.bin", "rb") as f:
        num_points = np.frombuffer(f.read(12), dtype=np.int32).tolist()
    n_frame = num_points[-1]
    dplan = coder._plan_from_counts(counts)
    cap_y = _bucket(m, coder.prune_granularity)
    pack2 = Coder._pack_bottleneck(
        dcoords, dfeats, [m] + list(num_points), cap_y
    )
    out_cap = _bucket(n_frame, coder.input_granularity)
    dec_fn = coder._decode_fn(dplan, cap_y)

    timed(f"H2D pack2 int16 ({pack2.nbytes / 1e6:.1f} MB)",
          lambda: sync(jax.device_put(pack2)))
    dpack2 = jax.device_put(pack2)
    sync(dpack2)

    def run_dec():
        out2 = dec_fn(coder.params, dpack2)
        sync(out2)

    timed("decode jit (device-resident in)", run_dec)
    out2 = dec_fn(coder.params, dpack2)
    sync(out2)
    timed(f"D2H merged occupancy ({np.prod(out2.shape) * 4 / 1e6:.1f} MB)",
          lambda: np.asarray(out2))
    from pcgcv2_tpu.ops import blocks as _B

    meta2, hbc, hbits = Coder._split_decode_out(np.asarray(out2))
    timed("host extract (LUT)",
          lambda: _B.host_extract(hbc, hbits))

    # end-to-end for reference
    for i in range(2):
        t0 = time.perf_counter()
        coder.encode(cloud, postfix="_e")
        t1 = time.perf_counter()
        coder.decode(postfix="_e")
        t2 = time.perf_counter()
        print(f"  end-to-end encode                          "
              f"{(t1 - t0) * 1e3:9.1f} ms", flush=True)
        print(f"  end-to-end decode                          "
              f"{(t2 - t1) * 1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
