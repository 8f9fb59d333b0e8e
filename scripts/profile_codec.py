"""One-process codec profiling on the real chip: tunnel characteristics
(dispatch latency, H2D/D2H bandwidth) plus a per-phase breakdown of
Coder.encode / Coder.decode at vox10 scale.

The axon tunnel recompiles per process (5-20 min cold), so ALL measurements
ride one process.  `block_until_ready` returns early on this backend; every
timing below forces a tiny D2H sync instead.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_codec.py
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.devices()[0].platform}", flush=True)

    # --- tunnel characteristics ------------------------------------------
    print("== tunnel ==", flush=True)
    one = jnp.ones((8, 128), jnp.float32)
    sync(one)
    timed("dispatch+sync floor (tiny add)", lambda: sync(one + 1.0), reps=5)
    for mb in (1, 4, 16, 64):
        host = np.ones((mb * 1024 * 1024 // 4,), np.float32)
        t0 = time.perf_counter()
        d = jnp.asarray(host)
        sync(d)
        up = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(d)
        down = time.perf_counter() - t0
        print(f"  {mb:3d} MB  H2D {mb / up:7.1f} MB/s   "
              f"D2H {mb / down:7.1f} MB/s", flush=True)

    # --- codec phase breakdown -------------------------------------------
    from pcgcv2_tpu.codec.coder import Coder
    from pcgcv2_tpu.config import BlockPlan
    from pcgcv2_tpu.data.synthetic import sphere_cloud, torus_cloud
    from pcgcv2_tpu.data.voxelize import collate
    from pcgcv2_tpu.models import PCCModel
    from pcgcv2_tpu.ops import blocks as B

    B.set_compute_dtype("bfloat16")

    cloud = torus_cloud(684, density=4.0, seed=0)
    n = len(cloud)
    print(f"== codec phases ({n} voxels @ res 1024) ==", flush=True)

    small = sphere_cloud(48, density=1.0, seed=1)
    coords, valid = collate([small], capacity=8192)
    model = PCCModel(plan=BlockPlan(res=64, nb=(512, 256, 128, 64)),
                     num_batches=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        coords, valid, True,
    )

    import tempfile

    td = tempfile.mkdtemp()
    coder = Coder(params, td + "/frame", res=1024)

    # encode phases (mirrors Coder.encode)
    from pcgcv2_tpu.codec.coder import _bucket, canonical_order

    t0 = time.perf_counter()
    ucoords = np.unique(np.asarray(cloud, dtype=np.int32), axis=0)
    print(f"  np.unique                                  "
          f"{(time.perf_counter() - t0) * 1e3:9.1f} ms", flush=True)
    plan = coder._plan_for(len(ucoords))
    cap = _bucket(len(ucoords), coder.input_granularity)
    enc_fn = coder._encode_fn(plan, cap)
    print("  [compiling encode...]", flush=True)
    t0 = time.perf_counter()
    rows, valid = collate([ucoords], capacity=cap)
    out = enc_fn(coder.params, rows, valid)
    sync(out[2])
    print(f"  encode compile+first run                   "
          f"{(time.perf_counter() - t0):9.1f} s", flush=True)

    rows, valid = collate([ucoords], capacity=cap)

    def up_rows():
        d = jax.device_put(rows)
        sync(d)

    timed(f"H2D rows [{cap},4] int32", up_rows)

    drows = jax.device_put(rows)
    dvalid = jax.device_put(valid)
    sync(drows); sync(dvalid)

    def run_enc():
        out = enc_fn(coder.params, drows, dvalid)
        sync(out[2])

    timed("encode jit (device-resident in/out)", run_enc)

    yc, yf, ny, nums, n_in, n_drop = enc_fn(coder.params, drows, dvalid)
    sync(ny)
    ny_i = int(ny)
    print(f"  [bottleneck ny = {ny_i}]", flush=True)
    timed(f"D2H yc [{yc.shape[0]},4] int32", lambda: np.asarray(yc))
    timed(f"D2H yf [{yf.shape[0]},{yf.shape[1]}] f32",
          lambda: np.asarray(yf))

    ds_coords = np.asarray(yc)[:ny_i, 1:] // 8
    feats = np.asarray(yf)[:ny_i]
    timed("host lexsort bottleneck", lambda: canonical_order(ds_coords))
    order = canonical_order(ds_coords)
    ds_s, f_s = ds_coords[order], feats[order]
    timed("feature rANS encode (pmf jit + host)",
          lambda: coder.feature_coder.encode(f_s, "_p"))
    timed("octree coordinate encode",
          lambda: coder.coordinate_coder.encode(ds_s, "_p"))

    # decode phases
    import jax.numpy as jnp  # noqa: F811

    coder.encode(cloud, postfix="_d")
    t0 = time.perf_counter()
    coder.decode(postfix="_d")
    print(f"  decode compile+first run                   "
          f"{(time.perf_counter() - t0):9.1f} s", flush=True)

    timed("octree coordinate decode",
          lambda: coder.coordinate_coder.decode("_d"))
    dcoords = coder.coordinate_coder.decode("_d")
    timed("feature rANS decode", lambda: coder.feature_coder.decode("_d"))
    dfeats = coder.feature_coder.decode("_d")

    m = len(dcoords)
    with open(coder.filename + "_d_num_points.bin", "rb") as f:
        num_points = np.frombuffer(f.read(12), dtype=np.int32).tolist()
    dplan = coder._plan_for(num_points[-1])
    cap_y = _bucket(m, coder.prune_granularity)
    rows2 = np.zeros((cap_y, 4), dtype=np.int32)
    rows2[:m, 1:] = dcoords[canonical_order(dcoords)] * 8
    valid2 = np.zeros((cap_y,), dtype=bool)
    valid2[:m] = True
    f_pad = np.zeros((cap_y, dfeats.shape[1]), dtype=np.float32)
    f_pad[:m] = dfeats
    out_cap = _bucket(num_points[-1], coder.input_granularity)
    nums_arr = jnp.asarray(np.array(num_points, dtype=np.int32))
    dec_fn = coder._decode_fn(dplan, out_cap)

    d_rows2 = jax.device_put(rows2)
    d_valid2 = jax.device_put(valid2)
    d_fpad = jax.device_put(f_pad)
    d_nums = jax.device_put(nums_arr)
    for x in (d_rows2, d_valid2, d_fpad, d_nums):
        sync(x)

    def run_dec():
        oc, cnt, nd = dec_fn(coder.params, d_rows2, d_fpad, d_valid2, d_nums)
        sync(cnt)

    timed("decode jit (device-resident in/out)", run_dec)
    oc, cnt, nd = dec_fn(coder.params, d_rows2, d_fpad, d_valid2, d_nums)
    sync(cnt)
    timed(f"D2H decoded coords [{oc.shape[0]},4] int32",
          lambda: np.asarray(oc))

    # end-to-end for reference
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
