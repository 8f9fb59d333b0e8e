"""Per-op decode profiling at vox10 bench shapes (round 5).

Splits the decode jit of profile_codec.py (740 ms steady at r4) into
separately-jitted pieces — blockify, and per decoder stage: generative
up-conv, neighbor map, 3^3 conv, each IRN block, cls head, top-k, prune +
compact — so the optimization effort lands on the true hot ops.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode_r5.py
"""

from __future__ import annotations

import argparse
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
    print(f"  {label:<46s} c{compile_s:7.1f}s  {best * 1e3:9.2f} ms",
          flush=True)
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/r4/r4_final.ckpt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    print("devices:", jax.devices(), flush=True)

    from pcgcv2_tpu.codec.coder import Coder, _bucket, block_counts
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import unique_rows
    from pcgcv2_tpu.models.pcc import PCCModel
    from pcgcv2_tpu.ops import blocks as B
    from pcgcv2_tpu.train.trainer import load_params

    B.set_compute_dtype("bfloat16")

    cloud = unique_rows(np.asarray(torus_cloud(684, density=4.0, seed=0),
                                   np.int32))
    n = len(cloud)
    counts = block_counts(cloud)
    params = load_params(args.ckpt)

    import tempfile

    td = tempfile.mkdtemp()
    coder = Coder(params, td + "/frame", res=1024)
    plan = coder._plan_from_counts(counts)
    print(f"frame: {n} voxels; plan nb={plan.nb} dec_nb={plan.dec_nb} "
          f"up_caps={[plan.up_cap(s) for s in range(3)]}", flush=True)

    # real bitstream -> decoded bottleneck pack (mirrors Coder.decode)
    coder.encode(cloud)
    dcoords = coder.coordinate_coder.decode()
    from pcgcv2_tpu.codec.coder import canonical_order

    dcoords = dcoords[canonical_order(dcoords)]
    dfeats = coder.feature_coder.decode()
    m = len(dcoords)
    with open(coder.filename + "_num_points.bin", "rb") as f:
        num_points = np.frombuffer(f.read(12), dtype=np.int32)
    cap_y = _bucket(m, coder.prune_granularity)
    pack = np.zeros((cap_y + 1, 3 + dfeats.shape[1]), dtype=np.float32)
    pack[:m, :3] = dcoords
    pack[:m, 3:] = dfeats
    pack[cap_y, 0] = m
    pack[cap_y, 1:4] = num_points
    dpack = jax.device_put(pack)
    sync(dpack)

    model = coder._model(plan)
    nb3 = plan.nb[3]
    res_y = max(1, plan.res // 8)

    unpack = jax.jit(lambda p: Coder._unpack_bottleneck(p, cap_y, nb3, res_y))
    (y, nums), _ = timed("unpack + blockify (bottleneck)", unpack, dpack)

    def apply(method, *a):
        return model.apply(params, *a, method=method)

    bg = y
    for s in range(3):
        ch = model.config.dec_channels[s + 1]
        up_cap = plan.up_cap(s)

        up = jax.jit(lambda g, _s=s, _c=up_cap: apply(
            lambda mdl, gg: getattr(mdl.decoder, f"up{_s}")(gg, out_cap=_c),
            g))
        out, _ = timed(f"stage{s} gen-up ({ch}ch, cap {up_cap})", up, bg)
        out = jax.jit(lambda g: g.with_feats(jax.nn.relu(g.feats)))(out)

        nbr_fn = jax.jit(B.neighbor_rows)
        nbrs, _ = timed(f"stage{s} neighbor_rows", nbr_fn, out)

        conv = jax.jit(lambda g, nb_, _s=s: apply(
            lambda mdl, gg, nn_: getattr(mdl.decoder, f"conv{_s}")(gg, nn_),
            g, nb_))
        out, _ = timed(f"stage{s} conv3 ({ch}->{ch})", conv, out, nbrs)
        out = jax.jit(lambda g: g.with_feats(jax.nn.relu(g.feats)))(out)

        for i in range(3):
            blk = jax.jit(lambda g, nb_, _s=s, _i=i: apply(
                lambda mdl, gg, nn_: getattr(
                    mdl.decoder, f"block{_s}_{_i}")(gg, nn_),
                g, nb_))
            out, _ = timed(f"stage{s} IRN{i} ({ch}ch)", blk, out, nbrs)

        cls_fn = jax.jit(lambda g, nb_, _s=s: apply(
            lambda mdl, gg, nn_: getattr(mdl.decoder, f"conv{_s}_cls")(
                gg, nn_),
            g, nb_))
        cls, _ = timed(f"stage{s} cls head ({ch}->1)", cls_fn, out, nbrs)

        k = nums[s:s + 1]
        topk = jax.jit(lambda g, c, kk: B.topk_mask(g, c.feats[:, :, 0], kk))
        keep, _ = timed(f"stage{s} topk_mask", topk, out, cls, k)

        pc = jax.jit(lambda g, kp, _s=s: B.compact(
            B.prune(g, kp), plan.dec_nb[_s]))
        bg, _ = timed(f"stage{s} prune+compact (-> {plan.dec_nb[s]})",
                      pc, out, keep)

    out_cap = _bucket(int(num_points[-1]), coder.input_granularity)
    ext = jax.jit(lambda g: B.extract(g, out_cap, with_feats=False))
    timed(f"extract ({out_cap})", ext, bg)

    # whole decode jit for comparison
    dec_fn = coder._decode_fn(plan, cap_y)
    timed("WHOLE decode jit", lambda p: dec_fn(params, p), dpack)


if __name__ == "__main__":
    main()
