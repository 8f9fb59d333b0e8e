"""Time the HOST-side encode/decode phases at vox10 scale (no TPU needed:
these run identically on any host — numpy + the native C++ coders).

The device jits dominate the frame budget, but the host phases run serially
with them, so every 10 ms here is 10 ms of frame wall-clock
(bench.py / VERDICT round-4 item 2: encode profiling).

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/profile_host_phases.py
"""

from __future__ import annotations

import time

import numpy as np


def timed(label, fn, reps=5):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:<46s} {best * 1e3:9.2f} ms", flush=True)
    return out


def main():
    from pcgcv2_tpu.codec import native, octree
    from pcgcv2_tpu.codec.coder import block_counts, canonical_order
    from pcgcv2_tpu.codec.coder import Coder
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import unique_rows

    cloud = torus_cloud(684, density=4.0, seed=0)
    print(f"== host phases ({len(cloud)} voxels) ==", flush=True)

    ucoords = timed("unique_rows (sorted input fast path)",
                    lambda: unique_rows(cloud))
    shuf = cloud[np.random.RandomState(0).permutation(len(cloud))]
    timed("unique_rows (shuffled input)", lambda: unique_rows(shuf))
    counts = timed("block_counts", lambda: block_counts(ucoords))
    print(f"    counts={counts}")
    timed("pack_input (morton u32)",
          lambda: Coder._pack_input(ucoords, 917504, 1024))

    # bottleneck-scale inputs: ~n/50 voxels, 8 channels
    ny = len(ucoords) // 50
    rng = np.random.RandomState(1)
    ds = np.unique(
        rng.randint(0, 128, size=(ny + ny // 4, 3)).astype(np.int32), axis=0
    )[:ny]
    feats = rng.randn(len(ds), 8).astype(np.float32) * 3.0

    timed(f"canonical_order lexsort ({len(ds)} rows)",
          lambda: canonical_order(ds))

    vals = np.round(feats).astype(np.int32)
    min_v, max_v = int(vals.min()), int(vals.max())
    s = max_v - min_v + 1
    pmf = np.abs(rng.randn(8, s)) + 1e-3
    pmf /= pmf.sum(axis=1, keepdims=True)
    cdf = timed(f"quantize_cdf ({8}x{s})", lambda: native.quantize_cdf(pmf))
    syms = (vals - min_v).reshape(-1)
    blob = timed(f"rans_encode ({syms.size} syms)",
                 lambda: native.rans_encode(cdf, syms))
    timed(f"rans_decode ({syms.size} syms)",
          lambda: native.rans_decode(cdf, blob, syms.size))
    enc = timed(f"octree.encode ({len(ds)} pts)", lambda: octree.encode(ds))
    print(f"    octree bytes={len(enc)}")
    timed("octree.decode", lambda: octree.decode(enc))

    # decode-side host extraction at vox10 scale
    from pcgcv2_tpu.ops import blocks as B

    nb = 4608  # vox10-frame-class block count at realistic ~5% occupancy
    occ = rng.random_sample((nb, B.VOL)) < 0.05
    bits = np.packbits(occ.astype(np.uint8), axis=1)
    bc = np.stack([np.zeros(nb, np.int32),
                   rng.randint(0, 64, nb), rng.randint(0, 64, nb),
                   rng.randint(0, 64, nb)], axis=1).astype(np.int32)
    npts = int(occ.sum())
    timed(f"host_extract ({nb} blocks, {npts / 1e3:.0f}k pts)",
          lambda: B.host_extract(bc, bits))


if __name__ == "__main__":
    main()
