"""Scale-path validation: vox11-class and pre-scaled vox12-class frames.

Mirrors the reference's large-content configurations (ref test.py + README):
  * dancer_vox11-class: ~2.6 M points at res 2048, pre-scaled by 0.5
    (ref results/dancer_vox11_00000001.csv processes it whole on a large-
    memory GPU; whole-frame decode needs ~29 GB of candidate grids -- over
    one v5e's 16 GB HBM, so the single-chip recipe is the same pre-scaling
    the reference itself uses for vox12.  Spatial partitioning / multi-chip
    sharding is the planned whole-frame path.).
  * vox12-class: res 4096 content with scaling_factor=0.375 pre-scaling and
    inverse rescale after decode (ref README.md:39-40, data_utils.py:112-118,
    results/House_without_roof_00057_vox12.csv).
Unscaled vox12 is guarded: the dense block table would need 2^27 cells
(ops/blocks.py MAX_TABLE_CELLS) — the same content must be pre-scaled, as
the reference does.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scale.py \
        --ckpt ckpts/lo/lo_final.ckpt
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--outdir", default="./output")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import os

    import numpy as np

    from pcgcv2_tpu.codec.coder import Coder
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import scale_coords
    from pcgcv2_tpu.eval.metrics import pc_metrics
    from pcgcv2_tpu.ops import blocks as B
    from pcgcv2_tpu.train.trainer import load_params

    B.set_compute_dtype("bfloat16")
    os.makedirs(args.outdir, exist_ok=True)
    params = load_params(args.ckpt)
    results = []

    # --- vox11 class: ~2.6 M points @ res 2048, sf=0.5 ---------------------
    cloud = torus_cloud(1390, density=4.0, seed=11)
    n = len(cloud)
    print(f"vox11-class frame: {n} voxels @ res 2048", flush=True)
    sf11 = 0.5
    scaled11 = scale_coords(cloud, sf11)
    print(f"pre-scaled to {len(scaled11)} voxels @ res 1024", flush=True)
    coder = Coder(params, os.path.join(args.outdir, "vox11"), res=1024)
    t0 = time.time()
    coder.encode(scaled11)
    t_enc = time.time() - t0
    t0 = time.time()
    dec_s11 = coder.decode(rho=1.0)
    t_dec = time.time() - t0
    dec = np.unique(np.round(dec_s11 / sf11).astype(np.int32), axis=0)
    bits = sum(8 * v for v in coder.bitstream_bytes().values())
    m = pc_metrics(cloud, dec, 2048, with_d2=False)
    row = dict(config="vox11_res2048_sf0.5", points=n,
               bpp=round(bits / n, 4), enc_s=round(t_enc, 2),
               dec_s=round(t_dec, 2),
               d1_psnr=round(m["mseF,PSNR (p2point)"], 2))
    print(json.dumps(row), flush=True)
    results.append(row)
    with open("results/scale_validation.json", "w") as f:
        json.dump(results, f, indent=1)

    # --- vox12 class: res 4096 content, sf=0.375 pre-scale -----------------
    # density chosen to land in the reference's vox12 size class
    # (House_without_roof: 4.85 M points, ref results/*.csv)
    cloud12 = torus_cloud(2780, density=0.85, seed=12)
    n12 = len(cloud12)
    print(f"vox12-class frame: {n12} voxels @ res 4096", flush=True)
    sf = 0.375
    scaled = scale_coords(cloud12, sf)
    print(f"pre-scaled to {len(scaled)} voxels @ res {int(4096 * sf)}",
          flush=True)
    coder12 = Coder(params, os.path.join(args.outdir, "vox12"),
                    res=2048)  # 4096 * 0.375 = 1536 < 2048
    t0 = time.time()
    coder12.encode(scaled)
    t_enc = time.time() - t0
    t0 = time.time()
    dec_s = coder12.decode(rho=1.0)
    t_dec = time.time() - t0
    # inverse rescale to vox12 coordinates (ref coder.py:165-166)
    dec12 = np.unique(np.round(dec_s / sf).astype(np.int32), axis=0)
    bits = sum(8 * v for v in coder12.bitstream_bytes().values())
    m = pc_metrics(cloud12, dec12, 4096, with_d2=False)
    row = dict(config="vox12_res4096_sf0.375", points=n12,
               bpp=round(bits / n12, 4), enc_s=round(t_enc, 2),
               dec_s=round(t_dec, 2),
               d1_psnr=round(m["mseF,PSNR (p2point)"], 2))
    print(json.dumps(row), flush=True)
    results.append(row)

    # --- unscaled vox12 must raise the documented table guard --------------
    from pcgcv2_tpu.config import BlockPlan

    try:
        B.check_table_size(4096, num_batches=2)
        print("ERROR: unscaled multi-batch vox12 guard did not trigger")
        return 1
    except ValueError as e:
        print(f"unscaled vox12 guard OK: {str(e)[:80]}...", flush=True)

    with open("results/scale_validation.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote results/scale_validation.json", flush=True)


if __name__ == "__main__":
    sys.exit(main())
