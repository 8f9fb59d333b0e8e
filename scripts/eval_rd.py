"""Rate-distortion sweep over trained checkpoints -> CSV + RD evidence.

Mirrors the reference's eval harness flow (ref /root/reference/test.py:13-99):
per rate point, encode + decode a frame, bpp from the 4 bitstream file sizes
(test.py:63-66), D1/D2 PSNR from the distortion metric, one CSV row per rate
point.  The held-out frame is a synthetic vox10-class surface (the 8iVFB
scans are not redistributable here); columns match `results/*.csv` so the
table is drop-in comparable in shape.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_rd.py \
        --ckpts ckpts/r1/r1_final.ckpt ckpts/r2/r2_final.ckpt \
        --res 1024 --out results/synthetic_torus_vox10.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpts", nargs="+", required=True)
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--rho", type=float, default=1.0)
    p.add_argument("--out", default="results/synthetic_vox10.csv")
    p.add_argument("--outdir", default="./output")
    p.add_argument("--frame", choices=("torus", "surface"), default="torus")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    import numpy as np

    from pcgcv2_tpu.ops import blocks as _B

    _B.set_compute_dtype("bfloat16")  # halve conv HBM traffic (f32 accum)

    from pcgcv2_tpu.codec.coder import Coder
    from pcgcv2_tpu.data.synthetic import random_surface_cloud, torus_cloud
    from pcgcv2_tpu.eval.metrics import pc_metrics
    from pcgcv2_tpu.train.trainer import load_params

    if args.frame == "torus":
        cloud = torus_cloud(int(args.res * 0.67), density=4.0, seed=99)
    else:
        cloud = random_surface_cloud(args.res - 1, seed=99, density=3.0)
    n = len(cloud)
    print(f"frame: {n} voxels @ res {args.res}", flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    rows = []
    for ck in args.ckpts:
        name = os.path.basename(ck).split("_")[0]
        params = load_params(ck)
        coder = Coder(params, os.path.join(args.outdir, f"eval_{name}"),
                      res=args.res)
        t0 = time.time()
        coder.encode(cloud)
        t_enc = time.time() - t0
        t0 = time.time()
        dec = coder.decode(rho=args.rho)
        t_dec = time.time() - t0
        sizes = coder.bitstream_bytes()
        bits = {k: 8 * v for k, v in sizes.items()}
        bpp = sum(bits.values()) / n
        m = pc_metrics(cloud, dec, args.res, with_d2=True)
        row = {
            "rate_point": name,
            "num_points(input)": n,
            "num_points(output)": len(dec),
            "resolution": args.res,
            "bits(coords)": bits["_C.bin"],
            "bits(feats)": bits["_F.bin"] + bits["_H.bin"],
            "bits(total)": sum(bits.values()),
            "bpp": round(bpp, 4),
            "bpp(coords)": round(bits["_C.bin"] / n, 4),
            "bpp(feats)": round((bits["_F.bin"] + bits["_H.bin"]) / n, 4),
            "time(enc)": round(t_enc, 3),
            "time(dec)": round(t_dec, 3),
            "D1 PSNR": round(m["mseF,PSNR (p2point)"], 3),
            "D2 PSNR": round(m["mseF,PSNR (p2plane)"], 3),
        }
        rows.append(row)
        print(row, flush=True)

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
