"""Multi-sequence rate-ladder evaluation (the reference ships 7 sequences
x 7 rates in results/*.csv; 8iVFB content is not redistributable here, so
the suite evaluates the 7-checkpoint ladder on 4 held-out synthetic
sequences spanning the same size/resolution classes):

  torus_vox10    ~858k pts @ res 1024          (longdress class; the bench frame)
  surface_vox10  ~850k pts @ res 1024, mixed primitives (soldier class)
  surface_vox11  ~2.6M pts @ res 2048          (dancer class)
  sparse_vox12   ~500k pts @ res 4096, sf=0.375 rho=4
                 (Staue_Klimt recipe: ref results/Staue_Klimt_vox12.csv)

Writes results/<name>.csv + RD plot per sequence via the cli.test harness
(warm-up rep -> steady-state time columns).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_suite_r5.py \
        [--ckptroot ./ckpts] [--seqs torus_vox10 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def make_frames(outdir: str):
    import numpy as np

    from pcgcv2_tpu.data import io as pcio
    from pcgcv2_tpu.data.synthetic import random_surface_cloud, torus_cloud

    os.makedirs(outdir, exist_ok=True)
    frames = {}

    def emit(name, cloud, res, sf, rho):
        path = os.path.join(outdir, name + ".ply")
        if not os.path.exists(path):
            pcio.write_ply_binary_geo(path, cloud)
        frames[name] = dict(path=path, res=res, sf=sf, rho=rho,
                            points=len(cloud))
        print(f"  {name}: {len(cloud)} pts @ res {res} "
              f"(sf={sf}, rho={rho})", flush=True)

    emit("torus_vox10", torus_cloud(684, density=4.0, seed=0),
         1024, 1.0, 1.0)
    emit("surface_vox10", random_surface_cloud(1023, seed=105, density=0.8),
         1024, 1.0, 1.0)
    emit("surface_vox11", random_surface_cloud(2047, seed=113, density=1.0),
         2048, 1.0, 1.0)
    # vox12-class sparse content: very low surface density at res 4096,
    # processed with the reference's Klimt recipe (sf=0.375, rho=4)
    emit("sparse_vox12", random_surface_cloud(4095, seed=112, density=0.16),
         4096, 0.375, 4.0)
    return frames


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckptroot", default="./ckpts")
    ap.add_argument("--outdir", default="./output")
    ap.add_argument("--resultdir", default="./results")
    ap.add_argument("--framedir", default="./testdata")
    ap.add_argument("--seqs", nargs="*", default=[
        "torus_vox10", "surface_vox10", "surface_vox11", "sparse_vox12"])
    args = ap.parse_args(argv)

    import jax

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    from pcgcv2_tpu.cli.test import plot_rd, run_sweep
    from pcgcv2_tpu.ops import blocks as B

    B.set_compute_dtype("bfloat16")

    ckpts = [os.path.join(args.ckptroot, f"r{i}", f"r{i}_final.ckpt")
             for i in range(1, 8)]
    missing = [c for c in ckpts if not os.path.exists(c)]
    if missing:
        print("missing checkpoints:", missing, file=sys.stderr)
        return 1

    print("generating / loading eval frames...", flush=True)
    frames = make_frames(args.framedir)

    for name in args.seqs:
        f = frames[name]
        print(f"==== sweep {name} ====", flush=True)
        t0 = time.time()
        results = run_sweep(
            f["path"], ckpts, args.outdir, args.resultdir,
            scaling_factor=f["sf"], rho=f["rho"], res=f["res"],
        )
        plot_rd(results, f["path"], args.resultdir)
        print(f"[{name}] sweep done in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
