"""Generate the golden regression triple (frame, checkpoint, expected RD)
for tests/test_golden.py (SURVEY §4: "golden tests that replay
results/*.csv within tolerance"; VERDICT r2 missing #5).

The frame is a deterministic synthetic surface (no data files needed —
regenerated identically inside the test); the checkpoint is copied to
tests/golden/; expected bpp / D1 are computed by running the codec on CPU
(float32 — the configuration the test suite runs under) and written to
tests/golden/expected.json.

    python scripts/make_golden.py --ckpt ckpts/r3/r3_final.ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

# Test-time frame/codec configuration — must match tests/test_golden.py.
FRAME_RES = 256
FRAME_SEED = 42
FRAME_SIZE = 170  # torus parameter; ~60k voxels at density 2.0
FRAME_DENSITY = 2.0


def golden_frame():
    from pcgcv2_tpu.data.synthetic import torus_cloud

    return torus_cloud(FRAME_SIZE, density=FRAME_DENSITY, seed=FRAME_SEED)


def run_codec(ckpt_path: str, outdir: str):
    import numpy as np

    from pcgcv2_tpu.codec.coder import Coder
    from pcgcv2_tpu.eval.metrics import pc_metrics
    from pcgcv2_tpu.train.trainer import load_params

    cloud = golden_frame()
    params = load_params(ckpt_path)
    coder = Coder(params, os.path.join(outdir, "golden"), res=FRAME_RES)
    coder.encode(cloud)
    dec = coder.decode(rho=1.0)
    bits = sum(8 * v for v in coder.bitstream_bytes().values())
    bpp = bits / len(cloud)
    m = pc_metrics(cloud, np.unique(dec, axis=0), FRAME_RES, with_d2=False)
    return dict(
        n_points=int(len(cloud)),
        bpp=round(float(bpp), 6),
        d1_psnr=round(float(m["mseF,PSNR (p2point)"]), 4),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)

    import tempfile

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    dst_ckpt = os.path.join(GOLDEN_DIR, "golden.ckpt")
    shutil.copy(args.ckpt, dst_ckpt)
    with tempfile.TemporaryDirectory() as td:
        row = run_codec(dst_ckpt, td)
    row["source_ckpt"] = args.ckpt
    with open(os.path.join(GOLDEN_DIR, "expected.json"), "w") as f:
        json.dump(row, f, indent=1)
    print("golden:", row)


if __name__ == "__main__":
    sys.exit(main())
