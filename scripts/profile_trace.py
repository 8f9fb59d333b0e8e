"""Capture a `jax.profiler` trace of one codec encode+decode (SURVEY §5).

Writes an XPlane/TensorBoard trace directory under results/trace/ that
records device compute, transfers, and host gaps — the evidence VERDICT r3
asked for behind the decode wall-clock work ("the 2.5x perf gap is being
chased without a trace").  Falls back to annotated wall-clock spans if the
backend's profiler plugin is unavailable (the axon tunnel does not always
ship one); either way each phase is wrapped in a TraceAnnotation so a
capture from any layer attributes time to codec phases.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trace.py \
        [--ckpt ckpts/base/base_final.ckpt] [--out results/trace]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out", default="results/trace")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    from pcgcv2_tpu.codec.coder import Coder
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.ops import blocks as B

    B.set_compute_dtype("bfloat16")
    print("backend:", jax.devices()[0].platform, flush=True)

    cloud = torus_cloud(684, density=4.0, seed=0)
    if args.ckpt:
        from pcgcv2_tpu.train.trainer import load_params

        params = load_params(args.ckpt)
        print("params:", args.ckpt, flush=True)
    else:
        from pcgcv2_tpu.config import BlockPlan
        from pcgcv2_tpu.data.synthetic import sphere_cloud
        from pcgcv2_tpu.data.voxelize import collate
        from pcgcv2_tpu.models import PCCModel

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

    # warm every jit cache outside the trace window
    print("[warmup encode+decode (compiles)...]", flush=True)
    coder.encode(cloud, postfix="_w")
    coder.decode(postfix="_w")

    os.makedirs(args.out, exist_ok=True)
    trace_cm = jax.profiler.trace(args.out)
    try:
        trace_cm.__enter__()
        have_trace = True
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"jax.profiler.trace unavailable ({type(e).__name__}: {e}); "
              "falling back to wall-clock spans", flush=True)
        trace_cm, have_trace = None, False

    spans = []
    for r in range(args.reps):
        for phase, fn in (
            ("encode", lambda: coder.encode(cloud, postfix="_t")),
            ("decode", lambda: coder.decode(postfix="_t")),
        ):
            ann = (jax.profiler.TraceAnnotation(f"codec/{phase}")
                   if have_trace else contextlib.nullcontext())
            t0 = time.perf_counter()
            with ann:
                fn()
            dt = time.perf_counter() - t0
            spans.append((r, phase, dt))
            print(f"  rep {r} {phase:6s} {dt:7.3f}s", flush=True)

    if trace_cm is not None:
        trace_cm.__exit__(None, None, None)
        sizes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(args.out) for f in fs
        )
        print(f"trace written to {args.out} ({sizes / 1e6:.1f} MB)",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
