"""Print the compiled HLO of the bench-shape decode (and encode) jits so
trace op names (fusion.NNN) can be mapped back to source ops.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/dump_decode_hlo.py \
        --out /tmp/hlo
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/r4/r4_final.ckpt")
    ap.add_argument("--out", default="/tmp/hlo")
    args = ap.parse_args()

    import os

    import jax

    from pcgcv2_tpu.cache import enable_persistent_cache

    enable_persistent_cache(jax)
    from pcgcv2_tpu.codec.coder import Coder, _bucket, block_counts
    from pcgcv2_tpu.data.synthetic import torus_cloud
    from pcgcv2_tpu.data.voxelize import unique_rows
    from pcgcv2_tpu.ops import blocks as B
    from pcgcv2_tpu.train.trainer import load_params

    B.set_compute_dtype("bfloat16")
    cloud = unique_rows(np.asarray(torus_cloud(684, density=4.0, seed=0),
                                   np.int32))
    n = len(cloud)
    counts = block_counts(cloud)
    params = load_params(args.ckpt)
    import tempfile

    coder = Coder(params, tempfile.mkdtemp() + "/frame", res=1024)
    plan = coder._plan_from_counts(counts)
    cap = _bucket(n, coder.input_granularity)
    y_cap = _bucket(max(n // 16, 1), coder.prune_granularity)

    os.makedirs(args.out, exist_ok=True)

    enc = coder._encode_fn(plan, cap, y_cap)
    pack = Coder._pack_input(np.zeros((1, 3), np.int32), cap, plan.res)
    lowered = enc.lower(coder.params, pack, np.zeros((1,), np.int32))
    txt = lowered.compile().as_text()
    with open(os.path.join(args.out, "encode.hlo"), "w") as f:
        f.write(txt)
    print("encode HLO:", len(txt), "bytes", flush=True)

    # decode shapes as the codec builds them
    m_guess = 17091
    cap_y = _bucket(m_guess, coder.prune_granularity)
    out_cap = _bucket(n, coder.input_granularity)
    dec = coder._decode_fn(plan, cap_y)
    pack2 = np.zeros((cap_y + 2, 11), dtype=np.int16)
    lowered = dec.lower(coder.params, pack2)
    txt = lowered.compile().as_text()
    with open(os.path.join(args.out, "decode.hlo"), "w") as f:
        f.write(txt)
    print("decode HLO:", len(txt), "bytes", flush=True)


if __name__ == "__main__":
    main()
