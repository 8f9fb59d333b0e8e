"""Dataset generation CLI (ref /root/reference/generate_dataset.py:74-89)."""

from __future__ import annotations

import argparse
import random


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("--mesh_rootdir", default="./ModelNet40/")
    p.add_argument("--pc_rootdir", default="./dataset/")
    p.add_argument("--out_filetype", choices=["h5", "ply"], default="h5")
    p.add_argument("--num_mesh", type=int, default=100)
    p.add_argument("--n_points", type=int, default=int(4e5))
    p.add_argument("--resolution", type=int, default=127)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from pcgcv2_tpu.data.generate import generate_dataset, traverse_meshes

    meshes = traverse_meshes(args.mesh_rootdir)
    print("mesh files found:", len(meshes))
    rng = random.Random(args.seed)
    picked = rng.sample(meshes, min(args.num_mesh, len(meshes)))
    written = generate_dataset(
        picked, args.pc_rootdir, args.out_filetype,
        n_points=args.n_points, resolution=args.resolution, seed=args.seed,
    )
    print("written:", written)


if __name__ == "__main__":
    main()
