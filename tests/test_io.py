"""I/O and dataset-generation tests (VERDICT r2 weak #7: data/io.py,
OFF/OBJ readers, scale_coords and the mesh->dataset CLI had no coverage).
Pure host-side numpy — no jit, fast."""

import os

import numpy as np
import pytest

from pcgcv2_tpu.data import io as pcio
from pcgcv2_tpu.data.generate import (
    mesh_to_points,
    read_obj,
    read_off,
    sample_mesh_uniform,
)
from pcgcv2_tpu.data.voxelize import scale_coords

pytestmark = pytest.mark.fast  # no full-model compiles


@pytest.fixture
def coords(rng):
    return rng.randint(0, 1024, size=(500, 3)).astype(np.int32)


def test_ply_ascii_roundtrip(tmp_path, coords):
    p = str(tmp_path / "a.ply")
    pcio.write_ply_ascii_geo(p, coords)
    out = pcio.read_ply_geo(p)
    np.testing.assert_array_equal(out, coords)


def test_ply_binary_roundtrip(tmp_path, coords):
    p = str(tmp_path / "b.ply")
    pcio.write_ply_binary_geo(p, coords)
    out = pcio.read_ply_geo(p)
    np.testing.assert_array_equal(out, coords)


def test_ply_binary_reader_handles_extra_props(tmp_path, coords):
    """Binary PLYs with extra per-vertex properties (normals, colors) must
    still yield xyz (the reference's reader assumes xyz-only ASCII,
    data_utils.py:19-34)."""
    p = str(tmp_path / "c.ply")
    n = len(coords)
    with open(p, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex %d\n" % n
            + b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
        )
        rec = np.zeros(
            n,
            dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("r", "u1"), ("g", "u1"), ("b", "u1")],
        )
        rec["x"], rec["y"], rec["z"] = coords.T
        f.write(rec.tobytes())
    out = pcio.read_ply_geo(p)
    np.testing.assert_array_equal(out, coords)


def test_h5_roundtrip(tmp_path, rng):
    pytest.importorskip("h5py")
    coords = rng.randint(0, 128, size=(300, 3)).astype(np.int32)
    p = str(tmp_path / "d.h5")
    pcio.write_h5_geo(p, coords)
    out = pcio.read_h5_geo(p)
    np.testing.assert_array_equal(out, coords)


def test_load_coords_dispatch(tmp_path, coords):
    p = str(tmp_path / "e.ply")
    pcio.write_ply_ascii_geo(p, coords)
    np.testing.assert_array_equal(pcio.load_coords(p), coords)


OFF_CUBE = """OFF
8 6 0
0 0 0
1 0 0
1 1 0
0 1 0
0 0 1
1 0 1
1 1 1
0 1 1
4 0 1 2 3
4 4 5 6 7
4 0 1 5 4
4 2 3 7 6
4 1 2 6 5
4 0 3 7 4
"""


def test_read_off(tmp_path):
    p = str(tmp_path / "cube.off")
    with open(p, "w") as f:
        f.write(OFF_CUBE)
    verts, faces = read_off(p)
    assert verts.shape == (8, 3)
    # quads triangulated (or kept) — every index in range
    assert faces.min() >= 0 and faces.max() < 8


def test_read_off_header_quirk(tmp_path):
    """ModelNet ships OFF files with the count line glued to the magic
    ('OFF8 6 0') — the reference's loader chokes; ours must not."""
    p = str(tmp_path / "quirk.off")
    with open(p, "w") as f:
        f.write("OFF" + OFF_CUBE[4:])
    verts, faces = read_off(p)
    assert verts.shape == (8, 3)


def test_read_obj(tmp_path):
    p = str(tmp_path / "tri.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    verts, faces = read_obj(p)
    assert verts.shape == (3, 3)
    assert faces.shape == (1, 3)


def test_sample_mesh_uniform_on_unit_triangle(rng):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2]])
    pts = sample_mesh_uniform(verts, faces, 1000, rng)
    assert pts.shape == (1000, 3)
    # all points inside the triangle's plane / bounds
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()


def test_mesh_to_points_voxelizes(tmp_path, rng):
    p = str(tmp_path / "cube.off")
    with open(p, "w") as f:
        f.write(OFF_CUBE)
    pts = mesh_to_points(p, n_points=20000, resolution=63, rng=rng)
    assert np.issubdtype(pts.dtype, np.integer)
    assert pts.min() >= 0 and pts.max() <= 63
    # unique voxels
    assert len(np.unique(pts, axis=0)) == len(pts)


def test_scale_coords_matches_reference_semantics(rng):
    """round(coords * factor) + dedup (ref data_utils.py:112-118)."""
    coords = rng.randint(0, 4096, size=(2000, 3)).astype(np.int32)
    out = scale_coords(coords, 0.375)
    expect = np.unique(
        np.round(coords * 0.375).astype(np.int32), axis=0
    )
    out_s = out[np.lexsort((out[:, 2], out[:, 1], out[:, 0]))]
    exp_s = expect[
        np.lexsort((expect[:, 2], expect[:, 1], expect[:, 0]))
    ]
    np.testing.assert_array_equal(out_s, exp_s)


def test_scale_coords_identity():
    coords = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    np.testing.assert_array_equal(
        np.sort(scale_coords(coords, 1.0), axis=0), coords
    )


def test_unique_rows_matches_np_unique(rng):
    from pcgcv2_tpu.data.voxelize import unique_rows

    coords = rng.randint(0, 4096, size=(5000, 3)).astype(np.int32)
    coords = np.concatenate([coords, coords[:1000]])  # force duplicates
    np.testing.assert_array_equal(
        unique_rows(coords), np.unique(coords, axis=0)
    )


def test_generate_dataset_cli_synthetic(tmp_path):
    """The dataset CLI's self-contained path writes loadable voxel files
    (VERDICT r2 weak #7: the mesh->dataset CLI had no test)."""
    from pcgcv2_tpu.cli.generate_dataset import main
    from pcgcv2_tpu.data.io import load_coords

    out = tmp_path / "ds"
    main(["--synthetic", "3", "--pc_rootdir", str(out),
          "--resolution", "63", "--out_filetype", "h5"])
    files = sorted(out.glob("*.h5"))
    assert len(files) == 3
    pts = load_coords(str(files[0]))
    assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 100
    assert pts.min() >= 0 and pts.max() <= 63


def test_generate_dataset_cli_mesh(tmp_path):
    """Mesh sampling path end-to-end: OFF file -> rotated voxel cloud."""
    from pcgcv2_tpu.cli.generate_dataset import main
    from pcgcv2_tpu.data.io import load_coords

    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    # unit right triangle pair approximating a square
    (mesh_dir / "sq.off").write_text(
        "OFF\n4 2 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n3 0 1 2\n3 0 2 3\n"
    )
    out = tmp_path / "ds"
    main(["--mesh_rootdir", str(mesh_dir), "--pc_rootdir", str(out),
          "--num_mesh", "1", "--n_points", "5000", "--resolution", "63",
          "--out_filetype", "ply"])
    files = sorted(out.glob("*.ply"))
    assert len(files) == 1
    pts = load_coords(str(files[0]))
    assert len(pts) > 500
    assert pts.min() >= 0 and pts.max() <= 63
