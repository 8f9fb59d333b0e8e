"""Dense-block backend vs the sparse reference ops (tests/test_sparse.py's
brute-force ground truths).  The reference has no tests (SURVEY.md §4); the
block backend must agree with the sparse ops bit-for-bit on shared semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.ops import sparse as S


def rand_cloud(rng, n, res, batches=1, stride=1):
    coords = set()
    while len(coords) < n:
        b = rng.randint(0, batches)
        xyz = tuple(rng.randint(0, res // stride, size=3) * stride)
        coords.add((b,) + xyz)
    return np.array(sorted(coords), dtype=np.int32)


def make_bg(rng, n=200, res=32, batches=1, channels=4, stride=1, nb_cap=None):
    coords = rand_cloud(rng, n, res, batches, stride)
    feats = rng.randn(n, channels).astype(np.float32)
    nb_cap = nb_cap or 256
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats),
        jnp.ones((n,), bool), nb_cap,
        stride=stride, res=res // stride, num_batches=batches,
    )
    return bg, coords, feats


def rows_of(bg):
    c, f, cnt = B.extract(bg, bg.nb_cap * B.VOL)
    cnt = int(cnt)
    return np.asarray(c)[:cnt], np.asarray(f)[:cnt]


def as_dict(coords, feats):
    return {tuple(c): f for c, f in zip(coords, feats)}


def test_blockify_extract_roundtrip(rng):
    bg, coords, feats = make_bg(rng, n=300, res=32, batches=2)
    c, f = rows_of(bg)
    assert int(bg.voxel_count()) == 300
    got = as_dict(c, f)
    want = as_dict(coords, feats)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    # voxels_per_batch matches
    np.testing.assert_array_equal(
        np.asarray(bg.voxels_per_batch()),
        np.bincount(coords[:, 0], minlength=2),
    )


def test_blockify_strided(rng):
    bg, coords, feats = make_bg(rng, n=100, res=64, stride=4)
    c, f = rows_of(bg)
    assert set(map(tuple, c)) == set(map(tuple, coords))


def test_conv3_matches_sparse(rng):
    n, ch, co = 250, 4, 5
    coords = rand_cloud(rng, n, 32)
    feats = rng.randn(n, ch).astype(np.float32)
    w = (rng.randn(3, 3, 3, ch, co) * 0.2).astype(np.float32)
    b = rng.randn(co).astype(np.float32)

    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        128, stride=1, res=32, num_batches=1,
    )
    nbrs = B.neighbor_rows(bg)
    out = B.conv3(bg, nbrs, jnp.asarray(w), jnp.asarray(b))
    c, f = rows_of(out)

    # sparse-op ground truth: weight layout [27, Cin, Cout] with offsets in
    # x-major (-1,0,1)^3 order == DHWIO kernel spatial order
    sv = S.build(
        jnp.asarray(np.pad(coords, ((0, 6), (0, 0)))),
        jnp.asarray(np.pad(feats, ((0, 6), (0, 0)))), jnp.int32(n),
    )
    kmap = S.build_kernel_map(sv, S.stencil_offsets(3, 1))
    w27 = w.reshape(27, ch, co)
    ref = S.conv(sv, kmap, jnp.asarray(w27), jnp.asarray(b))
    nref = int(ref.count)
    ref_d = as_dict(np.asarray(ref.coords)[:nref], np.asarray(ref.feats)[:nref])
    got_d = as_dict(c, f)
    assert set(got_d) == set(ref_d)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-4, atol=1e-4)


def test_conv3_strided_grid(rng):
    """conv3 on a stride-4 tensor reaches +-4 neighbors (grid-space halo)."""
    n, ch = 120, 3
    coords = rand_cloud(rng, n, 64, stride=4)
    feats = rng.randn(n, ch).astype(np.float32)
    w = (rng.randn(3, 3, 3, ch, ch) * 0.2).astype(np.float32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        128, stride=4, res=16, num_batches=1,
    )
    out = B.conv3(bg, B.neighbor_rows(bg), jnp.asarray(w), None)
    c, f = rows_of(out)
    sv = S.build(jnp.asarray(coords), jnp.asarray(feats), jnp.int32(n),
                 stride=4)
    kmap = S.build_kernel_map(sv, S.stencil_offsets(3, 4))
    ref = S.conv(sv, kmap, jnp.asarray(w.reshape(27, ch, ch)), None)
    ref_d = as_dict(
        np.asarray(ref.coords)[: int(ref.count)],
        np.asarray(ref.feats)[: int(ref.count)],
    )
    got_d = as_dict(c, f)
    assert set(got_d) == set(ref_d)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-4, atol=1e-4)


def test_conv_down_matches_sparse(rng):
    n, ch, co = 250, 4, 6
    coords = rand_cloud(rng, n, 32)
    feats = rng.randn(n, ch).astype(np.float32)
    w = (rng.randn(8, ch, co) * 0.3).astype(np.float32)
    b = rng.randn(co).astype(np.float32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        128, stride=1, res=32, num_batches=1,
    )
    out = B.conv_down(bg, jnp.asarray(w), jnp.asarray(b), 64)
    assert out.stride == 2 and out.res == 16
    c, f = rows_of(out)
    sv = S.build(jnp.asarray(coords), jnp.asarray(feats), jnp.int32(n))
    ref = S.conv_down(sv, jnp.asarray(w), jnp.asarray(b), out_capacity=256)
    ref_d = as_dict(
        np.asarray(ref.coords)[: int(ref.count)],
        np.asarray(ref.feats)[: int(ref.count)],
    )
    got_d = as_dict(c, f)
    assert set(got_d) == set(ref_d)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-4, atol=1e-4)


def test_conv_up_generative_matches_sparse(rng):
    n, ch, co = 80, 4, 3
    coords = rand_cloud(rng, n, 32, stride=2)
    feats = rng.randn(n, ch).astype(np.float32)
    w = (rng.randn(8, ch, co) * 0.3).astype(np.float32)
    b = rng.randn(co).astype(np.float32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        64, stride=2, res=16, num_batches=1,
    )
    out = B.conv_up_generative(bg, jnp.asarray(w), jnp.asarray(b), 512)
    assert out.stride == 1 and out.res == 32
    assert int(out.voxel_count()) == 8 * n
    c, f = rows_of(out)
    sv = S.build(jnp.asarray(coords), jnp.asarray(feats), jnp.int32(n),
                 stride=2)
    ref = S.conv_up_generative(sv, jnp.asarray(w), jnp.asarray(b))
    ref_d = as_dict(
        np.asarray(ref.coords)[: int(ref.count)],
        np.asarray(ref.feats)[: int(ref.count)],
    )
    got_d = as_dict(c, f)
    assert set(got_d) == set(ref_d)
    for k in ref_d:
        np.testing.assert_allclose(got_d[k], ref_d[k], rtol=1e-4, atol=1e-4)


def test_topk_mask_matches_sparse(rng):
    n = 300
    coords = rand_cloud(rng, n, 32, batches=3)
    scores = rng.randn(n, 1).astype(np.float32)
    nums = np.array([20, 1000, 0], np.int32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(scores), jnp.ones((n,), bool),
        256, stride=1, res=32, num_batches=3,
    )
    keep = B.topk_mask(bg, bg.feats[:, :, 0], jnp.asarray(nums))
    pr = B.prune(bg, keep)
    c, f = rows_of(pr)

    per_b = {}
    for b in range(3):
        rows = np.where(coords[:, 0] == b)[0]
        k = min(len(rows), int(nums[b]))
        top = rows[np.argsort(-scores[rows, 0], kind="stable")[:k]]
        per_b[b] = {tuple(coords[i]) for i in top}
    want = set().union(*per_b.values())
    assert set(map(tuple, c)) == want


def test_prune_compact(rng):
    bg, coords, feats = make_bg(rng, n=200, res=32)
    keep = jnp.asarray(rng.rand(bg.nb_cap, B.VOL) < 0.3) & bg.mask
    pr = B.prune(bg, keep)
    assert int(pr.voxel_count()) == int(keep.sum())
    cp = B.compact(pr, 128)
    assert int(cp.voxel_count()) == int(keep.sum())
    c1, f1 = rows_of(pr)
    c2, f2 = rows_of(cp)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(f1, f2)
    # every surviving block is non-empty
    nb = int(cp.count)
    assert bool(cp.mask[:nb].any(axis=1).all())


def test_overflow_detection(rng):
    """Capacity overflow must be counted in `dropped`, never corrupt the
    reserved all-zero miss row, and never be silent (VERDICT missing #5)."""
    n = 300
    res = 4 * B.BS  # 64 block cells — enough spread to overflow 8 rows
    coords = rand_cloud(rng, n, res)
    feats = rng.randn(n, 2).astype(np.float32)
    full = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        256, stride=1, res=res, num_batches=1,
    )
    assert int(full.dropped) == 0
    n_blocks = int(full.count)
    assert n_blocks > 8

    # undersized: only nb_cap - 1 = 7 usable rows
    tiny = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        8, stride=1, res=res, num_batches=1,
    )
    assert int(tiny.dropped) == n_blocks - 7
    # the reserved miss row stays all-zero: feats, mask, coords
    assert not bool(tiny.mask[-1].any())
    np.testing.assert_array_equal(np.asarray(tiny.feats[-1]), 0.0)
    # voxel_count only counts voxels that actually landed in valid rows
    assert int(tiny.voxel_count()) < n
    # conv over the overflowed grid stays finite (no garbage from sentinel)
    w = jnp.asarray((rng.randn(3, 3, 3, 2, 2) * 0.2).astype(np.float32))
    out = B.conv3(tiny, B.neighbor_rows(tiny), w, None)
    assert bool(jnp.isfinite(out.feats).all())
    # dropped propagates through scale changes
    wd = jnp.asarray((rng.randn(8, 2, 2) * 0.2).astype(np.float32))
    dn = B.conv_down(tiny, wd, None, 64)
    assert int(dn.dropped) >= int(tiny.dropped)


def test_table_size_guard():
    """Over-budget dense tables must raise, not OOM (VERDICT weak #8)."""
    g = B.grid_dim(4096)
    over = B.MAX_TABLE_CELLS // g ** 3 + 1  # first batch count past budget
    with pytest.raises(ValueError, match="scaling_factor"):
        B.check_table_size(4096, num_batches=over)
    B.check_table_size(4096, num_batches=1)  # single frame fits
    B.check_table_size(1024, num_batches=8)


def test_isin_matches_sparse(rng):
    a, ca, fa = make_bg(rng, n=200, res=32, channels=1)
    b, cb, fb = make_bg(rng, n=150, res=32, channels=1)
    got = B.isin(a, b)
    want_set = set(map(tuple, cb))
    ca_all = np.asarray(B.slot_coords(a)).reshape(-1, 4)
    got_flat = np.asarray(got).reshape(-1)
    mask_flat = np.asarray(a.mask & a.valid[:, None]).reshape(-1)
    for i in range(len(ca_all)):
        if mask_flat[i]:
            assert got_flat[i] == (tuple(ca_all[i]) in want_set)
        else:
            assert not got_flat[i]


def test_blockify_jit_grad(rng):
    """The block pipeline must be jit- and grad-safe end to end."""
    n, ch = 120, 4
    coords = rand_cloud(rng, n, 32)
    feats = rng.randn(n, ch).astype(np.float32)
    w3 = jnp.asarray((rng.randn(3, 3, 3, ch, ch) * 0.2).astype(np.float32))
    wd = jnp.asarray((rng.randn(8, ch, ch) * 0.2).astype(np.float32))
    wu = jnp.asarray((rng.randn(8, ch, ch) * 0.2).astype(np.float32))

    @jax.jit
    def loss(w3, wd, wu):
        bg = B.blockify(
            jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
            128, stride=1, res=32, num_batches=1,
        )
        bg = B.conv3(bg, B.neighbor_rows(bg), w3, None)
        dn = B.conv_down(bg, wd, None, 64)
        up = B.conv_up_generative(dn, wu, None, 512)
        return jnp.sum(up.feats ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(w3, wd, wu)
    for gi in g:
        assert bool(jnp.isfinite(gi).all())
        assert float(jnp.abs(gi).sum()) > 0


def test_conv3_chunked_matches_unchunked(rng, monkeypatch):
    """The lax.map big-grid path must reproduce the single-shot conv exactly
    (same weights, same halo semantics), including non-multiple-of-chunk
    block counts and cross-chunk neighbors."""
    n, ch, co = 400, 4, 6
    coords = rand_cloud(rng, n, 48)
    feats = rng.randn(n, ch).astype(np.float32)
    w = (rng.randn(3, 3, 3, ch, co) * 0.2).astype(np.float32)
    b = rng.randn(co).astype(np.float32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        200, stride=1, res=48, num_batches=1,
    )
    nbrs = B.neighbor_rows(bg)
    ref = B.conv3(bg, nbrs, jnp.asarray(w), jnp.asarray(b))
    monkeypatch.setattr(B, "CONV3_CHUNK", 32)  # 200 blocks -> 7 chunks
    out = B.conv3(bg, nbrs, jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out.feats), np.asarray(ref.feats), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))


def test_conv3_dot_lowering_matches_conv(rng, monkeypatch):
    """The dot_general banded lowering (CONV3_LOWERING='dot') must be
    numerically equivalent to the conv_general one — same band matrices,
    same accumulation dtype — including through the chunked path."""
    n, ch, co = 300, 4, 6
    coords = rand_cloud(rng, n, 48)
    feats = rng.randn(n, ch).astype(np.float32)
    w = (rng.randn(3, 3, 3, ch, co) * 0.2).astype(np.float32)
    b = rng.randn(co).astype(np.float32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.ones((n,), bool),
        160, stride=1, res=48, num_batches=1,
    )
    nbrs = B.neighbor_rows(bg)
    ref = B.conv3(bg, nbrs, jnp.asarray(w), jnp.asarray(b))
    monkeypatch.setattr(B, "CONV3_LOWERING", "dot")
    monkeypatch.setattr(B, "CONV3_CHUNK", 64)  # also cover chunked dot
    out = B.conv3(bg, nbrs, jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out.feats), np.asarray(ref.feats), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))


def test_conv_up_emits_only_occupied_child_blocks(rng):
    """Gen-up output block count must equal the true occupied child-block
    count (not 8x parents): one voxel -> 8 child voxels in ONE child block."""
    coords = np.array([[0, 4, 4, 4]], dtype=np.int32)  # stride-2 voxel
    bg = B.blockify(
        jnp.asarray(coords), jnp.ones((1, 3), jnp.float32),
        jnp.ones((1,), bool), 8, stride=2, res=8, num_batches=1,
    )
    w = np.ones((8, 3, 2), dtype=np.float32)
    out = B.conv_up_generative(bg, jnp.asarray(w), None, 16)
    assert int(out.count) == 1  # children at coords 8,9 -> block (1,1,1) only
    assert int(out.voxel_count()) == 8
    assert int(out.dropped) == 0
