import jax
import jax.numpy as jnp
import numpy as np

from pcgcv2_tpu.ops import keys as K
from pcgcv2_tpu.ops import sparse as S


def make_sv(rng, n=64, cap=96, batches=2, channels=4, span=20, stride=1):
    """Random unique voxel set (coords multiples of `stride`), padded to cap."""
    coords = set()
    while len(coords) < n:
        b = rng.randint(0, batches)
        xyz = tuple(rng.randint(0, span // stride, size=3) * stride)
        coords.add((b,) + xyz)
    coords = np.array(sorted(coords), dtype=np.int32)
    feats = rng.randn(n, channels).astype(np.float32)
    pad_c = np.zeros((cap - n, 4), np.int32)
    pad_f = np.zeros((cap - n, channels), np.float32)
    sv = S.build(
        jnp.asarray(np.concatenate([coords, pad_c])),
        jnp.asarray(np.concatenate([feats, pad_f])),
        jnp.int32(n),
        stride=stride,
    )
    return sv, coords, feats


def np_conv(coords, feats, out_coords, weight, bias, offsets):
    """Brute-force sparse conv ground truth."""
    table = {tuple(c): f for c, f in zip(coords, feats)}
    out = np.zeros((len(out_coords), weight.shape[-1]), np.float32)
    for i, c in enumerate(out_coords):
        acc = bias.copy()
        for k, d in enumerate(offsets):
            q = (c[0], c[1] + d[0], c[2] + d[1], c[3] + d[2])
            if q in table:
                acc = acc + table[q] @ weight[k]
        out[i] = acc
    return out


def valid_rows(sv):
    n = int(sv.count)
    return np.asarray(sv.coords)[:n], np.asarray(sv.feats)[:n]


def test_build_sorts_and_pads(rng):
    sv, coords, feats = make_sv(rng)
    c, f = valid_rows(sv)
    keys = np.asarray(sv.keys)
    assert (np.diff(keys) >= 0).all()
    assert (keys[int(sv.count):] == K.PAD_KEY).all()
    # same set of rows
    want = {tuple(r) for r in coords}
    got = {tuple(r) for r in c}
    assert got == want
    # padding feats zero
    assert (np.asarray(sv.feats)[int(sv.count):] == 0).all()


def test_build_dedupe(rng):
    coords = np.array(
        [[0, 1, 1, 1], [0, 1, 1, 1], [0, 2, 2, 2], [1, 0, 0, 0]], np.int32
    )
    feats = np.arange(8, dtype=np.float32).reshape(4, 2)
    sv = S.build(jnp.asarray(coords), jnp.asarray(feats), jnp.int32(4),
                 dedupe=True, capacity=6)
    assert int(sv.count) == 3
    c, _ = valid_rows(sv)
    assert {tuple(r) for r in c} == {(0, 1, 1, 1), (0, 2, 2, 2), (1, 0, 0, 0)}


def test_num_per_batch(rng):
    sv, coords, _ = make_sv(rng, batches=3)
    counts = np.asarray(sv.num_per_batch(3))
    want = np.bincount(coords[:, 0], minlength=3)
    np.testing.assert_array_equal(counts, want)


def test_conv3_matches_bruteforce(rng):
    sv, coords, feats = make_sv(rng, channels=4)
    offsets = S.stencil_offsets(3, 1)
    w = rng.randn(27, 4, 5).astype(np.float32) * 0.2
    b = rng.randn(5).astype(np.float32)
    kmap = S.build_kernel_map(sv, offsets)
    out = S.conv(sv, kmap, jnp.asarray(w), jnp.asarray(b))
    c, f = valid_rows(out)
    want = np_conv(coords, feats, c, w, b, np.asarray(offsets))
    np.testing.assert_allclose(f, want, rtol=1e-5, atol=1e-5)
    # padding rows stay zero
    assert (np.asarray(out.feats)[int(out.count):] == 0).all()


def test_conv3_stride2_neighborhood(rng):
    """3^3 conv on a stride-2 tensor must reach +-2 neighbors."""
    sv, coords, feats = make_sv(rng, channels=3, stride=2)
    offsets = S.stencil_offsets(3, 2)
    w = rng.randn(27, 3, 3).astype(np.float32) * 0.2
    b = np.zeros(3, np.float32)
    kmap = S.build_kernel_map(sv, offsets)
    out = S.conv(sv, kmap, jnp.asarray(w), jnp.asarray(b))
    c, f = valid_rows(out)
    want = np_conv(coords, feats, c, w, b, np.asarray(offsets))
    np.testing.assert_allclose(f, want, rtol=1e-5, atol=1e-5)


def test_conv_down_matches_bruteforce(rng):
    sv, coords, feats = make_sv(rng, channels=4)
    w = rng.randn(8, 4, 6).astype(np.float32) * 0.3
    b = rng.randn(6).astype(np.float32)
    out = S.conv_down(sv, jnp.asarray(w), jnp.asarray(b), out_capacity=96)
    assert out.stride == 2
    c, f = valid_rows(out)
    # ground-truth parents
    parents = np.unique(
        np.concatenate([coords[:, :1], coords[:, 1:] // 2 * 2], axis=1), axis=0
    )
    assert {tuple(r) for r in c} == {tuple(r) for r in parents}
    offsets = np.asarray(S.stencil_offsets(2, 1))
    want = np_conv(coords, feats, c, w, b, offsets)
    np.testing.assert_allclose(f, want, rtol=1e-5, atol=1e-5)


def test_conv_up_generative(rng):
    sv, coords, feats = make_sv(rng, n=32, cap=48, channels=4, stride=2)
    w = rng.randn(8, 4, 3).astype(np.float32) * 0.3
    b = rng.randn(3).astype(np.float32)
    out = S.conv_up_generative(sv, jnp.asarray(w), jnp.asarray(b))
    assert out.stride == 1
    assert out.capacity == 8 * sv.capacity
    assert int(out.count) == 8 * int(sv.count)
    c, f = valid_rows(out)
    # every child = parent + delta, feat = parent_feat @ W[delta] + b
    deltas = np.asarray(S.stencil_offsets(2, 1))
    want = {}
    for pc, pf in zip(coords, feats):
        for k, d in enumerate(deltas):
            cc = (pc[0], pc[1] + d[0], pc[2] + d[1], pc[3] + d[2])
            want[cc] = pf @ w[k] + b
    assert {tuple(r) for r in c} == set(want.keys())
    for cc, ff in zip(c, f):
        np.testing.assert_allclose(ff, want[tuple(cc)], rtol=1e-5, atol=1e-5)
    # sorted
    keys = np.asarray(out.keys)
    assert (np.diff(keys) >= 0).all()


def test_topk_mask_matches_numpy(rng):
    sv, coords, feats = make_sv(rng, n=60, cap=80, batches=3, channels=1)
    scores = np.asarray(sv.feats)[:, 0].copy()
    nums = np.array([5, 100, 0], np.int32)  # k > available in batch 1
    mask = np.asarray(
        S.topk_mask(sv, jnp.asarray(scores), jnp.asarray(nums), 3)
    )
    c = np.asarray(sv.coords)
    for b in range(3):
        rows = np.where((c[:, 0] == b) & (np.arange(80) < int(sv.count)))[0]
        k = min(len(rows), int(nums[b]))
        top = rows[np.argsort(-scores[rows], kind="stable")[:k]]
        got = set(np.where(mask)[0]) & set(rows)
        assert got == set(top)
    assert not mask[int(sv.count):].any()


def test_prune_compacts_sorted(rng):
    sv, coords, feats = make_sv(rng, n=50, cap=64)
    keep = np.zeros(64, bool)
    keep[rng.choice(50, 20, replace=False)] = True
    out = S.prune(sv, jnp.asarray(keep), out_capacity=32)
    assert int(out.count) == 20
    kc = np.asarray(sv.coords)[keep[:64]]
    c, f = valid_rows(out)
    assert {tuple(r) for r in c} == {tuple(r) for r in kc}
    keys = np.asarray(out.keys)
    assert (np.diff(keys) >= 0).all()
    # feats follow their rows
    src = {tuple(cc): ff for cc, ff in zip(np.asarray(sv.coords), np.asarray(sv.feats))}
    for cc, ff in zip(c, f):
        np.testing.assert_allclose(ff, src[tuple(cc)])


def test_conv_is_jittable_and_differentiable(rng):
    sv, coords, feats = make_sv(rng, channels=4)
    offsets = S.stencil_offsets(3, 1)
    w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32) * 0.2)

    @jax.jit
    def loss_fn(w, sv):
        kmap = S.build_kernel_map(sv, offsets)
        out = S.conv(sv, kmap, w)
        return jnp.sum(out.feats ** 2)

    g = jax.grad(loss_fn)(w, sv)
    assert g.shape == w.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0
