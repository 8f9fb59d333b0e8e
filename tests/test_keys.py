import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv2_tpu.ops import keys as K

pytestmark = pytest.mark.fast  # no full-model compiles


def random_coords(rng, n, batches=3, span=1000):
    b = rng.randint(0, batches, size=(n, 1))
    xyz = rng.randint(0, span, size=(n, 3))
    return np.concatenate([b, xyz], axis=1).astype(np.int32)


def test_ravel_unravel_roundtrip(rng):
    coords = random_coords(rng, 500, span=4096)
    keys = K.ravel(jnp.asarray(coords))
    back = K.unravel(keys)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_ravel_is_lexicographic(rng):
    coords = random_coords(rng, 300)
    keys = np.asarray(K.ravel(jnp.asarray(coords)))
    order_key = np.argsort(keys, kind="stable")
    order_lex = np.lexsort(
        (coords[:, 3], coords[:, 2], coords[:, 1], coords[:, 0])
    )
    np.testing.assert_array_equal(
        coords[order_key], coords[order_lex]
    )


def test_pad_key_is_max(rng):
    coords = random_coords(rng, 100, span=K.R - 1, batches=64)
    keys = np.asarray(K.ravel(jnp.asarray(coords)))
    assert (keys < K.PAD_KEY).all()
    assert K.PAD_KEY == int(K.ravel(jnp.asarray([K.PAD_COORD]))[0])


def test_isin_matches_numpy(rng):
    a = np.unique(rng.randint(0, 50, size=(200, 4)).astype(np.int32), axis=0)
    q = rng.randint(0, 50, size=(300, 4)).astype(np.int32)
    a_keys = np.sort(np.asarray(K.ravel(jnp.asarray(a))))
    got = np.asarray(K.isin(jnp.asarray(a_keys), K.ravel(jnp.asarray(q))))
    a_set = {tuple(r) for r in a}
    want = np.array([tuple(r) in a_set for r in q])
    np.testing.assert_array_equal(got, want)


def test_lookup_finds_correct_row(rng):
    a = np.unique(random_coords(rng, 400), axis=0)
    keys = np.sort(np.asarray(K.ravel(jnp.asarray(a))))
    idx, hit = K.lookup(jnp.asarray(keys), jnp.asarray(keys))
    assert bool(hit.all())
    np.testing.assert_array_equal(np.asarray(idx), np.arange(len(keys)))
