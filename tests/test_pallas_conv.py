"""The fused Pallas halo+conv kernel must match the XLA banded conv3 path
bit-for-bit in f32 (interpret mode on CPU; the real Mosaic compile runs on
the chip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv2_tpu.data.synthetic import sphere_cloud
from pcgcv2_tpu.data.voxelize import collate
from pcgcv2_tpu.ops import blocks as B
from pcgcv2_tpu.ops.pallas_conv import conv3_pallas


@pytest.fixture(autouse=True, scope="module")
def _production_dtypes():
    import jax

    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.mark.parametrize("ci,co", [(16, 16), (16, 32), (32, 32), (64, 64)])
def test_pallas_conv3_matches_xla(ci, co):
    cloud = sphere_cloud(20, density=1.5, seed=7)
    coords, valid = collate([cloud], capacity=4096)
    rng = np.random.RandomState(0)
    feats = rng.randn(4096, ci).astype(np.float32)
    bg = B.blockify(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid),
        nb_cap=64, stride=1, res=64, num_batches=1,
    )
    nbrs = B.neighbor_rows(bg)
    w = rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1
    b = rng.randn(co).astype(np.float32)

    ref = B.conv3(bg, nbrs, jnp.asarray(w), jnp.asarray(b),
                  compute_dtype=jnp.float32)
    got = conv3_pallas(bg, nbrs, jnp.asarray(w), jnp.asarray(b),
                       compute_dtype=jnp.float32, interpret=True)
    occ = np.asarray(bg.mask & bg.valid[:, None])
    r = np.asarray(ref.feats)
    g = np.asarray(got.feats)
    # compare on ALL slots (the conv runs dense; masking happens later)
    np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)
    assert occ.any()
