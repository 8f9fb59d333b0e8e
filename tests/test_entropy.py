import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcgcv2_tpu.models.entropy import (
    EntropyBottleneck,
    lower_bound,
    pmf_host,
    round_ste,
)

pytestmark = pytest.mark.fast  # no full-model compiles


def make_eb(channels=4):
    eb = EntropyBottleneck(channels=channels)
    params = eb.init(jax.random.PRNGKey(0), jnp.zeros((10, channels)), "symbols")
    return eb, params


def test_round_ste_grad():
    g = jax.grad(lambda x: jnp.sum(round_ste(x) ** 2))(jnp.array([1.3, -2.7]))
    # straight-through: d/dx sum(round(x)^2) ~ 2*round(x)
    np.testing.assert_allclose(np.asarray(g), [2.0, -6.0], atol=1e-6)


def test_lower_bound_grad():
    x = jnp.array([1e-12, 1e-12, 0.5])
    g = jax.grad(lambda x: jnp.sum(lower_bound(x) * jnp.array([1.0, -1.0, 1.0])))(x)
    # below bound: positive upstream grad blocked, negative passes
    np.testing.assert_allclose(np.asarray(g), [0.0, -1.0, 1.0], atol=1e-6)


def test_likelihood_is_valid_probability(rng):
    eb, params = make_eb()
    x = jnp.asarray(rng.randn(200, 4).astype(np.float32) * 3)
    y, lh = eb.apply(params, x, "symbols")
    lh = np.asarray(lh)
    assert (lh > 0).all() and (lh <= 1.0 + 1e-6).all()
    np.testing.assert_array_equal(np.asarray(y), np.round(np.asarray(x)))


def test_pmf_sums_to_one(rng):
    eb, params = make_eb()
    pmf = eb.apply(
        params, jnp.float32(-100), 200, method=lambda m, a, b: m.pmf(a, b)
    )
    pmf = np.asarray(pmf)
    assert pmf.shape == (4, 201)
    # over a wide symbol range the discretized density must capture ~all mass
    np.testing.assert_allclose(pmf.sum(axis=1), 1.0, atol=1e-3)


def test_pmf_host_matches_device(rng):
    """The codec's host PMF (pmf_host) must agree with the flax pmf to well
    under CDF-quantization granularity (2^-16) so either backend yields the
    same bitstream after native.quantize_cdf."""
    eb, params = make_eb()
    # perturb params away from init so the test isn't trivially symmetric
    params = jax.tree.map(
        lambda p: p + jnp.asarray(
            np.random.RandomState(3).uniform(-0.2, 0.2, p.shape), p.dtype
        ),
        params,
    )
    for min_v, s in ((-7, 15), (-40, 90), (0, 1)):
        dev = np.asarray(eb.apply(
            params, jnp.float32(min_v), s - 1,
            method=lambda m, a, b: m.pmf(a, b),
        ))
        host = pmf_host(params["params"], float(min_v), s)
        assert host.shape == dev.shape == (4, s)
        np.testing.assert_allclose(host, dev, atol=2e-6, rtol=1e-4)


def test_noise_mode_needs_and_uses_rng(rng):
    eb, params = make_eb()
    x = jnp.asarray(rng.randn(50, 4).astype(np.float32))
    y1, _ = eb.apply(params, x, "noise", jax.random.PRNGKey(1))
    y2, _ = eb.apply(params, x, "noise", jax.random.PRNGKey(2))
    d1 = np.abs(np.asarray(y1) - np.asarray(x))
    assert (d1 <= 0.5 + 1e-6).all()
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_likelihood_trains(rng):
    """A few SGD steps on the rate objective must reduce expected bits."""
    eb, params = make_eb(channels=2)
    x = jnp.asarray((rng.randn(500, 2) * 4).astype(np.float32))

    def bits(p):
        _, lh = eb.apply(p, x, "symbols")
        return -jnp.sum(jnp.log2(lh))

    b0 = float(bits(params))
    g = jax.grad(bits)(params)
    params2 = jax.tree.map(lambda p, gg: p - 1e-3 * gg, params, g)
    b1 = float(bits(params2))
    assert np.isfinite(b0) and np.isfinite(b1)
    assert b1 < b0
