"""Fully-factorized entropy bottleneck (Ballé et al. 2018, arXiv:1802.01436).

Reimplements the reference's `EntropyBottleneck`
(/root/reference/entropy_model.py:42-195) in pure JAX: a per-channel 4-stage
monotone MLP models the cumulative density; the likelihood of an integer bin
is the CDF difference at x±0.5 with the sign-stabilization trick; training
quantization is additive U(-0.5, 0.5) noise, eval quantization is round with
a straight-through gradient.

TPU notes: everything here is dense [N, C] math (elementwise + tiny einsums)
that XLA fuses into a few VPU kernels; the symbol-grid PMF evaluation used by
the codec is a [S, C] batch of the same network.  All float math is float32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LIKELIHOOD_BOUND = 1e-9


@jax.custom_vjp
def round_ste(x):
    """Round with straight-through gradient (ref RoundNoGradient,
    entropy_model.py:9-17)."""
    return jnp.round(x)


def _round_fwd(x):
    return jnp.round(x), None


def _round_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_fwd, _round_bwd)


@jax.custom_vjp
def lower_bound(x):
    """Clamp to LIKELIHOOD_BOUND with gradient pass-through when the input is
    above the bound or the gradient pushes it back up (ref Low_bound,
    entropy_model.py:20-39)."""
    return jnp.maximum(x, LIKELIHOOD_BOUND)


def _lb_fwd(x):
    return jnp.maximum(x, LIKELIHOOD_BOUND), x


def _lb_bwd(x, g):
    pass_through = (x >= LIKELIHOOD_BOUND) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


class EntropyBottleneck(nn.Module):
    """Flexible factorized density model over quantized features.

    channels   : feature channels (8 in PCCModel, ref pcc_model.py:13)
    filters    : hidden widths of the per-channel CDF MLP (ref (3,3,3))
    init_scale : controls the initial spread of the density (ref 8)
    """

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3)
    init_scale: float = 8.0

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (len(self.filters) + 1))
        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_m = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda k, s, v=init_m: jnp.full(s, v, jnp.float32),
                    (self.channels, dims[i + 1], dims[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    bias_uniform_init,
                    (self.channels, dims[i + 1], 1),
                )
            )
            factors.append(
                self.param(
                    f"factor_{i}",
                    nn.initializers.zeros,
                    (self.channels, dims[i + 1], 1),
                    jnp.float32,
                )
            )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

    def _logits_cumulative(self, inputs: jax.Array) -> jax.Array:
        """inputs [C, 1, N] -> logits of the cumulative density, same shape
        (ref entropy_model.py:82-101)."""
        logits = inputs
        for m, b, f in zip(self._matrices, self._biases, self._factors):
            logits = jnp.einsum(
                "cij,cjn->cin", jax.nn.softplus(m), logits,
                preferred_element_type=jnp.float32,
            )
            logits = logits + b
            logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def likelihood(self, x: jax.Array) -> jax.Array:
        """P(round(x) = bin) under the learned density.

        x: [N, C] -> likelihood [N, C], evaluating the CDF logits at x±0.5
        with sign stabilization (ref entropy_model.py:112-130).
        """
        v = x.T[:, None, :]  # [C, 1, N]
        lo = self._logits_cumulative(v - 0.5)
        hi = self._logits_cumulative(v + 0.5)
        sign = -jnp.sign(lo + hi)
        sign = jax.lax.stop_gradient(sign)
        lh = jnp.abs(jax.nn.sigmoid(sign * hi) - jax.nn.sigmoid(sign * lo))
        return lh[:, 0, :].T  # [N, C]

    def quantize(self, x: jax.Array, mode: str, rng=None) -> jax.Array:
        """'noise' (training) or 'symbols' (eval/coding),
        ref entropy_model.py:103-110."""
        if mode == "noise":
            assert rng is not None, "noise quantization needs an rng"
            return x + jax.random.uniform(
                rng, x.shape, x.dtype, minval=-0.5, maxval=0.5
            )
        if mode == "symbols":
            return round_ste(x)
        raise ValueError(f"unknown quantize mode {mode!r}")

    def __call__(self, x: jax.Array, mode: str = "noise", rng=None):
        """Returns (quantized values, bounded likelihood [N, C])."""
        y = self.quantize(x, mode, rng)
        lh = lower_bound(self.likelihood(y))
        return y, lh

    def pmf(self, min_v: jax.Array, max_v_static: int, offset: jax.Array = None):
        """PMF table over the integer symbol grid for the arithmetic coder.

        Evaluates the density at `min_v + [0 .. S)` where S = max_v_static+1
        symbols (static for jit; min_v is a traced scalar).  Returns
        [C, S] float32, clamped to the likelihood bound
        (ref entropy_model.py:151-176).
        """
        s = max_v_static + 1
        grid = min_v.astype(jnp.float32) + jnp.arange(s, dtype=jnp.float32)
        x = jnp.broadcast_to(grid[:, None], (s, self.channels))
        p = jnp.clip(self.likelihood(x), LIKELIHOOD_BOUND, None)
        return p.T  # [C, S]


def bias_uniform_init(key, shape, dtype=jnp.float32):
    """U(-0.5, 0.5) — the reference's bias init (entropy_model.py:74)."""
    return jax.random.uniform(key, shape, dtype, minval=-0.5, maxval=0.5)


def pmf_host(eb_params, min_v: float, num_symbols: int) -> np.ndarray:
    """Host (numpy) twin of `EntropyBottleneck.pmf` for the codec.

    The symbol-grid PMF is a [S, C] batch through a 4-stage MLP with hidden
    widths <= 3 — microseconds on the host, but as a jitted device call it
    costs a full tunnel round-trip per encode AND per decode (~0.75 s fixed
    H2D latency each, see codec/coder.py).  Both codec sides use this same
    function, so the quantized CDF stays bitstream-consistent by
    construction.

    eb_params: the `entropy_bottleneck` param subtree
    ({matrix_i, bias_i, factor_i}); returns [C, S] float64 >= the
    likelihood bound.
    """
    mats = sorted(k for k in eb_params if k.startswith("matrix_"))
    channels = np.asarray(eb_params["bias_0"]).shape[0]
    grid = min_v + np.arange(num_symbols, dtype=np.float64)  # [S]
    x = np.broadcast_to(grid, (channels, 1, num_symbols))  # [C, 1, S]

    def logits_cumulative(v):
        logits = v
        for i in range(len(mats)):
            m = np.asarray(eb_params[f"matrix_{i}"], dtype=np.float64)
            b = np.asarray(eb_params[f"bias_{i}"], dtype=np.float64)
            f = np.asarray(eb_params[f"factor_{i}"], dtype=np.float64)
            logits = np.einsum("cij,cjn->cin", np.logaddexp(0.0, m), logits)
            logits = logits + b
            logits = logits + np.tanh(f) * np.tanh(logits)
        return logits

    lo = logits_cumulative(x - 0.5)
    hi = logits_cumulative(x + 0.5)
    sign = -np.sign(lo + hi)

    def sigmoid(z):
        return 0.5 * (1.0 + np.tanh(0.5 * z))

    p = np.abs(sigmoid(sign * hi) - sigmoid(sign * lo))[:, 0, :]  # [C, S]
    return np.clip(p, LIKELIHOOD_BOUND, None)
