"""Implicit-differentiation gradients of the discrete-Gamma quadrature.

Round-1 regression: AD through the unrolled gammaincinv Newton produced
NaN tangents in f32 for alpha < ~0.1 (the iteration's clips and 1e-300
guards underflow f32), which froze the model optimizer on TPU whenever a
Gamma-shape excursion visited that region (alpha stuck at the excursion
value, branch lengths diverging).  gammaincinv_jax now carries a custom
JVP from the implicit-function theorem; these tests pin finiteness in
f32 across the regime and correctness against finite differences in f64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iqtree_tpu.utils.gamma_jax import (
    discrete_gamma_rates_jax,
    gammaincinv_jax,
)

ALPHAS = [5.0, 1.0, 0.3, 0.0908, 0.05, 0.02]


@pytest.mark.parametrize("ncat", [4, 8])
def test_jacobian_finite_f32(ncat):
    f = jax.jit(
        jax.jacrev(lambda a: discrete_gamma_rates_jax(a, ncat, jnp.float32(0.0)))
    )
    for a0 in ALPHAS:
        j = np.asarray(f(jnp.float32(a0)))
        assert np.isfinite(j).all(), f"NaN jacobian at alpha={a0}: {j}"


def test_jacobian_matches_finite_differences_f64():
    f = jax.jit(jax.jacrev(lambda a: discrete_gamma_rates_jax(a, 4, 0.0)))
    for a0 in ALPHAS:
        a = jnp.float64(a0)
        jac = np.asarray(f(a))
        eps = 1e-6 * a0
        fd = (
            np.asarray(discrete_gamma_rates_jax(a + eps, 4, 0.0))
            - np.asarray(discrete_gamma_rates_jax(a - eps, 4, 0.0))
        ) / (2 * eps)
        np.testing.assert_allclose(jac, fd, rtol=5e-4, atol=1e-12)


def test_gammaincinv_inverse_property():
    from jax.scipy.special import gammainc

    for a0 in ALPHAS:
        q = jnp.asarray([0.1, 0.25, 0.5, 0.75, 0.9], jnp.float64)
        x = gammaincinv_jax(jnp.float64(a0), q)
        np.testing.assert_allclose(
            np.asarray(gammainc(a0, x)), np.asarray(q), rtol=1e-8
        )


def test_gammaincinv_grad_q():
    # dx/dq = 1/pdf — check against finite differences
    a = jnp.float64(0.7)
    q = jnp.float64(0.4)
    g = jax.grad(lambda q: gammaincinv_jax(a, q[None])[0])(q)
    eps = 1e-7
    fd = (
        float(gammaincinv_jax(a, jnp.asarray([q + eps]))[0])
        - float(gammaincinv_jax(a, jnp.asarray([q - eps]))[0])
    ) / (2 * eps)
    assert float(g) == pytest.approx(fd, rel=1e-5)
