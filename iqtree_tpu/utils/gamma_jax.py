"""Differentiable discrete-Gamma quadrature in JAX.

The host-side version (utils/gamma.py) uses scipy's gammaincinv, which JAX
lacks; here the inverse regularized incomplete gamma is solved by Newton
iterations on jax.scipy.special.gammainc, seeded with the Wilson-Hilferty
chi-square quantile approximation.  Unrolled Newton is differentiable, so
the gamma shape alpha can be optimized jointly with everything else by
L-BFGS instead of the reference's separate Brent loop
(/root/reference/model/rategamma.cpp:209 optimizeParameters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaln, ndtri

_NEWTON_ITERS = 25


def _log_gammaincinv_newton(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """log of the solution of gammainc(a, x) = q (elementwise Newton)."""
    log_gamma_a = gammaln(a)
    # Wilson-Hilferty chi2 quantile approximation
    z = ndtri(q)
    wh = a * (1.0 - 1.0 / (9.0 * a) + z / (3.0 * jnp.sqrt(a))) ** 3
    # small-x series: gammainc(a, x) ~ x^a / (a Gamma(a))
    log_small = (jnp.log(q) + jnp.log(a) + log_gamma_a) / a
    u0 = jnp.where(wh > 1e-4 * (a + 1.0), jnp.log(jnp.maximum(wh, 1e-300)), log_small)
    # guard: if WH is nonsense (negative cube), use the series
    u0 = jnp.where(jnp.isfinite(u0), u0, log_small)

    def body(_, u):
        x = jnp.exp(u)
        f = gammainc(a, x) - q
        # d/du gammainc(a, e^u) = pdf(x) * x, in log space
        log_slope = a * u - x - log_gamma_a
        slope = jnp.exp(jnp.clip(log_slope, -700.0, 700.0))
        step = f / jnp.maximum(slope, 1e-300)
        return u - jnp.clip(step, -30.0, 30.0)

    return jax.lax.fori_loop(0, _NEWTON_ITERS, body, u0)


@jax.custom_jvp
def gammaincinv_jax(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Solve gammainc(a, x) = q for x (elementwise), a > 0, 0 < q < 1.

    Newton runs in log-x space so that the tiny-shape regime works: for
    a ~ 0.02 the lower quantiles sit at x ~ 1e-30, far below what x-space
    iteration (or Wilson-Hilferty alone) can reach.

    Differentiation is IMPLICIT (custom JVP below), not through the
    unrolled Newton: AD through the iteration's f32 clips/guards produces
    NaN tangents on TPU for a < ~0.1, which froze the model optimizer
    whenever a Gamma-shape excursion visited that region."""
    return jnp.exp(_log_gammaincinv_newton(a, q))


@gammaincinv_jax.defjvp
def _gammaincinv_jvp(primals, tangents):
    # x(a, q):  dx = (dq - dI/da * da) / pdf(a, x)
    # computed in log space:  x * pdf(a, x) = exp(a*u - x - lnGamma(a)),
    # u = log x  (finite in f32 even where x itself underflows)
    a, q = primals
    da, dq = tangents
    u = _log_gammaincinv_newton(a, q)
    x = jnp.exp(u)
    a_b = jnp.broadcast_to(a, x.shape)
    log_slope = a_b * u - x - gammaln(a_b)  # log(x * pdf)
    inv_slope_x = jnp.exp(-jnp.clip(log_slope, -80.0, 80.0))  # 1/(x*pdf)
    if type(da) is jax.custom_derivatives.SymbolicZero:
        dI_da = 0.0
    else:
        _, dI_da = jax.jvp(
            lambda aa: gammainc(aa, x), (a_b,), (jnp.broadcast_to(da, x.shape),)
        )
    dq_b = 0.0 if type(dq) is jax.custom_derivatives.SymbolicZero else dq
    du = (dq_b - dI_da) * inv_slope_x
    return x, x * du


def discrete_gamma_rates_jax(
    alpha: jnp.ndarray, ncat: int, p_inv: jnp.ndarray = 0.0
) -> jnp.ndarray:
    """Mean-rate discrete Gamma categories (Yang 1994), differentiable.

    Matches utils/gamma.py (and the reference's computeRatesMean,
    /root/reference/model/rategamma.cpp:136-151) to the Newton tolerance.
    Returns rates [ncat] with mean 1/(1-p_inv).
    """
    if ncat == 1:
        return jnp.ones((1,)) / (1.0 - p_inv)
    q = jnp.arange(1, ncat) / ncat
    cuts = gammaincinv_jax(alpha, q)  # cut points of Gamma(alpha, 1)
    # P(X < cut | category mass), via the identity
    # E[X 1{X<c}] / E[X] = gammainc(a+1, c) for Gamma(a,1) (mean a)
    upper = gammainc(alpha + 1.0, cuts)
    first = upper[0] * ncat
    last = (1.0 - upper[-1]) * ncat
    mid = (upper[1:] - upper[:-1]) * ncat
    rates = jnp.concatenate([first[None], mid, last[None]])
    return rates / (1.0 - p_inv)
