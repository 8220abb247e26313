"""Custom-VJP gradients vs plain scan autodiff; differentiable gamma."""

import jax
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.grad import loglik
from iqtree_tpu.engine.likelihood import compute_loglik
from iqtree_tpu.utils.gamma import discrete_gamma_rates
from iqtree_tpu.utils.gamma_jax import discrete_gamma_rates_jax, gammaincinv_jax

from test_derivatives import setup


def test_loglik_custom_vjp_matches_autodiff():
    ta, ma, sd = setup(n_taxa=8, seed=2, pinv=0.1)

    def f_custom(blen, model, freq):
        lnl, _ = loglik(ta.with_blen(blen), model, sd._replace(pattern_freq=freq))
        return lnl

    def f_ref(blen, model, freq):
        lnl, _ = compute_loglik(
            ta.with_blen(blen), model, sd._replace(pattern_freq=freq)
        )
        return lnl

    args = (ta.blen, ma, sd.pattern_freq)
    v1, g1 = jax.value_and_grad(f_custom, argnums=(0, 1, 2))(*args)
    v2, g2 = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)


def test_loglik_pattern_output_vjp():
    ta, ma, sd = setup(n_taxa=6, seed=7)

    def f_custom(blen):
        _, pat = loglik(ta.with_blen(blen), ma, sd)
        return jnp.sum(jnp.sin(pat))

    def f_ref(blen):
        _, pat = compute_loglik(ta.with_blen(blen), ma, sd)
        return jnp.sum(jnp.sin(pat))

    g1 = jax.grad(f_custom)(ta.blen)
    g2 = jax.grad(f_ref)(ta.blen)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-9)


def test_gammaincinv_jax():
    from scipy.special import gammaincinv

    for a in (0.05, 0.3, 1.0, 2.5, 20.0):
        q = np.linspace(0.05, 0.95, 7)
        got = np.asarray(gammaincinv_jax(jnp.asarray(a), jnp.asarray(q)))
        want = gammaincinv(a, q)
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_discrete_gamma_rates_jax():
    for alpha in (0.1, 0.5, 1.0, 3.0):
        for pinv in (0.0, 0.25):
            got = np.asarray(discrete_gamma_rates_jax(jnp.asarray(alpha), 4, pinv))
            want = discrete_gamma_rates(alpha, 4, pinv)
            np.testing.assert_allclose(got, want, rtol=1e-7)


def test_gamma_rates_differentiable():
    g = jax.grad(lambda a: discrete_gamma_rates_jax(a, 4).sum())(jnp.asarray(0.6))
    # sum of mean rates == ncat exactly, so d/da sum == 0
    assert abs(float(g)) < 1e-4
