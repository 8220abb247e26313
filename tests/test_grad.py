"""Custom-VJP gradients vs plain scan autodiff; differentiable gamma."""

import jax
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.grad import loglik
from iqtree_tpu.engine.likelihood import compute_loglik
from iqtree_tpu.utils.gamma import discrete_gamma_rates
from iqtree_tpu.utils.gamma_jax import discrete_gamma_rates_jax, gammaincinv_jax

from test_derivatives import setup


def _fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy(); xp.flat[i] += eps
        xm = x.copy(); xm.flat[i] -= eps
        g.flat[i] = (f(xp) - f(xm)) / (2 * eps)
    return g


def test_loglik_custom_vjp_matches_finite_differences():
    ta, ma, sd = setup(n_taxa=8, seed=2, pinv=0.1)

    def f_custom(blen, model, freq):
        lnl, _ = loglik(ta.with_blen(blen), model, sd._replace(pattern_freq=freq))
        return lnl

    args = (ta.blen, ma, sd.pattern_freq)
    v1, g1 = jax.value_and_grad(f_custom, argnums=(0, 1, 2))(*args)
    v_plain, _ = compute_loglik(ta, ma, sd)
    np.testing.assert_allclose(float(v1), float(v_plain), rtol=1e-12)
    # blen gradient vs finite differences, on OPTIMIZABLE branches only:
    # the pinned root-child edge sits at exactly t=0 where the P(t)
    # positivity floor (models/eigen.py transition_matrices) introduces a
    # kink — one-sided FD there measures (floor-jump)/eps, not the
    # derivative, while the analytic gradient is the smooth one (equal to
    # the shared pendant edge's, as the physical edge is the same)
    from iqtree_tpu.engine.derivatives import optimize_branch_mask

    mask = np.asarray(optimize_branch_mask(ta))
    g_blen_fd = _fd_grad(lambda b: float(f_custom(jnp.asarray(b), ma,
                                                  sd.pattern_freq)), args[0])
    got = np.array(g1[0], copy=True)
    np.testing.assert_allclose(got[mask], g_blen_fd[mask],
                               rtol=1e-4, atol=1e-5)
    # a few model-parameter gradients vs finite differences
    for field in ("rates", "props", "state_freq", "eigenvalues"):
        x0 = np.asarray(getattr(ma, field))

        def f_field(x):
            return float(f_custom(args[0], ma._replace(**{field: jnp.asarray(x)}),
                                  sd.pattern_freq))

        fd = _fd_grad(f_field, x0, eps=1e-7)
        np.testing.assert_allclose(
            np.asarray(getattr(g1[1], field)), fd, rtol=1e-3, atol=1e-4,
            err_msg=field,
        )
    # pattern_freq gradient is analytically lnl_p
    _, lnl_p = compute_loglik(ta, ma, sd)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(lnl_p), rtol=1e-10)


def test_loglik_pattern_output_vjp():
    ta, ma, sd = setup(n_taxa=6, seed=7)

    def f_custom(blen):
        _, pat = loglik(ta.with_blen(blen), ma, sd)
        return jnp.sum(jnp.sin(pat))

    g1 = np.array(jax.grad(f_custom)(ta.blen), copy=True)

    def f_np(b):
        _, pat = compute_loglik(ta.with_blen(jnp.asarray(b)), ma, sd)
        return float(jnp.sum(jnp.sin(pat)))

    # optimizable branches only — see the kink note in
    # test_loglik_custom_vjp_matches_finite_differences
    from iqtree_tpu.engine.derivatives import optimize_branch_mask

    mask = np.asarray(optimize_branch_mask(ta))
    g_fd = _fd_grad(f_np, ta.blen)
    np.testing.assert_allclose(g1[mask], g_fd[mask], rtol=1e-4, atol=1e-6)


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
