"""+ASC (Lewis ascertainment-bias correction) vs naive implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.grad import loglik
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.engine.derivatives import optimize_all_branches
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.factory import ModelParseError, parse_model_string
from iqtree_tpu.trees.tree import random_tree


def _variable_alignment(n_taxa=8, n_sites=120, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        seqs = ["".join(rng.choice(list("ACGT"), n_sites)) for _ in range(n_taxa)]
        aln = Alignment.from_sequences(
            [f"t{i}" for i in range(n_taxa)], seqs, "DNA"
        )
        if aln.frac_const_sites() == 0:
            return aln


@pytest.fixture(scope="module")
def setup():
    aln = _variable_alignment()
    subst, rate = parse_model_string("GTR+ASC+G4", aln)
    assert subst.asc
    subst.set_rate_param_vector(np.array([1.5, 2.0, 0.8, 1.2, 3.0]))
    rate.alpha = 0.7
    tree = random_tree(aln.n_taxa, np.random.default_rng(3))
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    site_plain = SiteData.from_alignment(aln, jnp.float64, asc=False)
    site_asc = SiteData.from_alignment(aln, jnp.float64, asc=True)
    return aln, ta, ma, site_plain, site_asc


def test_asc_lnl_matches_naive(setup):
    aln, ta, ma, site_plain, site_asc = setup
    lnl_plain, lnl_p = jax.jit(compute_loglik)(ta, ma, site_plain)
    lnl_asc, lnl_p_asc = jax.jit(compute_loglik)(ta, ma, site_asc)
    # naive: evaluate each constant pattern's likelihood separately
    S = aln.num_states
    q = 0.0
    for s in range(S):
        codes = np.full((aln.n_taxa, 1), s, np.int32)
        site_c = site_plain._replace(
            tip_codes=jnp.asarray(codes),
            pattern_freq=jnp.ones(1, jnp.float64),
            const_state=jnp.asarray([s]),
            asc_mask=jnp.zeros(1, jnp.float64),
        )
        lc, _ = compute_loglik(ta, ma, site_c)
        q += float(jnp.exp(lc))
    expected = float(lnl_plain) - aln.n_sites * np.log1p(-q)
    assert float(lnl_asc) == pytest.approx(expected, abs=1e-8)
    # per-pattern corrected lnl reproduces the total under the weights
    got = float(
        jnp.sum(site_asc.pattern_freq * lnl_p_asc)
    )
    assert got == pytest.approx(expected, abs=1e-8)


def test_asc_gradient_matches_fd(setup):
    _, ta, ma, _, site_asc = setup

    def f(blen):
        lnl, _ = loglik(ta.with_blen(blen), ma, site_asc)
        return lnl

    g = jax.jit(jax.grad(f))(ta.blen)
    eps = 1e-6
    for v in [0, 3, ta.n_taxa + 1]:
        b1 = ta.blen.at[v].add(eps)
        b2 = ta.blen.at[v].add(-eps)
        fd = (f(b1) - f(b2)) / (2 * eps)
        assert float(g[v]) == pytest.approx(float(fd), rel=1e-4, abs=1e-5)


def test_asc_branch_newton_improves_and_agrees_with_grad_zero(setup):
    _, ta, ma, _, site_asc = setup
    lnl0, _ = compute_loglik(ta, ma, site_asc)
    ta2, lnl = jax.jit(
        lambda t: optimize_all_branches(t, ma, site_asc, n_sweeps=60)
    )(ta)
    assert float(lnl) > float(lnl0)

    def f(blen):
        l, _ = loglik(ta.with_blen(blen), ma, site_asc)
        return l

    g = jax.jit(jax.grad(f))(ta2.blen)
    from iqtree_tpu.engine.derivatives import optimize_branch_mask

    mask = np.asarray(optimize_branch_mask(ta2))
    interior = mask & (np.asarray(ta2.blen) > 2e-6) & (np.asarray(ta2.blen) < 50)
    assert np.max(np.abs(np.asarray(g)[interior])) < 5e-3


def test_asc_rejects_constant_sites_and_invar():
    rng = np.random.default_rng(0)
    seqs = ["ACGTAAAA", "ACGAAAAA", "TCGTAAAA", "TTGTAAAA"]
    aln = Alignment.from_sequences(["a", "b", "c", "d"], seqs, "DNA")
    with pytest.raises(ModelParseError):
        parse_model_string("GTR+ASC", aln)
    aln2 = _variable_alignment(4, 40, 5)
    with pytest.raises(ModelParseError):
        parse_model_string("GTR+ASC+I", aln2)
