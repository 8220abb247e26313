"""Mixture models: parsing, likelihood identity, optimization, gradients."""

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
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.mixture import MixtureModel
from iqtree_tpu.trees.tree import random_tree


@pytest.fixture(scope="module")
def prot():
    aln = read_alignment("tests/data/prot_M126_27_269.phy")
    tree = random_tree(aln.n_taxa, np.random.default_rng(7))
    return aln, tree


def test_mixture_is_weighted_sum_of_components(prot):
    """MIX{WAG,LG} (no rate het): L_p = w1 L_p(WAG) + w2 L_p(LG)."""
    aln, tree = prot
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)

    mix, rate = parse_model_string("MIX{WAG,LG}", aln)
    assert isinstance(mix, MixtureModel) and mix.n_mix == 2
    ma = ModelArrays.from_model(mix, rate, jnp.float64)
    _, lnl_p = compute_loglik(ta, ma, sd)

    parts = []
    for name in ["WAG", "LG"]:
        s1, r1 = parse_model_string(name, aln)
        # components of MIX use the matrices' own frequencies
        ma1 = ModelArrays.from_model(s1, r1, jnp.float64)
        _, p1 = compute_loglik(ta, ma1, sd)
        parts.append(np.asarray(p1))
    expected = np.log(0.5 * np.exp(parts[0]) + 0.5 * np.exp(parts[1]))
    np.testing.assert_allclose(np.asarray(lnl_p), expected, rtol=1e-10)


def test_builtin_mixtures_parse_and_evaluate(prot):
    aln, tree = prot
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    expect_ncat = {"EX2": 2, "EHO": 3, "C10": 40, "LG4M": 4, "LG4X": 4,
                   "CF4": 20}
    for name, ncat in expect_ncat.items():
        subst, rate = parse_model_string(name, aln)
        ma = ModelArrays.from_model(subst, rate, jnp.float64)
        assert ma.ncat == ncat, name
        lnl, _ = jax.jit(compute_loglik)(ta, ma, sd)
        assert np.isfinite(float(lnl)), name


def test_lg4x_is_freerate_fused(prot):
    aln, _ = prot
    subst, rate = parse_model_string("LG4X", aln)
    assert subst.fused_with_rate
    assert rate.is_free_rate and rate.ncat == 4
    assert subst.fix_weights  # tied to the FreeRate weights


def test_mixture_weight_optimization_improves(prot):
    from iqtree_tpu.models.optimize import (
        ModelOptimizer,
        optimize_model_and_branches,
    )

    aln, tree = prot
    subst, rate = parse_model_string("EX2+G", aln)
    assert not subst.fix_weights
    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    p = opt.init_params()
    assert "mix_logits" in p and "alpha_logit" in p
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    ma0 = opt.build(p)
    lnl0, _ = compute_loglik(ta, ma0, sd)
    ta2, p2, lnl = optimize_model_and_branches(opt, ta, sd, params=p, rounds=4)
    assert lnl > float(lnl0)
    s2, r2 = opt.unpack(p2)
    w = s2.weights
    assert abs(w.sum() - 1.0) < 1e-8 and (w > 0).all()


def test_mixture_gradient_matches_fd(prot):
    aln, tree = prot
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    subst, rate = parse_model_string("EX2+G", aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)

    def f(blen):
        lnl, _ = loglik(ta.with_blen(blen), ma, sd)
        return lnl

    g = jax.jit(jax.grad(f))(ta.blen)
    eps = 1e-6
    for v in [1, aln.n_taxa + 2]:
        fd = (f(ta.blen.at[v].add(eps)) - f(ta.blen.at[v].add(-eps))) / (2 * eps)
        assert float(g[v]) == pytest.approx(float(fd), rel=1e-5, abs=1e-6)
