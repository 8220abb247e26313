"""Site-rate estimation (engine/site_rates.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.likelihood import ModelArrays, SiteData, TreeArrays
from iqtree_tpu.engine.site_rates import ml_site_rates, posterior_mean_rates
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.trees.tree import PhyloTree


@pytest.fixture(scope="module")
def setup():
    aln = read_alignment("tests/data/example.phy")
    subst, rate = parse_model_string("HKY+G{0.5}", aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    tree = PhyloTree.from_newick(
        open("tests/data/golden_tree_44.nwk").read(), aln.names
    )
    return aln, TreeArrays.from_tree(tree, jnp.float64), ma, sd


def test_posterior_mean_rates(setup):
    aln, ta, ma, sd = setup
    rates, post = jax.jit(posterior_mean_rates)(ta, ma, sd)
    rates = np.asarray(rates)
    post = np.asarray(post)
    assert rates.shape == (aln.n_patterns,)
    # posteriors are proper distributions
    np.testing.assert_allclose(post.sum(1), 1.0, atol=1e-8)
    assert (rates >= 0).all()
    # constant patterns should have lower rates than highly variable ones
    const = np.asarray(aln.const_state) >= 0
    assert rates[const].mean() < rates[~const].mean()
    # rates stay within the model's category range
    r_cats = np.asarray(ma.rates)
    assert rates.max() <= r_cats.max() + 1e-9
    assert rates.min() >= 0


def test_ml_site_rates(setup):
    aln, ta, ma, sd = setup
    rates = np.asarray(ml_site_rates(ta, ma, sd))
    assert rates.shape == (aln.n_patterns,)
    const = np.asarray(aln.const_state) >= 0
    # constant sites drive their ML rate to the minimum rail
    assert rates[const].mean() < 0.05
    assert rates[~const].mean() > rates[const].mean()


def test_weighted_kmeans_1d():
    from iqtree_tpu.engine.site_rates import weighted_kmeans_1d

    pts = np.array([0.1, 0.11, 0.12, 5.0, 5.1, 9.9, 10.0, 10.1])
    w = np.ones_like(pts)
    centers, assign = weighted_kmeans_1d(pts, w, 3)
    assert centers.shape == (3,)
    assert np.all(np.diff(centers) > 0)
    np.testing.assert_allclose(centers, [0.11, 5.05, 10.0], atol=1e-6)
    np.testing.assert_array_equal(assign, [0, 0, 0, 1, 1, 2, 2, 2])
    # weights pull the center
    w2 = np.array([100.0, 1, 1, 1, 1, 1, 1, 1])
    c2, _ = weighted_kmeans_1d(pts, w2, 3)
    assert c2[0] < 0.105


def test_discrete_ml_site_rates(setup):
    """RateMeyerDiscrete analogue: k-means discretization of ML rates
    (model/ratemeyerdiscrete.cpp:432)."""
    from iqtree_tpu.engine.site_rates import (
        MAX_SITE_RATE,
        discrete_ml_site_rates,
    )

    aln, ta, ma, sd = setup
    k = 4
    cat_rates, cats, ptn_rates = discrete_ml_site_rates(ta, ma, sd, k)
    P = np.asarray(sd.pattern_freq).shape[0]
    assert cats.shape == (P,) and ptn_rates.shape == (P,)
    assert cat_rates.shape == (k,)
    assert np.all(np.diff(cat_rates) > 0)
    assert cats.min() >= 0 and cats.max() < k
    # weighted mean ~ 1 over non-saturated sites (normalizeRates)
    freq = np.asarray(sd.pattern_freq)
    ok = ptn_rates < MAX_SITE_RATE
    mean = (ptn_rates[ok] * freq[ok]).sum() / freq[ok].sum()
    assert abs(mean - 1.0) < 0.01
    # rates must follow the category assignment
    np.testing.assert_allclose(ptn_rates, cat_rates[cats])


def test_kategory_rate_model():
    """+K (RateKategory, ratekategory.cpp:23): free rates, equal
    weights, sum(rates) == ncat."""
    from iqtree_tpu.models.optimize import ModelOptimizer, fit_model_step

    aln = read_alignment("tests/data/example.phy")
    subst, rate = parse_model_string("HKY+K3", aln)
    assert rate.is_kategory and rate.ncat == 3
    assert rate.df == 2
    r, w = rate.category_rates()
    # reference RateKategory convention: weight 1.0 per category
    # (rateheterogeneity.h:121), lnL = sum over categories unweighted
    np.testing.assert_allclose(w, np.ones(3))
    np.testing.assert_allclose(r.mean(), 1.0)
    tree = PhyloTree.from_newick(
        open("tests/data/golden_tree_44.nwk").read(), aln.names
    )
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    p0 = opt.init_params()
    assert p0["kat_logits"].shape == (2,)
    ma0 = opt.build(p0)
    np.testing.assert_allclose(float(ma0.rates.sum()), 3.0, rtol=1e-12)
    from iqtree_tpu.engine.grad import loglik

    lnl0, _ = loglik(ta, ma0, sd)
    params, lnl = jax.jit(
        lambda t, p: fit_model_step(opt, t, sd, p, 40)
    )(ta, p0)
    assert float(lnl) > float(lnl0)
    s2, r2 = opt.unpack(params)
    rr, ww = r2.category_rates()
    np.testing.assert_allclose(rr.mean(), 1.0, rtol=1e-9)
    assert rr.max() > 1.5  # example.phy has strong rate heterogeneity


def test_parse_kategory_rejects_combos():
    from iqtree_tpu.models.factory import ModelParseError

    aln = read_alignment("tests/data/example.phy")
    with pytest.raises(ModelParseError):
        parse_model_string("HKY+K3+G4", aln)
    with pytest.raises(ModelParseError):
        parse_model_string("HKY+K3+I", aln)


def test_kategory_golden_reference_parity():
    """Reference: iqtree-omp -s example.phy -m HKY+K3 -te <tree> gives
    BEST SCORE -10883.562 with rates {0.108, 0.770, 2.122} (category
    weight 1.0 each per the RateKategory getProp()==1 convention)."""
    from iqtree_tpu.models.optimize import (
        ModelOptimizer,
        optimize_model_and_branches,
    )

    aln = read_alignment("tests/data/example.phy")
    subst, rate = parse_model_string("HKY+K3", aln)
    tree = PhyloTree.from_newick(
        open("tests/data/ssf_golden.treefile").read(), aln.names,
        rng=np.random.default_rng(0),
    )
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    _, params, lnl = optimize_model_and_branches(opt, ta, sd, tol=0.001)
    assert lnl >= -10883.562 - 0.05
    _, r2 = opt.unpack(params)
    rr, _ = r2.category_rates()
    np.testing.assert_allclose(sorted(rr), [0.108, 0.770, 2.122],
                               atol=0.02)
