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
