"""NNI likelihood upper bounds (engine/nni.py nni_upper_bounds vs
reference upperbounds.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.likelihood import ModelArrays, SiteData, TreeArrays
from iqtree_tpu.engine.nni import evaluate_nnis, nni_upper_bounds
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.search.nni_search import NNIEngine
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.utils.simulate import simulate_alignment


def _setup(seed=0, n_taxa=10, n_sites=300, gamma=4):
    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng)
    subst = create_dna_model("HKY")
    subst.set_rate_param_vector(np.array([2.5]))
    subst.state_freq = np.array([0.3, 0.25, 0.25, 0.2])
    rate = RateModel.make(gamma_cats=gamma, alpha=0.8)
    seqs = simulate_alignment(tree, subst, rate, n_sites, rng)
    aln = Alignment.from_sequences(
        [f"t{i}" for i in range(n_taxa)], seqs, "DNA"
    )
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    return tree, ta, ma, sd, aln


def test_upper_bound_dominates_true_lnl():
    """UB must be >= the swapped-topology lnL at the CURRENT branch
    lengths (the bound of Hoang et al. is per fixed lengths; the
    reference likewise compares it against curScore before the branch
    re-optimization, phylotree.cpp:2891)."""
    for seed in range(4):
        tree, ta, ma, sd, _ = _setup(seed=seed)
        edges = tree.internal_edges()
        edges_dev = np.asarray(ta.h2d)[edges]
        ubs = np.asarray(nni_upper_bounds(ta, ma, sd, jnp.asarray(edges_dev)))
        ev = evaluate_nnis(ta, ma, sd, jnp.asarray(edges_dev),
                           nni5=False, local_rounds=0, final_newton=0)
        lnls = np.asarray(ev.lnl)
        assert (ubs >= lnls - 1e-6).all(), (
            f"seed {seed}: UB violated by {np.max(lnls - ubs)}"
        )


def test_ub_filter_hill_climb_matches_unfiltered():
    tree, ta, ma, sd, aln = _setup(seed=5, n_taxa=12)
    rng = np.random.default_rng(0)
    start = random_tree(12, rng)
    plain = NNIEngine(ma, sd, dtype=jnp.float64)
    filt = NNIEngine(ma, sd, dtype=jnp.float64, ub_filter=True)
    r1 = plain.hill_climb(start.copy())
    r2 = filt.hill_climb(start.copy())
    # the prefilter only skips provably-hopeless swaps; both should land
    # on (essentially) the same optimum
    assert abs(r1.lnl - r2.lnl) < 0.5, (r1.lnl, r2.lnl)
