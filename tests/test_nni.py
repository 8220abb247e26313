"""Batched NNI evaluation vs host-applied ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.derivatives import optimize_all_branches
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.engine.nni import evaluate_nnis
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.trees.tree import random_tree


def setup(n_taxa=12, seed=3, n_sites=200):
    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGT"), n_sites)) for _ in range(n_taxa)]
    aln = Alignment.from_sequences([f"t{i}" for i in range(n_taxa)], seqs, "DNA")
    subst = create_dna_model("HKY")
    subst.state_freq = aln.state_frequencies()
    subst.group_rates = np.array([1.0, 2.5])
    rate = RateModel.make(gamma_cats=4, alpha=0.8)
    tree = random_tree(n_taxa, rng)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    return tree, ta, ma, sd


def test_cur_lnl_matches():
    tree, ta, ma, sd = setup()
    edges = jnp.asarray(tree.internal_edges())
    ev = evaluate_nnis(ta, ma, sd, edges)
    lnl, _ = compute_loglik(ta, ma, sd)
    np.testing.assert_allclose(float(ev.cur_lnl), float(lnl), rtol=1e-9)


def test_nni_eval_exact_algebra():
    """With zero branch re-optimization the candidate lnL must EXACTLY
    equal compute_loglik of the host-applied swapped topology."""
    tree, ta, ma, sd = setup()
    edges = tree.internal_edges()
    edges_dev = np.asarray(ta.h2d)[edges]
    ev = evaluate_nnis(
        ta, ma, sd, jnp.asarray(edges_dev), nni5=False, local_rounds=0,
        final_newton=0,
    )
    lnls = np.asarray(ev.lnl)
    for k, v in enumerate(edges):
        for swap in (0, 1):
            t2 = tree.copy()
            t2.apply_nni(int(v), swap)
            ta2 = TreeArrays.from_tree(t2, jnp.float64)
            truth, _ = compute_loglik(ta2, ma, sd)
            np.testing.assert_allclose(lnls[k, swap], float(truth), rtol=1e-9)


def test_nni_eval_vs_host_apply():
    """From a branch-optimized tree, the local-5-branch estimate must be a
    tight lower bound on the fully re-optimized lnL of the swapped
    topology."""
    tree, ta, ma, sd = setup()
    ta, _ = optimize_all_branches(ta, ma, sd)
    tree.blen = ta.host_blen()
    edges = tree.internal_edges()
    ev = evaluate_nnis(ta, ma, sd, jnp.asarray(np.asarray(ta.h2d)[edges]), nni5=True)
    lnls = np.asarray(ev.lnl)
    for k, v in enumerate(edges[:5]):
        for swap in (0, 1):
            t2 = tree.copy()
            t2.apply_nni(int(v), swap)
            t2.check()
            ta2 = TreeArrays.from_tree(t2, jnp.float64)
            _, full = optimize_all_branches(ta2, ma, sd)
            est = lnls[k, swap]
            assert est <= float(full) + 0.05, (v, swap, est, float(full))
            assert est >= float(full) - 2.0, (v, swap, est, float(full))


def test_nni_ranking_improves_tree():
    """Applying the best positive NNI must improve the true lnL."""
    tree, ta, ma, sd = setup(seed=11)
    # degrade the tree: random NNIs from a decent start
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = int(rng.choice(tree.internal_edges()))
        tree.apply_nni(v, int(rng.integers(2)))
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ta, lnl0 = optimize_all_branches(ta, ma, sd)
    edges = tree.internal_edges()
    ev = evaluate_nnis(ta, ma, sd, jnp.asarray(np.asarray(ta.h2d)[edges]), nni5=True)
    delta = np.asarray(ev.lnl) - float(ev.cur_lnl)
    best = np.unravel_index(np.argmax(delta), delta.shape)
    if delta[best] > 0.01:
        t2 = tree.copy()
        t2.apply_nni(int(edges[best[0]]), int(best[1]))
        ta2 = TreeArrays.from_tree(t2, jnp.float64)
        _, lnl2 = optimize_all_branches(ta2, ma, sd)
        assert float(lnl2) > float(lnl0), (float(lnl2), float(lnl0))
