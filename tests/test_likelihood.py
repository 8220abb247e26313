"""Likelihood engine correctness: brute force, pulley principle, scaling."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.trees.tree import PhyloTree, random_tree


def brute_force_lnl(tree: PhyloTree, aln: Alignment, subst, rate: RateModel):
    """Sum over all internal state assignments — exponential, tiny trees only."""
    q = subst.rate_matrix()
    pi = subst.state_freq
    rates, props = rate.category_rates()
    S = aln.num_states
    N = tree.n_taxa
    masks = aln.states.code_masks
    n_nodes = tree.n_nodes
    post = tree.postorder()
    total = 0.0
    lnls = []
    for p in range(aln.n_patterns):
        site_lh = 0.0
        for c, (r, w) in enumerate(zip(rates, props)):
            P = {v: expm(q * r * tree.blen[v]) for v in range(n_nodes)}
            # iterate over states of all internal nodes
            internals = list(post)
            lh_c = 0.0
            for assign in itertools.product(range(S), repeat=len(internals)):
                state = {v: s for v, s in zip(internals, assign)}
                val = pi[state[post[-1]]]
                for v in internals:
                    for child in tree.children[v]:
                        child = int(child)
                        if child < N:
                            code = aln.patterns[child, p]
                            val *= sum(
                                P[child][state[v], s] * masks[code, s]
                                for s in range(S)
                            )
                        else:
                            val *= P[child][state[v], state[child]]
                lh_c += val
            site_lh += w * lh_c
        cs = aln.const_state[p]
        if rate.p_invar > 0 and cs >= 0:
            site_lh += rate.p_invar * (1.0 if cs == S else pi[cs])
        lnls.append(np.log(site_lh))
        total += aln.pattern_freq[p] * np.log(site_lh)
    return total, np.array(lnls)


def make_setup(seed=0, n_taxa=5, n_sites=12, model="GTR", gamma=4, pinv=0.0):
    rng = np.random.default_rng(seed)
    chars = "ACGT"
    seqs = ["".join(rng.choice(list(chars + "-RY"), n_sites)) for _ in range(n_taxa)]
    names = [f"t{i}" for i in range(n_taxa)]
    aln = Alignment.from_sequences(names, seqs, "DNA")
    subst = create_dna_model(model)
    subst.state_freq = aln.state_frequencies()
    if model == "GTR":
        subst.set_rate_param_vector(rng.uniform(0.5, 3.0, 5))
    rate = RateModel.make(gamma_cats=gamma, invar=pinv > 0, p_invar=pinv, alpha=0.7)
    tree = random_tree(n_taxa, rng)
    return tree, aln, subst, rate


def device_lnl(tree, aln, subst, rate, dtype=jnp.float64):
    ta = TreeArrays.from_tree(tree, dtype)
    ma = ModelArrays.from_model(subst, rate, dtype)
    sd = SiteData.from_alignment(aln, dtype)
    lnl, pat = compute_loglik(ta, ma, sd)
    return float(lnl), np.asarray(pat)


@pytest.mark.parametrize("model,gamma,pinv", [
    ("JC", 1, 0.0),
    ("HKY", 4, 0.0),
    ("GTR", 4, 0.0),
    ("GTR", 4, 0.2),
])
def test_brute_force_parity(model, gamma, pinv):
    tree, aln, subst, rate = make_setup(model=model, gamma=gamma, pinv=pinv)
    expected, exp_pat = brute_force_lnl(tree, aln, subst, rate)
    got, got_pat = device_lnl(tree, aln, subst, rate)
    np.testing.assert_allclose(got, expected, rtol=1e-8)
    np.testing.assert_allclose(got_pat, exp_pat, rtol=1e-7)


def test_pulley_principle():
    """lnL must be invariant to where the virtual root sits: re-reading the
    newick re-roots on tip0's edge from a different traversal."""
    tree, aln, subst, rate = make_setup(n_taxa=8, n_sites=60)
    lnl1, _ = device_lnl(tree, aln, subst, rate)
    nwk = tree.to_newick(aln.names)
    tree2 = PhyloTree.from_newick(nwk, aln.names)
    lnl2, _ = device_lnl(tree2, aln, subst, rate)
    assert abs(lnl1 - lnl2) < 1e-8


def test_scaling_deep_tree():
    """Long chains underflow float64 without rescaling; ours must not."""
    rng = np.random.default_rng(3)
    n = 60
    tree, aln, subst, rate = make_setup(n_taxa=n, n_sites=40, model="HKY")
    lnl, pat = device_lnl(tree, aln, subst, rate)
    assert np.isfinite(lnl)
    assert np.all(np.isfinite(pat))


def test_nni_changes_lnl():
    tree, aln, subst, rate = make_setup(n_taxa=8, n_sites=100)
    lnl1, _ = device_lnl(tree, aln, subst, rate)
    v = int(tree.internal_edges()[0])
    tree.apply_nni(v, 0)
    tree.check()
    lnl2, _ = device_lnl(tree, aln, subst, rate)
    assert lnl1 != lnl2
