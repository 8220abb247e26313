"""WH-test of model homogeneity (analysis/whtest.py vs reference
whtest/)."""

import numpy as np

from iqtree_tpu.analysis.whtest import (
    _delta_statistic,
    _pair_h_matrices,
    _pairwise_q,
    run_whtest,
)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.utils.simulate import simulate_alignment


def _sim_aln(subst, n_taxa=10, n_sites=600, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng)
    tree.blen = tree.blen * scale
    seqs = simulate_alignment(tree, subst, RateModel.make(), n_sites, rng)
    return Alignment.from_sequences(
        [f"t{i}" for i in range(n_taxa)], seqs, "DNA"
    )


def test_pairwise_q_recovers_generator():
    """On abundant data from one GTR process, every pairwise Q estimate
    approximates the same generator -> Delta near its floor."""
    gtr = create_dna_model("GTR")
    gtr.set_rate_param_vector(np.array([2.0, 4.0, 0.7, 1.3, 5.0]))
    gtr.state_freq = np.array([0.3, 0.25, 0.2, 0.25])
    aln = _sim_aln(gtr, n_taxa=8, n_sites=5000, seed=2)
    codes = np.asarray(aln.patterns)[:, aln.site_to_pattern]
    h = _pair_h_matrices(codes)
    q, dist, valid = _pairwise_q(h, alpha=100.0)
    assert valid.all()
    # every valid Q is normalized: -sum pi q_ii == 1
    pi = h.sum(axis=2)
    mean_rates = -np.einsum("pk,pkk->p", pi, q)
    np.testing.assert_allclose(mean_rates, 1.0, atol=1e-6)
    # rows sum to ~0 (generator property survives the estimation)
    assert np.abs(q.sum(axis=2)).max() < 0.15
    delta = _delta_statistic(q, valid)
    assert 0 < delta < 2.0, delta


def test_whtest_homogeneous_not_rejected():
    gtr = create_dna_model("HKY")
    gtr.set_rate_param_vector(np.array([3.0]))
    gtr.state_freq = np.array([0.3, 0.25, 0.2, 0.25])
    aln = _sim_aln(gtr, n_taxa=8, n_sites=800, seed=1)
    res = run_whtest(aln, alpha=100.0, n_sim=60, seed=3,
                     log=lambda s: None)
    assert res.n_valid_pairs == 28
    assert res.p_value > 0.05, (res.delta, res.delta_quantile, res.p_value)
    assert not res.rejected
    assert "DID NOT reject" in res.report()


def _simulate_branch_het(tree, model_a, model_b, group_b, n_sites, rng):
    """Evolve down the tree using model_b's generator on every branch
    whose subtree contains only group_b taxa, model_a elsewhere — the
    lineage heterogeneity the WH-test is designed to detect."""
    from scipy.linalg import expm

    qa, qb = model_a.rate_matrix(), model_b.rate_matrix()
    pia = model_a.state_freq
    n_nodes = tree.n_nodes
    # taxon sets per node
    in_b = np.zeros(n_nodes, dtype=bool)
    for v in range(tree.n_taxa):
        in_b[v] = v in group_b
    only_b = in_b.copy()
    for v in tree.postorder():
        l, r = tree.children[v]
        only_b[v] = only_b[l] and only_b[r]
    seq = np.empty((n_nodes, n_sites), dtype=np.int64)
    seq[tree.root] = rng.choice(4, size=n_sites, p=pia)
    for v in list(tree.postorder())[::-1]:
        for c in tree.children[v]:
            c = int(c)
            q = qb if only_b[c] else qa
            P = expm(q * float(tree.blen[c]))
            P = np.clip(P, 0, None)
            P /= P.sum(1, keepdims=True)
            cdf = np.cumsum(P[seq[v]], axis=1)
            seq[c] = (rng.random(n_sites)[:, None] > cdf).sum(axis=1)
    chars = np.array(list("ACGT"))
    return ["".join(chars[seq[i]]) for i in range(tree.n_taxa)]


def test_whtest_heterogeneous_rejected():
    """One clade evolving under a very different process must inflate
    Delta and be rejected (the test's raison d'etre)."""
    a = create_dna_model("HKY")
    a.set_rate_param_vector(np.array([1.0]))
    a.state_freq = np.array([0.25, 0.25, 0.25, 0.25])
    b = create_dna_model("HKY")
    b.set_rate_param_vector(np.array([20.0]))
    b.state_freq = np.array([0.45, 0.3, 0.15, 0.1])

    rng = np.random.default_rng(9)
    tree = random_tree(10, rng)
    tree.blen = np.maximum(tree.blen, 0.05)
    # group_b: taxa in one real clade (children of some internal node)
    po = tree.postorder()
    group_b = None
    for v in po:
        taxa = [u for u in range(tree.n_taxa)]
        # collect subtree taxa of v
        stack, got = [int(v)], []
        while stack:
            u = stack.pop()
            if u < tree.n_taxa:
                got.append(u)
            else:
                stack.extend(int(c) for c in tree.children[u])
        if 3 <= len(got) <= 5:
            group_b = set(got)
            break
    assert group_b is not None
    seqs = _simulate_branch_het(tree, a, b, group_b, 1200, rng)
    het = Alignment.from_sequences([f"t{i}" for i in range(10)], seqs,
                                   "DNA")
    res = run_whtest(het, alpha=100.0, n_sim=60, seed=4, log=lambda s: None)
    assert res.rejected, (res.delta, res.delta_quantile, res.p_value)
