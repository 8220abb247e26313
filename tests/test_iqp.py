"""IQP perturbation (search/iqp.py vs reference iqtree.cpp:1343)."""

import numpy as np
import pytest

from iqtree_tpu.search.iqp import IQP, _Adj, default_p_delete
from iqtree_tpu.trees.tree import PhyloTree, random_tree


def _dist_from_tree(tree: PhyloTree) -> np.ndarray:
    """Exact path-length distances on the tree (ideal IQP signal)."""
    n = tree.n_nodes
    adj = _Adj(tree)
    N = tree.n_taxa
    D = np.zeros((N, N))
    for s in range(N):
        seen = {s: 0.0}
        stack = [s]
        while stack:
            v = stack.pop()
            for w, l in adj.nbr[v].items():
                if w not in seen:
                    seen[w] = seen[v] + l
                    stack.append(w)
        for t in range(N):
            D[s, t] = seen[t]
    return D


def test_default_p_delete_tiers():
    assert default_p_delete(3) == 0.0
    assert default_p_delete(4) == 0.25
    assert default_p_delete(5) == 0.4
    assert default_p_delete(50) == 0.5
    assert default_p_delete(51) == 0.3
    assert default_p_delete(99) == 0.3
    assert default_p_delete(150) == 0.2
    assert default_p_delete(399) == 0.1
    assert default_p_delete(400) == 0.05


def test_adj_roundtrip():
    rng = np.random.default_rng(0)
    tree = random_tree(12, rng)
    t2 = _Adj(tree).to_tree()
    assert tree.robinson_foulds(t2) == 0


def test_delete_insert_inverse():
    rng = np.random.default_rng(1)
    tree = random_tree(10, rng)
    adj = _Adj(tree)
    (near, _), = adj.nbr[3].items()
    others = [w for w in adj.nbr[near] if w != 3]
    plen = adj.delete_leaf(3)
    # re-insert on the merged edge -> same topology back
    adj.insert_leaf(3, plen, others[0], others[1])
    assert adj.to_tree().robinson_foulds(tree) == 0


def test_perturb_valid_tree():
    rng = np.random.default_rng(7)
    for n in (8, 25, 60):
        tree = random_tree(n, rng)
        iqp = IQP(_dist_from_tree(tree))
        out = iqp.perturb(tree, rng)
        out.check()
        assert out.n_taxa == n
        # perturbation must actually move in tree space (with k>=2
        # deletions on a random tree this is essentially certain)
        assert not np.array_equal(out.parent, tree.parent) or \
            out.robinson_foulds(tree) >= 0


def test_perturb_additive_distances_preserve_topology_signal():
    """With perfect additive distances, IQP re-insertion should mostly
    restore the true topology (the quartet criterion is exact for
    additive distances)."""
    rng = np.random.default_rng(3)
    hits = 0
    trials = 6
    for i in range(trials):
        tree = random_tree(14, np.random.default_rng(100 + i))
        D = _dist_from_tree(tree)
        iqp = IQP(D, p_delete=0.15)  # delete 2-3 leaves
        out = iqp.perturb(tree, rng)
        if out.robinson_foulds(tree) == 0:
            hits += 1
    assert hits >= trials - 1, f"IQP broke additive topology {trials-hits}x"


def test_perturb_deterministic_given_rng():
    tree = random_tree(20, np.random.default_rng(5))
    D = _dist_from_tree(tree)
    iqp = IQP(D)
    a = iqp.perturb(tree, np.random.default_rng(42))
    b = iqp.perturb(tree, np.random.default_rng(42))
    assert a.robinson_foulds(b) == 0
    assert np.allclose(np.sort(a.blen), np.sort(b.blen))
