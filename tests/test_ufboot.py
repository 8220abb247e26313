"""UFBoot: RELL rescoring, split counting, consensus, supports."""

import numpy as np
import jax.numpy as jnp

from iqtree_tpu.search.driver import SearchParams, run_search
from iqtree_tpu.trees.splits import (
    SplitCounter,
    consensus_tree,
    map_supports,
    splits_compatible,
    tree_splits,
)
from iqtree_tpu.trees.tree import PhyloTree, random_tree

from test_search import _simulate


def test_split_machinery():
    rng = np.random.default_rng(0)
    t1 = random_tree(8, rng)
    t2 = t1.copy()
    v = int(t2.internal_edges()[0])
    t2.apply_nni(v, 0)
    c = SplitCounter(8)
    c.add_tree(t1)
    c.add_tree(t1)
    c.add_tree(t2)
    # splits of t1 should mostly have support 1.0, the NNI-broken one 2/3
    sups = [c.support(s) for s in tree_splits(t1)]
    assert max(sups) == 1.0 and min(sups) >= 2.0 / 3.0 - 1e-9
    cons, _ = consensus_tree(c)
    cons.check()
    assert cons.n_taxa == 8
    # consensus of majority splits must equal t1's topology here
    assert cons.robinson_foulds(t1) == 0
    labels = map_supports(t1, c)
    assert all(0 <= int(v) <= 100 for v in labels.values())


def test_ufboot_search():
    true_tree, aln = _simulate(n_taxa=8, n_sites=400, seed=5)
    p = SearchParams(
        model="JC",
        seed=3,
        fixed_iterations=3,
        n_init_trees=4,
        n_top_init=2,
        ufboot=100,
        log=lambda s: None,
    )
    res = run_search(aln, p)
    uf = res.ufboot
    assert uf is not None
    assert (uf.boot_tree_id >= 0).all(), "every sample must have a tree"
    sup = uf.supports_for(res.best_tree)
    assert len(sup) == aln.n_taxa - 3
    assert all(0 <= int(v) <= 100 for v in sup.values())
    # strong signal -> most supports should be high
    vals = np.array([int(v) for v in sup.values()])
    assert np.median(vals) >= 50
    cons = uf.consensus()
    cons.check()
