"""Standard bootstrap: resampled pattern weights, consensus, supports."""

import numpy as np

from iqtree_tpu.search.driver import SearchParams, run_search
from iqtree_tpu.trees.splits import SplitCounter, consensus_tree, map_supports

from test_search import _simulate


def test_standard_bootstrap_replicates():
    true_tree, aln = _simulate(n_taxa=7, n_sites=400, seed=9)
    rng = np.random.default_rng(0)
    counter = SplitCounter(aln.n_taxa)
    for b in range(3):
        freqs = aln.bootstrap_pattern_freq(rng)
        assert freqs.sum() == aln.n_sites
        sp = SearchParams(
            model="JC",
            seed=b,
            fixed_iterations=1,
            n_init_trees=2,
            n_top_init=1,
            log=lambda s: None,
            pattern_freq=freqs,
        )
        r = run_search(aln, sp)
        assert np.isfinite(r.best_lnl)
        counter.add_tree(r.best_tree)
    cons, _ = consensus_tree(counter)
    cons.check()
    sup = map_supports(cons, counter)
    assert all(0 <= int(v) <= 100 for v in sup.values())
