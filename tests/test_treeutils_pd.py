"""Tree utilities (consensus/RF/random trees) and the PD suite."""

import numpy as np
import pytest

from iqtree_tpu.analysis.pd import (
    greedy_max_pd,
    min_pd_order,
    pd_score,
    run_pd_analysis,
)
from iqtree_tpu.analysis.treeutils import (
    generate_random_tree,
    read_trees,
    run_consensus,
    run_rf_distance,
)
from iqtree_tpu.trees.tree import PhyloTree, random_tree


def test_random_tree_modes():
    rng = np.random.default_rng(0)
    for mode in ["yule", "uniform", "caterpillar", "balanced", "star"]:
        t = generate_random_tree(12, rng, mode)
        t.check()
        assert t.n_taxa == 12


def test_read_trees_and_consensus(tmp_path):
    rng = np.random.default_rng(1)
    base = random_tree(10, rng)
    trees = [base.copy() for _ in range(8)]
    # a couple of perturbed trees; majority should match base
    for t in trees[6:]:
        edges = t.internal_edges()
        t.apply_nni(int(edges[0]), 0)
    names = [f"t{i}" for i in range(10)]
    f = tmp_path / "trees.nwk"
    f.write_text("\n".join(t.to_newick(names) for t in trees) + "\n")
    trees2, names2 = read_trees(str(f))
    assert len(trees2) == 8
    cons = run_consensus(str(f), str(tmp_path / "out"), log=lambda s: None)
    assert cons.robinson_foulds(base) == 0


def test_rf_distance(tmp_path):
    rng = np.random.default_rng(2)
    a = random_tree(12, rng)
    b = a.copy()
    edges = b.internal_edges()
    b.apply_nni(int(edges[2]), 1)
    names = [f"t{i}" for i in range(12)]
    f = tmp_path / "two.nwk"
    f.write_text(a.to_newick(names) + "\n" + b.to_newick(names) + "\n")
    d = run_rf_distance(str(f), str(tmp_path / "rf"), log=lambda s: None)
    assert d.shape == (2, 2)
    assert d[0, 1] == a.robinson_foulds(b) > 0
    assert d[0, 0] == 0


def test_pd_score_bruteforce():
    rng = np.random.default_rng(3)
    tree = random_tree(8, rng)
    # PD of all taxa = total branch length (minus the pinned root edge)
    total = float(tree.blen.sum() - tree.blen[tree.root])
    assert pd_score(tree, range(8)) == pytest.approx(total)
    # PD of pair = path length between the two leaves
    # brute force path length via adjacency walk
    from iqtree_tpu.analysis.pd import _undirected_adj

    adj = _undirected_adj(tree)

    def dist(a, b):
        import heapq

        d = {a: 0.0}
        h = [(0.0, a)]
        while h:
            dv, v = heapq.heappop(h)
            if v == b:
                return dv
            for u, l in adj[v]:
                nd = dv + l
                if nd < d.get(u, np.inf):
                    d[u] = nd
                    heapq.heappush(h, (nd, u))
        return np.inf

    for (x, y) in [(0, 3), (2, 7), (4, 5)]:
        assert pd_score(tree, [x, y]) == pytest.approx(dist(x, y))


def test_greedy_pd_optimal_small():
    """Greedy max-PD is optimal on trees; verify against brute force."""
    from itertools import combinations

    rng = np.random.default_rng(4)
    tree = random_tree(9, rng)
    res = greedy_max_pd(tree)
    for k in [2, 3, 4]:
        best = max(
            pd_score(tree, c) for c in combinations(range(9), k)
        )
        assert res.score(k) == pytest.approx(best, rel=1e-9), k
        assert pd_score(tree, res.subset(k)) == pytest.approx(res.score(k))


def test_min_pd_order():
    rng = np.random.default_rng(5)
    tree = random_tree(10, rng)
    order = min_pd_order(tree)
    assert len(order) == 8  # stops at 2 remaining
    assert len(set(order)) == 8


def test_run_pd_analysis(tmp_path):
    rng = np.random.default_rng(6)
    tree = random_tree(12, rng)
    names = [f"t{i}" for i in range(12)]
    f = tmp_path / "t.nwk"
    f.write_text(tree.to_newick(names) + "\n")
    res = run_pd_analysis(str(f), str(tmp_path / "pd"), k=5,
                          log=lambda s: None)
    out = (tmp_path / "pd.pda").read_text()
    assert "k = 5" in out
    assert res.score(5) > res.score(3)


def test_consensus_network(tmp_path):
    """-net: all above-cutoff splits, parseable by the SplitSystem
    reader, supports consistent with SplitCounter."""
    import numpy as np

    from iqtree_tpu.analysis.pdnetwork import SplitSystem
    from iqtree_tpu.analysis.treeutils import run_consensus_network
    from iqtree_tpu.trees.splits import SplitCounter, tree_splits
    from iqtree_tpu.trees.tree import random_tree

    names = [f"t{i}" for i in range(8)]
    trees = [random_tree(8, np.random.default_rng(s)) for s in range(5)]
    f = tmp_path / "trees.nwk"
    f.write_text("".join(t.to_newick(names) + "\n" for t in trees))
    run_consensus_network(str(f), str(tmp_path / "net"), log=lambda s: None)
    ss = SplitSystem.from_nexus(str(tmp_path / "net.nex"))
    assert ss.names == names
    counter = SplitCounter(8)
    for t in trees:
        counter.add_tree(t)
    # every non-trivial split in the file carries its true support
    for k in range(ss.n_splits):
        side = frozenset(np.where(ss.sides[k])[0].tolist())
        if len(side) in (1, 7):
            assert ss.weights[k] == 1.0
            continue
        canon = side if 0 in side else frozenset(range(8)) - side
        assert abs(ss.weights[k] - counter.support(canon)) < 1e-6
