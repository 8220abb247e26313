"""PD split networks + ILP + budgets + areas + GSS
(analysis/pdnetwork.py vs reference pdnetwork.h/gss.cpp)."""

import numpy as np
import pytest

from iqtree_tpu.analysis.pd import greedy_max_pd, pd_score
from iqtree_tpu.analysis.pdnetwork import (
    SplitSystem,
    max_pd_ilp,
    read_taxa_sets,
    run_gss,
)
from iqtree_tpu.trees.tree import random_tree


def test_split_system_pd_equals_tree_pd():
    rng = np.random.default_rng(0)
    tree = random_tree(10, rng)
    ss = SplitSystem.from_tree(tree)
    for seed in range(5):
        sub = np.random.default_rng(seed).choice(10, 4, replace=False)
        assert abs(ss.pd_of(sub) - pd_score(tree, sub)) < 1e-9


def test_ilp_matches_greedy_on_trees():
    """Greedy is provably optimal for max-PD on trees (Steel 2005) —
    the ILP must agree with it."""
    rng = np.random.default_rng(1)
    tree = random_tree(12, rng)
    ss = SplitSystem.from_tree(tree)
    g = greedy_max_pd(tree)
    for k in (3, 5, 8):
        sol = max_pd_ilp(ss, k=k)
        assert abs(sol.score - g.score(k)) < 1e-6, (k, sol.score, g.score(k))


def test_ilp_budget_mode():
    rng = np.random.default_rng(2)
    tree = random_tree(8, rng)
    ss = SplitSystem.from_tree(tree)
    costs = np.ones(8)
    costs[0] = 100.0  # taxon 0 unaffordable
    sol = max_pd_ilp(ss, costs=costs, budget=4.0)
    assert 0 not in sol.taxa
    assert len(sol.taxa) <= 4
    # must equal the best 4-subset PD excluding taxon 0
    import itertools

    best = max(
        ss.pd_of(s) for s in itertools.combinations(range(1, 8), 4)
    )
    assert abs(sol.score - best) < 1e-6


def test_ilp_initial_set():
    rng = np.random.default_rng(3)
    tree = random_tree(9, rng)
    ss = SplitSystem.from_tree(tree)
    sol = max_pd_ilp(ss, k=4, initial=[2, 5])
    assert 2 in sol.taxa and 5 in sol.taxa


def test_nexus_splits_roundtrip(tmp_path):
    path = tmp_path / "x.splits.nex"
    path.write_text(
        "#nexus\n"
        "BEGIN Taxa;\nDIMENSIONS ntax=4;\nTAXLABELS\n"
        "[1] 'a'\n[2] 'b'\n[3] 'c'\n[4] 'd'\n;\nEND; [Taxa]\n"
        "BEGIN Splits;\nDIMENSIONS ntax=4 nsplits=3;\n"
        "FORMAT labels=no weights=yes confidences=no intervals=no;\n"
        "MATRIX\n"
        "\t1.5\t 1,\n"
        "\t2.0\t 1 2,\n"
        "\t0.5\t 3,\n"
        ";\nEND; [Splits]\n"
    )
    ss = SplitSystem.from_nexus(str(path))
    assert ss.names == ["a", "b", "c", "d"]
    assert ss.n_splits == 3
    np.testing.assert_allclose(ss.weights, [1.5, 2.0, 0.5])
    # split {a,b}|{c,d} counts for {a,c} but not {a,b}
    assert ss.pd_of([0, 2]) == pytest.approx(1.5 + 2.0 + 0.5)
    assert ss.pd_of([0, 1]) == pytest.approx(1.5 + 0.0 + 0.0)


def test_area_mode():
    """PD over areas: choosing areas (taxon sets) instead of taxa."""
    rng = np.random.default_rng(4)
    tree = random_tree(8, rng)
    ss = SplitSystem.from_tree(tree)
    areas = np.zeros((3, 8), dtype=bool)
    areas[0, [0, 1, 2]] = True
    areas[1, [3, 4]] = True
    areas[2, [5, 6, 7]] = True
    sol = max_pd_ilp(ss, k=2, area_taxa=areas)
    assert len(sol.taxa) == 2
    # score equals PD of the union of the chosen areas' taxa
    taxa = np.where(areas[sol.taxa].any(axis=0))[0]
    assert abs(sol.score - ss.pd_of(taxa)) < 1e-6
    # and must be the best of the 3 pairs
    import itertools

    best = max(
        ss.pd_of(np.where(areas[list(pair)].any(axis=0))[0])
        for pair in itertools.combinations(range(3), 2)
    )
    assert abs(sol.score - best) < 1e-6


def test_gss(tmp_path):
    # network: a 4-taxon star tree over gene sets s1..s4
    net = tmp_path / "net.nwk"
    net.write_text("(s1:1.0,s2:2.0,s3:3.0,s4:0.5);\n")
    sets = tmp_path / "sets.txt"
    sets.write_text(
        "s1: g1 g2\ns2: g2 g3\ns3: g4\ns4: g1 g3 g4\n"
    )
    pvals = tmp_path / "pvals.txt"
    pvals.write_text("g1 0.9\ng2 0.1\ng3 0.5\ng4 0.8\n")
    sol = run_gss(str(net), str(sets), str(pvals), k=2,
                  out_prefix=str(tmp_path / "out"), log=lambda s: None)
    assert len(sol.taxa) == 2
    # best pair by hand: evaluate all pairs
    import itertools

    from iqtree_tpu.analysis.pdnetwork import _load_split_system

    ss = _load_split_system(str(net))
    genes = {"g1": 0.9, "g2": 0.1, "g3": 0.5, "g4": 0.8}
    members = {0: {"g1", "g2"}, 1: {"g2", "g3"}, 2: {"g4"},
               3: {"g1", "g3", "g4"}}
    def score(pair):
        cov = set().union(*(members[i] for i in pair))
        return ss.pd_of(list(pair)) + sum(genes[g] for g in cov)
    best = max(score(p) for p in itertools.combinations(range(4), 2))
    assert abs(sol.score - best) < 1e-6
    assert (tmp_path / "out.gss").exists()


def test_ecopd(tmp_path):
    """Viability: a high-PD predator can only be kept with its prey."""
    from iqtree_tpu.analysis.pdnetwork import run_ecopd

    # star tree: predator P has a huge pendant branch
    net = tmp_path / "eco.nwk"
    net.write_text("(P:10.0,a:1.0,b:1.0,c:0.2);\n")
    web = tmp_path / "web.txt"
    # P eats a and b; a, b, c are basal
    web.write_text(
        "4\n"
        "P 0 1 1 0\n"
        "a 0 0 0 0\n"
        "b 0 0 0 0\n"
        "c 0 0 0 0\n"
    )
    # k=2: P alone (with one basal) is viable -> {P, a} or {P, b}
    sol = run_ecopd(str(net), str(web), 2, str(tmp_path / "o"),
                    log=lambda s: None)
    assert "P" in sol.names and ("a" in sol.names or "b" in sol.names)

    # k=1: P is NOT viable alone; best single viable is a or b or c
    sol1 = run_ecopd(str(net), str(web), 1, str(tmp_path / "o1"),
                     log=lambda s: None)
    assert "P" not in sol1.names

    # weighted diet: P needs >= 60% of diet; a alone = 50% -> must take
    # both a and b with k=3
    web2 = tmp_path / "web2.txt"
    web2.write_text(
        "4\n"
        "P 0 0.5 0.5 0\n"
        "a 0 0 0 0\n"
        "b 0 0 0 0\n"
        "c 0 0 0 0\n"
    )
    sol2 = run_ecopd(str(net), str(web2), 3, str(tmp_path / "o2"),
                     diet_frac=0.6, log=lambda s: None)
    if "P" in sol2.names:
        assert "a" in sol2.names and "b" in sol2.names
