"""Fitch parsimony + stepwise addition (engine/parsimony.py) vs a
brute-force reference implementation."""

import numpy as np
import pytest

from iqtree_tpu.engine.parsimony import (
    parsimony_score,
    parsimony_stepwise_tree,
)
from iqtree_tpu.io.alignment import Alignment, read_alignment
from iqtree_tpu.trees.tree import PhyloTree, random_tree


def brute_fitch(tree: PhyloTree, aln: Alignment) -> float:
    """Set-based Fitch, rooted at the virtual root (rooting-invariant)."""
    code_masks = np.asarray(aln.states.code_masks) > 0
    sets = {}
    total = 0.0
    for t in range(aln.n_taxa):
        sets[t] = code_masks[aln.patterns[t]]  # [P, S] bool
    steps = np.zeros(aln.n_patterns)
    for v in tree.postorder():
        l, r = tree.children[v]
        inter = sets[int(l)] & sets[int(r)]
        empty = ~inter.any(axis=1)
        out = np.where(empty[:, None], sets[int(l)] | sets[int(r)], inter)
        steps += empty
        sets[int(v)] = out
    return float((steps * aln.pattern_freq).sum())


@pytest.fixture(scope="module")
def example_aln():
    return read_alignment("tests/data/example.phy")


def test_fitch_matches_bruteforce_random(example_aln):
    rng = np.random.default_rng(7)
    for seed in range(3):
        tree = random_tree(example_aln.n_taxa, np.random.default_rng(seed))
        assert parsimony_score(tree, example_aln) == pytest.approx(
            brute_fitch(tree, example_aln)
        )


def test_fitch_protein():
    aln = read_alignment("tests/data/prot_M126_27_269.phy")
    tree = random_tree(aln.n_taxa, np.random.default_rng(0))
    assert parsimony_score(tree, aln) == pytest.approx(brute_fitch(tree, aln))


def test_stepwise_addition_beats_random(example_aln):
    rng = np.random.default_rng(11)
    sw = parsimony_stepwise_tree(example_aln, rng)
    sw.check()
    sw_score = parsimony_score(sw, example_aln)
    rand_scores = [
        parsimony_score(
            random_tree(example_aln.n_taxa, np.random.default_rng(s)),
            example_aln,
        )
        for s in range(5)
    ]
    assert sw_score == brute_fitch(sw, example_aln)
    assert sw_score < min(rand_scores), (sw_score, rand_scores)


def test_stepwise_insertion_cost_is_exactish(example_aln):
    """The directed-union insertion rule must reproduce the true Fitch
    delta for single-leaf attachment on small cases."""
    rng = np.random.default_rng(3)
    small = Alignment.from_sequences(
        [f"t{i}" for i in range(6)],
        ["ACGTAC", "ACGAAC", "TCGTAA", "TTGTAA", "ACCTGC", "TCCTGA"],
        "DNA",
    )
    sw = parsimony_stepwise_tree(small, rng)
    sw.check()
    assert parsimony_score(sw, small) == brute_fitch(sw, small)
