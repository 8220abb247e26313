"""Binary / morphology model selection (phylotesting.cpp:41-45 lists)."""

import numpy as np
import jax.numpy as jnp

from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.search.model_select import run_model_selection
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.utils.simulate import simulate_alignment


def test_binary_selection():
    rng = np.random.default_rng(0)
    tree = random_tree(8, rng)
    subst, _ = parse_model_string("JC2", Alignment.from_sequences(
        ["a", "b"], ["01", "10"], "BIN"))
    seqs = simulate_alignment(tree, subst, RateModel.make(), 300, rng)
    aln = Alignment.from_sequences([f"t{i}" for i in range(8)], seqs, "BIN")
    best, table = run_model_selection(
        aln, dtype=jnp.float64, log=lambda s: None, rate_classes=[""])[:2]
    assert best in ("JC2", "GTR2")
    assert "GTR2" in table and "JC2" in table


def test_morphology_mk_vs_ordered():
    """Data simulated under MK on short branches must prefer MK; under
    ORDERED must prefer ORDERED."""
    rng = np.random.default_rng(1)
    tree = random_tree(8, rng)
    tree.blen = np.minimum(tree.blen, 0.3)
    dummy = Alignment.from_sequences(["a", "b"], ["012", "210"], "MORPH",
                                     num_states=3)
    mk, _ = parse_model_string("MK", dummy)
    seqs = simulate_alignment(tree, mk, RateModel.make(), 500, rng)
    aln = Alignment.from_sequences([f"t{i}" for i in range(8)], seqs,
                                   "MORPH", num_states=3)
    best, _ = run_model_selection(
        aln, dtype=jnp.float64, log=lambda s: None, rate_classes=[""])[:2]
    assert best == "MK", best

    ordered, _ = parse_model_string("ORDERED", dummy)
    seqs = simulate_alignment(tree, ordered, RateModel.make(), 500, rng)
    aln = Alignment.from_sequences([f"t{i}" for i in range(8)], seqs,
                                   "MORPH", num_states=3)
    best, _ = run_model_selection(
        aln, dtype=jnp.float64, log=lambda s: None, rate_classes=[""])[:2]
    assert best == "ORDERED", best
