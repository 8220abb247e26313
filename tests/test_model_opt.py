"""Model factory parsing + joint model/branch optimization golden test."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.likelihood import SiteData, TreeArrays
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.optimize import ModelOptimizer, optimize_model_and_branches
from iqtree_tpu.trees.tree import PhyloTree

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_parse_model_strings():
    aln = read_alignment(os.path.join(DATA, "example.phy"))
    s, r = parse_model_string("GTR+G4", aln)
    assert s.name == "GTR" and r.has_gamma and r.ncat == 4
    assert s.freq_type == "empirical"
    s, r = parse_model_string("HKY+I+G", aln)
    assert s.name == "HKY" and r.has_invar and r.has_gamma
    s, r = parse_model_string("JC", aln)
    assert s.name == "JC" and s.freq_type == "equal" and r.ncat == 1
    s, r = parse_model_string("GTR{1.5,2.0,0.8,1.2,3.0}+F{0.25,0.26,0.25,0.24}+G{0.5}", aln)
    assert s.fixed_rates and r.fix_alpha and r.alpha == 0.5
    np.testing.assert_allclose(s.group_rates, [1.0, 1.5, 2.0, 0.8, 1.2, 3.0])
    s, r = parse_model_string("TIM2+R3", aln)
    assert r.is_free_rate and r.ncat == 3


def test_parse_protein_model():
    aln = read_alignment(os.path.join(DATA, "prot_M126_27_269.phy"))
    assert aln.states.seq_type == "AA"
    s, r = parse_model_string("LG+G", aln)
    assert s.num_states == 20 and s.fixed_rates
    assert abs(s.state_freq.sum() - 1) < 1e-9
    s, _ = parse_model_string("WAG+F", aln)
    assert s.freq_type == "empirical"


def test_joint_optimization_golden():
    """Reference: -te golden_tree_44.nwk -m GTR+G (empirical freqs) gives
    lnL -13419.401, alpha 0.3882, rates [2.0135,3.0008,1.7630,1.9936,4.2605].
    Our joint optimizer must reach at least that lnL with close params."""
    aln = read_alignment(os.path.join(DATA, "example.phy"))
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, "golden_tree_44.nwk")).read(), aln.names
    )
    subst, rate = parse_model_string("GTR+G", aln)
    subst.state_freq = aln.state_frequencies()
    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    t_opt, params, lnl = optimize_model_and_branches(opt, ta, sd, tol=0.001)
    assert lnl >= -13419.401 - 0.05, lnl
    subst, rate = opt.unpack(params)
    # AC,AG,AT,CG,CT order is groups [1..5].  The (rates, alpha) surface
    # has a flat ridge: we reach a slightly *better* lnL than the
    # reference with slightly different parameters, so compare loosely.
    got = subst.group_rates[1:]
    want = np.array([2.0135, 3.0008, 1.7630, 1.9936, 4.2605])
    np.testing.assert_allclose(got, want, rtol=0.05)
    assert abs(rate.alpha - 0.3882) < 0.02
