"""UNREST non-reversible model (models/nonrev.py vs reference
modelnonrev.cpp)."""

import numpy as np
import jax.numpy as jnp
import pytest

from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.nonrev import NonRevModel, nonrev_qmat
from iqtree_tpu.models.optimize import (
    ModelOptimizer,
    optimize_model_and_branches,
)
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.trees.tree import random_tree

from test_likelihood import brute_force_lnl, device_lnl, make_setup


def test_qmat_stationary_and_normalized():
    rng = np.random.default_rng(0)
    r = rng.uniform(0.3, 3.0, 12)
    q, pi = nonrev_qmat(jnp.asarray(r))
    q, pi = np.asarray(q), np.asarray(pi)
    assert np.abs(q.sum(1)).max() < 1e-6
    assert np.abs(pi @ q).max() < 1e-6  # stationarity
    assert abs(-(pi * np.diag(q)).sum() - 1.0) < 1e-6  # mean rate 1
    assert abs(pi.sum() - 1.0) < 1e-7


def test_unrest_equal_rates_is_jc():
    tree, aln, _, rate = make_setup(model="JC", gamma=4)
    jc = create_dna_model("JC")
    lnl_jc, pat_jc = device_lnl(tree, aln, jc, rate)
    un = NonRevModel()
    lnl_un, pat_un = device_lnl(tree, aln, un, rate)
    assert abs(lnl_jc - lnl_un) < 1e-6
    np.testing.assert_allclose(pat_jc, pat_un, atol=1e-8)


def test_unrest_brute_force_parity():
    tree, aln, _, rate = make_setup(n_taxa=5, n_sites=10, gamma=2)
    rng = np.random.default_rng(3)
    un = NonRevModel(nr_rates=np.append(rng.uniform(0.3, 3.0, 11), 1.0))
    ref, ref_pat = brute_force_lnl(tree, aln, un, rate)
    got, got_pat = device_lnl(tree, aln, un, rate)
    assert abs(ref - got) < 1e-8, (ref, got)
    np.testing.assert_allclose(ref_pat, got_pat, atol=1e-8)


def test_unrest_parse_and_optimize():
    rng = np.random.default_rng(11)
    # simulate under an asymmetric process so UNREST has signal
    from iqtree_tpu.utils.simulate import simulate_alignment

    true = NonRevModel(
        nr_rates=np.array([2.5, 1.0, 0.4, 1.0, 1.0, 3.0,
                           0.5, 1.0, 1.0, 1.0, 0.8, 1.0])
    )
    tree = random_tree(12, rng)
    seqs = simulate_alignment(tree, true, RateModel.make(), 2000, rng)
    aln = Alignment.from_sequences(
        [f"t{i}" for i in range(12)], seqs, "DNA"
    )

    subst, rate = parse_model_string("UNREST", aln)
    assert isinstance(subst, NonRevModel)
    assert subst.df == 11

    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    site = SiteData.from_alignment(aln, jnp.float64)

    lnl0, _ = compute_loglik(ta, opt.build(opt.init_params()), site)
    ta2, params, lnl = optimize_model_and_branches(opt, ta, site)
    assert lnl > float(lnl0) + 1.0

    # UNREST must also beat JC on asymmetric data
    jc, rate_jc = parse_model_string("JC", aln)
    opt_jc = ModelOptimizer(jc, rate_jc, dtype=jnp.float64)
    _, _, lnl_jc = optimize_model_and_branches(opt_jc, ta, site)
    assert lnl > lnl_jc

    s2, _ = opt.unpack(params)
    assert s2.nr_rates[-1] == 1.0
    assert s2.state_freq is not None and abs(s2.state_freq.sum() - 1) < 1e-6


def test_unrest_with_gamma_parse():
    tree, aln, _, _ = make_setup(n_taxa=5, n_sites=10)
    subst, rate = parse_model_string("UNREST+G4", aln)
    assert isinstance(subst, NonRevModel)
    assert rate.ncat == 4
    lnl, _ = device_lnl(tree, aln, subst, rate)
    assert np.isfinite(lnl)
