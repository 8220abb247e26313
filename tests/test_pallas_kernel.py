"""Fused Pallas pruning kernel vs the XLA engine (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.kernels.pruning import (
    device_slot_schedule,
    fused_compute_loglik,
)
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)

from test_derivatives import setup as _setup_arrays
from test_likelihood import make_setup


@pytest.mark.parametrize("pinv", [0.0, 0.2])
def test_fused_kernel_matches_engine(pinv):
    tree, aln, subst, rate = make_setup(
        seed=4, n_taxa=14, n_sites=500, model="GTR", gamma=4, pinv=pinv
    )
    ta = TreeArrays.from_tree(tree, jnp.float32)
    ma = ModelArrays.from_model(subst, rate, jnp.float32)
    sd = SiteData.from_alignment(aln, jnp.float32)
    want, want_pat = compute_loglik(ta, ma, sd)
    steps, n_slots = device_slot_schedule(tree, ta)
    got, got_pat = fused_compute_loglik(ta, ma, sd, steps, n_slots, tile=128)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6)
    np.testing.assert_allclose(
        np.asarray(got_pat), np.asarray(want_pat), rtol=2e-5, atol=1e-5
    )


def test_fused_path_in_optimizers():
    """fit_model_step and optimize_all_branches with a slot schedule must
    agree with the XLA path."""
    import jax

    from iqtree_tpu.engine.derivatives import optimize_all_branches
    from iqtree_tpu.io.alignment import read_alignment
    from iqtree_tpu.models.factory import parse_model_string
    from iqtree_tpu.models.optimize import ModelOptimizer, fit_model_step
    from iqtree_tpu.trees.tree import PhyloTree
    import os

    DATA = os.path.join(os.path.dirname(__file__), "data")
    aln = read_alignment(os.path.join(DATA, "example.phy"))
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, "golden_tree_44.nwk")).read(), aln.names
    )
    subst, rate = parse_model_string("GTR+G", aln)
    opt = ModelOptimizer(subst, rate, dtype=jnp.float32)
    ta = TreeArrays.from_tree(tree, jnp.float32)
    sd = SiteData.from_alignment(aln, jnp.float32)
    steps, n_slots = device_slot_schedule(tree, ta)

    p0 = opt.init_params()
    # compare the CONVERGED f32 fused fit against the f64 XLA optimum:
    # the f32 XLA path itself stalls early (pre-existing line-search
    # precision issue at -17522 vs the true -17296.8), while the fused
    # path reaches the optimum in f32
    opt64 = ModelOptimizer(subst, rate, dtype=jnp.float64)
    ta64 = TreeArrays.from_tree(tree, jnp.float64)
    sd64 = SiteData.from_alignment(aln, jnp.float64)
    _, lnl_true = fit_model_step(opt64, ta64, sd64, opt64.init_params(),
                                 max_iters=100)
    _, lnl_fused = fit_model_step(
        opt, ta, sd, p0, max_iters=60, steps=jnp.asarray(steps),
        n_slots=n_slots
    )
    assert float(lnl_fused) >= float(lnl_true) - 2.0, (
        float(lnl_true), float(lnl_fused)
    )

    ma = opt.build(p0)
    _, b_xla = optimize_all_branches(ta, ma, sd, n_sweeps=3)
    _, b_fused = optimize_all_branches(
        ta, ma, sd, n_sweeps=3, steps=jnp.asarray(steps), n_slots=n_slots
    )
    assert abs(float(b_xla) - float(b_fused)) < 0.5, (
        float(b_xla), float(b_fused)
    )


def test_packed_schedule_parity():
    """Pack-4 group schedule (schedule.packed_slot_schedule): forward,
    custom-VJP gradient, and fused Newton derivatives must equal the
    sequential pack-1 schedule bit-for-bit (interpret mode)."""
    import jax

    from iqtree_tpu.engine.grad import loglik_fused_fn
    from iqtree_tpu.engine.kernels.cs_kernels import fused_newton_derivs
    from iqtree_tpu.engine.kernels.pruning import schedule_pack
    from iqtree_tpu.engine.likelihood import tip_partials
    from iqtree_tpu.engine.nni import _ptn_invar

    tree, aln, subst, rate = make_setup(
        seed=9, n_taxa=21, n_sites=400, model="GTR", gamma=4, pinv=0.0
    )
    ta = TreeArrays.from_tree(tree, jnp.float32)
    ma = ModelArrays.from_model(subst, rate, jnp.float32)
    sd = SiteData.from_alignment(aln, jnp.float32)
    assert schedule_pack(4, 4) == 4
    s1, ns1 = device_slot_schedule(tree, ta, pack=1)
    s4, ns4 = device_slot_schedule(tree, ta, pack=4)
    assert s4.shape[0] > s1.shape[0] and s4.shape[0] % 4 == 0
    assert int(s4[-1, 5]) == int(s1[-1, 5])  # root step last

    l1, p1 = fused_compute_loglik(ta, ma, sd, jnp.asarray(s1), ns1)
    l4, p4 = fused_compute_loglik(ta, ma, sd, jnp.asarray(s4), ns4)
    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(p4), np.asarray(p1), atol=1e-6)

    def grad_blen(f, s):
        def neg(b):
            return -f(ta.with_blen(b), ma, sd, jnp.asarray(s))[0]
        return jax.grad(neg)(ta.blen)

    g1 = grad_blen(loglik_fused_fn(ns1), s1)
    g4 = grad_blen(loglik_fused_fn(ns4), s4)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)

    tips = tip_partials(sd, ma.ncat)
    pi = _ptn_invar(ma, sd)
    d1a, d2a = fused_newton_derivs(jnp.asarray(s1), ns1, ma, ta.blen,
                                   tips, sd.pattern_freq, pi)
    d1b, d2b = fused_newton_derivs(jnp.asarray(s4), ns4, ma, ta.blen,
                                   tips, sd.pattern_freq, pi)
    np.testing.assert_allclose(np.asarray(d1b), np.asarray(d1a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2b), np.asarray(d2a),
                               rtol=1e-5, atol=1e-6)
