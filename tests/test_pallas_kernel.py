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
