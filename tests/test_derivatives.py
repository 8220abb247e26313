"""Outside pass, theta-buffer derivatives, batched branch Newton."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.derivatives import (
    all_passes,
    branch_lnl_derivs,
    compute_thetas,
    optimize_all_branches,
    optimize_branch_mask,
)
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.trees.tree import PhyloTree, random_tree

DATA = os.path.join(os.path.dirname(__file__), "data")


def setup(n_taxa=10, seed=0, pinv=0.0):
    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGT-"), 80)) for _ in range(n_taxa)]
    names = [f"t{i}" for i in range(n_taxa)]
    from iqtree_tpu.io.alignment import Alignment

    aln = Alignment.from_sequences(names, seqs, "DNA")
    subst = create_dna_model("GTR")
    subst.state_freq = aln.state_frequencies()
    subst.set_rate_param_vector(rng.uniform(0.5, 3.0, 5))
    rate = RateModel.make(gamma_cats=4, invar=pinv > 0, p_invar=pinv, alpha=0.9)
    tree = random_tree(n_taxa, rng)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    return ta, ma, sd


def test_branch_lnl_consistency():
    """Theta-based lnL for every branch equals the pruning lnL."""
    ta, ma, sd = setup(pinv=0.15)
    lnl_ref, _ = compute_loglik(ta, ma, sd)
    up, us, out, os_, trans = all_passes(ta, ma, sd)
    theta = compute_thetas(ta, ma, sd, up, us, out, os_)
    lnl_all, d1, d2 = branch_lnl_derivs(theta, ma, sd, ta.blen)
    mask = np.asarray(optimize_branch_mask(ta))
    np.testing.assert_allclose(
        np.asarray(lnl_all)[mask], float(lnl_ref), rtol=1e-9
    )


def test_derivatives_match_finite_differences():
    ta, ma, sd = setup(pinv=0.1)
    up, us, out, os_, trans = all_passes(ta, ma, sd)
    theta = compute_thetas(ta, ma, sd, up, us, out, os_)
    _, d1, d2 = branch_lnl_derivs(theta, ma, sd, ta.blen)

    def lnl_fn(blen):
        lnl, _ = compute_loglik(ta.with_blen(blen), ma, sd)
        return float(lnl)

    # central finite differences per branch (f64): the independent check
    # (reverse-mode AD through the dynamic-length pruning loop is not
    # available; the custom VJP is the production gradient path)
    mask = np.asarray(optimize_branch_mask(ta))
    blen0 = np.asarray(ta.blen)
    eps = 1e-6
    for v in np.nonzero(mask)[0][::3]:
        bp = blen0.copy(); bp[v] += eps
        bm = blen0.copy(); bm[v] -= eps
        fp, fm, f0 = lnl_fn(bp), lnl_fn(bm), lnl_fn(blen0)
        g_fd = (fp - fm) / (2 * eps)
        h_fd = (fp - 2 * f0 + fm) / eps**2
        np.testing.assert_allclose(float(d1[v]), g_fd, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(float(d2[v]), h_fd, rtol=2e-2, atol=2e-1)


def test_optimize_all_branches_improves():
    ta, ma, sd = setup(n_taxa=12, seed=5)
    lnl0, _ = compute_loglik(ta, ma, sd)
    t_opt, lnl = jax.jit(optimize_all_branches, static_argnames=())(ta, ma, sd)
    assert float(lnl) > float(lnl0) + 1.0
    # gradient at optimum ~ 0 for interior branches
    up, us, out, os_, _ = all_passes(t_opt, ma, sd)
    theta = compute_thetas(t_opt, ma, sd, up, us, out, os_)
    _, d1, _ = branch_lnl_derivs(theta, ma, sd, t_opt.blen)
    mask = np.asarray(optimize_branch_mask(ta))
    blen = np.asarray(t_opt.blen)
    interior = mask & (blen > 2e-6) & (blen < 99.0)
    assert np.max(np.abs(np.asarray(d1)[interior])) < 0.5


def test_golden_branch_opt():
    """Reference: iqtree-omp -te golden_tree_44.nwk with fixed GTR+G model
    optimizes branch lengths to lnL -13448.8386446 (.ckp.gz)."""
    aln = read_alignment(os.path.join(DATA, "example.phy"))
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, "golden_tree_44.nwk")).read(), aln.names
    )
    subst = create_dna_model("GTR")
    subst.group_rates = np.array([1.0, 1.5, 2.0, 0.8, 1.2, 3.0])
    subst.state_freq = np.array([0.25, 0.26, 0.25, 0.24])
    rate = RateModel.make(gamma_cats=4, alpha=0.5)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    t_opt, lnl = jax.jit(optimize_all_branches)(ta, ma, sd)
    assert float(lnl) >= -13448.8386446 - 0.05, float(lnl)


def test_wide_cs_newton_matches_theta_path():
    """Round-5 wide-CS (protein, C*S_pad=96) streaming Newton reverse
    sweep vs the theta-buffer derivatives: same d1/d2 on every free
    branch (the DNA-class kernel is covered by test_fused_nni)."""
    from iqtree_tpu.engine.derivatives import (
        branch_lnl_derivs,
        compute_thetas,
        fused_all_passes,
        optimize_branch_mask,
    )
    from iqtree_tpu.engine.kernels.cs_kernels import (
        fused_newton_derivs,
        newton_kernel_serves,
    )
    from iqtree_tpu.engine.kernels.pruning import device_slot_schedule
    from iqtree_tpu.engine.likelihood import tip_partials
    from iqtree_tpu.engine.nni import _ptn_invar
    from iqtree_tpu.io.alignment import Alignment
    from iqtree_tpu.models.protein import create_protein_model

    rng = np.random.default_rng(5)
    chars = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(chars), 80)) for _ in range(8)]
    aln = Alignment.from_sequences([f"t{i}" for i in range(8)], seqs, "AA")
    subst = create_protein_model("LG")
    rate = RateModel.make(gamma_cats=4, alpha=0.8, invar=True, p_invar=0.1)
    tree = random_tree(8, rng)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    assert newton_kernel_serves(ma.ncat, ma.num_states)
    steps, n_slots = device_slot_schedule(tree, ta)
    steps = jnp.asarray(steps)
    tips = tip_partials(sd, ma.ncat)

    up, usc, out, osc, trans, site_p = fused_all_passes(
        ta, ma, sd, steps, n_slots)
    th = compute_thetas(ta, ma, site_p, up, usc, out, osc)
    _, d1t, d2t = branch_lnl_derivs(th, ma, site_p, ta.blen)
    d1k, d2k = fused_newton_derivs(steps, n_slots, ma, ta.blen, tips,
                                   sd.pattern_freq, _ptn_invar(ma, sd))
    n = ta.blen.shape[0]
    mask = np.asarray(optimize_branch_mask(ta))
    np.testing.assert_allclose(np.asarray(d1k)[:n][mask],
                               np.asarray(d1t)[:n][mask],
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(d2k)[:n][mask],
                               np.asarray(d2t)[:n][mask],
                               rtol=1e-8, atol=1e-8)
