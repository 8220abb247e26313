"""Fused store-sweep NNI engine vs the XLA mailbox engine.

Round-4 coverage: the downward (outside) store kernels
(cs_kernels._kernel_down_store_cs, pruning._kernel_down_store) must
reproduce the XLA downward_pass outside partials exactly, and
evaluate_nnis on the fused path must rank/score NNI candidates like the
mailbox path.  Kernels run in interpret mode on CPU (conftest pins the
platform); the same code compiles with Mosaic on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iqtree_tpu.engine.derivatives import all_passes, optimize_all_branches
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    branch_transition_mats,
    tip_partials,
)
from iqtree_tpu.engine.nni import evaluate_nnis
from iqtree_tpu.engine.kernels.pruning import (
    device_slot_schedule,
    schedule_pack,
)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.trees.tree import PhyloTree, random_tree


def _workload(n_taxa=14, n_sites=83, model="GTR+G", seed=7, dtype=jnp.float32,
              seqtype="DNA"):
    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng, mean_blen=0.12)
    from iqtree_tpu.utils.simulate import simulate_alignment

    subst, rate = None, None
    names = [f"t{i}" for i in range(n_taxa)]
    if seqtype == "DNA":
        from iqtree_tpu.models.dna import create_dna_model
        from iqtree_tpu.models.rates import RateModel

        s = create_dna_model("GTR")
        s.group_rates = np.array([1.0, 2.1, 0.7, 1.3, 3.0, 1.0])
        r = RateModel.make(gamma_cats=4, alpha=0.8)
        seqs = simulate_alignment(tree, s, r, n_sites, rng)
        aln = Alignment.from_sequences(names, seqs, "DNA")
    else:
        from iqtree_tpu.models.protein import create_protein_model
        from iqtree_tpu.models.rates import RateModel

        s = create_protein_model("LG")
        r = RateModel.make(gamma_cats=4, alpha=0.9)
        seqs = simulate_alignment(tree, s, r, n_sites, rng)
        aln = Alignment.from_sequences(names, seqs, "AA")
    subst, rate = parse_model_string(model, aln)
    ma = ModelArrays.from_model(subst, rate, dtype)
    site = SiteData.from_alignment(aln, dtype)
    ta = TreeArrays.from_tree(tree, dtype)
    return tree, ta, ma, site


def _fused_passes(tree, ta, ma, site, pack):
    steps, n_slots = device_slot_schedule(tree, ta, pack=pack)
    steps = jnp.asarray(steps)
    trans = branch_transition_mats(ma, ta.blen)
    tips = tip_partials(site, ma.ncat)
    C, S = ma.ncat, ma.num_states
    from iqtree_tpu.engine.kernels.pruning import _cs_packable

    if _cs_packable(C, S):
        from iqtree_tpu.engine.kernels.cs_kernels import fused_nni_passes_cs

        up, usc, out, osc = fused_nni_passes_cs(
            steps, n_slots, trans, tips, ma.props, ma.state_freq)
        n = up.shape[0]
        up = up.reshape(n, C, S, -1)
        out = out.reshape(n, C, S, -1)
    else:
        from iqtree_tpu.engine.kernels.pruning import fused_nni_passes_general

        up, usc, out, osc = fused_nni_passes_general(
            steps, n_slots, trans, tips, ma.props, ma.state_freq)
    return steps, n_slots, up, usc, out, osc


@pytest.mark.parametrize("seqtype,model,packed", [
    ("DNA", "GTR+G", False),
    ("DNA", "GTR+G", True),
    ("DNA", "HKY+I+G", True),
    ("AA", "LG+G", False),
])
def test_fused_passes_match_xla(seqtype, model, packed):
    tree, ta, ma, site = _workload(model=model, seqtype=seqtype)
    pack = schedule_pack(ma.ncat, ma.num_states) if packed else 1
    if packed and pack == 1:
        pytest.skip("shape not packable")
    steps, n_slots, up, usc, out, osc = _fused_passes(tree, ta, ma, site, pack)
    up_x, usc_x, out_x, osc_x, _ = all_passes(ta, ma, site)
    P = site.tip_codes.shape[1]
    n = ta.n_slots  # 2N rows incl. dummy
    root = ta.root
    for v in range(n - 1):
        np.testing.assert_allclose(
            np.asarray(up[v, ..., :P]), np.asarray(up_x[v]),
            rtol=2e-5, atol=2e-6, err_msg=f"up node {v}")
        np.testing.assert_allclose(
            np.asarray(usc[v, :P]), np.asarray(usc_x[v]),
            rtol=2e-5, atol=2e-5, err_msg=f"usc node {v}")
        if v == root:
            continue  # fused path never writes the root's outside row
        np.testing.assert_allclose(
            np.asarray(out[v, ..., :P]), np.asarray(out_x[v]),
            rtol=2e-5, atol=2e-6, err_msg=f"out node {v}")
        np.testing.assert_allclose(
            np.asarray(osc[v, :P]), np.asarray(osc_x[v]),
            rtol=2e-5, atol=2e-5, err_msg=f"osc node {v}")


@pytest.mark.parametrize("seqtype,model", [
    ("DNA", "GTR+G"),
    ("AA", "LG+G"),
])
def test_fused_evaluate_nnis_matches(seqtype, model):
    tree, ta, ma, site = _workload(model=model, seqtype=seqtype)
    pack = schedule_pack(ma.ncat, ma.num_states)
    steps, n_slots = device_slot_schedule(tree, ta, pack=pack)
    steps = jnp.asarray(steps)
    edges = tree.internal_edges()
    edges_dev = jnp.asarray(np.asarray(ta.h2d)[edges])
    ev_x = evaluate_nnis(ta, ma, site, edges_dev)
    ev_f = evaluate_nnis(ta, ma, site, edges_dev, steps=steps,
                         n_slots=n_slots)
    np.testing.assert_allclose(float(ev_f.cur_lnl), float(ev_x.cur_lnl),
                               rtol=1e-6)
    # engine-parity bound, not optimality: the two engines feed the
    # same local machinery f32 messages with different rounding, and
    # one local round (the reference's effort) smooths less than the
    # old two, so the per-candidate scores agree to ~0.1 lnL
    np.testing.assert_allclose(np.asarray(ev_f.lnl), np.asarray(ev_x.lnl),
                               rtol=1e-6, atol=0.1)
    np.testing.assert_allclose(
        np.asarray(ev_f.center_blen), np.asarray(ev_x.center_blen),
        rtol=1e-4, atol=1e-6)


def test_fused_optimize_all_branches_matches():
    tree, ta, ma, site = _workload()
    pack = schedule_pack(ma.ncat, ma.num_states)
    steps, n_slots = device_slot_schedule(tree, ta, pack=pack)
    steps = jnp.asarray(steps)
    ta_x, lnl_x = optimize_all_branches(ta, ma, site, n_sweeps=20)
    ta_f, lnl_f = optimize_all_branches(ta, ma, site, n_sweeps=20,
                                        steps=steps, n_slots=n_slots)
    assert abs(float(lnl_f) - float(lnl_x)) < 0.05, (lnl_f, lnl_x)


def test_fused_hill_climb_matches():
    """End-to-end: NNIEngine(fused=True) reaches the same tree/lnL as
    the mailbox engine from the same start."""
    from iqtree_tpu.search.nni_search import NNIEngine

    tree, ta, ma, site = _workload(n_taxa=12, n_sites=120, seed=3)
    rng = np.random.default_rng(0)
    start = tree.copy()
    for _ in range(4):
        e = start.internal_edges()
        start.apply_nni(int(e[rng.integers(len(e))]), int(rng.integers(2)))

    e1 = NNIEngine(ma, site, dtype=jnp.float32, fused=False)
    e2 = NNIEngine(ma, site, dtype=jnp.float32, fused=True)
    r1 = e1.hill_climb(start.copy())
    r2 = e2.hill_climb(start.copy())
    assert abs(r1.lnl - r2.lnl) < 0.05, (r1.lnl, r2.lnl)


def test_pad_packed_rows_keeps_results():
    """Row padding (shape-stable schedules for the search) is inert."""
    from iqtree_tpu.engine.kernels.pruning import fused_compute_loglik
    from iqtree_tpu.engine.kernels.schedule import pad_packed_rows

    tree, ta, ma, site = _workload()
    pack = schedule_pack(ma.ncat, ma.num_states)
    steps, n_slots = device_slot_schedule(tree, ta, pack=pack)
    lnl0, _ = fused_compute_loglik(ta, ma, site, jnp.asarray(steps), n_slots)
    padded = pad_packed_rows(steps, pack, steps.shape[0] + 3 * pack)
    lnl1, _ = fused_compute_loglik(ta, ma, site, jnp.asarray(padded),
                                   n_slots + 4)
    np.testing.assert_allclose(float(lnl1), float(lnl0), rtol=1e-9)
