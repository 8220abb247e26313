"""Streaming forward kernel (HBM-resident tips + group matrices) vs the
VMEM-resident packed kernel, and the multi-tree batched evaluator."""

import numpy as np
import jax.numpy as jnp
import pytest

from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    branch_transition_mats,
    compute_loglik,
    tip_partials,
)
from iqtree_tpu.engine.nni import _ptn_invar
from iqtree_tpu.engine.kernels.pruning import (
    device_slot_schedule,
    fused_multi_tree_lnl,
    fused_site_lnl,
    fused_site_lnl_cs_stream,
    schedule_pack,
)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.utils.simulate import simulate_alignment


def _workload(n_taxa=16, n_sites=150, seed=9, alpha=0.7, pinv=0.0):
    rng = np.random.default_rng(seed)
    tree = random_tree(n_taxa, rng, mean_blen=0.1)
    s = create_dna_model("GTR")
    s.group_rates = np.array([1.0, 2.0, 0.6, 1.4, 2.4, 1.0])
    r = RateModel.make(gamma_cats=4, alpha=alpha, p_invar=pinv)
    names = [f"t{i}" for i in range(n_taxa)]
    seqs = simulate_alignment(tree, s, r, n_sites, rng)
    aln = Alignment.from_sequences(names, seqs, "DNA")
    ma = ModelArrays.from_model(s, r, jnp.float32)
    site = SiteData.from_alignment(aln, jnp.float32)
    ta = TreeArrays.from_tree(tree, jnp.float32)
    return tree, ta, ma, site


@pytest.mark.parametrize("pinv", [0.0, 0.15])
def test_stream_kernel_matches_packed(pinv):
    tree, ta, ma, site = _workload(pinv=pinv)
    pack = schedule_pack(ma.ncat, ma.num_states)
    steps, n_slots = device_slot_schedule(tree, ta, pack=pack)
    steps = jnp.asarray(steps)
    trans = branch_transition_mats(ma, ta.blen)
    tips = tip_partials(site, ma.ncat)
    inv = _ptn_invar(ma, site)
    ref = fused_site_lnl(steps, n_slots, trans, tips, ma.props,
                         ma.state_freq, inv)
    got = fused_site_lnl_cs_stream(steps, n_slots, trans, tips, ma.props,
                                   ma.state_freq, inv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_multi_tree_lnl_matches_per_tree():
    tree, ta, ma, site = _workload()
    rng = np.random.default_rng(1)
    trees = [tree]
    for _ in range(4):
        t = trees[-1].copy()
        e = t.internal_edges()
        t.apply_nni(int(e[rng.integers(len(e))]), int(rng.integers(2)))
        t.blen = t.blen * float(rng.uniform(0.8, 1.2))
        trees.append(t)
    pairs = [(t, TreeArrays.from_tree(t, jnp.float32)) for t in trees]
    got = np.asarray(fused_multi_tree_lnl(pairs, ma, site))
    want = np.array([float(compute_loglik(tak, ma, site)[0])
                     for _, tak in pairs])
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=5e-3)
    # the perturbed topologies must actually differ in lnL
    assert np.ptp(want) > 1.0
