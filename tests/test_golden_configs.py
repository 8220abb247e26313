"""Golden parity vs the reference binary on the BASELINE configs.

Every value below was produced by IQ-TREE 1.4.3-beta built from
/root/reference (cmake -DIQTREE_FLAGS=omp, -std=gnu++11) with all
topologies FIXED (-te) so lnL is a pure model+branch-length fit:

  LG+G    iqtree-omp -s prot_M126_27_269.phy -m LG+G
              -te lg_golden.treefile          => -5008.231, alpha 0.442
  GY+F3X4 iqtree-omp -s example_codon.phy -st CODON -m GY+F3X4
              -te ssf_golden.treefile         => -11142.814,
              omega 0.136, kappa 1.072
  HKY+R4  iqtree-omp -s example.phy -m HKY+R4
              -te ssf_golden.treefile         => -11276.547
  -spp    iqtree-omp -s example.phy -spp example.nex
              -te spp_golden.treefile         => -11302.852
              (charpartition mine = HKY:part1, GTR+G:part2, GTR+G:part3)
  -m TEST iqtree-omp -s example.phy -m TEST
              -te ssf_golden.treefile         => best by BIC: TIM+I+G4

Tolerances: our batched-Newton + L-BFGS optimizer regularly lands at or
slightly ABOVE the reference optimum, so the checks are one-sided
(lnl >= golden - tol) plus parameter closeness where pinned.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.likelihood import SiteData, TreeArrays
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.optimize import (
    ModelOptimizer,
    optimize_model_and_branches,
)
from iqtree_tpu.trees.tree import PhyloTree

DATA = os.path.join(os.path.dirname(__file__), "data")


def _fit(aln_file, model, tree_file, seq_type=None, tol=0.001):
    aln = read_alignment(os.path.join(DATA, aln_file), seq_type=seq_type)
    subst, rate = parse_model_string(model, aln)
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, tree_file)).read(), aln.names,
        rng=np.random.default_rng(0),
    )
    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    opt.max_pinv = max(aln.frac_const_sites(), 1e-4)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    ta, params, lnl = optimize_model_and_branches(opt, ta, sd, tol=tol)
    return opt, params, lnl


def test_golden_protein_lg_gamma():
    opt, params, lnl = _fit("prot_M126_27_269.phy", "LG+G",
                            "lg_golden.treefile")
    assert lnl >= -5008.231 - 0.05
    _, rate = opt.unpack(params)
    assert abs(rate.alpha - 0.442) < 0.02


def test_golden_codon_gy_f3x4():
    opt, params, lnl = _fit("example_codon.phy", "GY+F3X4",
                            "ssf_golden.treefile", seq_type="CODON")
    assert lnl >= -11142.814 - 0.2
    subst, _ = opt.unpack(params)
    assert abs(subst.omega - 0.136) < 0.01
    assert abs(subst.kappa - 1.072) < 0.03


def test_golden_freerate_r4():
    opt, params, lnl = _fit("example.phy", "HKY+R4", "ssf_golden.treefile")
    assert lnl >= -11276.547 - 0.1


def test_golden_partitioned_spp():
    """Edge-linked proportional partition model on the reference's
    3-partition example (phylosupertreeplen.h:165 semantics)."""
    from iqtree_tpu.engine.partition import (
        PartitionOptimizer,
        optimize_partitioned,
        partition_loglik,
    )
    from iqtree_tpu.io.superalignment import SuperAlignment

    dtype = jnp.float64
    saln = SuperAlignment.from_files(
        os.path.join(DATA, "example.phy"), os.path.join(DATA, "example.nex"),
        None, 1,
    )
    opts, sites = [], []
    for k, aln_k in enumerate(saln.partitions):
        s_k, r_k = parse_model_string(saln.defs[k].model, aln_k)
        opts.append(ModelOptimizer(s_k, r_k, dtype=dtype))
        sites.append(SiteData.from_alignment(aln_k, dtype))
    popt = PartitionOptimizer(opts, mode="proportional", dtype=dtype)
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, "spp_golden.treefile")).read(), saln.names,
        rng=np.random.default_rng(0),
    )
    ta = TreeArrays.from_tree(tree, dtype)
    blens = jnp.stack([ta.blen] * saln.n_parts)
    ta2, _, p2, lnl = optimize_partitioned(
        popt, ta, blens, tuple(sites), rounds=20, tol=0.001
    )
    assert lnl >= -11302.852 - 0.2


def test_golden_model_selection_bic():
    """-m TEST best-fit ranking on the reference's evaluation tree."""
    from iqtree_tpu.search.model_select import run_model_selection

    aln = read_alignment(os.path.join(DATA, "example.phy"))
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, "ssf_golden.treefile")).read(), aln.names,
        rng=np.random.default_rng(0),
    )
    best, table = run_model_selection(
        aln, dtype=jnp.float64, log=lambda s: None, tree=tree
    )
    # reference: TIM+I+G4 chosen according to BIC
    base = best.split("+")[0].upper()
    assert base == "TIM", f"best model {best!r}, expected TIM family"
    assert "+I" in best and "+G" in best
