"""Golden-value parity tests against the reference IQ-TREE 1.4.3 binary.

Golden numbers were produced by building the reference (/root/reference,
cmake -DIQTREE_FLAGS=omp) and running it with every parameter pinned:

  iqtree-omp -s example.phy -te golden_tree_44.nwk -blfix \
      -m "GTR{1.5,2.0,0.8,1.2,3.0}+F{0.25,0.26,0.25,0.24}+G{0.5}" -nt 1

The full-precision score comes from the .ckp.gz CandidateSet entry
(reference prints -17848.038178); target tolerance is the driver's 1e-4.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.trees.tree import PhyloTree

DATA = os.path.join(os.path.dirname(__file__), "data")

GOLDEN_GTR_G_LNL = -17848.038178  # reference .ckp.gz CandidateSet score


def setup_gtr_g():
    aln = read_alignment(os.path.join(DATA, "example.phy"))
    tree = PhyloTree.from_newick(
        open(os.path.join(DATA, "golden_tree_44.nwk")).read(), aln.names
    )
    subst = create_dna_model("GTR")
    # group order for code "123450": [GT, AC, AG, AT, CG, CT]
    subst.group_rates = np.array([1.0, 1.5, 2.0, 0.8, 1.2, 3.0])
    subst.state_freq = np.array([0.25, 0.26, 0.25, 0.24])
    rate = RateModel.make(gamma_cats=4, alpha=0.5)
    return aln, tree, subst, rate


def test_golden_gtr_gamma_f64():
    aln, tree, subst, rate = setup_gtr_g()
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    lnl, _ = jax.jit(compute_loglik)(ta, ma, sd)
    assert abs(float(lnl) - GOLDEN_GTR_G_LNL) < 1e-4


def test_golden_gtr_gamma_f32():
    """f32 (the TPU production dtype) must stay within ~1e-2 relative-ish
    of the reference on this 44-taxon example."""
    aln, tree, subst, rate = setup_gtr_g()
    ta = TreeArrays.from_tree(tree, jnp.float32)
    ma = ModelArrays.from_model(subst, rate, jnp.float32)
    sd = SiteData.from_alignment(aln, jnp.float32)
    lnl, _ = jax.jit(compute_loglik)(ta, ma, sd)
    assert abs(float(lnl) - GOLDEN_GTR_G_LNL) < 0.5
