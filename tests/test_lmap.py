"""Likelihood mapping (engine/quartet.py): quartet likelihoods, region
assignment, end-to-end mapping on the example data."""

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
from iqtree_tpu.engine.quartet import (
    likelihood_mapping,
    quartet_lnls,
    region_assign,
)
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.trees.tree import PhyloTree


def test_region_assignment_rule():
    w = np.array([
        [0.98, 0.01, 0.01],   # corner t1 -> area 0
        [0.01, 0.98, 0.01],   # corner t2 -> area 1
        [0.01, 0.01, 0.98],   # corner t3 -> area 2
        [0.48, 0.48, 0.04],   # edge t1t2 -> area 3
        [0.04, 0.48, 0.48],   # edge t2t3 -> area 4
        [0.48, 0.04, 0.48],   # edge t1t3 -> area 5
        [0.34, 0.33, 0.33],   # center -> area 6
    ])
    np.testing.assert_array_equal(region_assign(w), [0, 1, 2, 3, 4, 5, 6])


@pytest.fixture(scope="module")
def setup():
    aln = read_alignment("tests/data/example.phy")
    subst, rate = parse_model_string("HKY+G", aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    return aln, ma, sd


def test_quartet_lnl_matches_engine(setup):
    """The closed-form 4-taxon likelihood must agree with the general
    pruning engine on the same quartet tree."""
    aln, ma, sd = setup
    q = np.array([0, 5, 11, 23])
    lnls = np.asarray(quartet_lnls(ma, sd, jnp.asarray([q]), n_iter=10))[0]
    # rebuild topology 0 ((a,b),(c,d)) as a 4-taxon PhyloTree over the
    # quartet's own sub-alignment and optimize its branches
    from iqtree_tpu.engine.derivatives import optimize_all_branches
    from iqtree_tpu.io.alignment import Alignment

    # sub-alignment of the 4 taxa (decode patterns back to site strings)
    sub_names = [aln.names[i] for i in q]
    nwk = f"(({sub_names[0]}:0.1,{sub_names[1]}:0.1):0.1,{sub_names[2]}:0.1,{sub_names[3]}:0.1);"
    codes = aln.patterns[q]  # [4, P]
    sub_sd = SiteData(
        tip_codes=jnp.asarray(codes),
        code_masks=sd.code_masks,
        pattern_freq=sd.pattern_freq,
        const_state=sd.const_state,
        asc_mask=sd.asc_mask,
    )
    tree = PhyloTree.from_newick(nwk, sub_names)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ta2, lnl_engine = jax.jit(
        lambda t: optimize_all_branches(t, ma, sub_sd, n_sweeps=100)
    )(ta)
    assert lnls[0] == pytest.approx(float(lnl_engine), abs=0.05)
    # the data tree should resolve towards one topology more than others
    assert lnls.max() - lnls.min() > 1.0


def test_likelihood_mapping_end_to_end(setup, tmp_path):
    aln, ma, sd = setup
    lm = likelihood_mapping(ma, sd, aln.n_taxa, 30,
                            np.random.default_rng(42))
    assert lm.n_quartets == 30
    assert lm.resolved + lm.partly_resolved + lm.unresolved == pytest.approx(1.0)
    # real phylogenetic data: most quartets should be resolved
    assert lm.resolved > 0.5
    svg = tmp_path / "x.svg"
    lm.write_svg(str(svg))
    assert svg.read_text().startswith("<?xml")
    assert "LIKELIHOOD MAPPING" in lm.summary()
