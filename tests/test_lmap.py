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


def test_lmclust_read_sample_and_labels(tmp_path, setup):
    """-lmclust: cluster parsing (both formats), reference quartet-
    drawing semantics, and cluster-labeled corners
    (quartet.cpp:115-200,1231-1345)."""
    from iqtree_tpu.engine.quartet import (LmapClusters,
                                           read_lmap_clusters,
                                           sample_cluster_quartets)

    aln, ma, site = setup
    names = aln.names
    # RAxML-style file: 2 clusters + ignored
    f = tmp_path / "clusters.txt"
    f.write_text(
        f"({names[0]}, {names[1]}, {names[2]}) Left\n"
        f"({names[3]}, {names[4]}, {names[5]}, {names[6]}) Right\n"
        f"({names[7]}) ignored\n"
    )
    cl = read_lmap_clusters(str(f), names)
    assert cl.n_groups == 2
    assert cl.names == ["Left", "Right"]
    assert cl.groups[0] == [0, 1, 2] and cl.groups[1] == [3, 4, 5, 6]
    assert cl.ignored == [7]
    assert cl.unique_quartets() == 3 * 6  # C(3,2)*C(4,2)

    # enumeration covers all unique quartets with (a,a,b,b) structure
    rng = np.random.default_rng(0)
    qs = sample_cluster_quartets(cl, 0, rng)
    assert qs.shape == (18, 4)
    assert all(q[0] in cl.groups[0] and q[1] in cl.groups[0]
               and q[2] in cl.groups[1] and q[3] in cl.groups[1]
               for q in qs)
    # random sampling respects cluster membership too
    qs2 = sample_cluster_quartets(cl, 7, rng)
    assert qs2.shape == (7, 4)
    assert all(q[2] in cl.groups[1] and q[3] in cl.groups[1] for q in qs2)

    lab = cl.corner_labels()
    assert lab[0] == "(Left,Left)-(Right,Right)"

    # NEXUS taxset format
    f2 = tmp_path / "clusters.nex"
    f2.write_text(
        "#nexus\nbegin sets;\n"
        f"  taxset A = {names[0]} {names[1]};\n"
        f"  taxset B = {names[2]} {names[3]};\n"
        f"  taxset C = {names[4]} {names[5]} {names[6]};\n"
        "end;\n"
    )
    cl3 = read_lmap_clusters(str(f2), names)
    assert cl3.n_groups == 3
    assert cl3.unique_quartets() == 2 * 2 * 3  # A*B*C(3,2)
    qs3 = sample_cluster_quartets(cl3, 0, np.random.default_rng(1))
    assert qs3.shape == (12, 4)

    # 4-cluster end-to-end mapping with labeled SVG + EPS
    f4 = tmp_path / "c4.txt"
    f4.write_text(
        f"({names[0]},{names[1]}) W\n({names[2]},{names[3]}) X\n"
        f"({names[4]},{names[5]}) Y\n({names[6]},{names[7]}) Z\n"
    )
    cl4 = read_lmap_clusters(str(f4), names)
    lm = likelihood_mapping(ma, site, aln.n_taxa, 0,
                            np.random.default_rng(2), clusters=cl4)
    assert lm.n_quartets == 16
    assert lm.corners == ("(W,X)-(Y,Z)", "(W,Y)-(X,Z)", "(W,Z)-(X,Y)")
    svg = tmp_path / "o.svg"
    eps = tmp_path / "o.eps"
    lm.write_svg(str(svg))
    lm.write_eps(str(eps))
    assert "(W,X)-(Y,Z)" in svg.read_text()
    t = eps.read_text()
    assert t.startswith("%!PS-Adobe") and "(W,Y)-(X,Z)" in t
