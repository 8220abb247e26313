"""Guided bootstrap, multinomial probability, NCBI taxonomy, multistate
parsimony CLI utilities."""

import os

import numpy as np
import pytest

from iqtree_tpu.analysis.guided_bootstrap import (
    expected_norm_freq,
    guided_bootstrap,
    multinomial_log_prob,
    multinomial_prob_of,
    read_site_lnl_file,
)
from iqtree_tpu.analysis.ncbitree import ncbi_subtree_newick
from iqtree_tpu.io.alignment import Alignment, read_alignment


def test_expected_norm_freq_sums_to_n():
    rng = np.random.default_rng(0)
    lnl = rng.normal(-8, 1, 50)
    for n in (100, 377, 1000):
        f = expected_norm_freq(lnl, n)
        assert f.sum() == n
        assert (f >= 0).all()


def test_multinomial_log_prob_max_at_observed():
    obs = np.array([10.0, 5.0, 3.0, 2.0])
    n = int(obs.sum())
    p_obs = multinomial_log_prob(obs, obs, n)
    p_other = multinomial_log_prob(np.array([5.0, 10.0, 3.0, 2.0]), obs, n)
    assert p_obs > p_other
    # exact value vs scipy
    from scipy.stats import multinomial

    ref = multinomial.logpmf(obs, n, obs / n)
    assert abs(p_obs - ref) < 1e-9


def test_guided_bootstrap_outputs(tmp_path):
    aln = read_alignment("tests/data/example.phy")
    rng = np.random.default_rng(1)
    # synthetic per-site lnls, constant within each pattern
    pat_lnl = rng.normal(-10, 1, aln.n_patterns)
    site_lnl = pat_lnl[aln.site_to_pattern]
    prefix = str(tmp_path / "gbo_test")
    log_p, log_p_max = guided_bootstrap(aln, site_lnl, prefix,
                                        log=lambda s: None)
    assert log_p <= log_p_max <= 0
    assert os.path.exists(prefix + ".patInfo")
    assert os.path.exists(prefix + ".gbo.logP")
    # the emitted alignment must parse and have the same length + taxa
    gbo = read_alignment(prefix + ".gbo")
    assert gbo.n_taxa == aln.n_taxa
    assert gbo.n_sites == aln.n_sites


def test_read_site_lnl_roundtrip(tmp_path):
    path = str(tmp_path / "x.sitelh")
    with open(path, "w") as f:
        f.write("1 5\nSite_Lh -1.5 -2.5 -3.5 -4.5 -5.5\n")
    v = read_site_lnl_file(path)
    np.testing.assert_allclose(v, [-1.5, -2.5, -3.5, -4.5, -5.5])


def test_multinomial_prob_of_self_is_max():
    aln = read_alignment("tests/data/example.phy")
    p_self = multinomial_prob_of(aln, aln)
    assert np.isfinite(p_self) and p_self < 0


def test_ncbi_subtree(tmp_path):
    nodes = tmp_path / "nodes.dmp"
    names = tmp_path / "names.dmp"
    # tiny taxonomy: 1 root; 2,3 kingdoms; 4,5 species under 2; 6 under 3;
    # 7 subspecies under 4
    nodes.write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tkingdom\t|\n"
        "3\t|\t1\t|\tkingdom\t|\n"
        "4\t|\t2\t|\tspecies\t|\n"
        "5\t|\t2\t|\tspecies\t|\n"
        "6\t|\t3\t|\tspecies\t|\n"
        "7\t|\t4\t|\tsubspecies\t|\n"
    )
    names.write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tAnimalia\t|\t\t|\tscientific name\t|\n"
        "4\t|\tHomo sapiens\t|\t\t|\tscientific name\t|\n"
        "4\t|\thuman\t|\t\t|\tcommon name\t|\n"
    )
    nwk = ncbi_subtree_newick(str(nodes), 1, names_dmp=str(names),
                              log=lambda s: None)
    assert "Homo_sapiens" in nwk and "Animalia" in nwk and "7" in nwk
    # cutting at species rank drops the subspecies
    nwk2 = ncbi_subtree_newick(str(nodes), 1, taxon_rank="species",
                               names_dmp=str(names), log=lambda s: None)
    assert "7" not in nwk2 and "Homo_sapiens" in nwk2
    # subtree rooted below the full root
    nwk3 = ncbi_subtree_newick(str(nodes), 2, log=lambda s: None)
    assert "6" not in nwk3 and "5" in nwk3
    # parses as a tree
    from iqtree_tpu.io.newick import parse_newick

    parse_newick(nwk)


def test_cli_tina_and_gbo(tmp_path):
    from iqtree_tpu.cli import main

    # guided bootstrap through the CLI
    aln = read_alignment("tests/data/example.phy")
    sitelh = str(tmp_path / "ex.sitelh")
    rng = np.random.default_rng(3)
    pat_lnl = rng.normal(-9, 0.5, aln.n_patterns)
    with open(sitelh, "w") as f:
        f.write(f"1 {aln.n_sites}\nSite_Lh " + " ".join(
            f"{x:.5f}" for x in pat_lnl[aln.site_to_pattern]) + "\n")
    rc = main(["-s", "tests/data/example.phy", "-gbo", sitelh,
               "-pre", str(tmp_path / "g"), "-quiet"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "g") + ".gbo")

    # -tina parsimony score on the golden tree
    rc = main(["-s", "tests/data/example.phy", "-tina",
               "-t", "tests/data/golden_tree_44.nwk",
               "-pre", str(tmp_path / "t"), "-quiet"])
    assert rc == 0


def test_msf_reader(tmp_path):
    msf = (
        "!!NA_MULTIPLE_ALIGNMENT 1.0\n\n"
        "   MSF:  16  Type: N    Check:  0   ..\n\n"
        " Name: seq1 oo  Len:   16  Check:  0  Weight:  1.00\n"
        " Name: seq2 oo  Len:   16  Check:  0  Weight:  1.00\n\n"
        "//\n\n"
        "seq1  ACGTACGT ACGT.CGT\n"
        "seq2  ACGTAC~T ACGTACGT\n"
    )
    p = tmp_path / "x.msf"
    p.write_text(msf)
    aln = read_alignment(str(p))
    assert aln.n_taxa == 2 and aln.n_sites == 16
    assert aln.names == ["seq1", "seq2"]


def test_branch_stats_and_scale(tmp_path):
    from iqtree_tpu.analysis.treeutils import (
        run_branch_stats,
        run_scale_branch_length,
        read_trees,
    )
    from iqtree_tpu.trees.tree import random_tree

    t = random_tree(8, np.random.default_rng(1))
    names = [f"t{i}" for i in range(8)]
    f = tmp_path / "t.nwk"
    f.write_text(t.to_newick(names))
    run_branch_stats(str(f), str(tmp_path / "s"), log=lambda s: None)
    stats = (tmp_path / "s.stats").read_text()
    total = float([l for l in stats.splitlines()
                   if l.startswith("Total tree length")][0].split(":")[1])
    assert abs(total - t.blen.sum()) < 1e-4

    run_scale_branch_length(str(f), 3.0, str(tmp_path / "sc"),
                            log=lambda s: None)
    t2, _ = read_trees(str(tmp_path / "sc.scaled.treefile"))
    assert abs(t2[0].blen.sum() - 3.0 * t.blen.sum()) < 1e-6


def test_identical_groups_and_subset():
    """Duplicate-sequence removal (PhyloTree::removeIdenticalSeqs,
    phylotree.cpp:4326) + regraft string surgery."""
    import numpy as np

    from iqtree_tpu.cli import _graft_identical
    from iqtree_tpu.io.alignment import Alignment

    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), 30)) for _ in range(5)]
    seqs += [seqs[1], seqs[1], seqs[3]]
    names = [f"t{i}" for i in range(5)] + ["d1", "d2", "d3"]
    aln = Alignment.from_sequences(names, seqs, "DNA")
    keep, pairs = aln.identical_groups()
    assert [aln.names[i] for i in keep] == [f"t{i}" for i in range(5)]
    assert pairs == [("d1", "t1"), ("d2", "t1"), ("d3", "t3")]
    red = aln.subset_taxa(keep)
    assert red.n_taxa == 5 and red.n_sites == 30
    # grafting: every removed taxon attaches next to its twin with 0 blen
    nwk = "(t0:0.1,(t1:0.2,t3:0.3):0.05,t2:0.4,t4:0.5);"
    out = _graft_identical(nwk, pairs)
    assert "d1:0" in out and "d2:0" in out and "d3:0" in out
    from iqtree_tpu.analysis.treeutils import read_trees
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.nwk")
        open(p, "w").write(out + "\n")
        (t,), nm = read_trees(p)
        assert sorted(nm) == sorted(names)


def test_read_dist_file_roundtrip(tmp_path):
    """-d distance file: PHYLIP square, name-mapped row order
    (Alignment::readDist, alignment.cpp:2622)."""
    import numpy as np

    from iqtree_tpu.io.alignment import read_dist_file
    from iqtree_tpu.trees.bionj import bionj_tree

    names = ["c", "a", "b", "d"]
    rng = np.random.default_rng(0)
    D = rng.random((4, 4)); D = (D + D.T); np.fill_diagonal(D, 0.0)
    # write rows in a DIFFERENT order than `names`
    order = [1, 3, 0, 2]
    with open(tmp_path / "d.dist", "w") as f:
        f.write("4\n")
        for i in order:
            f.write(names[i] + " " + " ".join(
                f"{D[i, j]:.8f}" for j in order) + "\n")
    D2 = read_dist_file(str(tmp_path / "d.dist"), names)
    np.testing.assert_allclose(D2, D, atol=1e-7)
    t = bionj_tree(D2)
    assert t.n_taxa == 4
