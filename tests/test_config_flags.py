"""Round-3 flag-tail coverage: -blmin/-blmax, -fconst, -bi/-tm, -rlen,
-nni1/-nni5, -starttree, -cmin/-cmax + -m TESTNEW, -wbtl, -mwopt,
-keep_ident alias, -me, -beps validation.

References: /root/reference/tools.cpp parseArg branches cited per test.
"""

import os

import numpy as np
import pytest

from iqtree_tpu.config import parse_args

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_parse_new_flags():
    cfg = parse_args(
        "-s x.phy -blmin 1e-4 -blmax 10 -me 0.5 -cmin 3 -cmax 5 -nni1 "
        "-starttree PARS -fconst 1,2,3,4 -bi 10 -tm 50 -mwopt -prec 8 "
        "-wsf -wbtl -rlen 0.01 0.2 0.9 -beps 0.25 -keep_ident".split()
    )
    assert cfg.min_branch_length == 1e-4
    assert cfg.max_branch_length == 10
    assert cfg.model_eps == 0.5
    assert (cfg.min_rate_cats, cfg.max_rate_cats) == (3, 5)
    assert cfg.nni5 is False
    assert cfg.start_tree_mode == "PARS"
    assert cfg.freq_const_patterns == "1,2,3,4"
    assert (cfg.tree_burnin, cfg.tree_max_count) == (10, 50)
    assert cfg.optimize_mixmodel_weight
    assert cfg.numeric_precision == 8
    assert cfg.write_site_freq
    assert cfg.write_boot_tree_blens and cfg.write_boot_trees
    assert cfg.random_tree_mean_len == 0.2
    assert cfg.ufboot_epsilon == 0.25
    assert cfg.keep_identical


def test_parse_testnew():
    cfg = parse_args("-s x.phy -m TESTNEW".split())
    assert cfg.model_test and cfg.model_test_rate_scan
    assert not cfg.model_test_only
    cfg = parse_args("-s x.phy -m TESTNEWONLY".split())
    assert cfg.model_test_only and cfg.model_test_rate_scan
    cfg = parse_args("-s x.phy -m TEST".split())
    assert cfg.model_test and not cfg.model_test_rate_scan


def test_parse_validation_errors():
    # -beps must be positive (tools.cpp:2404); -cmin >= 2
    with pytest.raises(SystemExit):
        parse_args("-s x.phy -beps 0".split())
    with pytest.raises(SystemExit):
        parse_args("-s x.phy -cmin 1".split())
    with pytest.raises(SystemExit):
        parse_args("-s x.phy -cmin 5 -cmax 3".split())


def test_numpars_alias():
    assert parse_args("-s x.phy -numpars 7".split()).n_init_trees == 7
    assert parse_args("-s x.phy".split()).n_init_trees == 20


def test_fconst_appends_constant_sites():
    # Alignment::addConstPatterns (-fconst, tools.cpp:1902)
    from iqtree_tpu.io.alignment import read_alignment

    aln = read_alignment(os.path.join(DATA, "example.phy"))
    n0, p0 = aln.n_sites, aln.n_patterns
    a2 = aln.add_const_patterns("3,0,2,0")
    assert a2.n_sites == n0 + 5
    assert a2.n_taxa == aln.n_taxa
    # the added sites are constant-A / constant-G columns
    segs = a2.site_to_pattern[n0:]
    for s in segs:
        col = a2.patterns[:, s]
        assert (col == col[0]).all()
    assert a2.pattern_freq.sum() == a2.n_sites
    with pytest.raises(ValueError):
        aln.add_const_patterns("1,2,3")  # wrong arity for DNA


def test_read_trees_burnin_maxcount(tmp_path):
    from iqtree_tpu.analysis.treeutils import read_trees
    from iqtree_tpu.trees.tree import random_tree

    rng = np.random.default_rng(0)
    path = tmp_path / "trees.nwk"
    names = [f"t{i}" for i in range(6)]
    with open(path, "w") as f:
        for _ in range(10):
            f.write(random_tree(6, rng).to_newick(names) + "\n")
    trees, _ = read_trees(str(path))
    assert len(trees) == 10
    trees, _ = read_trees(str(path), burnin=4)
    assert len(trees) == 6
    trees, _ = read_trees(str(path), burnin=2, max_count=3)
    assert len(trees) == 3
    with pytest.raises(ValueError):
        read_trees(str(path), burnin=10)


def test_rlen_bounds_random_tree():
    from iqtree_tpu.analysis.treeutils import generate_random_tree

    rng = np.random.default_rng(1)
    t = generate_random_tree(20, rng, "yule", min_len=0.05, mean_len=0.2,
                             max_len=0.3)
    b = t.blen[t.blen > 0.0]
    assert b.min() >= 0.05 - 1e-12 and b.max() <= 0.3 + 1e-12
    t.check()


def test_blen_bounds_roundtrip():
    from iqtree_tpu.engine import derivatives

    try:
        derivatives.set_blen_bounds(1e-4, 5.0)
        assert derivatives.blen_bounds() == (1e-4, 5.0)
        import jax.numpy as jnp

        tgt = derivatives.newton_target(
            jnp.array([1.0]), jnp.array([-2.0]), jnp.array([10.0]))
        assert float(tgt[0]) <= 5.0
    finally:
        derivatives.set_blen_bounds(derivatives.MIN_BLEN,
                                    derivatives.MAX_BLEN)


def test_testnew_rate_scan_small():
    """-m TESTNEW on a small DNA alignment: +R models appear in the
    table, the scan stops early, and the best model is well-formed
    (phylotesting.cpp:640 expansion + :1512 stop)."""
    from iqtree_tpu.io.alignment import read_alignment
    from iqtree_tpu.search.model_select import run_model_selection

    aln = read_alignment(os.path.join(DATA, "example.phy"))
    best, table = run_model_selection(
        aln, log=lambda *a: None, model_set="JC,HKY",
        rate_scan=True, min_rate_cats=2, max_rate_cats=3,
    )
    assert "+R2" in table
    assert best


def test_mwopt_forces_free_weights():
    from iqtree_tpu.io.alignment import Alignment
    from iqtree_tpu.models import mixture
    from iqtree_tpu.models.factory import parse_model_string

    names = ["a", "b", "c", "d"]
    seqs = ["ACGTACGTAC", "ACGTACGAAC", "ACTTACGTAC", "ACGTACGTCC"]
    aln = Alignment.from_sequences(names, seqs, "DNA")
    m = "MIX{JC:1:0.6,HKY:1:0.4}"
    subst, _ = parse_model_string(m, aln)
    assert subst.fix_weights  # weights given -> pinned by default
    try:
        mixture.FORCE_OPT_WEIGHTS = True
        subst, _ = parse_model_string(m, aln)
        assert not subst.fix_weights
    finally:
        mixture.FORCE_OPT_WEIGHTS = False


def test_flag_tail_wt2_wbl_gz_madd(tmp_path):
    """-wt2/-wt3/-wbl/-gz/-mredo/-madd parse into RunConfig (reference
    tools.cpp:2095-2111, :2501, :1754, :1789)."""
    from iqtree_tpu.config import parse_args

    cfg = parse_args(["-s", "x.phy", "-wt2", "-wbl", "-gz", "-mredo",
                      "-madd", "GTR,TIM"])
    assert cfg.write_intermediate_level == 2
    assert cfg.write_local_trees
    assert cfg.print_branch_lengths
    assert cfg.compress_output
    assert cfg.model_test_redo
    assert cfg.model_add == "GTR,TIM"
    cfg3 = parse_args(["-s", "x.phy", "-wt3"])
    assert cfg3.write_intermediate_level == 3


def test_gzout_roundtrip(tmp_path):
    from iqtree_tpu.utils.gzout import open_in, open_out, out_name

    p = str(tmp_path / "f.treels")
    with open_out(p, compress=True) as f:
        f.write("(a,b);\n")
    assert out_name(p, True).endswith(".gz")
    with open_in(p + ".gz") as f:
        assert f.read() == "(a,b);\n"
    with open_out(p, compress=False) as f:
        f.write("plain\n")
    with open_in(p) as f:
        assert f.read() == "plain\n"


def test_madd_extends_candidates():
    from iqtree_tpu.search.model_select import candidate_models

    assert candidate_models("DNA", "HKY", extra="GTR,TIM") == \
        ["HKY", "GTR", "TIM"]
    import pytest

    with pytest.raises(ValueError):
        candidate_models("DNA", "HKY", extra="BOGUS")
