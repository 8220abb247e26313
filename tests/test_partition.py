"""Partitioned analysis: parsing, SuperAlignment, engine identities,
joint optimization, end-to-end search."""

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
from iqtree_tpu.engine.partition import (
    PartitionOptimizer,
    optimize_partitioned,
    partition_loglik,
)
from iqtree_tpu.io.alignment import read_alignment
from iqtree_tpu.io.partition import parse_raxml_partitions, read_partition_file
from iqtree_tpu.io.superalignment import SuperAlignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.optimize import ModelOptimizer
from iqtree_tpu.trees.tree import random_tree


def test_parse_nexus_sets():
    parts = read_partition_file("tests/data/example.nex", 384)
    assert [p.name for p in parts] == ["part1", "part2", "part3"]
    assert parts[0].model == "HKY"
    assert parts[1].model == "GTR+G"
    # codon-position charsets: 1-99\3 2-99\3 = positions !=3rd in 1..99
    assert len(parts[0].sites) == 66
    assert len(parts[1].sites) == 33
    assert len(parts[2].sites) == 285
    assert sum(len(p.sites) for p in parts) == 384


def test_parse_raxml_style():
    parts = parse_raxml_partitions("DNA, p1 = 1-100\nGTR+G, p2 = 101-200\n")
    assert parts[0].model is None and parts[0].seq_type == "DNA"
    assert parts[1].model == "GTR+G"


@pytest.fixture(scope="module")
def super_aln():
    return SuperAlignment.from_files(
        "tests/data/example.phy", "tests/data/example.nex"
    )


def test_superalignment_split(super_aln):
    assert super_aln.n_parts == 3
    assert super_aln.n_sites == 384
    assert super_aln.n_taxa == 44


def test_joint_partition_lnl_equals_concatenated(super_aln):
    """Same model + shared branch lengths across partitions must equal
    the unpartitioned likelihood of the full alignment."""
    full = read_alignment("tests/data/example.phy")
    subst, rate = parse_model_string("GTR{1.5,2.0,0.8,1.2,3.0}+G{0.6}", full)
    tree = random_tree(full.n_taxa, np.random.default_rng(0))
    ta = TreeArrays.from_tree(tree, jnp.float64)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    lnl_full, _ = compute_loglik(ta, ma, SiteData.from_alignment(full, jnp.float64))

    models, sites = [], []
    for aln_k in super_aln.partitions:
        s_k, r_k = parse_model_string("GTR{1.5,2.0,0.8,1.2,3.0}+G{0.6}", aln_k)
        s_k.state_freq = subst.state_freq  # same freqs as the full data
        models.append(ModelArrays.from_model(s_k, r_k, jnp.float64))
        sites.append(SiteData.from_alignment(aln_k, jnp.float64))
    total, _ = partition_loglik(
        ta, (ta.blen,) * 3, tuple(models), tuple(sites)
    )
    assert float(total) == pytest.approx(float(lnl_full), abs=1e-6)


@pytest.mark.parametrize("mode", ["joint", "proportional", "unlinked"])
def test_optimize_partitioned_improves(super_aln, mode):
    dtype = jnp.float64
    opts, sites = [], []
    for k, aln_k in enumerate(super_aln.partitions):
        s_k, r_k = parse_model_string(super_aln.defs[k].model, aln_k)
        opts.append(ModelOptimizer(s_k, r_k, dtype=dtype))
        sites.append(SiteData.from_alignment(aln_k, dtype))
    popt = PartitionOptimizer(opts, mode=mode, dtype=dtype)
    tree = random_tree(super_aln.n_taxa, np.random.default_rng(3))
    ta = TreeArrays.from_tree(tree, dtype)
    blens = jnp.stack([ta.blen] * 3)
    p = popt.init_params()
    models0 = popt.build(p)
    lnl0, _ = partition_loglik(ta, (ta.blen,) * 3, models0, tuple(sites))
    ta2, blens2, p2, lnl = optimize_partitioned(
        popt, ta, blens, tuple(sites), params=p, rounds=3, tol=0.5
    )
    assert lnl > float(lnl0) + 10
    if mode == "proportional":
        (_, scales) = popt.unpack(p2)[0], popt.unpack(p2)[1]
        assert scales.shape == (3,) and scales[0] == 1.0


def test_partitioned_search_end_to_end(super_aln):
    from iqtree_tpu.search.driver import SearchParams
    from iqtree_tpu.search.super_driver import run_search_partitioned

    sp = SearchParams(
        seed=5,
        fixed_iterations=1,
        dtype=jnp.float64,
        log=lambda s: None,
    )
    res = run_search_partitioned(super_aln, sp, mode="joint")
    assert np.isfinite(res.best_lnl)
    res.best_tree.check()
    # search should land well above a random-tree likelihood
    assert res.best_lnl > -25000


def test_bspec_gene_and_genesite_resampling():
    """-bspec GENE/GENESITE semantics vs a NumPy oracle
    (SuperAlignment::createBootstrapAlignment,
    /root/reference/superalignment.cpp:333-367)."""
    import numpy as np

    from iqtree_tpu.io.superalignment import SuperAlignment

    saln = SuperAlignment.from_files(
        "tests/data/example.phy", "tests/data/example.nex"
    )
    K = saln.n_parts
    tot_sites = [p.n_sites for p in saln.partitions]

    # GENE: every drawn gene contributes its FULL pattern-freq vector ->
    # each partition's freq is an integer multiple of its original
    rng = np.random.default_rng(5)
    freqs = saln.bootstrap_pattern_freqs(rng, "GENE")
    assert len(freqs) == K
    mults = []
    for k in range(K):
        pf = saln.partitions[k].pattern_freq
        with np.errstate(invalid="ignore"):
            ratio = np.where(pf > 0, freqs[k] / pf, 0)
        m = ratio.max()
        assert np.allclose(freqs[k], m * pf), "GENE must copy whole genes"
        mults.append(int(m))
    # total drawn genes == K
    assert sum(mults) == K
    # total sites conserved only in expectation — but each gene's
    # contribution is multiples of its site count
    assert sum(m * n for m, n in zip(mults, tot_sites)) == sum(
        int(f.sum()) for f in freqs
    )

    # GENESITE: sites resampled within drawn genes -> per drawn gene the
    # site total matches that gene's length
    rng = np.random.default_rng(6)
    freqs2 = saln.bootstrap_pattern_freqs(rng, "GENESITE")
    drawn_totals = [int(f.sum()) for f in freqs2]
    assert sum(drawn_totals) == sum(
        tot_sites[k] * m for k, m in enumerate(
            [int(round(t / tot_sites[k])) for k, t in enumerate(drawn_totals)]
        )
    )

    # default: per-partition site resampling conserves each gene's length
    rng = np.random.default_rng(7)
    freqs3 = saln.bootstrap_pattern_freqs(rng, None)
    for k in range(K):
        assert int(freqs3[k].sum()) == tot_sites[k]
