"""Codon models: state space, GY94/MG94 structure, empirical ECMs,
likelihood + optimization through the 61-state engine."""

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
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.codon import (
    CodonModel,
    GENETIC_CODES,
    codon_masks,
    empirical_codon_model,
    genetic_code_table,
    product_codon_freqs,
    sense_codons,
)
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.trees.tree import random_tree


def _random_codon_alignment(n_taxa=6, n_codons=80, seed=0):
    rng = np.random.default_rng(seed)
    sc = sense_codons(1)
    nts = "ACGT"
    seqs = []
    for _ in range(n_taxa):
        cods = rng.choice(sc, n_codons)
        seqs.append("".join(
            nts[c // 16] + nts[(c // 4) % 4] + nts[c % 4] for c in cods
        ))
    return Alignment.from_sequences(
        [f"t{i}" for i in range(n_taxa)], seqs, "CODON"
    )


def test_genetic_code_tables():
    # standard: 61 sense codons; vertebrate mito: 60
    assert genetic_code_table(1).count("*") == 3
    assert genetic_code_table(2).count("*") == 4
    assert len(sense_codons(1)) == 61
    assert len(sense_codons(2)) == 60
    # spot-check table 1 (universal constants)
    tab = genetic_code_table(1)
    assert tab[0] == "K"  # AAA
    assert tab[14] == "M"  # ATG
    assert tab[3 * 16 + 2 * 4 + 0] == "*"  # TGA
    assert tab[3 * 16 + 2 * 4 + 2] == "W"  # TGG


def test_codon_encoding_and_stops():
    aln = _random_codon_alignment()
    assert aln.num_states == 61
    with pytest.raises(ValueError, match="stop codon"):
        Alignment.from_sequences(["a", "b"], ["TAAACG", "ACGACG"], "CODON")
    # ambiguity -> unknown
    a2 = Alignment.from_sequences(["a", "b"], ["A-GACG", "ACGACG"], "CODON")
    assert a2.patterns.max() == 61  # unknown code present


def test_gy94_structure():
    aln = _random_codon_alignment()
    m, _ = parse_model_string("GY{2.5,0.4}", aln) if False else (None, None)
    subst, rate = parse_model_string("GY", aln)
    subst.kappa, subst.omega = 2.5, 0.4
    subst.refresh_exchange()
    q = subst.rate_matrix()
    pi = subst.state_freq
    # rows sum to zero, detailed balance, single-step sparsity
    np.testing.assert_allclose(q.sum(1), 0, atol=1e-12)
    np.testing.assert_allclose(pi[:, None] * q, (pi[:, None] * q).T, atol=1e-12)
    masks = codon_masks(1)
    offdiag = ~np.eye(61, dtype=bool)
    assert (q[offdiag & ~masks["step"]] == 0).all()
    assert (q[masks["step"] & ~masks["ts"] & ~masks["nonsyn"]] > 0).all()


def test_mg94_reversible_with_product_freqs():
    aln = _random_codon_alignment(seed=3)
    subst, rate = parse_model_string("MG+F3X4", aln)
    q = subst.rate_matrix()
    pi = subst.state_freq
    np.testing.assert_allclose(
        pi[:, None] * q, (pi[:, None] * q).T, atol=1e-10
    )


def test_empirical_codon_models_load():
    for name in ["KOSI07", "SCHN05", "ECMREST"]:
        m = empirical_codon_model(name)
        assert m.num_states == 61
        lam, v, vinv = m.eigen()
        assert np.isfinite(lam).all()
        # P(t) rows sum to 1
        p = v @ np.diag(np.exp(lam * 0.3)) @ vinv
        np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-8)
        assert (p > -1e-10).all()


def test_codon_likelihood_and_optimization():
    from iqtree_tpu.models.optimize import (
        ModelOptimizer,
        optimize_model_and_branches,
    )

    aln = _random_codon_alignment(n_taxa=5, n_codons=60, seed=7)
    tree = random_tree(aln.n_taxa, np.random.default_rng(1))
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    subst, rate = parse_model_string("GY+G4", aln)
    opt = ModelOptimizer(subst, rate, dtype=jnp.float64)
    p = opt.init_params()
    assert "log_kappa" in p and "log_omega" in p
    ma0 = opt.build(p)
    assert ma0.num_states == 61
    lnl0, _ = compute_loglik(ta, ma0, sd)
    assert np.isfinite(float(lnl0))
    ta2, p2, lnl = optimize_model_and_branches(opt, ta, sd, params=p, rounds=3)
    assert lnl > float(lnl0)
    s2, _ = opt.unpack(p2)
    assert 0.001 < s2.kappa < 500 and 0.001 < s2.omega < 500
