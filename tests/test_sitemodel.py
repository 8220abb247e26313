"""Site-specific state-frequency model (+SSF / ModelSet, `-fs`).

Oracle: a class-pure split of the patterns evaluated class-by-class with
the SHARED-model engine (each class as its own ModelArrays on the same
tree) must give the identical likelihood, branch derivatives, and
optimized branch lengths as the per-pattern-gathered SSF engine.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqtree_tpu.engine.derivatives import all_passes, branch_lnl_derivs, compute_thetas
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.engine.sitemodel import (
    SSFArrays,
    gather_eigendata,
    ssf_all_passes,
    ssf_branch_lnl_derivs,
    ssf_compute_loglik,
    ssf_compute_thetas,
    ssf_optimize_all_branches,
)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.eigen import eigen_reversible
from iqtree_tpu.models.rates import RateModel
from iqtree_tpu.models.sitefreq import (
    SSFOptimizer,
    optimize_ssf_model_and_branches,
    parse_site_spec,
    read_site_freq_file,
    regroup_by_class,
)
from iqtree_tpu.trees.tree import random_tree


def make_ssf_setup(seed=0, n_taxa=7, n_sites=60, K=3, gamma=4, pinv=0.0):
    rng = np.random.default_rng(seed)
    seqs = ["".join(rng.choice(list("ACGT-N"), n_sites)) for _ in range(n_taxa)]
    names = [f"t{i}" for i in range(n_taxa)]
    aln = Alignment.from_sequences(names, seqs, "DNA")
    subst = create_dna_model("GTR")
    subst.set_rate_param_vector(rng.uniform(0.5, 3.0, 5))
    rate = RateModel.make(gamma_cats=gamma, invar=pinv > 0, p_invar=pinv, alpha=0.8)
    tree = random_tree(n_taxa, rng)
    site_class = rng.integers(0, K, n_sites).astype(np.int64)
    class_freq = rng.dirichlet(np.ones(4) * 5.0, K)
    new_aln, ptn_class = regroup_by_class(aln, site_class)
    return tree, new_aln, ptn_class, class_freq, subst, rate


def build_ssf(subst, rate, class_freq, ptn_class, dtype=jnp.float64):
    sym = jnp.asarray(subst.sym_rates(), dtype)
    fk = jnp.asarray(class_freq, dtype)
    lam, v, vinv = jax.vmap(lambda f: eigen_reversible(sym, f))(fk)
    r, w = rate.category_rates()
    return SSFArrays(
        eigenvalues=lam.astype(dtype),
        eigvec=v.astype(dtype),
        inv_eigvec=vinv.astype(dtype),
        state_freq=fk,
        rates=jnp.asarray(r, dtype),
        props=jnp.asarray(w, dtype),
        p_invar=jnp.asarray(rate.p_invar, dtype),
        ptn_class=jnp.asarray(ptn_class),
    )


def per_class_models(subst, rate, class_freq, dtype=jnp.float64):
    """One shared-engine ModelArrays per class (the oracle)."""
    out = []
    for fk in class_freq:
        m = create_dna_model("GTR")
        m.set_rate_param_vector(np.asarray(subst.group_rates[1:]))
        m.state_freq = np.asarray(fk)
        out.append(ModelArrays.from_model(m, rate, dtype))
    return out


def class_split_lnl(tree, aln, ptn_class, models, dtype=jnp.float64):
    """Oracle lnL: evaluate each class's patterns with its own model."""
    ta = TreeArrays.from_tree(tree, dtype)
    sd = SiteData.from_alignment(aln, dtype)
    total = 0.0
    for k, ma in enumerate(models):
        sel = np.where(np.asarray(ptn_class) == k)[0]
        if sel.size == 0:
            continue
        sub = SiteData(
            tip_codes=sd.tip_codes[:, sel],
            code_masks=sd.code_masks,
            pattern_freq=sd.pattern_freq[sel],
            const_state=sd.const_state[sel],
            asc_mask=sd.asc_mask[sel],
        )
        lnl, _ = compute_loglik(ta, ma, sub)
        total += float(lnl)
    return total


@pytest.mark.parametrize("gamma,pinv", [(1, 0.0), (4, 0.0), (4, 0.15)])
def test_ssf_loglik_matches_class_split(gamma, pinv):
    tree, aln, ptn_class, class_freq, subst, rate = make_ssf_setup(
        seed=1, gamma=gamma, pinv=pinv
    )
    ssf = build_ssf(subst, rate, class_freq, ptn_class)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    got, _ = ssf_compute_loglik(ta, ssf, sd)
    models = per_class_models(subst, rate, class_freq)
    expected = class_split_lnl(tree, aln, ptn_class, models)
    np.testing.assert_allclose(float(got), expected, rtol=1e-10)


def test_ssf_single_class_matches_shared_engine():
    """K=1 must reduce exactly to the shared-model engine."""
    tree, aln, ptn_class, _, subst, rate = make_ssf_setup(seed=2, K=1)
    freq = np.asarray([[0.3, 0.25, 0.25, 0.2]])
    subst.state_freq = freq[0]
    ssf = build_ssf(subst, rate, freq, np.zeros_like(ptn_class))
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    got, got_p = ssf_compute_loglik(ta, ssf, sd)
    ma = ModelArrays.from_model(subst, rate, jnp.float64)
    exp, exp_p = compute_loglik(ta, ma, sd)
    np.testing.assert_allclose(float(got), float(exp), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(exp_p), rtol=1e-10)


def test_ssf_branch_derivs_match_finite_diff():
    tree, aln, ptn_class, class_freq, subst, rate = make_ssf_setup(seed=3)
    ssf = build_ssf(subst, rate, class_freq, ptn_class)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    g, up, us, out, os_ = ssf_all_passes(ta, ssf, sd)
    theta = ssf_compute_thetas(ta, ssf, g, sd, up, us, out, os_)
    lnl, d1, d2 = ssf_branch_lnl_derivs(theta, ssf, g, sd, ta.blen)
    lnl0, _ = ssf_compute_loglik(ta, ssf, sd)
    # lnl[v] is only defined on real edges (not the root's own slot)
    np.testing.assert_allclose(np.asarray(lnl[: ta.root]),
                               float(lnl0), rtol=1e-9)
    # finite differences on a few branches
    eps = 1e-6
    from iqtree_tpu.engine.derivatives import optimize_branch_mask

    mask = np.asarray(optimize_branch_mask(ta))
    free = np.where(mask)[0][:5]
    for v in free:
        bp = np.asarray(ta.blen).copy()
        bp[v] += eps
        lp, _ = ssf_compute_loglik(ta.with_blen(jnp.asarray(bp)), ssf, sd)
        bm = np.asarray(ta.blen).copy()
        bm[v] -= eps
        lm, _ = ssf_compute_loglik(ta.with_blen(jnp.asarray(bm)), ssf, sd)
        fd1 = (float(lp) - float(lm)) / (2 * eps)
        np.testing.assert_allclose(float(d1[v]), fd1, rtol=2e-4, atol=1e-6)


def test_ssf_branch_optimization_improves_and_converges():
    tree, aln, ptn_class, class_freq, subst, rate = make_ssf_setup(seed=4)
    ssf = build_ssf(subst, rate, class_freq, ptn_class)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    lnl0, _ = ssf_compute_loglik(ta, ssf, sd)
    t_opt, lnl = ssf_optimize_all_branches(ta, ssf, sd)
    assert float(lnl) > float(lnl0)
    # at the optimum, gradients vanish on free branches
    g, up, us, out, os_ = ssf_all_passes(t_opt, ssf, sd)
    theta = ssf_compute_thetas(t_opt, ssf, g, sd, up, us, out, os_)
    _, d1, _ = ssf_branch_lnl_derivs(theta, ssf, g, sd, t_opt.blen)
    from iqtree_tpu.engine.derivatives import optimize_branch_mask

    mask = np.asarray(optimize_branch_mask(t_opt))
    interior = mask & (np.asarray(t_opt.blen) > 2e-6) & (
        np.asarray(t_opt.blen) < 99.0
    )
    assert np.max(np.abs(np.asarray(d1)[interior])) < 1e-2


def test_ssf_model_fit_improves():
    tree, aln, ptn_class, class_freq, subst, rate = make_ssf_setup(
        seed=5, n_taxa=6, n_sites=40
    )
    opt = SSFOptimizer(
        subst=subst, rate=rate, class_freq=class_freq, ptn_class=ptn_class
    )
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(aln, jnp.float64)
    p0 = opt.init_params()
    assert "freq_logits" not in p0  # frequencies are fixed per class
    lnl0, _ = ssf_compute_loglik(ta, opt.build_ssf(p0), sd)
    t_fit, params, lnl = optimize_ssf_model_and_branches(
        opt, ta, sd, rounds=3
    )
    assert lnl > float(lnl0)


def test_parse_site_spec():
    np.testing.assert_array_equal(parse_site_spec("1", 10), [0])
    np.testing.assert_array_equal(parse_site_spec("3-5", 10), [2, 3, 4])
    np.testing.assert_array_equal(
        parse_site_spec("1,4-6,9", 10), [0, 3, 4, 5, 8]
    )
    np.testing.assert_array_equal(
        parse_site_spec("1-7\\3", 10), [0, 3, 6]
    )
    with pytest.raises(ValueError):
        parse_site_spec("0", 10)
    with pytest.raises(ValueError):
        parse_site_spec("11", 10)
    with pytest.raises(ValueError):
        parse_site_spec("5-3", 10)


def test_read_site_freq_file(tmp_path):
    rng = np.random.default_rng(0)
    seqs = ["".join(rng.choice(list("ACGT"), 10)) for _ in range(4)]
    aln = Alignment.from_sequences([f"t{i}" for i in range(4)], seqs, "DNA")
    f = tmp_path / "sf.txt"
    f.write_text(
        "1-4 0.4 0.3 0.2 0.1\n"
        "5,6 0.1 0.2 0.3 0.4\n"
        "7-8 0.4 0.3 0.2 0.1\n"  # duplicate vector of class 0 -> dedup
    )
    site_class, freqs = read_site_freq_file(str(f), aln)
    assert freqs.shape[0] == 3  # two file classes (deduped) + default
    assert site_class[0] == site_class[7]  # dedup merged 1-4 with 7-8
    assert site_class[4] != site_class[0]
    # sites 9,10 unspecified -> default class (empirical freqs)
    assert site_class[8] == site_class[9]
    np.testing.assert_allclose(freqs.sum(axis=1), 1.0, atol=1e-12)
    # duplicated site id -> error
    f2 = tmp_path / "bad.txt"
    f2.write_text("1-4 0.4 0.3 0.2 0.1\n2 0.1 0.2 0.3 0.4\n")
    with pytest.raises(ValueError):
        read_site_freq_file(str(f2), aln)


def test_regroup_by_class_pure_patterns():
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("AC"), 20)) for _ in range(4)]
    aln = Alignment.from_sequences([f"t{i}" for i in range(4)], seqs, "DNA")
    site_class = (np.arange(20) % 2).astype(np.int64)
    new_aln, ptn_class = regroup_by_class(aln, site_class)
    assert new_aln.n_sites == 20
    assert ptn_class.shape[0] == new_aln.n_patterns
    # every site maps to a pattern whose class matches the site's class
    for s in range(20):
        assert ptn_class[new_aln.site_to_pattern[s]] == site_class[s]
    assert float(new_aln.pattern_freq.sum()) == 20.0


def test_ssf_golden_reference_parity():
    """Golden +SSF parity vs the reference binary.

    Reference run (IQ-TREE 1.4.3-beta built from /root/reference with
    -std=gnu++11):
      iqtree-omp -s example/example.phy -m HKY+G -fs <per-site freqs:
        cycling (.35,.25,.22,.18)/(.15,.35,.30,.20)/(.25,.25,.25,.25)>
        -te tests/data/ssf_golden.treefile -nt 1
      => Optimal log-likelihood: -11349.256
    (the reference instantiates 367 per-pattern models; the global
    frequency dedup here reduces that to 3 eigensystems, likelihood-
    identical).  NOTE: the reference binary only supports -fs files with
    ONE line per site — its sitemodel kernel asserts models->size() ==
    nptn (phylokernelsitemodel.cpp:31) and SIGABRTs on grouped specs."""
    import os

    import jax

    from iqtree_tpu.engine.likelihood import SiteData, TreeArrays
    from iqtree_tpu.io.alignment import read_alignment
    from iqtree_tpu.models.factory import parse_model_string
    from iqtree_tpu.models.sitefreq import optimize_ssf_model_and_branches
    from iqtree_tpu.trees.tree import PhyloTree

    data = os.path.join(os.path.dirname(__file__), "data")
    aln = read_alignment(os.path.join(data, "example.phy"))
    profiles = [
        [0.35, 0.25, 0.22, 0.18],
        [0.15, 0.35, 0.30, 0.20],
        [0.25, 0.25, 0.25, 0.25],
    ]
    site_class = np.array([i % 3 for i in range(aln.n_sites)])
    class_freq = np.asarray(profiles)
    new_aln, ptn_class = regroup_by_class(aln, site_class)
    subst, rate = parse_model_string("HKY+G", new_aln)
    opt = SSFOptimizer(
        subst=subst, rate=rate, dtype=jnp.float64,
        class_freq=class_freq, ptn_class=ptn_class,
    )
    tree = PhyloTree.from_newick(
        open(os.path.join(data, "ssf_golden.treefile")).read(),
        new_aln.names, rng=np.random.default_rng(0),
    )
    ta = TreeArrays.from_tree(tree, jnp.float64)
    sd = SiteData.from_alignment(new_aln, jnp.float64)
    _, _, lnl = optimize_ssf_model_and_branches(opt, ta, sd, tol=0.001)
    assert abs(lnl - (-11349.256)) < 0.05


def test_ssf_nni_evaluation_and_hill_climb():
    """Batched NNI evaluation dispatches to the per-pattern-basis
    primitives for SSF models; scores must match applying the swap on
    the host and re-optimizing branches with the SSF engine."""
    from iqtree_tpu.engine.nni import evaluate_nnis
    from iqtree_tpu.search.nni_search import NNIEngine

    tree, aln, ptn_class, class_freq, subst, rate = make_ssf_setup(
        seed=9, n_taxa=8, n_sites=80
    )
    ssf = build_ssf(subst, rate, class_freq, ptn_class)
    sd = SiteData.from_alignment(aln, jnp.float64)
    ta = TreeArrays.from_tree(tree, jnp.float64)
    edges_host = tree.internal_edges()
    edges_dev = np.asarray(ta.h2d)[edges_host]
    ev = evaluate_nnis(ta, ssf, sd, jnp.asarray(edges_dev))
    lnl0, _ = ssf_compute_loglik(ta, ssf, sd)
    # cur_lnl through the theta machinery equals the direct lnL
    np.testing.assert_allclose(float(ev.cur_lnl), float(lnl0), rtol=1e-9)
    # each candidate's score is reachable by applying the swap + branch opt
    for k in range(min(3, len(edges_host))):
        for s in range(2):
            t2 = tree.copy()
            t2.apply_nni(int(edges_host[k]), s)
            ta2 = TreeArrays.from_tree(t2, jnp.float64)
            _, lnl_full = ssf_optimize_all_branches(ta2, ssf, sd)
            # full re-optimization can only be >= the local 5-branch score
            assert float(lnl_full) >= float(ev.lnl[k, s]) - 1e-6
    # hill climb end-to-end under SSF
    engine = NNIEngine(ssf, sd, dtype=jnp.float64)
    res = engine.hill_climb(tree.copy())
    assert res.lnl >= float(lnl0) - 1e-9
    res.tree.check()
