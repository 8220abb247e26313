"""NGS position-specific rate analysis (analysis/ngs.py vs reference
ngs.cpp)."""

import numpy as np
import pytest
from scipy.linalg import expm

from iqtree_tpu.analysis.ngs import (
    empirical_distances,
    empirical_rates,
    read_fritz_file,
    run_ngs_analysis,
)


def _simulate_counts(rng, n_pos=6, n_pairs_obs=20000):
    """Counts from a known GTR with per-position distances."""
    from iqtree_tpu.models.dna import create_dna_model

    gtr = create_dna_model("GTR")
    true_rates = np.array([2.0, 6.0, 1.0, 1.5, 8.0])
    gtr.set_rate_param_vector(true_rates)
    gtr.state_freq = np.array([0.35, 0.25, 0.2, 0.2])
    q = gtr.rate_matrix()
    pi = gtr.state_freq
    true_t = rng.uniform(0.05, 0.8, n_pos)
    counts = np.zeros((n_pos, 4, 4))
    for c, t in enumerate(true_t):
        joint = pi[:, None] * expm(q * t)
        flat = rng.multinomial(n_pairs_obs, joint.ravel() / joint.sum())
        counts[c] = flat.reshape(4, 4)
    return counts, np.append(true_rates, 1.0) / 1.0, pi, true_t


def test_read_fritz(tmp_path):
    path = tmp_path / "x.fritz"
    c = np.arange(32, dtype=float)
    path.write_text("2 4\n" + " ".join(map(str, c)))
    m = read_fritz_file(str(path))
    assert m.shape == (2, 4, 4)
    assert m[1, 3, 3] == 31.0


def test_empirical_helpers():
    rng = np.random.default_rng(0)
    counts, _, _, true_t = _simulate_counts(rng)
    d = empirical_distances(counts)
    # p-distance is monotone in true distance at these scales
    assert np.all(np.argsort(d) == np.argsort(true_t))
    r = empirical_rates(counts)
    assert r.shape == (6,) and (r > 0).all()


def test_ngs_recovers_rates_and_distances(tmp_path):
    rng = np.random.default_rng(3)
    counts, true_rates6, pi, true_t = _simulate_counts(rng)
    path = tmp_path / "sim.fritz"
    C = counts.shape[0]
    path.write_text(
        f"{C} 4\n" + " ".join(str(x) for x in counts.ravel())
    )
    res = run_ngs_analysis(str(path), str(tmp_path / "out"),
                           log=lambda s: None)
    # homogeneous fit recovers the generating GTR (rates normalized to
    # the last = G<->T pair)
    est = np.append(res.rates[:-1] / res.rates[-1], 1.0)
    want = true_rates6[:-1] / true_rates6[-1]
    np.testing.assert_allclose(est[:-1], want, rtol=0.15)
    np.testing.assert_allclose(res.freqs, pi, atol=0.02)
    np.testing.assert_allclose(res.distances, true_t, rtol=0.15)
    # homogeneous model (per-position t) must beat the null (single t)
    assert res.lnl > res.null_lnl
    # per-position models only add parameters -> at least as good
    assert res.pos_lnl.sum() >= res.lnl - 1e-3
    assert (tmp_path / "out.ngs").exists()
