"""Weiss-von Haeseler (2003) test of model homogeneity over branches.

Re-expresses the reference's vendored whtest library
(/root/reference/whtest/: whtest.c, whtest_sub.c, weisslambda_sub.c;
driver whtest_wrapper.cpp, activated by `-m WHTEST`,
phyloanalysis.cpp:705,1886):

  1. For every taxon pair: symmetrized divergence matrix H (4x4 joint
     frequencies, Compute_Hij whtest_sub.c:410) -> pairwise GTR rate
     matrix Q_ij via the spectral decomposition of P(t) = Pi^-1 H with
     the Gamma(alpha) "pulled-back" eigenvalue map
     f(lam) = alpha (1 - lam^(-1/alpha)) (Compute_Qij_tij :503),
     normalized to mean rate 1; pairs with unusable eigenvalues or
     saturated distances are discarded (:536-547, :608).
  2. Delta statistic: 12x12 between-pair scatter matrix of the
     off-diagonal Q entries; Delta = 1 + sum_k log(1 + eig_k)
     (Compute_SSbetween_Matrix / ComputeWeissLambda,
     weisslambda_sub.c:246,299).
  3. Null distribution: average valid Q -> q_hat; BIONJ tree from the
     pairwise distances; parametric simulation of `n_sim` alignments
     under the single q_hat with continuous Gamma(alpha) site rates
     (Simulate_Sequences_q_hat whtest_sub.c:1143); p-value =
     fraction of simulated Delta >= observed (whtest.c:534).

Everything is batched NumPy (batched 4x4 eigh over all pairs at once;
the simulation evolves all sites of a node in one categorical draw).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np


@dataclass
class WHTestResult:
    delta: float
    delta_quantile: float  # 0.95 quantile of the null distribution
    p_value: float
    n_valid_pairs: int
    n_sim: int
    q_hat: np.ndarray  # [4,4] homogeneous rate matrix
    pi_hat: np.ndarray  # [4]

    @property
    def rejected(self) -> bool:
        return self.p_value < 0.05

    def report(self) -> str:
        L = ["TEST OF HOMOGENEITY ASSUMPTION OVER BRANCHES", ""]
        L.append(f"Delta of data:                       {self.delta:.6f}")
        L.append(
            f".95 quantile of Delta distribution:  "
            f"{self.delta_quantile:.6f}"
        )
        L.append(f"Number of simulations performed:     {self.n_sim}")
        L.append(f"p-value:                             {self.p_value:.6f}")
        L.append("")
        if self.rejected:
            L.append("WH-test rejected the assumption of a single model "
                     "among branches of the tree")
        else:
            L.append("WH-test DID NOT reject the assumption of a single "
                     "model among branches of the tree")
        return "\n".join(L) + "\n"


def _pair_h_matrices(codes: np.ndarray) -> np.ndarray:
    """[N,sites] int codes (>=4 = gap/ambiguous) -> symmetrized,
    normalized joint divergence matrices H [n_pairs, 4, 4]
    (Compute_Hij, whtest_sub.c:410; gaps contribute nothing because the
    reference's 5x5 H only reads the 4x4 block)."""
    N = codes.shape[0]
    onehot = np.zeros((N, 4, codes.shape[1]))
    for s in range(4):
        onehot[:, s, :] = codes == s
    iu, ju = np.triu_indices(N, 1)
    # counts[i,j] = onehot_i @ onehot_j^T over sites
    h = np.einsum("iks,jls->ijkl", onehot, onehot, optimize=True)
    h = h[iu, ju]
    h = h + np.swapaxes(h, 1, 2)  # symmetrize
    tot = h.sum(axis=(1, 2), keepdims=True)
    return h / np.maximum(tot, 1e-12)


def _pairwise_q(h: np.ndarray, alpha: float):
    """Batched Compute_Qij_tij: H [P,4,4] -> (Q [P,4,4] normalized,
    dist [P], valid [P])."""
    P = h.shape[0]
    pi = h.sum(axis=2)  # [P,4]
    pi = np.maximum(pi, 1e-12)
    d = np.sqrt(pi)
    # A = D^-1/2 H D^-1/2 is symmetric with the eigenvalues of Pi^-1 H
    a = h / d[:, :, None] / d[:, None, :]
    a = 0.5 * (a + np.swapaxes(a, 1, 2))
    lam, w = np.linalg.eigh(a)  # [P,4], [P,4,4]
    valid = (lam.min(axis=1) > 1e-4) & (lam.max(axis=1) <= 1.01)
    lam_safe = np.clip(lam, 1e-4, None)
    if alpha > 10:  # no rate heterogeneity (whtest_sub.c:573)
        f = np.log(lam_safe)
    else:
        f = alpha * (1.0 - lam_safe ** (-1.0 / alpha))
    u = w / d[:, :, None]  # eigenvectors of P
    vinv = np.swapaxes(w, 1, 2) * d[:, None, :]
    q = np.einsum("pkl,pl,plm->pkm", u, f, vinv, optimize=True)
    dist = -np.einsum("pk,pkk->p", pi, q)
    dist = np.where(np.abs(dist) < 1e-5, np.sign(dist + 1e-30) * 1e-5, dist)
    valid &= dist <= 100.0
    q = q / dist[:, None, None]
    q = np.where(valid[:, None, None], q, 0.0)
    return q, np.abs(dist), valid


_OFFDIAG = np.array([k for k in range(16) if k % 5 != 0])


def _delta_statistic(q: np.ndarray, valid: np.ndarray) -> float:
    """ComputeWeissLambdaQ16 + Compute_SSbetween_Matrix +
    ComputeWeissLambda (weisslambda_sub.c:193,246,299)."""
    data = q.reshape(q.shape[0], 16)[:, _OFFDIAG][valid]  # [n,12]
    n = data.shape[0]
    if n < 2:
        return 0.0
    mean = data.mean(axis=0)
    ss = (data.T @ data - n * np.outer(mean, mean)) / (n - 1.0)
    lam = np.linalg.eigvalsh(ss)
    if lam.max() > 1e5 or lam.min() < -0.1:
        return 0.0
    return 1.0 + float(np.sum(np.log1p(lam)))


def _simulate_codes(
    tree, q_hat: np.ndarray, pi: np.ndarray, n_sites: int,
    alpha: float, rng: np.random.Generator,
) -> np.ndarray:
    """Parametric simulation under the homogeneous q_hat with continuous
    Gamma(alpha) site rates (Simulate_Sequences_q_hat)."""
    lam, u = np.linalg.eig(q_hat)  # real for GTR-like q_hat
    uinv = np.linalg.inv(u)
    rates = (
        rng.gamma(alpha, 1.0 / alpha, n_sites)
        if alpha <= 10
        else np.ones(n_sites)
    )
    n_nodes = tree.n_nodes
    seq = np.empty((n_nodes, n_sites), dtype=np.int32)
    root = tree.root
    seq[root] = rng.choice(4, size=n_sites, p=pi / pi.sum())
    order = list(tree.postorder())[::-1]  # parents before children
    unif = rng.random((n_nodes, n_sites))
    for v in order:
        for child in tree.children[v]:
            child = int(child)
            t = max(float(tree.blen[child]), 0.0)
            e = np.exp(np.outer(rates * t, lam))  # [sites,4]
            p_mats = np.einsum(
                "kl,sl,lm->skm", u, e, uinv, optimize=True
            ).real
            p_rows = p_mats[np.arange(n_sites), seq[v]]  # [sites,4]
            p_rows = np.clip(p_rows, 0.0, None)
            p_rows /= p_rows.sum(axis=1, keepdims=True)
            cdf = np.cumsum(p_rows, axis=1)
            seq[child] = (unif[child][:, None] > cdf).sum(axis=1)
    return seq[: tree.n_taxa]


def run_whtest(
    aln,
    alpha: float = 100.0,
    n_sim: int = 1000,
    seed: int = 1,
    log: Callable = print,
) -> WHTestResult:
    """Full WH-test (WHTest_run, whtest.c:389).  alpha > 10 means no
    rate heterogeneity; n_sim from `-ns` (default 1000, tools.cpp:810)."""
    from ..trees.bionj import bionj_tree

    if aln.num_states != 4:
        raise ValueError("WH-test is defined for DNA data only")
    rng = np.random.default_rng(seed)
    codes = np.asarray(aln.patterns)[:, aln.site_to_pattern]  # [N, sites]
    N, n_sites = codes.shape

    h = _pair_h_matrices(codes)
    q, dist, valid = _pairwise_q(h, alpha)
    delta_data = _delta_statistic(q, valid)
    n_valid = int(valid.sum())
    log(f"WH-test: {n_valid}/{len(valid)} valid Q matrices, "
        f"Delta = {delta_data:.6f}")

    # homogeneous null model: mean of valid Q (Compute_q_hat_pairwise)
    q_hat = q.sum(axis=0) / max(n_valid, 1)
    lam_h, u_h = np.linalg.eig(q_hat)
    # stationary pi: eigenvector of the ~0 eigenvalue of q_hat^T
    k0 = np.argmin(np.abs(lam_h))
    vinv_h = np.linalg.inv(u_h)
    pi_hat = np.abs(vinv_h[k0].real)
    pi_hat = pi_hat / pi_hat.sum()

    # BIONJ guide tree from the pairwise distances (the reference builds
    # plain NJ, ComputeNeighborJoiningTree whtest_sub.c)
    iu, ju = np.triu_indices(N, 1)
    dmat = np.zeros((N, N))
    dmat[iu, ju] = np.where(valid, dist, 2.0)
    dmat = dmat + dmat.T
    tree = bionj_tree(dmat)

    delta_sim = np.zeros(n_sim)
    for s in range(n_sim):
        sim_codes = _simulate_codes(tree, q_hat, pi_hat, n_sites, alpha, rng)
        hs = _pair_h_matrices(sim_codes)
        qs, _, vs = _pairwise_q(hs, alpha)
        delta_sim[s] = _delta_statistic(qs, vs)
        if (s + 1) % max(1, n_sim // 10) == 0:
            log(f"  WH-test simulation {s + 1}/{n_sim}")

    p_value = float(np.mean(delta_sim >= delta_data))
    quant = float(np.sort(delta_sim)[int(np.floor(0.95 * n_sim))])
    return WHTestResult(
        delta=float(delta_data),
        delta_quantile=quant,
        p_value=p_value,
        n_valid_pairs=n_valid,
        n_sim=n_sim,
        q_hat=q_hat,
        pi_hat=pi_hat,
    )
