"""NGS position-specific rate analysis.

Re-expresses the reference's NGS application
(/root/reference/ngs.h:37-429, ngs.cpp; dispatched by `-sf <file>`,
pda.cpp:2429, tools.cpp:1582): the input is "Fritz format" — one
pairwise count matrix [S x S] per read position (category), counting
reference-base -> read-base substitutions (NGSAlignment::readFritzFile,
ngs.cpp:72).  The analysis fits

  1. ONE homogeneous GTR across positions with a free evolutionary
     distance t_c per position (the reference alternates model BFGS and
     per-category Newton, NGSRate::optimizeParameters ngs.cpp:263 +
     computeFuncDervCat :211);
  2. per-position GTR models (testSingleRateModel, ngs.cpp:1186);
  3. a null equal-rate model on the summed counts (ngs.cpp:1196).

Here all three are ONE jitted L-BFGS each — (2) is a single vmapped
batch over positions, which is exactly the kind of [C,S,S]-batched
small-matrix workload the MXU eats: pairwise likelihood
lnL = sum_ij n_ij log(pi_i P_ij(t)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Tuple

import numpy as np


def read_fritz_file(path: str) -> np.ndarray:
    """-> counts [n_positions, S, S] (readFritzFile, ngs.cpp:72)."""
    toks = open(path).read().split()
    ncat, S = int(toks[0]), int(toks[1])
    vals = np.asarray([float(t) for t in toks[2:2 + ncat * S * S]])
    if len(vals) != ncat * S * S:
        raise ValueError(f"{path}: expected {ncat * S * S} counts")
    if (vals < 0).any():
        raise ValueError("negative count")
    return vals.reshape(ncat, S, S)


def empirical_rates(counts: np.ndarray) -> np.ndarray:
    """Initial exchangeabilities from the summed divergence matrix,
    normalized to the last pair (computeDivergenceMatrix, ngs.cpp:145)."""
    S = counts.shape[1]
    pair = counts.sum(axis=0)
    sym = pair + pair.T
    last = sym[S - 2, S - 1]
    if last == 0:
        raise ValueError("last rate entry is zero")
    return np.array(
        [sym[i, j] / last for i in range(S - 1) for j in range(i + 1, S)]
    )


def empirical_distances(counts: np.ndarray) -> np.ndarray:
    """Per-position p-distances (computeEmpiricalDist, ngs.cpp:179)."""
    tot = counts.sum(axis=(1, 2))
    match = np.trace(counts, axis1=1, axis2=2)
    tot = np.where(tot == 0, 1.0, tot)
    return (tot - match) / tot


@dataclass
class NGSResult:
    rates: np.ndarray  # [n_pairs] homogeneous GTR exchangeabilities
    freqs: np.ndarray  # [S]
    distances: np.ndarray  # [C] per-position distances (rate scalings)
    lnl: float
    pos_rates: np.ndarray  # [C, n_pairs] per-position GTR rates
    pos_lnl: np.ndarray  # [C]
    null_distance: float
    null_lnl: float


def _pairwise_lnl_fn(counts, dtype):
    """counts [.., S, S] -> differentiable lnL(log_rates, freq_logits,
    log_t) with P(t) from the shared eigen path."""
    import jax
    import jax.numpy as jnp

    from ..models.eigen import eigen_reversible, transition_matrices
    from ..models.subst import pair_index

    S = counts.shape[-1]
    pairs = pair_index(S)
    pi_i = np.array([i for i, j in pairs])
    pi_j = np.array([j for i, j in pairs])
    n = jnp.asarray(counts, dtype)

    def lnl(log_rates, freq_logits, log_t):
        rates = jnp.exp(log_rates)
        freq = jax.nn.softmax(freq_logits)
        freq = jnp.maximum(freq, 1e-6)
        freq = freq / freq.sum()
        sym = jnp.zeros((S, S), dtype).at[pi_i, pi_j].set(rates)
        sym = sym + sym.T
        lam, v, vinv = eigen_reversible(sym, freq)
        t = jnp.exp(log_t)  # [...]
        p = transition_matrices(
            lam[None], v[None], vinv[None], t[..., None]
        )[..., 0, :, :]
        p = jnp.maximum(p, 1e-10)
        joint = freq[:, None] * p
        return jnp.sum(n * jnp.log(joint))

    return lnl


def run_ngs_analysis(
    ngs_file: str,
    out_prefix: str,
    log: Callable = print,
    dtype=None,
    max_iters: int = 300,
) -> NGSResult:
    import jax
    import jax.numpy as jnp

    from ..utils.lbfgs import lbfgs_minimize

    dtype = dtype or jnp.float64
    counts = read_fritz_file(ngs_file)
    C, S, _ = counts.shape
    log(f"{C} matrices of size {S}")
    n_pairs = S * (S - 1) // 2

    r0 = np.log(np.maximum(empirical_rates(counts), 1e-4))
    d0 = np.log(np.maximum(empirical_distances(counts), 1e-4))
    f0 = np.log(np.maximum(counts.sum(axis=(0, 2))
                           + counts.sum(axis=(0, 1)), 1.0))

    # ---- 1. homogeneous model, free distance per position -------------
    # objectives are scaled by the total count: raw gradients are O(N)
    # and break the Armijo line search's unit trial step
    scale = counts.sum()
    lnl_fn = _pairwise_lnl_fn(counts, dtype)

    def neg_hom(p):
        return -lnl_fn(p["log_rates"], p["freq_logits"], p["log_t"]) / scale

    p0 = {
        "log_rates": jnp.asarray(r0, dtype),
        "freq_logits": jnp.asarray(f0 - f0.max(), dtype),
        "log_t": jnp.asarray(d0, dtype),
    }
    def solve(neg, p, iters):
        # one restart: the ring-buffer memory resets, recovering from a
        # stale curvature estimate ending the line search early
        p, _, _ = lbfgs_minimize(neg, p, max_iters=iters)
        return lbfgs_minimize(neg, p, max_iters=iters)

    p_hom, negval, _ = jax.jit(
        lambda p: solve(neg_hom, p, max_iters)
    )(p0)
    lnl_hom = -float(negval) * float(scale)
    rates = np.exp(np.asarray(p_hom["log_rates"]))
    rates = rates / rates[-1]
    freqs = np.asarray(jax.nn.softmax(p_hom["freq_logits"]))
    dists = np.exp(np.asarray(p_hom["log_t"]))
    log(f"Homogeneous model lnL: {lnl_hom:.4f}")

    # ---- 2. position-specific models (one vmapped batch) --------------
    def neg_pos(p, n_c):
        lnl = _pairwise_lnl_fn(n_c, dtype)
        return -lnl(p["log_rates"], p["freq_logits"], p["log_t"]) / (
            jnp.sum(n_c) + 1e-9
        )

    def fit_one(n_c, r_init, t_init):
        p0c = {
            "log_rates": r_init,
            "freq_logits": jnp.asarray(f0 - f0.max(), dtype),
            "log_t": t_init,
        }
        p, _, _ = lbfgs_minimize(lambda p: neg_pos(p, n_c), p0c,
                                 max_iters=max_iters)
        p, v, _ = lbfgs_minimize(lambda p: neg_pos(p, n_c), p,
                                 max_iters=max_iters)
        return p, -v * jnp.sum(n_c)

    fit_batch = jax.jit(jax.vmap(fit_one))
    p_pos, lnl_pos = fit_batch(
        jnp.asarray(counts, dtype),
        jnp.broadcast_to(jnp.asarray(r0, dtype), (C, n_pairs)),
        jnp.asarray(d0, dtype),
    )
    pos_rates = np.exp(np.asarray(p_pos["log_rates"]))
    pos_rates = pos_rates / pos_rates[:, -1:]
    log(f"Position-specific models fitted ({C} positions, one vmapped "
        f"L-BFGS batch)")

    # ---- 3. equal-rate null model on the summed counts ----------------
    sum_counts = counts.sum(axis=0)
    lnl_null_fn = _pairwise_lnl_fn(sum_counts, dtype)

    def neg_null(p):
        return -lnl_null_fn(
            p["log_rates"], p["freq_logits"], p["log_t"]
        ) / scale

    p0n = {
        "log_rates": jnp.asarray(r0, dtype),
        "freq_logits": jnp.asarray(f0 - f0.max(), dtype),
        "log_t": jnp.asarray(np.log(max(empirical_distances(
            sum_counts[None])[0], 1e-4)), dtype),
    }
    p_null, negnull, _ = jax.jit(
        lambda p: solve(neg_null, p, max_iters)
    )(p0n)
    null_lnl = -float(negnull) * float(scale)
    null_t = float(np.exp(p_null["log_t"]))
    log(f"Null (equal-rate) model lnL: {null_lnl:.4f}")

    res = NGSResult(
        rates=rates, freqs=freqs, distances=dists, lnl=lnl_hom,
        pos_rates=pos_rates, pos_lnl=np.asarray(lnl_pos),
        null_distance=null_t, null_lnl=null_lnl,
    )
    _write_report(out_prefix + ".ngs", ngs_file, res, S, log)
    return res


def _write_report(path: str, ngs_file: str, res: NGSResult, S: int,
                  log: Callable):
    names = list("ACGT") if S == 4 else [str(i) for i in range(S)]
    pair_names = [
        f"{names[i]}<->{names[j]}"
        for i in range(S - 1) for j in range(i + 1, S)
    ]
    L = [f"Input file: {ngs_file}",
         "Model of evolution: GTR", "",
         "Substitution process assuming one homogeneous model among all "
         "positions:", "", "Rate parameters:"]
    k = 0
    mat = np.zeros((S, S))
    for i in range(S - 1):
        for j in range(i + 1, S):
            mat[i, j] = mat[j, i] = res.rates[k]
            k += 1
    for i in range(S):
        L.append(" \t".join(
            "-" if i == j else f"{mat[i, j]:.6f}" for j in range(S)
        ))
    L.append("")
    L.append("State frequencies: " + " ".join(
        f"{f:.6f}" for f in res.freqs))
    L.append(f"Log-likelihood: {res.lnl:.6f}")
    L.append(f"Null (equal-rate) distance: {res.null_distance:.6f} "
             f"lnL: {res.null_lnl:.6f}")
    L.append("")
    L.append("Position-specific rates (distance + rate parameters):")
    L.append("Pos\tDistance\t" + "\t".join(pair_names) + "\tlnL")
    for c in range(len(res.distances)):
        L.append(
            f"{c + 1}\t{res.distances[c]:.6f}\t"
            + "\t".join(f"{r:.4f}" for r in res.pos_rates[c])
            + f"\t{res.pos_lnl[c]:.4f}"
        )
    with open(path, "w") as f:
        f.write("\n".join(L) + "\n")
    log(f"NGS analysis written to {path}")
