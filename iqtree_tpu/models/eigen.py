"""Rate-matrix construction and eigendecomposition (JAX, differentiable).

TPU-native replacement for the reference's EISPACK-style decomposition
(/root/reference/eigendecomposition.cpp:38,167).  For reversible models we
use the standard symmetrization trick (eigendecomposition.cpp:373):

    B = diag(sqrt(pi)) * Q * diag(sqrt(pi))^-1   is symmetric,
    eigh(B) = (lam, U)  =>  Q = V diag(lam) V^-1 with
    V = diag(pi)^-1/2 U,  V^-1 = U^T diag(pi)^1/2.

Everything here is pure jnp and differentiable, so model parameters can be
optimized jointly with branch lengths by autodiff (eigh has a well-defined
VJP for distinct eigenvalues).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_rate_matrix(sym_rates: jnp.ndarray, freq: jnp.ndarray) -> jnp.ndarray:
    """Reversible rate matrix from exchangeabilities and frequencies.

    sym_rates: [S, S] symmetric matrix of exchangeabilities R_ij (diagonal
               ignored); Q_ij = R_ij * pi_j for i != j.
    freq:      [S] state frequencies (sum 1).
    Returns Q normalized so the mean substitution rate -sum_i pi_i Q_ii = 1
    (the reference's convention, eigendecomposition.cpp:306).
    """
    S = freq.shape[0]
    q = sym_rates * freq[None, :]
    q = q - jnp.diag(jnp.diag(q))
    q = q - jnp.diag(q.sum(axis=1))
    mean_rate = -jnp.sum(freq * jnp.diag(q))
    return q / mean_rate


def eigen_reversible(sym_rates: jnp.ndarray, freq: jnp.ndarray):
    """Eigendecomposition of the normalized reversible Q.

    Returns (eigenvalues [S], eigvec V [S,S], inv_eigvec V^-1 [S,S]) with
    Q = V diag(lam) V^-1 and P(t) = V diag(exp(lam t)) V^-1.
    """
    q = build_rate_matrix(sym_rates, freq)
    sqrt_pi = jnp.sqrt(freq)
    b = q * (sqrt_pi[:, None] / sqrt_pi[None, :])
    b = 0.5 * (b + b.T)  # enforce exact symmetry
    lam, u = jnp.linalg.eigh(b)
    v = u / sqrt_pi[:, None]
    vinv = u.T * sqrt_pi[None, :]
    return lam, v, vinv


def transition_matrices(
    eigenvalues: jnp.ndarray,  # [S]
    eigvec: jnp.ndarray,  # [S, S]
    inv_eigvec: jnp.ndarray,  # [S, S]
    t: jnp.ndarray,  # [...] branch length * rate products
) -> jnp.ndarray:
    """P(t) = V exp(diag(lam * t)) V^-1, batched over the shape of t.

    Returns [..., S, S].  (Reference: ModelGTR::computeTransMatrix,
    /root/reference/model/modelgtr.cpp:225.)
    """
    expo = jnp.exp(eigenvalues * t[..., None])  # [..., S]
    # HIGHEST precision: TPU default bf16 matmuls round P(t) hard enough to
    # produce small negative probabilities (observed: -2^-9), which poison
    # log-likelihoods downstream.  These matrices are tiny; full f32 is free.
    return jnp.einsum(
        "ij,...j,jk->...ik",
        eigvec,
        expo,
        inv_eigvec,
        precision=jax.lax.Precision.HIGHEST,
    )
