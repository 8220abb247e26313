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


@jax.custom_jvp
def safe_eigh(b: jnp.ndarray):
    """eigh with degenerate-safe derivatives.

    Plain eigh's JVP divides by eigenvalue gaps and yields NaN at (exact)
    degeneracies — e.g. the F81/JC structure where all rates are equal
    (triple eigenvalue), which is the *starting point* of every GTR
    optimization.  Downstream we only use V diag(f(lam)) V^-1, which is
    invariant under rotations inside an eigenspace, so zeroing the
    degenerate cross-terms gives the correct gradient."""
    return jnp.linalg.eigh(b)


@safe_eigh.defjvp
def _safe_eigh_jvp(primals, tangents):
    (b,) = primals
    (db,) = tangents
    lam, u = jnp.linalg.eigh(b)
    m = u.T @ db @ u
    dlam = jnp.diagonal(m)
    diff = lam[None, :] - lam[:, None]  # diff[i,j] = lam_j - lam_i
    scale = jnp.maximum(jnp.max(jnp.abs(lam)), 1e-30)
    # dtype-aware degeneracy cutoff: numerically-degenerate eigenvalues
    # differ by O(eps * scale) (e.g. ~1e-7 in f32 at the all-equal-rates
    # starting point), and 1/diff then injects O(1/eps) garbage into the
    # gradient; anything below ~eps^0.75 cannot carry meaningful signal.
    eps = jnp.finfo(lam.dtype).eps
    tol = 30.0 * eps ** 0.75 * scale
    degenerate = jnp.abs(diff) < tol
    f = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, diff))
    du = u @ (f * m)
    return (lam, u), (dlam, du)


def eigen_reversible(sym_rates: jnp.ndarray, freq: jnp.ndarray):
    """Eigendecomposition of the normalized reversible Q.

    Returns (eigenvalues [S], eigvec V [S,S], inv_eigvec V^-1 [S,S]) with
    Q = V diag(lam) V^-1 and P(t) = V diag(exp(lam t)) V^-1.
    """
    q = build_rate_matrix(sym_rates, freq)
    sqrt_pi = jnp.sqrt(freq)
    b = q * (sqrt_pi[:, None] / sqrt_pi[None, :])
    b = 0.5 * (b + b.T)  # enforce exact symmetry
    lam, u = safe_eigh(b)
    v = u / sqrt_pi[:, None]
    vinv = u.T * sqrt_pi[None, :]
    return lam, v, vinv


def transition_matrices(
    eigenvalues: jnp.ndarray,  # [C, S] per-category (mixture-class) values
    eigvec: jnp.ndarray,  # [C, S, S]
    inv_eigvec: jnp.ndarray,  # [C, S, S]
    t: jnp.ndarray,  # [..., C] branch length * rate products per category
) -> jnp.ndarray:
    """P_c(t_c) = V_c exp(diag(lam_c * t_c)) V_c^-1 for every category.

    The category axis C is the fused (mixture class x rate class) axis:
    non-mixture models pass C identical eigensystems (the reference's
    fused_mix_rate layout, /root/reference/phylotreesse.cpp:99-136).
    Returns [..., C, S, S].  (Reference: ModelGTR::computeTransMatrix,
    /root/reference/model/modelgtr.cpp:225.)
    """
    expo = jnp.exp(eigenvalues * t[..., None])  # [..., C, S]
    # HIGHEST precision: TPU default bf16 matmuls round P(t) hard enough to
    # produce small negative probabilities (observed: -2^-9), which poison
    # log-likelihoods downstream.  These matrices are tiny; full f32 is free.
    p = jnp.einsum(
        "cij,...cj,cjk->...cik",
        eigvec,
        expo,
        inv_eigvec,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Floor at a tiny positive value: genuinely minuscule entries (codon
    # double substitutions across a near-zero branch are O(t^2) ~ 1e-12)
    # are computed by cancellation of O(1) eigen-terms, and the f64
    # round-off can flip them NEGATIVE.  One negative entry poisons a
    # whole pattern's likelihood (-95 lnL observed on GY+F3X4) and turns
    # the parameter gradient NaN, stalling L-BFGS at its starting point.
    # P(t) of an irreducible Q is strictly positive for every t > 0, so
    # the floor never masks a legitimate value.  STRAIGHT-THROUGH
    # gradient: a hard max() zeroes the cotangent of every floored entry,
    # which wrecks d lnL/d blen at zero-length branches (P(0)'s
    # off-diagonals are +-1e-17 round-off but dP/dt = Q there is O(1));
    # the identity pullback keeps the smooth unclamped derivative.
    return p + jax.lax.stop_gradient(jnp.maximum(p, 0.0) - p)
