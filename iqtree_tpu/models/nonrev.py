"""Non-reversible DNA model (UNREST).

Re-expresses the reference's ModelNonRev
(/root/reference/model/modelnonrev.h:31, modelnonrev.cpp):
  * 12 off-diagonal rates (row-major A,C,G,T order), the last pinned
    to 1.0 -> 11 free parameters (modelnonrev.cpp:26 num_params).
  * State frequencies are NOT free: pi is the stationary distribution of
    Q, obtained by solving pi^T Q = 0, sum pi = 1 (QtoPi,
    modelnonrev.cpp:106-125) — here one differentiable linear solve.
  * Q is normalized to mean rate 1 (modelnonrev.cpp:148-160).
  * P(t) = expm(Q t).  The reference uses hand-rolled scaling-and-
    squaring (matexp, modelnonrev.cpp:208); we use jax.scipy.linalg.expm
    (Pade + squaring), which is jittable AND differentiable, so model
    rates and branch lengths optimize jointly by autodiff instead of the
    reference's derivative-free BFGS.

Because Q is non-symmetric its eigensystem is complex; instead of
threading complex arrays through the pruning engine, ModelArrays carries
the Q matrix itself (qmat) and engine.likelihood.branch_transition_mats
switches to the expm path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def offdiag_index(S: int = 4):
    """Row-major off-diagonal (i, j) order used by the reference
    (modelnonrev.cpp:137-144)."""
    return [(i, j) for i in range(S) for j in range(S) if i != j]


def expm_taylor(
    a: jnp.ndarray, order: int = 8, max_squarings: int = 16
) -> jnp.ndarray:
    """Batched matrix exponential by scaling-and-squaring + Taylor/Horner.

    Same family as the reference's matexp (modelnonrev.cpp:208: order-2
    Taylor, 2^10 squarings) but with adaptive squaring count and order-8
    Taylor (scaled norm <= 0.25 -> remainder ~1e-11).  Solve-free: TPU's
    XLA LuDecomposition (used by jax.scipy.linalg.expm's Pade solve)
    only supports f32, so Pade is unusable in f64 on TPU.  Fully
    differentiable.  a: [..., S, S]."""
    hp = jax.lax.Precision.HIGHEST
    norm = jnp.max(jnp.sum(jnp.abs(a), axis=-1), axis=-1)  # [...]
    s = jnp.ceil(
        jnp.maximum(0.0, jnp.log2(jnp.maximum(norm, 1e-30)) + 2.0)
    )
    s = jnp.minimum(s, float(max_squarings))
    a = a * (2.0 ** -s)[..., None, None]
    S = a.shape[-1]
    eye = jnp.eye(S, dtype=a.dtype)
    p = eye + a / order
    for k in range(order - 1, 0, -1):
        p = eye + jnp.einsum("...ij,...jk->...ik", a, p, precision=hp) / k
    for i in range(max_squarings):
        p = jnp.where(
            (i < s)[..., None, None],
            jnp.einsum("...ij,...jk->...ik", p, p, precision=hp),
            p,
        )
    return p


def _solve_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense solve for tiny static S, unrolled Gaussian elimination with
    partial pivoting.  TPU's XLA LuDecomposition only supports f32/c64;
    this is pure elementwise/where ops, so it works in f64 on TPU and is
    differentiable (pivot choice is piecewise constant)."""
    S = a.shape[0]
    aug = jnp.concatenate([a, b[:, None]], axis=1)  # [S, S+1]
    for k in range(S):
        col = jnp.abs(aug[:, k])
        col = jnp.where(jnp.arange(S) < k, -jnp.inf, col)
        p = jnp.argmax(col)
        rk, rp = aug[k], aug[p]
        onehot_k = jnp.arange(S) == k
        onehot_p = jnp.arange(S) == p
        aug = jnp.where(onehot_k[:, None], rp[None, :],
                        jnp.where(onehot_p[:, None], rk[None, :], aug))
        piv = aug[k, k]
        row_k = aug[k] / piv
        factors = jnp.where(onehot_k, 0.0, aug[:, k])
        aug = aug - factors[:, None] * row_k[None, :]
        aug = jnp.where(onehot_k[:, None], row_k[None, :], aug)
    return aug[:, S]


def nonrev_qmat(rates: jnp.ndarray, S: int = 4):
    """[S*(S-1)] off-diagonal rates -> (Q normalized to mean rate 1,
    stationary pi).  Differentiable."""
    idx = offdiag_index(S)
    ii = jnp.asarray([i for i, _ in idx])
    jj = jnp.asarray([j for _, j in idx])
    q = jnp.zeros((S, S), rates.dtype).at[ii, jj].set(rates)
    q = q - jnp.diag(q.sum(axis=1))
    # stationary distribution: pi^T Q = 0, sum(pi) = 1  (QtoPi)
    a = jnp.concatenate([jnp.ones((1, S), q.dtype), q.T[1:]], axis=0)
    b = jnp.zeros(S, q.dtype).at[0].set(1.0)
    pi = _solve_small(a, b)
    pi = jnp.maximum(pi, 1e-10)
    pi = pi / pi.sum()
    mean_rate = -jnp.sum(pi * jnp.diag(q))
    return q / mean_rate, pi


@dataclass
class NonRevModel:
    """UNREST (duck-typed against ReversibleModel where the driver/report
    layers need it)."""

    name: str = "UNREST"
    num_states: int = 4
    nr_rates: np.ndarray = field(
        default_factory=lambda: np.ones(12, dtype=np.float64)
    )
    asc: bool = False
    freq_type: str = "+FQ"  # derived from Q, not free
    fixed_rates: bool = False
    state_freq: Optional[np.ndarray] = None  # filled by update_freq()

    def __post_init__(self):
        self.nr_rates = np.asarray(self.nr_rates, dtype=np.float64)
        if self.nr_rates.shape != (self.n_entries,):
            raise ValueError(
                f"UNREST expects {self.n_entries} rates, got "
                f"{self.nr_rates.shape}"
            )
        self.update_freq()

    @property
    def n_entries(self) -> int:
        return self.num_states * (self.num_states - 1)

    @property
    def df(self) -> int:
        """11 free rates (last pinned; modelnonrev.cpp:26)."""
        return 0 if self.fixed_rates else self.n_entries - 1

    @property
    def n_rate_params(self) -> int:
        return self.df

    def qmat(self) -> np.ndarray:
        q, _ = nonrev_qmat(jnp.asarray(self.nr_rates))
        return np.asarray(q)

    # ReversibleModel-compatible alias (tests, reporting)
    def rate_matrix(self) -> np.ndarray:
        return self.qmat()

    def update_freq(self) -> None:
        _, pi = nonrev_qmat(jnp.asarray(self.nr_rates))
        self.state_freq = np.asarray(pi)

    def rate_param_vector(self) -> np.ndarray:
        return self.nr_rates[:-1].copy()

    def set_rate_param_vector(self, v: np.ndarray) -> None:
        self.nr_rates = np.concatenate(
            [np.asarray(v, dtype=np.float64), [1.0]]
        )
        self.update_freq()
