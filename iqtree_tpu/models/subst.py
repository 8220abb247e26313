"""Substitution models (host-side parameter containers).

Replaces the reference's ModelSubst/ModelGTR hierarchy
(/root/reference/model/modelsubst.h:27, modelgtr.h:41) with plain
dataclasses whose parameters are NumPy arrays; the device engine consumes
them via `ModelArrays` pytrees (eigen-data + rate categories), rebuilt by
differentiable jnp code in models/eigen.py during joint optimization.

A reversible model is defined by:
  * `rate_groups`: for each unordered state pair (i<j, row-major order:
    (0,1),(0,2)... so DNA order is AC,AG,AT,CG,CT,GT), an integer group id.
    All pairs in a group share one exchangeability; group 0 is pinned to
    1.0 (the reference's rate-code strings like "010010" for HKY,
    /root/reference/model/modeldna.cpp:41-148).
  * `exchange`: alternatively a full symmetric exchangeability matrix
    (empirical protein models).
  * state frequencies with a frequency policy (equal/empirical/estimated/
    user, cf. /root/reference/model/modelsubst.h FREQ_*).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

FREQ_EQUAL = "equal"
FREQ_EMPIRICAL = "empirical"  # +F counted from data
FREQ_ESTIMATE = "estimate"  # +FO ML-optimized
FREQ_USER = "user"  # +F{...} / +FU


def pair_index(num_states: int) -> List[Tuple[int, int]]:
    return [(i, j) for i in range(num_states) for j in range(i + 1, num_states)]


@dataclass
class ReversibleModel:
    name: str
    num_states: int
    # either group-coded rates ...
    rate_groups: Optional[np.ndarray] = None  # [n_pairs] int
    group_rates: Optional[np.ndarray] = None  # [n_groups] float, [0]==1.0
    # ... or a fixed empirical exchangeability matrix
    exchange: Optional[np.ndarray] = None  # [S, S] symmetric
    freq_type: str = FREQ_EQUAL
    state_freq: Optional[np.ndarray] = None  # [S]
    fixed_rates: bool = False  # true for empirical matrices
    asc: bool = False  # +ASC: Lewis ascertainment-bias correction

    def __post_init__(self):
        S = self.num_states
        if self.state_freq is None:
            self.state_freq = np.full(S, 1.0 / S)
        if self.rate_groups is not None:
            self.rate_groups = np.asarray(self.rate_groups, dtype=np.int32)
            ngroups = int(self.rate_groups.max()) + 1
            if self.group_rates is None:
                self.group_rates = np.ones(ngroups, dtype=np.float64)

    # -- parameter bookkeeping -----------------------------------------
    @property
    def n_rate_params(self) -> int:
        if self.fixed_rates or self.rate_groups is None:
            return 0
        return int(self.rate_groups.max())  # group 0 pinned

    @property
    def n_freq_params(self) -> int:
        return self.num_states - 1 if self.freq_type == FREQ_ESTIMATE else 0

    @property
    def df(self) -> int:
        """Free parameters counted for AIC/BIC, matching the reference
        (ModelGTR::getNDim + freq params; phylotesting.cpp:174-188 usage)."""
        n = self.n_rate_params + (
            self.num_states - 1 if self.freq_type in (FREQ_ESTIMATE, FREQ_EMPIRICAL) else 0
        )
        return n

    def sym_rates(self) -> np.ndarray:
        """Full symmetric exchangeability matrix R (diagonal zero)."""
        S = self.num_states
        if self.exchange is not None:
            r = np.array(self.exchange, dtype=np.float64)
            np.fill_diagonal(r, 0.0)
            return r
        r = np.zeros((S, S))
        for (i, j), g in zip(pair_index(S), self.rate_groups):
            r[i, j] = r[j, i] = self.group_rates[g]
        return r

    def rate_param_vector(self) -> np.ndarray:
        """Free exchangeability parameters (groups 1..G-1)."""
        return np.array(self.group_rates[1:], dtype=np.float64)

    def set_rate_param_vector(self, v: np.ndarray) -> None:
        self.group_rates = np.concatenate([[1.0], np.asarray(v, dtype=np.float64)])

    def rate_matrix(self) -> np.ndarray:
        """Normalized Q (mean rate 1) as float64 NumPy."""
        r = self.sym_rates()
        pi = self.state_freq
        q = r * pi[None, :]
        np.fill_diagonal(q, 0.0)
        np.fill_diagonal(q, -q.sum(axis=1))
        mean_rate = -np.sum(pi * np.diag(q))
        return q / mean_rate

    def eigen(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(eigenvalues, V, V^-1) of normalized Q via symmetrization
        (float64, NumPy — used for golden tests and initialization)."""
        q = self.rate_matrix()
        pi = self.state_freq
        sq = np.sqrt(pi)
        b = q * (sq[:, None] / sq[None, :])
        b = 0.5 * (b + b.T)
        lam, u = np.linalg.eigh(b)
        v = u / sq[:, None]
        vinv = u.T * sq[None, :]
        return lam, v, vinv
