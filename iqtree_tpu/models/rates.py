"""Among-site rate heterogeneity models (+G, +I, +I+G, +R, +R+I).

Replaces the reference RateHeterogeneity hierarchy
(/root/reference/model/rateheterogeneity.h:44, rategamma.cpp, rateinvar.cpp,
rategammainvar.cpp, ratefree.cpp) with one dataclass that exposes the
category (rate, proportion) arrays the engine consumes.

Conventions (matching the reference kernels, phylokernel.h:169-170 +
rateinvar.h:66 / rategamma.h:114 / rategammainvar.h:57):
  * site likelihood = sum_c prop[c] * L_c(ptn) + ptn_invar[ptn]
  * +G:    rates = discrete-gamma quadrature, prop = 1/K each
  * +I:    one category, rate 1, prop = (1 - p_inv)
  * +I+G:  rates = gamma rates / (1 - p_inv), prop = (1 - p_inv)/K
  * +R k:  free (rate, weight) pairs with sum w = 1 and sum w*r = 1
  * +R+I:  free rates with invariable class; rates renormalized likewise
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from ..utils.gamma import discrete_gamma_rates

MIN_GAMMA_SHAPE = 0.02
MAX_GAMMA_SHAPE = 100.0
MIN_PINVAR = 1e-6
TOL_FREE_RATE = 1e-4


@dataclass
class RateModel:
    """Unified rate-heterogeneity state.

    kind: "" (uniform) | "G" | "I" | "I+G" | "R" | "R+I"
    """

    kind: str = ""
    ncat: int = 1
    alpha: float = 1.0  # gamma shape
    p_invar: float = 0.0
    gamma_median: bool = False
    # free-rate (+R) parameters
    free_rates: Optional[np.ndarray] = None  # [K]
    free_props: Optional[np.ndarray] = None  # [K]
    fix_alpha: bool = False
    fix_p_invar: bool = False

    @property
    def has_gamma(self) -> bool:
        return "G" in self.kind

    @property
    def has_invar(self) -> bool:
        return "I" in self.kind

    @property
    def is_free_rate(self) -> bool:
        return "R" in self.kind

    @property
    def is_kategory(self) -> bool:
        """+K: free rates with EQUAL weights and mean pinned to 1
        (RateKategory, /root/reference/model/ratekategory.cpp:23-38;
        ndim = ncat-1, ratekategory.h:89)."""
        return "K" in self.kind

    @property
    def df(self) -> int:
        n = 0
        if self.has_gamma and not self.fix_alpha:
            n += 1
        if self.has_invar and not self.fix_p_invar:
            n += 1
        if self.is_free_rate:
            n += 2 * self.ncat - 2
        if self.is_kategory:
            n += self.ncat - 1
        return n

    def name_suffix(self) -> str:
        s = ""
        if self.has_invar:
            s += "+I"
        if self.has_gamma:
            s += f"+G{self.ncat}" if self.ncat != 4 else "+G4"
        if self.is_free_rate:
            s += f"+R{self.ncat}"
        if self.is_kategory:
            s += f"+K{self.ncat}"
        return s

    def category_rates(self) -> Tuple[np.ndarray, np.ndarray]:
        """(rates [C], props [C]); props sum to 1 - p_invar."""
        if self.is_kategory:
            r = np.asarray(self.free_rates, dtype=np.float64)
            r = r / r.mean()  # the reference keeps sum(rates) == ncat
            # RateKategory inherits getProp() == 1.0 (rateheterogeneity.h:121
            # — unlike RateGamma's 1/ncat), so the reference's +K site
            # likelihood is the UNWEIGHTED SUM over categories; reported
            # lnL is offset by +n_sites*log(ncat) vs a 1/K-weighted mix.
            # Matched here so lnL and BIC agree with the reference.
            w = np.ones(self.ncat)
            return r, w
        if self.is_free_rate:
            r = np.asarray(self.free_rates, dtype=np.float64)
            w = np.asarray(self.free_props, dtype=np.float64)
            w = w / w.sum() * (1.0 - self.p_invar)
            # normalize mean rate to 1 over all sites
            mean = (r * w).sum()
            return r / mean, w
        if self.has_gamma:
            rates = discrete_gamma_rates(
                self.alpha, self.ncat, self.p_invar, self.gamma_median
            )
            props = np.full(self.ncat, (1.0 - self.p_invar) / self.ncat)
            return rates, props
        # uniform or +I only
        return np.array([1.0]), np.array([1.0 - self.p_invar])

    @classmethod
    def make(
        cls,
        gamma_cats: int = 0,
        invar: bool = False,
        free_cats: int = 0,
        alpha: float = 1.0,
        p_invar: float = 0.0,
        gamma_median: bool = False,
        fix_alpha: bool = False,
        fix_p_invar: bool = False,
        kat_cats: int = 0,
    ) -> "RateModel":
        if kat_cats:
            # +K: K free rates, equal weights (RateKategory); the
            # reference inits randomly in [0.1,0.9] then rescales to
            # mean 1 (ratekategory.cpp:34-38) — a deterministic gamma
            # ladder is used here instead (same init as +R)
            k = kat_cats
            return cls(
                kind="K", ncat=k, p_invar=0.0,
                free_rates=(discrete_gamma_rates(1.0, k) if k > 1
                            else np.ones(1)),
                free_props=np.full(k, 1.0 / k),
            )
        if free_cats:
            kind = "R+I" if invar else "R"
            k = free_cats
            # reference init: rates/weights from a gamma-like ladder
            # (ratefree.cpp ctor initializes from gamma quadrature)
            init_r = discrete_gamma_rates(1.0, k)
            init_w = np.full(k, 1.0 / k)
            return cls(
                kind=kind, ncat=k, p_invar=p_invar, alpha=alpha,
                free_rates=init_r, free_props=init_w,
                fix_alpha=fix_alpha, fix_p_invar=fix_p_invar,
            )
        if gamma_cats and invar:
            return cls(kind="I+G", ncat=gamma_cats, alpha=alpha, p_invar=p_invar,
                       gamma_median=gamma_median, fix_alpha=fix_alpha,
                       fix_p_invar=fix_p_invar)
        if gamma_cats:
            return cls(kind="G", ncat=gamma_cats, alpha=alpha,
                       gamma_median=gamma_median, fix_alpha=fix_alpha)
        if invar:
            return cls(kind="I", ncat=1, p_invar=p_invar, fix_p_invar=fix_p_invar)
        return cls()
