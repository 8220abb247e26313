"""Discrete Gamma rate-category quadrature (Yang 1994).

Host-side (NumPy/SciPy) computation of the per-category rates used by the
+G model of among-site rate variation.  Matches the conventions of the
reference implementation (/root/reference/model/rategamma.cpp:89-151):

* "mean" quadrature (default): category c covers the (c/K, (c+1)/K)
  quantile slice of Gamma(alpha, 1/alpha); its rate is the conditional mean
  of the slice, computed with the incomplete-gamma identity
  E[X | a<X<b] * P(a<X<b) = I(b*alpha; alpha+1) - I(a*alpha; alpha+1).
* "median" quadrature: rate = quantile at the slice midpoint, then rescaled
  so the mean rate is exactly 1.
* With invariable sites (+I), all rates are divided by (1 - p_inv) so that
  the expected rate over ALL sites stays 1
  (/root/reference/model/rategamma.cpp:121-126).
"""

from __future__ import annotations

import numpy as np
from scipy.special import gammaincinv, gammainc


def discrete_gamma_rates(
    alpha: float,
    ncat: int,
    p_inv: float = 0.0,
    median: bool = False,
) -> np.ndarray:
    """Per-category relative rates for the discrete Gamma model.

    Returns an array of shape [ncat]; mean rate is 1/(1-p_inv).
    """
    if ncat == 1:
        rates = np.array([1.0])
    elif median:
        probs = (2.0 * np.arange(ncat) + 1.0) / (2.0 * ncat)
        rates = gammaincinv(alpha, probs) / alpha
        rates = np.abs(rates)
        rates = rates * ncat / rates.sum()
    else:
        # Cut points between categories: quantiles of Gamma(alpha, scale=1/alpha)
        cut_quant = np.arange(1, ncat) / ncat
        cuts = gammaincinv(alpha, cut_quant) / alpha  # shape [ncat-1]
        # I(cut*alpha; alpha+1) = P(Gamma(alpha+1,1) < cut*alpha)
        upper_inc = gammainc(alpha + 1.0, cuts * alpha)  # shape [ncat-1]
        rates = np.empty(ncat)
        rates[0] = upper_inc[0] * ncat
        rates[-1] = (1.0 - upper_inc[-1]) * ncat
        if ncat > 2:
            rates[1:-1] = (upper_inc[1:] - upper_inc[:-1]) * ncat
    if p_inv > 0.0:
        rates = rates / (1.0 - p_inv)
    return rates
