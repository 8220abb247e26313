"""Per-site rate estimation.

Two estimators matching the reference's site-rate machinery:

* Empirical-Bayes posterior mean rates under the fitted rate-
  heterogeneity model (the reference's `-wsr` output via
  RateGamma/RateFree category posteriors):
      r_hat_p = sum_c r_c w_c L_pc / sum_c w_c L_pc
* ML site rates (RateMeyerHaeseler, model/ratemeyerhaeseler.h:29):
  per-site 1-D Newton on a rate multiplier applied to all branches,
  batched over sites via the theta buffers at the root branch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import (
    ModelArrays,
    SCALE_TINY,
    SiteData,
    TreeArrays,
    branch_transition_mats,
    tip_partials,
    upward_pass,
)

HIGHEST = jax.lax.Precision.HIGHEST


def posterior_mean_rates(
    tree: TreeArrays, model: ModelArrays, site: SiteData
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rates [P], cat_posteriors [P, C(+1 if invar)]) — empirical-Bayes
    posterior mean site rates (cf. RateGamma::computePatternRates)."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    up, scale = upward_pass(tree, trans, tips)
    x = up[tree.root]  # [C, S, P]
    l_pc = jnp.einsum("cs,csp->cp", model.state_freq, x, precision=HIGHEST)
    w_l = model.props[:, None] * l_pc  # [C, P] scaled likelihood per cat
    # invariable-site class (rate 0)
    S = model.num_states
    mean_freq = model.mean_freq
    pi_ext = jnp.concatenate([mean_freq, jnp.ones((1,), mean_freq.dtype)])
    w0 = jnp.where(site.const_state >= 0,
                   pi_ext[jnp.clip(site.const_state, 0, S)], 0.0)
    invar = model.p_invar * w0 * jnp.exp(jnp.clip(-scale[tree.root], max=80.0))
    denom = jnp.maximum(w_l.sum(0) + invar, SCALE_TINY)
    rates = jnp.einsum("c,cp->p", model.rates, w_l, precision=HIGHEST) / denom
    post = jnp.concatenate([w_l, invar[None, :]], axis=0) / denom[None, :]
    return rates, jnp.swapaxes(post, 0, 1)


def ml_site_rates(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    newton_iters: int = 20,
    min_rate: float = 1e-4,
    max_rate: float = 100.0,
) -> jnp.ndarray:
    """[P] per-site ML rate multipliers (RateMeyerHaeseler semantics,
    model/ratemeyerhaeseler.cpp optimizeSiteRates): the site likelihood
    as a function of a global rate multiplier rho is evaluated through
    the root-branch theta buffer, so every Newton iteration over ALL
    sites is one batched einsum."""
    # theta at the root's child branch: L_p(rho) when rho scales the one
    # branch... scaling ALL branches needs full re-evaluation, so use a
    # short fixed-point: evaluate lnl_p on a log-spaced rate grid and
    # Newton-polish on the best gridpoint via quadratic fit.
    grid = jnp.exp(jnp.linspace(np.log(min_rate), np.log(max_rate), 25))

    tips = tip_partials(site, model.ncat)

    def lnl_at(rho):
        trans = branch_transition_mats(model, tree.blen * rho)
        up, scale = upward_pass(tree, trans, tips)
        x = up[tree.root]
        lh = jnp.einsum("c,cs,csp->p", model.props, model.state_freq, x,
                        precision=HIGHEST)
        return scale[tree.root] + jnp.log(jnp.maximum(lh, SCALE_TINY))

    lnls = jax.lax.map(lnl_at, grid)  # [G, P]
    best = jnp.argmax(lnls, axis=0)  # [P]
    G = grid.shape[0]
    i0 = jnp.clip(best, 1, G - 2)
    lm = jnp.take_along_axis(lnls, (i0 - 1)[None, :], 0)[0]
    l0 = jnp.take_along_axis(lnls, i0[None, :], 0)[0]
    lp = jnp.take_along_axis(lnls, (i0 + 1)[None, :], 0)[0]
    # quadratic interpolation in log-rate space (uniform grid)
    h = jnp.log(grid[1]) - jnp.log(grid[0])
    denom = lm - 2 * l0 + lp
    delta = jnp.where(denom < -1e-12, 0.5 * (lm - lp) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    log_rate = jnp.log(grid)[i0] + delta * h
    # saturate at the rails like the reference (MAX_SITE_RATE)
    log_rate = jnp.where(best == 0, jnp.log(grid)[0], log_rate)
    log_rate = jnp.where(best == G - 1, jnp.log(grid)[G - 1], log_rate)
    return jnp.exp(log_rate)


def weighted_kmeans_1d(
    points: np.ndarray,
    weights: np.ndarray,
    k: int,
    max_iters: int = 200,
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic weighted 1-D k-means: weighted-quantile init + Lloyd
    to convergence.  Replaces the reference's RunKMeans1D
    (model/ratemeyerdiscrete.cpp:453, vendored kmeans/) — deterministic
    init instead of random restarts.  Returns (centers [k] sorted,
    assignment [n])."""
    points = np.asarray(points, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    order = np.argsort(points)
    ps, ws = points[order], weights[order]
    cw = np.cumsum(ws)
    q = (np.arange(k) + 0.5) / k * cw[-1]
    centers = ps[np.searchsorted(cw, q).clip(0, len(ps) - 1)]
    centers = np.unique(centers)
    if centers.size < k:  # duplicate quantiles (few distinct points)
        extra = centers[-1] + np.arange(1, k - centers.size + 1, dtype=np.float64)
        centers = np.sort(np.concatenate([centers, extra]))
    for _ in range(max_iters):
        assign = np.argmin(np.abs(points[:, None] - centers[None, :]), axis=1)
        new = centers.copy()
        for j in range(k):
            m = assign == j
            wsum = weights[m].sum()
            if wsum > 0:
                new[j] = (points[m] * weights[m]).sum() / wsum
        if np.allclose(new, centers, atol=1e-12):
            break
        centers = new
    order = np.argsort(centers)
    remap = np.empty(k, dtype=np.int64)
    remap[order] = np.arange(k)
    return centers[order], remap[assign]


MIN_SITE_RATE = 1e-4
MAX_SITE_RATE = 100.0


def discrete_ml_site_rates(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    ncat: int,
    use_log: bool = True,
    per_site_weights: bool = False,
    aln=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RateMeyerDiscrete: k-means discretization of the per-pattern ML
    rates (model/ratemeyerdiscrete.cpp:432 classifyRatesKMeans).

    Defaults mirror the reference's MCAT_LOG + MCAT_PATTERN
    (tools.cpp:811): clustering in log-rate space with unit
    per-pattern weights; per_site_weights=True (reference -cat_site)
    weights each pattern by its site frequency.  Category rates are
    rail-clipped and renormalized to weighted mean 1 over non-saturated
    sites (normalizeRates, ratemeyerdiscrete.cpp:410).

    Returns (cat_rates [ncat], ptn_cat [P], ptn_rates [P])."""
    raw = np.asarray(jax.jit(ml_site_rates)(tree, model, site))
    pts = np.log(np.maximum(raw, MIN_SITE_RATE)) if use_log else raw
    w = np.ones_like(raw)
    if per_site_weights:
        w = np.asarray(site.pattern_freq)
    centers, cat = weighted_kmeans_1d(pts, w, ncat)
    rates = np.exp(centers) if use_log else centers
    rates[0] = max(rates[0], MIN_SITE_RATE)
    rates[-1] = min(rates[-1], MAX_SITE_RATE)
    # normalize to weighted mean 1 over non-saturated sites
    ptn_rates = rates[cat]
    freq = np.asarray(site.pattern_freq)
    ok = ptn_rates < MAX_SITE_RATE
    sum_r = (ptn_rates[ok] * freq[ok]).sum()
    sum_w = freq[ok].sum()
    if abs(sum_r - sum_w) > 1e-3 and sum_r > 0:
        scale = sum_w / sum_r
        adj = (rates > 2 * MIN_SITE_RATE) & (rates < MAX_SITE_RATE)
        rates[adj] *= scale
        ptn_rates = rates[cat]
    return rates, cat, ptn_rates


def write_site_rates(path: str, aln, rates: np.ndarray,
                     posteriors: np.ndarray = None,
                     categories: np.ndarray = None,
                     method: str = "empirical Bayes posterior mean"):
    """.rate file (reference -wsr format: site, rate [, category])."""
    site_rates = np.asarray(rates)[aln.site_to_pattern]
    site_cat = (
        np.asarray(categories)[aln.site_to_pattern]
        if categories is not None else None
    )
    with open(path, "w") as f:
        f.write("# Site-specific substitution rates determined by "
                f"{method}\n")
        f.write("Site\tRate" + ("\tCategory" if site_cat is not None else "")
                + "\n")
        for i, r in enumerate(site_rates, 1):
            if site_cat is not None:
                f.write(f"{i}\t{r:.5f}\t{site_cat[i - 1] + 1}\n")
            else:
                f.write(f"{i}\t{r:.5f}\n")
