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


def write_site_rates(path: str, aln, rates: np.ndarray,
                     posteriors: np.ndarray = None):
    """.rate file (reference -wsr format: site, rate [, category])."""
    site_rates = np.asarray(rates)[aln.site_to_pattern]
    with open(path, "w") as f:
        f.write("# Site-specific substitution rates determined by "
                "empirical Bayes posterior mean\n")
        f.write("Site\tRate\n")
        for i, r in enumerate(site_rates, 1):
            f.write(f"{i}\t{r:.5f}\n")
