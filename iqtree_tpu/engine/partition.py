"""Partitioned (supertree) likelihood engine.

TPU-native re-expression of the reference's partition models
(/root/reference/phylosupertree.h:33 edge-unlinked `-sp`;
phylosupertreeplen.h:165 edge-linked proportional `-spp` / joint `-spj`;
lnL = sum over partitions, OpenMP over partitions at
phylosupertree.cpp:970,1017).

Key design choice: every partition keeps the FULL taxon set (absent taxa
are all-unknown tips, likelihood-neutral), so all partitions share ONE
topology (TreeArrays index arrays) and the engine is a plain sum of
per-partition likelihoods — no branch-image mapping machinery
(phylosupertree.cpp:751 linkTree) is needed.  Per-partition work is
unrolled inside one jitted program (the XLA analogue of the reference's
`schedule(dynamic)` partition loop).

Branch-length modes:
  joint ("-q"/"-spj")      one shared blen vector
  proportional ("-spp")    shared blen, per-partition rate scale g_k
                           (folded into ModelArrays.rates by
                           PartitionOptimizer — scaling all rates by g_k
                           IS proportional branch scaling)
  unlinked ("-sp")         per-partition blen matrix [K, 2N]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..trees.tree import PhyloTree
from .derivatives import (
    all_passes,
    branch_lnl_derivs,
    compute_thetas,
    optimize_all_branches,
    optimize_branch_mask,
)
from .likelihood import ModelArrays, SiteData, TreeArrays, compute_loglik

MODE_JOINT = "joint"
MODE_PROPORTIONAL = "proportional"
MODE_UNLINKED = "unlinked"


def partition_loglik(
    tree: TreeArrays,
    blens,  # tuple of [2N] arrays (same object K times for shared modes)
    models: Tuple[ModelArrays, ...],
    sites: Tuple[SiteData, ...],
):
    """(total lnL, tuple of per-pattern lnl).  Uses the custom-VJP
    likelihood so the sum is reverse-differentiable for the joint model
    fit (grad.loglik; plain compute_loglik's fori_loop is forward-only)."""
    from .grad import loglik

    total = jnp.zeros((), jnp.float64)
    pats = []
    for b, m, s in zip(blens, models, sites):
        lnl, p = loglik(tree.with_blen(b), m, s)
        total = total + lnl
        pats.append(p)
    return total, tuple(pats)


def optimize_all_branches_joint(
    tree: TreeArrays,
    models: Tuple[ModelArrays, ...],
    sites: Tuple[SiteData, ...],
    n_sweeps: int = 100,
    tol: float = 1e-5,
    max_backtracks: int = 8,
):
    """Shared-blen Newton across partitions: per-branch derivatives are
    the SUM of per-partition theta-buffer derivatives (the edge-linked
    analogue of PhyloSuperTreePlen::optimizeOneBranch,
    phylosupertreeplen.h:295 — but batched over all branches and
    partitions at once)."""
    mask = optimize_branch_mask(tree)

    def true_lnl(blen):
        t = jnp.zeros((), jnp.float64)
        for m, s in zip(models, sites):
            lnl, _ = compute_loglik(tree.with_blen(blen), m, s)
            t = t + lnl
        return t

    def derivs(blen):
        t = tree.with_blen(blen)
        d1 = jnp.zeros_like(blen)
        d2 = jnp.zeros_like(blen)
        for m, s in zip(models, sites):
            up, us, out, os_, _ = all_passes(t, m, s)
            theta = compute_thetas(t, m, s, up, us, out, os_)
            _, d1_k, d2_k = branch_lnl_derivs(theta, m, s, blen)
            d1 = d1 + d1_k
            d2 = d2 + d2_k
        return d1, d2

    def sweep(carry):
        blen, last_lnl, it, _ = carry
        d1, d2 = derivs(blen)
        newton = blen - d1 / jnp.minimum(d2, -1e-12)
        fallback = jnp.where(d1 > 0, blen * 2.0, blen * 0.5)
        target = jnp.clip(
            jnp.where(d2 < -1e-12, newton, fallback), 1e-6, 100.0
        )
        direction = jnp.where(mask, target - blen, 0.0)

        def bt_cond(sv):
            step, lnl_new, k = sv
            return jnp.logical_and(k < max_backtracks, lnl_new < last_lnl)

        def bt_body(sv):
            step, _, k = sv
            step = step * 0.5
            return step, true_lnl(blen + step * direction), k + 1

        lnl_full = true_lnl(blen + direction)
        step, lnl_new, _ = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.asarray(1.0, blen.dtype), lnl_full, jnp.asarray(0)),
        )
        accept = lnl_new >= last_lnl
        new_blen = jnp.where(accept, blen + step * direction, blen)
        lnl_out = jnp.where(accept, lnl_new, last_lnl)
        return new_blen, lnl_out, it + 1, lnl_out - last_lnl

    def cond(carry):
        _, _, it, improved = carry
        return jnp.logical_and(it < n_sweeps, improved > tol)

    lnl0 = true_lnl(tree.blen)
    blen, lnl, _, _ = jax.lax.while_loop(
        cond, sweep,
        (tree.blen, lnl0, jnp.asarray(0),
         jnp.asarray(jnp.inf, dtype=lnl0.dtype)),
    )
    return tree.with_blen(blen), lnl


def optimize_all_branches_unlinked(
    tree: TreeArrays,
    blens: jnp.ndarray,  # [K, 2N]
    models: Tuple[ModelArrays, ...],
    sites: Tuple[SiteData, ...],
    n_sweeps: int = 100,
):
    """Edge-unlinked: independent per-partition Newton (reference `-sp`)."""
    out = []
    total = jnp.zeros((), jnp.float64)
    for k, (m, s) in enumerate(zip(models, sites)):
        t_k, lnl_k = optimize_all_branches(
            tree.with_blen(blens[k]), m, s, n_sweeps=n_sweeps
        )
        out.append(t_k.blen)
        total = total + lnl_k
    return jnp.stack(out), total


# ---------------------------------------------------------------------------
# joint model optimization across partitions
# ---------------------------------------------------------------------------


@dataclass
class PartitionOptimizer:
    """Per-partition ModelOptimizers + (for `-spp`) partition rate scales.

    The scale g_k multiplies partition k's rate categories, which is
    exactly a proportional scaling of all branch lengths in that
    partition (PhyloSuperTreePlen part_rate semantics).  g_0 is pinned
    to 1 (the shared blen vector absorbs the global scale)."""

    opts: List[object]  # List[ModelOptimizer]
    mode: str = MODE_JOINT
    dtype: object = jnp.float64

    def __post_init__(self):
        self._jit_cache = {}

    @property
    def n_parts(self) -> int:
        return len(self.opts)

    def init_params(self) -> Dict:
        p = {f"part{k}": o.init_params() for k, o in enumerate(self.opts)}
        if self.mode == MODE_PROPORTIONAL and self.n_parts > 1:
            p["log_scale"] = jnp.zeros((self.n_parts - 1,), self.dtype)
        return p

    def build(self, params: Dict) -> Tuple[ModelArrays, ...]:
        models = []
        for k, o in enumerate(self.opts):
            ma = o.build(params[f"part{k}"])
            if self.mode == MODE_PROPORTIONAL and self.n_parts > 1 and k > 0:
                g = jnp.exp(params["log_scale"][k - 1])
                ma = ma._replace(rates=ma.rates * g)
            models.append(ma)
        return tuple(models)

    def unpack(self, params: Dict):
        out = [o.unpack(params[f"part{k}"]) for k, o in enumerate(self.opts)]
        scales = np.ones(self.n_parts)
        if self.mode == MODE_PROPORTIONAL and self.n_parts > 1:
            scales[1:] = np.exp(np.asarray(params["log_scale"]))
        return out, scales

    @property
    def n_free_params(self) -> int:
        n = sum(o.n_free_params for o in self.opts)
        if self.mode == MODE_PROPORTIONAL and self.n_parts > 1:
            n += self.n_parts - 1
        return n


def fit_partition_models(
    popt: PartitionOptimizer,
    tree: TreeArrays,
    blens,
    sites: Tuple[SiteData, ...],
    params: Dict,
    max_iters: int = 60,
):
    """One L-BFGS solve of ALL partitions' model parameters jointly."""
    from ..utils.lbfgs import lbfgs_minimize

    def negloglik(p):
        models = popt.build(p)
        total, _ = partition_loglik(tree, blens, models, sites)
        return -total

    if not any(np.size(v) for v in jax.tree_util.tree_leaves(params)):
        return params, -negloglik(params)
    p, val, _ = lbfgs_minimize(negloglik, params, max_iters=max_iters)
    return p, -val


def optimize_partitioned(
    popt: PartitionOptimizer,
    tree: TreeArrays,
    blens,  # [K,2N] for unlinked; ignored for shared modes (tree.blen)
    sites: Tuple[SiteData, ...],
    params: Optional[Dict] = None,
    rounds: int = 10,
    tol: float = 0.01,
):
    """Alternate joint model L-BFGS and branch Newton (the partitioned
    analogue of models/optimize.optimize_model_and_branches).  Returns
    (tree, blens, params, lnl)."""
    if params is None:
        params = popt.init_params()
    mode = popt.mode

    key = ("pround", tuple(s.tip_codes.shape for s in sites), mode)
    step = popt._jit_cache.get(key)
    if step is None:

        def _round(t, bl, p):
            p, _ = fit_partition_models(
                popt, t, _blen_tuple(t, bl, mode, popt.n_parts), sites, p
            )
            models = popt.build(p)
            if mode == MODE_UNLINKED:
                bl, lnl = optimize_all_branches_unlinked(
                    t, bl, models, sites
                )
            else:
                t, lnl = optimize_all_branches_joint(t, models, sites)
            return t, bl, p, lnl

        step = jax.jit(_round)
        popt._jit_cache[key] = step

    lnl_prev = -np.inf
    lnl = -np.inf
    for it in range(rounds):
        tree, blens, params, lnl = step(tree, blens, params)
        if float(lnl) - lnl_prev < tol and it > 0:
            break
        lnl_prev = float(lnl)
    return tree, blens, params, float(lnl)


def _blen_tuple(tree: TreeArrays, blens, mode: str, n_parts: int):
    if mode == MODE_UNLINKED:
        return tuple(blens[k] for k in range(n_parts))
    return tuple([tree.blen] * n_parts)
