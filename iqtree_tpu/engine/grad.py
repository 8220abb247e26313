"""Constant-memory exact gradients for the tree likelihood (custom VJP).

jax.grad through the pruning `lax.scan` stores every intermediate carry —
O(N) copies of the full partials buffer — which is unusable beyond toy
trees.  The classical message-passing identity gives all gradients from
ONE extra (downward) pass instead:

  For any edge e:  L_p = sum_c w_c sum_{s,t} O_e[c,s,p] P_e[c,s,t] U_e[c,t,p]
  =>  d lnl_p / d P_e[c,s,t] = w_c O_e[c,s,p] U_e[c,t,p]
                                 * exp(scaleO_e + scaleU_e - lnl_p)

so the cotangent for every transition matrix is a single batched einsum
over (O, U), and cotangents for branch lengths / eigen-data / rates
follow by ordinary autodiff through `branch_transition_mats` (a tiny op).
Root-level parameters (props, state frequencies, p_invar) get their
cotangents through `root_loglik` directly; the implicit dependence of the
eigenvectors on the frequencies is handled *outside* this boundary by
autodiff through models/eigen.py.

This is the TPU-native analogue of the reference's analytic-derivative
kernels (computeLikelihoodDervEigenSIMD, phylokernel.h:485) generalized
to all parameters at once.  Residuals = the primal inputs only; the
backward pass rematerializes both sweeps (cf. the reference's
memory-saving LM_PER_NODE re-orientation, phylotree.h lh_mem_save).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .derivatives import downward_pass
from .likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    branch_transition_mats,
    root_loglik,
    tip_partials,
    upward_pass,
)

HIGHEST = jax.lax.Precision.HIGHEST


@jax.custom_vjp
def loglik(tree: TreeArrays, model: ModelArrays, site: SiteData):
    """(total lnL, per-pattern lnl) with an efficient custom VJP.

    NOTE: cotangents are produced for tree.blen and all ModelArrays
    leaves, and for site.pattern_freq; site.code_masks is treated as a
    constant (zero cotangent)."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    up, up_scale = upward_pass(tree, trans, tips)
    root = tree.root
    return root_loglik(model, site, up[root], up_scale[root])


def _loglik_fwd(tree, model, site):
    out = loglik(tree, model, site)
    return out, (tree, model, site)


def _loglik_bwd(res, cotangents):
    tree, model, site = res
    g_total, g_pat = cotangents

    # recompute both sweeps (rematerialization)
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    up, up_scale, mb, msc = upward_pass(tree, trans, tips, return_mailbox=True)
    out, out_scale = downward_pass(tree, trans, mb, msc, model.state_freq)
    root = tree.root

    # root-level vjp: props, state_freq, p_invar, pattern_freq (and lnl_p)
    def root_fn(model_, pattern_freq_):
        site_ = site._replace(pattern_freq=pattern_freq_)
        return root_loglik(model_, site_, up[root], up_scale[root])

    (lnl_total, lnl_p), root_vjp = jax.vjp(root_fn, model, site.pattern_freq)
    model_bar, pattern_freq_bar = root_vjp((g_total, g_pat))

    # per-pattern weight: d(outputs)/d lnl_p pulled back
    w_p = g_total * site.pattern_freq + g_pat  # [P]

    # edge-level: trans_bar[e,c,s,t] = sum_p w_c O U * exp(scales - lnl_p) * w_p
    factor = jnp.exp(
        jnp.clip(out_scale + up_scale - lnl_p[None, :], max=80.0)
    ) * w_p[None, :]  # [E, P]
    # zero out the root row (no edge above the root)
    factor = factor.at[root].set(0.0)
    trans_bar = jnp.einsum(
        "ecsp,ectp,ep,c->ecst", out, up, factor, model.props,
        precision=HIGHEST,
    )[: tree.n_slots]  # drop schedule padding rows (out==0 there anyway)

    # pull trans_bar back through P(t) construction -> blen + eigen + rates
    def trans_fn(model_, blen_):
        return branch_transition_mats(model_, blen_)

    _, trans_vjp = jax.vjp(trans_fn, model, tree.blen)
    model_bar2, blen_bar = trans_vjp(trans_bar)

    model_bar = jax.tree_util.tree_map(jnp.add, model_bar, model_bar2)

    tree_bar = jax.tree_util.tree_map(
        lambda x: (
            blen_bar
            if x is tree.blen
            else np.zeros(x.shape, dtype=jax.dtypes.float0)
        ),
        tree,
    )
    site_bar = SiteData(
        tip_codes=_int_zero(site.tip_codes),
        code_masks=jnp.zeros_like(site.code_masks),
        pattern_freq=pattern_freq_bar,
        const_state=_int_zero(site.const_state),
    )
    return tree_bar, model_bar, site_bar


def _int_zero(x):
    """float0 cotangent for integer-valued primal arrays."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


loglik.defvjp(_loglik_fwd, _loglik_bwd)
