"""Pairwise maximum-likelihood distances, batched over all pairs.

Replaces AlignmentPairwise (/root/reference/alignmentpairwise.h:31,
optimizeDist :68; driver computeMLDist phyloanalysis.cpp:1193): the
reference runs 1-D Newton per pair sequentially.  Here the pair count
matrices for ALL pairs come from one einsum over one-hot encodings, and
the per-pair Newton iterations are vmapped.

For a reversible model with rate categories the pairwise likelihood of
count matrix n is  l(t) = sum_st n_st log( sum_c w_c pi_s P_c(t)[s,t] ).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import ModelArrays, SiteData
from .derivatives import MIN_BLEN, MAX_BLEN

HIGHEST = jax.lax.Precision.HIGHEST


def pair_count_matrices(site: SiteData) -> jnp.ndarray:
    """[T, T, S, S] weighted co-occurrence counts for all taxon pairs.

    Ambiguous codes contribute fractionally (mask / mask.sum), gaps and
    unknowns spread uniformly — consistent with how the reference counts
    via state appearance."""
    masks = site.code_masks[site.tip_codes]  # [T, P, S]
    onehot = masks / jnp.maximum(masks.sum(-1, keepdims=True), 1e-30)
    return jnp.einsum(
        "aps,bpt,p->abst", onehot, onehot, site.pattern_freq, precision=HIGHEST
    )


def ml_distances(
    model: ModelArrays,
    site: SiteData,
    newton_iters: int = 12,
) -> jnp.ndarray:
    """[T, T] ML distance matrix (diagonal 0), vmapped Newton."""
    counts = pair_count_matrices(site)  # [T,T,S,S]
    T = counts.shape[0]

    lam = model.eigenvalues
    v = model.eigvec
    vinv = model.inv_eigvec
    pi = model.state_freq
    rates, props = model.rates, model.props

    def pair_obj(n, t):
        # joint[s,t'] = sum_c w_c pi_c[s] P_c(t)[s,t']; derivatives via
        # extra lam_c factors (all per fused category)
        expo = jnp.exp(lam * (t * rates)[:, None])  # [C, S]
        lamr = lam * rates[:, None]
        wpi = props[:, None] * pi  # [C, S] class weight x class freqs
        joint = jnp.einsum("cij,cj,cjk,ci->ik", v, expo, vinv, wpi,
                           precision=HIGHEST)
        num1 = jnp.einsum("cij,cj,cjk,ci->ik", v, expo * lamr, vinv, wpi,
                          precision=HIGHEST)
        num2 = jnp.einsum("cij,cj,cjk,ci->ik", v, expo * lamr ** 2, vinv, wpi,
                          precision=HIGHEST)
        joint = jnp.maximum(joint, 1e-300)
        d1 = jnp.sum(n * num1 / joint)
        r2 = num2 / joint
        r1sq = (num1 / joint) ** 2
        d2 = jnp.sum(n * (r2 - r1sq))
        return d1, d2

    def solve(n):
        # initial guess: observed proportion -> JC-ish correction
        total = jnp.maximum(n.sum(), 1e-30)
        pdiff = 1.0 - jnp.trace(n) / total
        S = pi.shape[-1]
        b = (S - 1.0) / S
        arg = jnp.maximum(1.0 - pdiff / b, 0.05)
        t0 = jnp.clip(-b * jnp.log(arg), MIN_BLEN, MAX_BLEN)

        def newton(_, t):
            d1, d2 = pair_obj(n, t)
            t_new = jnp.where(
                d2 < -1e-12,
                t - d1 / jnp.minimum(d2, -1e-12),
                jnp.where(d1 > 0, t * 2.0, t * 0.5),
            )
            return jnp.clip(t_new, MIN_BLEN, MAX_BLEN)

        return jax.lax.fori_loop(0, newton_iters, newton, t0)

    flat = counts.reshape(T * T, counts.shape[2], counts.shape[3])
    d = jax.vmap(solve)(flat).reshape(T, T)
    d = 0.5 * (d + d.T)
    d = d - jnp.diag(jnp.diag(d))
    return d
