"""Batched NNI evaluation — every internal branch, both swaps, at once.

TPU-native redesign of PhyloTree::getBestNNIForBran
(/root/reference/phylotree.cpp:2873-3080): the reference walks branches
one at a time, swapping pointers and re-optimizing 1 or 5 branch lengths
in place.  Here ONE up pass + ONE down pass provide the four subtree
messages around every internal edge; each NNI candidate is then a purely
local computation (messages fixed, 5 local branch lengths re-optimized by
Newton), vmapped over all candidates.

Around internal edge (v, u = parent(v)) the four subtrees are
  a = children[v,0],  b = children[v,1]   (below v)
  c = sibling of v,                       (below u)
  up = everything above u                 (outside message O[u])
swap 0 exchanges a <-> c, swap 1 exchanges b <-> c, matching
PhyloTree.apply_nni(v, swap_child) on the host side.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .derivatives import downward_pass
from .likelihood import (
    ModelArrays,
    SCALE_TINY,
    SiteData,
    TreeArrays,
    branch_transition_mats,
    tip_partials,
    upward_pass,
)
from .derivatives import blen_bounds

HIGHEST = jax.lax.Precision.HIGHEST


class NNIEval(NamedTuple):
    lnl: jnp.ndarray  # [E, 2] candidate log-likelihoods
    center_blen: jnp.ndarray  # [E, 2] optimized central branch length
    cur_lnl: jnp.ndarray  # scalar: current-tree lnL (same machinery)
    site_lnl: jnp.ndarray = None  # [E, 2, P] per-pattern lnl (optional)
    # paired evaluation (f32 TPU): the SAME edge's identity (unswapped)
    # configuration scored through the identical local machinery.  Deep
    # f32 partial chains carry per-edge lnL biases of +-10..100 at 1000
    # taxa on the MXU; the bias lives in the shared (U, O) messages and
    # cancels in lnl - base_lnl, leaving the true topology effect.
    base_lnl: jnp.ndarray = None  # [E]


def _pmat(model: ModelArrays, t) -> jnp.ndarray:
    """P(t * r_c): [C, S, S] for a scalar branch length.

    Non-reversible models (UNREST) carry Q itself and identity eigen
    arrays, so the spectral form would silently give P = I; dispatch to
    the solve-free expm instead (ModelNonRev::computeTransMatrix,
    /root/reference/model/modelnonrev.cpp:246)."""
    if model.qmat is not None:
        from ..models.nonrev import expm_taylor

        qt = model.qmat * (t * model.rates)[:, None, None]
        return expm_taylor(qt)
    expo = jnp.exp(model.eigenvalues * (t * model.rates)[:, None])
    return jnp.einsum(
        "cij,cj,cjk->cik", model.eigvec, expo, model.inv_eigvec, precision=HIGHEST
    )


def _apply(p, x):
    """[C,S,S] x [C,S,P] -> [C,S,P]"""
    return jnp.einsum("cst,ctp->csp", p, x, precision=HIGHEST)


def _apply_t(p, x):
    return jnp.einsum("cst,csp->ctp", p, x, precision=HIGHEST)


def _rescale(x, scale):
    m = jnp.maximum(jnp.max(x, axis=(0, 1)), SCALE_TINY)
    return x / m, scale + jnp.log(m)


def _theta_lnl_newton(
    model: ModelArrays,
    site: SiteData,
    inside,  # [C,S,P]
    in_scale,  # [P]
    outside,  # [C,S,P]
    out_scale,  # [P]
    t0,
    ptn_invar,  # [P]
    newton_iters: int = 4,
):
    """1-D branch optimization on a theta buffer; returns (t*, lnl(t*)).

    Reversible models use the spectral theta trick (dot products with
    exp(lambda r t) weights); qmat models (UNREST) have no eigen form,
    so P(t) is rebuilt by expm each iteration and the derivatives use
    dP/dt = r_c Q P (cheap: S=4, a few 4x4 matmuls per iteration)."""
    scale = in_scale + out_scale  # [P]
    invar = ptn_invar * jnp.exp(jnp.clip(-scale, max=80.0)) * (ptn_invar > 0)

    if model.qmat is not None:
        rq = model.qmat * model.rates[:, None, None]  # [C,S,S]

        def derivs(t):
            p = _pmat(model, t)  # [C,S,S]
            qp = jnp.einsum("cij,cjk->cik", rq, p, precision=HIGHEST)
            qqp = jnp.einsum("cij,cjk->cik", rq, qp, precision=HIGHEST)

            def fk(m):
                return jnp.einsum(
                    "c,csp,cst,ctp->p", model.props, outside, m, inside,
                    precision=HIGHEST,
                )

            denom = jnp.maximum(fk(p), SCALE_TINY) + invar
            return denom, fk(qp), fk(qqp)
    else:
        vt_o = jnp.einsum("csj,csp->cjp", model.eigvec, outside, precision=HIGHEST)
        vi_u = jnp.einsum("cjs,csp->cjp", model.inv_eigvec, inside, precision=HIGHEST)
        theta = vt_o * vi_u  # [C, S(j), P]
        lam_r = model.eigenvalues * model.rates[:, None]  # [C, j]

        def derivs(t):
            e = model.props[:, None] * jnp.exp(lam_r * t)  # [C, j]
            f0 = jnp.einsum("cj,cjp->p", e, theta, precision=HIGHEST)
            f1 = jnp.einsum("cj,cj,cjp->p", e, lam_r, theta, precision=HIGHEST)
            f2 = jnp.einsum("cj,cj,cjp->p", e, lam_r * lam_r, theta, precision=HIGHEST)
            denom = jnp.maximum(f0, SCALE_TINY) + invar
            return denom, f1, f2

    n_sites = jnp.sum(site.pattern_freq)

    def newton(i, t):
        denom, f1, f2 = derivs(t)
        r1 = f1 / denom
        r2 = f2 / denom
        d1 = jnp.sum(site.pattern_freq * r1)
        d2 = jnp.sum(site.pattern_freq * (r2 - r1 * r1))
        # +ASC terms (see derivatives.branch_lnl_derivs)
        lnl_p = scale + jnp.log(denom)
        L_asc = site.asc_mask * jnp.exp(jnp.minimum(lnl_p, 0.0))
        one_m_q = jnp.maximum(1.0 - jnp.sum(L_asc), 1e-10)
        q1 = jnp.sum(L_asc * r1)
        q2 = jnp.sum(L_asc * r2)
        d1 = d1 + n_sites * q1 / one_m_q
        d2 = d2 + n_sites * (q2 / one_m_q + (q1 / one_m_q) ** 2)
        t_new = jnp.where(
            d2 < -1e-12,
            t - d1 / jnp.minimum(d2, -1e-12),
            jnp.where(d1 > 0, t * 2.0, t * 0.5),
        )
        return jnp.clip(t_new, *blen_bounds())

    t = jax.lax.fori_loop(0, newton_iters, newton, t0)
    denom, _, _ = derivs(t)
    site_lnl = scale + jnp.log(denom)
    from .likelihood import asc_correction

    site_lnl = site_lnl - asc_correction(site, site_lnl)
    lnl = jnp.sum(
        site.pattern_freq.astype(jnp.float64) * site_lnl.astype(jnp.float64)
    )
    return t, lnl, site_lnl


def _ptn_invar(model: ModelArrays, site: SiteData):
    S = model.num_states
    mean_freq = model.mean_freq
    pi_ext = jnp.concatenate([mean_freq, jnp.ones((1,), mean_freq.dtype)])
    w = jnp.where(site.const_state >= 0, pi_ext[jnp.clip(site.const_state, 0, S)], 0.0)
    return model.p_invar * w


def evaluate_nnis(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    edges: jnp.ndarray,  # [E] int32 DEVICE node ids with internal parent edge
    nni5: bool = True,
    # ONE round over the 5 local branches matches the reference
    # (getBestNNIForBran optimizes each branch once per swap,
    # phylotree.cpp:2990-3013); round 4 used 2 rounds — ~1.7x the eval
    # cost for no measurable lnL gain at 1000 taxa
    local_rounds: int = 1,
    final_newton: int = 2,
    want_site_lnl: bool = False,
    steps: jnp.ndarray = None,
    n_slots: int = 0,
    edge_chunk: int = 0,
    paired: bool = False,
) -> NNIEval:
    """Evaluate both NNIs on every given edge (vmapped).

    nni5=True re-optimizes all 5 local branch lengths (reference default,
    phylotree.cpp getBestNNIForBran with params->nni5); nni5=False only
    the central one.

    With a slot schedule (steps, n_slots) the two global passes run on
    the FUSED Pallas store kernels (packed CS sweeps for DNA-class
    shapes, unpacked store sweeps otherwise) instead of the XLA mailbox
    engine — the round-4 search fast path: the mailbox passes measure
    ~25x slower than the fused kernels at 1000 taxa (BENCH_r03), and
    they dominate every evaluate_nnis call.  The per-candidate local
    re-optimization that follows is unchanged (batched XLA einsums).

    Site-specific models (SSFArrays, engine/sitemodel.py) dispatch to
    the per-pattern-basis primitives — the search machinery is shared
    (the reference likewise reuses its NNI loop over the sitemodel
    kernels, phylokernelsitemodel.h)."""
    is_ssf = hasattr(model, "ptn_class")
    if is_ssf:
        from .sitemodel import (
            gather_eigendata,
            ssf_apply,
            ssf_apply_t,
            ssf_downward_pass,
            ssf_ptn_invar,
            ssf_theta_lnl_newton,
            ssf_upward_pass,
        )

        g = gather_eigendata(model)
        tips = tip_partials(site, model.ncat)
        up, up_scale, mb, msc = ssf_upward_pass(
            tree, model, g, tips, return_mailbox=True
        )
        out, out_scale = ssf_downward_pass(tree, model, g, mb, msc)
        ptn_invar = ssf_ptn_invar(model, g, site)
        papply = lambda t, x: ssf_apply(g, model.rates, t, x)
        papply_t = lambda t, x: ssf_apply_t(g, model.rates, t, x)
        theta_newton = lambda ins, s_in, outs, s_out, t0, iters: (
            ssf_theta_lnl_newton(model, g, site, ins, s_in, outs, s_out,
                                 t0, ptn_invar, iters)
        )
    else:
        trans = branch_transition_mats(model, tree.blen)
        tips = tip_partials(site, model.ncat)
        if steps is not None and model.qmat is None:
            from .derivatives import pad_site_patterns
            from .kernels.cs_kernels import fused_nni_passes_cs
            from .kernels.pruning import _cs_packable, fused_nni_passes_general

            C, S = model.ncat, model.num_states
            if _cs_packable(C, S):
                up, up_scale, out, out_scale = fused_nni_passes_cs(
                    steps, n_slots, trans, tips, model.props,
                    model.state_freq,
                )
                n_nodes, _, P_pad = up.shape
                up = up.reshape(n_nodes, C, S, P_pad)
                out = out.reshape(n_nodes, C, S, P_pad)
            else:
                up, up_scale, out, out_scale = fused_nni_passes_general(
                    steps, n_slots, trans, tips, model.props,
                    model.state_freq,
                )
            site = pad_site_patterns(site, up.shape[-1])
        else:
            up, up_scale, mb, msc = upward_pass(
                tree, trans, tips, return_mailbox=True
            )
            out, out_scale = downward_pass(
                tree, trans, mb, msc, model.state_freq, with_d=False
            )
        ptn_invar = _ptn_invar(model, site)
        papply = lambda t, x: _apply(_pmat(model, t), x)
        papply_t = lambda t, x: _apply_t(_pmat(model, t), x)
        theta_newton = lambda ins, s_in, outs, s_out, t0, iters: (
            _theta_lnl_newton(model, site, ins, s_in, outs, s_out, t0,
                              ptn_invar, iters)
        )

    root = tree.root
    # current lnL through the same machinery (for consistent comparison):
    # use the first edge's parent edge theta — any branch gives the tree lnL
    def cur_lnl_fn():
        v = edges[0]
        _, lnl, _ = theta_newton(
            up[v], up_scale[v], out[v], out_scale[v], tree.blen[v], 0,
        )
        return lnl

    cur_lnl = cur_lnl_fn()

    def eval_edge(v, swap):
        u = tree.parent_of(v)
        a = tree.children[v, 0]
        b = tree.children[v, 1]
        w_slot = jnp.where(tree.children[u, 0] == v, 1, 0)
        c = tree.children[u, w_slot]
        # swap 0: exchange a<->c -> inside (c, b), outgoing a
        # swap 1: exchange b<->c -> inside (a, c), outgoing b
        # swap 2 (paired baseline): identity -> inside (a, b), outgoing c
        p_node = jnp.where(swap == 0, c, a)
        q_node = jnp.where(swap == 0, b, jnp.where(swap == 1, c, b))
        r_node = jnp.where(swap == 0, a, jnp.where(swap == 1, b, c))

        U_p, sU_p = up[p_node], up_scale[p_node]
        U_q, sU_q = up[q_node], up_scale[q_node]
        U_r, sU_r = up[r_node], up_scale[r_node]
        O_u, sO_u = out[u], out_scale[u]

        # branch lengths travel with their subtrees (doNNI semantics)
        t_p = tree.blen[p_node]
        t_q = tree.blen[q_node]
        t_r = tree.blen[r_node]
        t_u = tree.blen[u]
        t_c = tree.blen[v]

        def local_iter(_, ts):
            t_p, t_q, t_r, t_u, t_c = ts
            M_p = papply(t_p, U_p)
            M_q = papply(t_q, U_q)
            M_r = papply(t_r, U_r)
            M_up = papply_t(t_u, O_u)
            inside, s_in = _rescale(M_p * M_q, sU_p + sU_q)
            outside, s_out = _rescale(M_r * M_up, sU_r + sO_u)
            # central branch
            t_c, _, _ = theta_newton(inside, s_in, outside, s_out, t_c, 2)
            if nni5:
                down = papply_t(t_c, outside)  # at v, from outside
                s_down = s_out
                # outer branch p: outside = M_q * down
                o_p, so_p = _rescale(M_q * down, sU_q + s_down)
                t_p, _, _ = theta_newton(U_p, sU_p, o_p, so_p, t_p, 2)
                o_q, so_q = _rescale(M_p * down, sU_p + s_down)
                t_q, _, _ = theta_newton(U_q, sU_q, o_q, so_q, t_q, 2)
                up2 = papply(t_c, inside)  # message v->u
                s_up2 = s_in
                o_r, so_r = _rescale(M_up * up2, sO_u + s_up2)
                t_r, _, _ = theta_newton(U_r, sU_r, o_r, so_r, t_r, 2)
                u_in, su_in = _rescale(M_r * up2, sU_r + s_up2)
                t_u, _, _ = theta_newton(u_in, su_in, O_u, sO_u, t_u, 2)
            return t_p, t_q, t_r, t_u, t_c

        ts = jax.lax.fori_loop(
            0, local_rounds, local_iter, (t_p, t_q, t_r, t_u, t_c)
        )
        t_p, t_q, t_r, t_u, t_c = ts
        # final score at the center
        M_p = papply(t_p, U_p)
        M_q = papply(t_q, U_q)
        M_r = papply(t_r, U_r)
        M_up = papply_t(t_u, O_u)
        inside, s_in = _rescale(M_p * M_q, sU_p + sU_q)
        outside, s_out = _rescale(M_r * M_up, sU_r + sO_u)
        t_c, lnl, slnl = theta_newton(
            inside, s_in, outside, s_out, t_c, final_newton,
        )
        return lnl, t_c, slnl

    eval_v = jax.vmap(
        jax.vmap(eval_edge, in_axes=(None, 0)), in_axes=(0, None)
    )
    n_sw = 3 if paired else 2
    swaps = jnp.arange(n_sw)
    E = edges.shape[0]
    if edge_chunk and E > edge_chunk:
        # bound peak memory: the full vmap materializes per-candidate
        # [C,S,P] messages for EVERY edge at once (multi-GB at 1000 taxa
        # x 10k patterns); lax.map over edge blocks keeps only one
        # block's temporaries live.  Padding edges repeat edge 0 and are
        # sliced off.
        B = edge_chunk
        E_pad = -(-E // B) * B
        epad = jnp.concatenate(
            [edges, jnp.broadcast_to(edges[:1], (E_pad - E,))])
        lnls, t_centers, site_lnls = jax.lax.map(
            lambda chunk: eval_v(chunk, swaps),
            epad.reshape(E_pad // B, B),
        )
        lnls = lnls.reshape(E_pad, n_sw)[:E]
        t_centers = t_centers.reshape(E_pad, n_sw)[:E]
        if site_lnls is not None:
            site_lnls = site_lnls.reshape(
                (E_pad, n_sw) + site_lnls.shape[3:])[:E]
    else:
        lnls, t_centers, site_lnls = eval_v(edges, swaps)
    return NNIEval(
        lnl=lnls[:, :2],
        center_blen=t_centers[:, :2],
        cur_lnl=cur_lnl,
        site_lnl=(site_lnls[:, :2] if want_site_lnl else None),
        base_lnl=lnls[:, 2] if paired else None,
    )


def nni_upper_bounds(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    edges: jnp.ndarray,  # [E] device node ids with internal parent edge
) -> jnp.ndarray:
    """[E, 2] upper bounds on the swapped-topology log-likelihood
    (the `-upNNI` prefilter; getBestNNIForBranUB,
    /root/reference/upperbounds.cpp:598, hook phylotree.cpp:2884).

    UB(swap) = sum of the 4 subtree marginal lnLs
             + n_sites * [logC(t_center) + logC(t_i+t_j) + logC(t_k+t_l)]
    where logC(t) = log(max_ij P_ij(t) / min_s pi_s)
    (upperbounds.cpp:809) and (i,j),(k,l) are the post-swap subtree
    pairings.  One batched program for every branch at once — the
    reference computes this per branch inside the NNI loop."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    up, up_scale, mb, msc = upward_pass(tree, trans, tips, return_mailbox=True)
    out, out_scale = downward_pass(
        tree, trans, mb, msc, model.state_freq, with_d=False
    )
    min_freq = jnp.min(model.state_freq)
    log_min_freq = jnp.log(jnp.maximum(min_freq, 1e-12))
    log_w = jnp.log(jnp.maximum(model.props, 1e-300))
    ptn_invar = _ptn_invar(model, site)
    log_invar = jnp.log(jnp.maximum(ptn_invar, 1e-300))

    def log_marg(partial, scale):
        # per-(category, pattern) log of the pi-weighted subtree marginal
        # — kept PER CATEGORY: the product of subtree marginals must be
        # taken within a rate class, mixing first is not a bound
        mix = jnp.einsum("cs,csp->cp", model.state_freq, partial,
                         precision=jax.lax.Precision.HIGHEST)
        return jnp.log(jnp.maximum(mix, 1e-300)) + scale[None, :]

    def log_c(t):
        # log(max_ij P_ij(t) / min_s pi_s), maximized over rate classes
        # (valid for each class; upperbounds.cpp:809 logC)
        p = _pmat(model, t)  # [C,S,S]
        return jnp.log(jnp.maximum(jnp.max(p), 1e-12)) - log_min_freq

    def ub_edge(v):
        u = tree.parent_of(v)
        a = tree.children[v, 0]
        b = tree.children[v, 1]
        w_slot = jnp.where(tree.children[u, 0] == v, 1, 0)
        c = tree.children[u, w_slot]
        # [C,P] log product of the 4 subtree marginals per rate class
        lp = (
            log_marg(up[a], up_scale[a])
            + log_marg(up[b], up_scale[b])
            + log_marg(up[c], up_scale[c])
            + log_marg(out[u], out_scale[u])
        )
        a_p = jax.scipy.special.logsumexp(lp + log_w[:, None], axis=0)  # [P]
        t_a, t_b = tree.blen[a], tree.blen[b]
        t_c, t_u, t_v = tree.blen[c], tree.blen[u], tree.blen[v]
        lc_v = log_c(t_v)
        # swap0 exchanges a<->c: v holds (c,b), u holds (a, outside);
        # post-swap same-node branch pairs sum inside logC
        # (getBestNNIForBranUB correspondence, upperbounds.cpp:645)
        q0 = lc_v + log_c(t_c + t_b) + log_c(t_a + t_u) + 2.0 * (-log_min_freq)
        q1 = lc_v + log_c(t_c + t_a) + log_c(t_b + t_u) + 2.0 * (-log_min_freq)

        def total(q):
            ub_p = jnp.logaddexp(a_p + q, log_invar)
            return jnp.sum(site.pattern_freq * ub_p)

        return jnp.stack([total(q0), total(q1)])

    return jax.vmap(ub_edge)(edges)
