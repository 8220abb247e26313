"""Site-specific state-frequency likelihood engine (+SSF / ModelSet).

TPU-native re-expression of the reference's per-site-model kernels
(/root/reference/phylokernelsitemodel.h:33-801, phylokernelsitemodel.cpp:13,
model/modelset.h:29): each pattern carries a class index into a bank of
per-class eigen systems (one ModelGTR per frequency vector, shared
exchangeabilities, shared rate heterogeneity).

Design: instead of per-pattern eigen-data lookups inside a scalar site
loop (the reference's `models->at(ptn_model_map[ptn])`), the per-pattern
eigen tensors are GATHERED ONCE with the pattern axis last (the TPU lane
dimension), and every node's message becomes two per-pattern matvecs in
the eigen basis:

    z[c,j,p] = sum_t Vinv[k(p),j,t] * y[c,t,p]
    m[c,s,p] = sum_j V[k(p),s,j] * exp(lam[k(p),j] * r_c * t_v) * z[c,j,p]

so no [V,C,S,S,P] transition tensor ever exists: class count K is free
(K can be n_sites), cost is ~2x the shared-model contraction.  The same
mailbox schedule, scaling, theta-buffer Newton, and +I handling as the
shared-model engine apply; only the basis is per-pattern.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import (
    SCALE_TINY,
    SCHED_WIDTH,
    SiteData,
    TreeArrays,
)

HIGHEST = jax.lax.Precision.HIGHEST


class SSFArrays(NamedTuple):
    """Device view of a ModelSet: K class eigen-systems + pattern map.

    The rate heterogeneity (rates/props/p_invar) is SHARED across classes
    (the reference attaches one site_rate to the whole ModelSet)."""

    eigenvalues: jnp.ndarray  # [K, S]
    eigvec: jnp.ndarray  # [K, S, S]
    inv_eigvec: jnp.ndarray  # [K, S, S]
    state_freq: jnp.ndarray  # [K, S]
    rates: jnp.ndarray  # [C]
    props: jnp.ndarray  # [C]
    p_invar: jnp.ndarray  # scalar
    ptn_class: jnp.ndarray  # [P] int32

    @property
    def num_states(self) -> int:
        return self.eigenvalues.shape[-1]

    @property
    def ncat(self) -> int:
        return self.rates.shape[0]

    @property
    def n_classes(self) -> int:
        return self.eigenvalues.shape[0]


class SSFGathered(NamedTuple):
    """Per-pattern eigen tensors, pattern axis last (lane dim)."""

    lam: jnp.ndarray  # [S(j), P]
    v: jnp.ndarray  # [S(s), S(j), P]
    vinv: jnp.ndarray  # [S(j), S(t), P]
    freq: jnp.ndarray  # [S, P]


def gather_eigendata(ssf: SSFArrays) -> SSFGathered:
    k = ssf.ptn_class
    return SSFGathered(
        lam=ssf.eigenvalues[k].T,
        v=jnp.transpose(ssf.eigvec[k], (1, 2, 0)),
        vinv=jnp.transpose(ssf.inv_eigvec[k], (1, 2, 0)),
        freq=ssf.state_freq[k].T,
    )


def _messages(
    g: SSFGathered,
    rates: jnp.ndarray,  # [C]
    blen: jnp.ndarray,  # [W] branch lengths of the sending nodes
    y: jnp.ndarray,  # [W, C, S, P] scaled partials at the senders
) -> jnp.ndarray:
    """Transition-applied messages [W,C,S,P] with per-pattern bases.

    Written as elementwise-exp feeding contractions so XLA fuses the
    [W,C,S,P] exponential into the reduction (never materialized in HBM
    beyond one fusion tile)."""
    z = jnp.einsum("jtp,wctp->wcjp", g.vinv, y, precision=HIGHEST)
    e = jnp.exp(
        g.lam[None, None] * (blen[:, None] * rates[None, :])[:, :, None, None]
    )
    return jnp.einsum("sjp,wcjp->wcsp", g.v, e * z, precision=HIGHEST)


def ssf_upward_pass(
    tree: TreeArrays,
    ssf: SSFArrays,
    g: SSFGathered,
    tips: jnp.ndarray,  # [N_taxa, S, P]
    return_mailbox: bool = False,
):
    """Mailbox pruning with per-pattern eigen bases (cf. the shared-model
    upward_pass in likelihood.py; structure identical, only the message
    computation differs — computePartialLikelihoodSiteModel,
    /root/reference/phylokernelsitemodel.cpp:30)."""
    W = SCHED_WIDTH
    n_slots = tree.n_slots
    n_taxa = tree.n_taxa
    C = ssf.ncat
    S = tips.shape[1]
    P = tips.shape[2]
    dtype = tips.dtype
    dummy = tree.dummy

    blen_p = jnp.concatenate([tree.blen, jnp.zeros((W,), tree.blen.dtype)])
    parent_p = jnp.concatenate(
        [tree.parent, jnp.full((W,), dummy, tree.parent.dtype)]
    )
    side_p = jnp.concatenate([tree.side, jnp.zeros((W,), tree.side.dtype)])

    # prologue: tip messages into parents' mailboxes
    m_tip = _messages(
        g, ssf.rates, tree.blen[:n_taxa],
        jnp.broadcast_to(tips[:, None], (n_taxa, C, S, P)).astype(dtype),
    )
    mb = jnp.zeros((n_slots + W, 2, C, S, P), dtype=dtype)
    msc = jnp.zeros((n_slots + W, 2, P), dtype=dtype)
    mb = mb.at[tree.parent[:n_taxa], tree.side[:n_taxa]].set(m_tip)

    u0 = jnp.ones((n_slots + W, C, S, P), dtype=dtype)
    u0 = u0.at[:n_taxa].set(tips[:, None, :, :])
    us0 = jnp.zeros((n_slots + W, P), dtype=dtype)

    def row_step(i, carry):
        mb, msc, u, usc = carry
        s = tree.row_start[i]
        ln = tree.row_len[i]
        z = jnp.zeros((), s.dtype)
        blk = jax.lax.dynamic_slice(mb, (s, z, z, z, z), (W, 2, C, S, P))
        sbk = jax.lax.dynamic_slice(msc, (s, z, z), (W, 2, P))
        y = blk[:, 0] * blk[:, 1]
        mx = jnp.maximum(jnp.max(y, axis=(1, 2)), SCALE_TINY)  # [W, P]
        y = y / mx[:, None, None, :]
        sc = sbk[:, 0] + sbk[:, 1] + jnp.log(mx)
        u = jax.lax.dynamic_update_slice(u, y, (s, z, z, z))
        usc = jax.lax.dynamic_update_slice(usc, sc, (s, z))
        bl = jax.lax.dynamic_slice(blen_p, (s,), (W,))
        m = _messages(g, ssf.rates, bl, y)
        valid = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0] < ln
        p = jnp.where(valid, jax.lax.dynamic_slice(parent_p, (s,), (W,)), dummy)
        sd = jax.lax.dynamic_slice(side_p, (s,), (W,))
        mb = mb.at[p, sd].set(m)
        msc = msc.at[p, sd].set(sc)
        return mb, msc, u, usc

    mb, msc, u, usc = jax.lax.fori_loop(
        0, tree.n_rows, row_step, (mb, msc, u0, us0)
    )
    if return_mailbox:
        return u, usc, mb, msc
    return u, usc


def ssf_root_loglik(
    ssf: SSFArrays,
    g: SSFGathered,
    site: SiteData,
    root_partial: jnp.ndarray,  # [C, S, P]
    root_scale: jnp.ndarray,  # [P]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(total lnL, per-pattern lnl) with per-pattern root frequencies
    (models->at(ptn_model_map[ptn])->state_freq in the reference root
    kernel, phylokernelsitemodel.cpp:500)."""
    from .likelihood import asc_correction

    S = ssf.num_states
    mix = jnp.einsum(
        "c,sp,csp->p", ssf.props, g.freq, root_partial, precision=HIGHEST
    )
    mix = jnp.maximum(mix, SCALE_TINY)
    lnl_var = root_scale + jnp.log(mix)
    const = site.const_state
    # per-pattern invariable weight: the class' own frequency of the
    # constant state (1 for an all-unknown column)
    freq_ext = jnp.concatenate(
        [g.freq, jnp.ones((1, g.freq.shape[1]), g.freq.dtype)], axis=0
    )
    w = jnp.where(
        const >= 0,
        jnp.take_along_axis(
            freq_ext, jnp.clip(const, 0, S)[None, :], axis=0
        )[0],
        0.0,
    )
    ptn_invar = ssf.p_invar * w
    lnl = jnp.where(
        ptn_invar > 0,
        jnp.logaddexp(lnl_var, jnp.log(jnp.maximum(ptn_invar, SCALE_TINY))),
        lnl_var,
    )
    lnl = lnl - asc_correction(site, lnl)
    total = jnp.sum(
        site.pattern_freq.astype(jnp.float64) * lnl.astype(jnp.float64)
    )
    return total, lnl


def ssf_compute_loglik(
    tree: TreeArrays, ssf: SSFArrays, site: SiteData
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Public lnL entry for site-specific models."""
    from .likelihood import tip_partials

    g = gather_eigendata(ssf)
    tips = tip_partials(site, ssf.ncat)
    u, usc = ssf_upward_pass(tree, ssf, g, tips)
    root = tree.root
    return ssf_root_loglik(ssf, g, site, u[root], usc[root])


def ssf_downward_pass(
    tree: TreeArrays,
    ssf: SSFArrays,
    g: SSFGathered,
    mb: jnp.ndarray,  # [2N+W, 2, C, S, P]
    msc: jnp.ndarray,  # [2N+W, 2, P]
):
    """Outside partials with per-pattern bases.  D transport through an
    edge uses P^T = Vinv^T diag(e) V^T (cf. derivatives.downward_pass)."""
    W = SCHED_WIDTH
    n_slots = tree.n_slots
    C = ssf.ncat
    S = ssf.num_states
    P = mb.shape[4]
    dtype = mb.dtype
    root = tree.root
    dummy = tree.dummy

    blen_p = jnp.concatenate([tree.blen, jnp.zeros((W,), tree.blen.dtype)])
    children_p = jnp.concatenate(
        [tree.children, jnp.full((W, 2), dummy, tree.children.dtype)]
    )

    o = jnp.zeros((n_slots + W, C, S, P), dtype=dtype)
    os_ = jnp.zeros((n_slots + W, P), dtype=dtype)
    d = jnp.zeros((n_slots + W, C, S, P), dtype=dtype)
    ds = jnp.zeros((n_slots + W, P), dtype=dtype)
    d = d.at[root].set(
        jnp.broadcast_to(g.freq[None, :, :], (C, S, P)).astype(dtype)
    )

    def transport(child_ids, o_child):
        """D[child] = P(blen_child)^T @ O[child], per-pattern basis."""
        a = jnp.einsum("sjp,wcsp->wcjp", g.v, o_child, precision=HIGHEST)
        bl = blen_p[child_ids]
        e = jnp.exp(
            g.lam[None, None]
            * (bl[:, None] * ssf.rates[None, :])[:, :, None, None]
        )
        return jnp.einsum("jtp,wcjp->wctp", g.vinv, e * a, precision=HIGHEST)

    def row_step(j, carry):
        o, os_, d, ds = carry
        i = tree.n_rows - 1 - j
        s = tree.row_start[i]
        ln = tree.row_len[i]
        z = jnp.zeros((), s.dtype)
        du = jax.lax.dynamic_slice(d, (s, z, z, z), (W, C, S, P))
        dsu = jax.lax.dynamic_slice(ds, (s, z), (W, P))
        blk = jax.lax.dynamic_slice(mb, (s, z, z, z, z), (W, 2, C, S, P))
        sbk = jax.lax.dynamic_slice(msc, (s, z, z), (W, 2, P))

        def out_for(m_sib, sib_scale):
            y = du * m_sib
            mx = jnp.maximum(jnp.max(y, axis=(1, 2)), SCALE_TINY)
            return y / mx[:, None, None, :], dsu + sib_scale + jnp.log(mx)

        ol, ol_s = out_for(blk[:, 1], sbk[:, 1])
        or_, or_s = out_for(blk[:, 0], sbk[:, 0])
        valid = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0] < ln
        ch = jax.lax.dynamic_slice(children_p, (s, z), (W, 2))
        l = jnp.where(valid, ch[:, 0], dummy)
        r = jnp.where(valid, ch[:, 1], dummy)
        o = o.at[l].set(ol).at[r].set(or_)
        os_ = os_.at[l].set(ol_s).at[r].set(or_s)
        d = d.at[l].set(transport(l, ol)).at[r].set(transport(r, or_))
        ds = ds.at[l].set(ol_s).at[r].set(or_s)
        return o, os_, d, ds

    o, os_, d, ds = jax.lax.fori_loop(
        0, tree.n_rows, row_step, (o, os_, d, ds)
    )
    return o, os_


class SSFThetas(NamedTuple):
    theta: jnp.ndarray  # [2N+W, C, S(j), P] eigen-basis products
    scale: jnp.ndarray  # [2N+W, P]
    ptn_invar: jnp.ndarray  # [P]


def ssf_all_passes(tree: TreeArrays, ssf: SSFArrays, site: SiteData):
    from .likelihood import tip_partials

    g = gather_eigendata(ssf)
    tips = tip_partials(site, ssf.ncat)
    up, usc, mb, msc = ssf_upward_pass(tree, ssf, g, tips, return_mailbox=True)
    out, osc = ssf_downward_pass(tree, ssf, g, mb, msc)
    return g, up, usc, out, osc


def ssf_compute_thetas(
    tree: TreeArrays,
    ssf: SSFArrays,
    g: SSFGathered,
    site: SiteData,
    up: jnp.ndarray,
    up_scale: jnp.ndarray,
    out: jnp.ndarray,
    out_scale: jnp.ndarray,
) -> SSFThetas:
    """theta[v,c,j,p] = (V_p^T O[v])_j (V_p^-1 U[v])_j — the site-model
    analogue of computeThetas (phylokernelsitemodel derivatives)."""
    S = ssf.num_states
    vt_o = jnp.einsum("sjp,vcsp->vcjp", g.v, out, precision=HIGHEST)
    vi_u = jnp.einsum("jtp,vctp->vcjp", g.vinv, up, precision=HIGHEST)
    freq_ext = jnp.concatenate(
        [g.freq, jnp.ones((1, g.freq.shape[1]), g.freq.dtype)], axis=0
    )
    w = jnp.where(
        site.const_state >= 0,
        jnp.take_along_axis(
            freq_ext, jnp.clip(site.const_state, 0, S)[None, :], axis=0
        )[0],
        0.0,
    )
    return SSFThetas(vt_o * vi_u, up_scale + out_scale, ssf.p_invar * w)


def ssf_branch_lnl_derivs(
    theta: SSFThetas,
    ssf: SSFArrays,
    g: SSFGathered,
    site: SiteData,
    blen: jnp.ndarray,  # [2N-1]
):
    """(lnL[v], d1[v], d2[v]) for all branches; lam carries a pattern
    axis so the exp factors are fused elementwise products, not einsums
    (cf. derivatives.branch_lnl_derivs)."""
    nv = blen.shape[0]
    nbuf = theta.theta.shape[0]
    blen_p = jnp.concatenate([blen, jnp.zeros((nbuf - nv,), blen.dtype)])
    # lam_r[c,j,p] = lam[j,p] * r_c ; e[v,c,j,p] = w_c exp(lam_r * t_v)
    lam_r = g.lam[None] * ssf.rates[:, None, None]  # [C, S, P]
    x = lam_r[None] * blen_p[:, None, None, None]  # [V,C,S,P] (fused)
    e = ssf.props[None, :, None, None] * jnp.exp(x)
    et = e * theta.theta
    f0 = jnp.sum(et, axis=(1, 2))  # [V, P]
    f1 = jnp.sum(et * lam_r[None], axis=(1, 2))
    f2 = jnp.sum(et * (lam_r * lam_r)[None], axis=(1, 2))
    f0 = jnp.maximum(f0, SCALE_TINY)
    invar_term = theta.ptn_invar[None, :] * jnp.exp(
        jnp.clip(-theta.scale, max=80.0)
    ) * (theta.ptn_invar[None, :] > 0)
    denom = f0 + invar_term
    lnl_p = theta.scale + jnp.log(denom)
    lnl = jnp.einsum(
        "p,vp->v",
        site.pattern_freq.astype(jnp.float64),
        lnl_p.astype(jnp.float64),
        precision=HIGHEST,
    )
    r1 = f1 / denom
    r2 = f2 / denom
    d1 = jnp.einsum("p,vp->v", site.pattern_freq, r1, precision=HIGHEST)
    d2 = jnp.einsum(
        "p,vp->v", site.pattern_freq, r2 - r1 * r1, precision=HIGHEST
    )
    # +ASC chain-rule terms (identical to derivatives.branch_lnl_derivs)
    L_asc = site.asc_mask[None, :] * jnp.exp(jnp.minimum(lnl_p, 0.0))
    q = jnp.sum(L_asc, axis=1)
    one_m_q = jnp.maximum(1.0 - q, 1e-10)
    n_sites = jnp.sum(site.pattern_freq)
    q1 = jnp.einsum("vp,vp->v", L_asc, r1, precision=HIGHEST)
    q2 = jnp.einsum("vp,vp->v", L_asc, r2, precision=HIGHEST)
    lnl = lnl - n_sites.astype(jnp.float64) * jnp.log(one_m_q).astype(
        jnp.float64
    )
    d1 = d1 + n_sites * q1 / one_m_q
    d2 = d2 + n_sites * (q2 / one_m_q + (q1 / one_m_q) ** 2)
    return lnl[:nv], d1[:nv], d2[:nv]


def ssf_apply(g: SSFGathered, rates, t, x):
    """P_p(t r_c) @ x for a SCALAR branch length: [C,S,P] -> [C,S,P]
    (per-pattern-basis analogue of nni._apply(_pmat(...)))."""
    z = jnp.einsum("jtp,ctp->cjp", g.vinv, x, precision=HIGHEST)
    e = jnp.exp(g.lam[None] * (t * rates)[:, None, None])
    return jnp.einsum("sjp,cjp->csp", g.v, e * z, precision=HIGHEST)


def ssf_apply_t(g: SSFGathered, rates, t, x):
    """P_p(t r_c)^T @ x (transpose transport)."""
    a = jnp.einsum("sjp,csp->cjp", g.v, x, precision=HIGHEST)
    e = jnp.exp(g.lam[None] * (t * rates)[:, None, None])
    return jnp.einsum("jtp,cjp->ctp", g.vinv, e * a, precision=HIGHEST)


def ssf_ptn_invar(ssf: SSFArrays, g: SSFGathered, site: SiteData):
    """[P] invariable-site weights with per-pattern class frequencies."""
    S = ssf.num_states
    freq_ext = jnp.concatenate(
        [g.freq, jnp.ones((1, g.freq.shape[1]), g.freq.dtype)], axis=0
    )
    w = jnp.where(
        site.const_state >= 0,
        jnp.take_along_axis(
            freq_ext, jnp.clip(site.const_state, 0, S)[None, :], axis=0
        )[0],
        0.0,
    )
    return ssf.p_invar * w


def ssf_theta_lnl_newton(
    ssf: SSFArrays,
    g: SSFGathered,
    site: SiteData,
    inside, in_scale, outside, out_scale,
    t0, ptn_invar, newton_iters: int = 4,
):
    """1-D branch Newton on an eigen-basis theta buffer with per-pattern
    eigenvalues (the SSF analogue of nni._theta_lnl_newton)."""
    scale = in_scale + out_scale
    invar = ptn_invar * jnp.exp(jnp.clip(-scale, max=80.0)) * (ptn_invar > 0)
    vt_o = jnp.einsum("sjp,csp->cjp", g.v, outside, precision=HIGHEST)
    vi_u = jnp.einsum("jtp,ctp->cjp", g.vinv, inside, precision=HIGHEST)
    theta = vt_o * vi_u  # [C, j, P]
    lam_r = g.lam[None] * ssf.rates[:, None, None]  # [C, j, P]

    def derivs(t):
        e = ssf.props[:, None, None] * jnp.exp(lam_r * t)
        et = e * theta
        f0 = jnp.sum(et, axis=(0, 1))
        f1 = jnp.sum(et * lam_r, axis=(0, 1))
        f2 = jnp.sum(et * lam_r * lam_r, axis=(0, 1))
        denom = jnp.maximum(f0, SCALE_TINY) + invar
        return denom, f1, f2

    from .derivatives import blen_bounds

    n_sites = jnp.sum(site.pattern_freq)

    def newton(i, t):
        denom, f1, f2 = derivs(t)
        r1 = f1 / denom
        r2 = f2 / denom
        d1 = jnp.sum(site.pattern_freq * r1)
        d2 = jnp.sum(site.pattern_freq * (r2 - r1 * r1))
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


def ssf_optimize_all_branches(
    tree: TreeArrays,
    ssf: SSFArrays,
    site: SiteData,
    n_sweeps: int = 100,
    tol: float = 1e-5,
    max_backtracks: int = 8,
) -> Tuple[TreeArrays, jnp.ndarray]:
    """Batched Newton sweeps with monotone line search (the site-model
    analogue of derivatives.optimize_all_branches)."""
    from .derivatives import blen_bounds, optimize_branch_mask

    mask = optimize_branch_mask(tree)

    def true_lnl(b):
        lnl, _ = ssf_compute_loglik(tree.with_blen(b), ssf, site)
        return lnl

    def sweep(carry):
        blen, last_lnl, it, _ = carry
        t = tree.with_blen(blen)
        g, up, us, out, os_ = ssf_all_passes(t, ssf, site)
        theta = ssf_compute_thetas(t, ssf, g, site, up, us, out, os_)
        _, d1, d2 = ssf_branch_lnl_derivs(theta, ssf, g, site, blen)
        newton = blen - d1 / jnp.minimum(d2, -1e-12)
        fallback = jnp.where(d1 > 0, blen * 2.0, blen * 0.5)
        target = jnp.clip(
            jnp.where(d2 < -1e-12, newton, fallback), *blen_bounds()
        )
        direction = jnp.where(mask, target - blen, 0.0)

        def bt_cond(s):
            step, lnl_new, k = s
            return jnp.logical_and(k < max_backtracks, lnl_new < last_lnl)

        def bt_body(s):
            step, _, k = s
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
