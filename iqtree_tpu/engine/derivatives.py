"""Outside (downward) pass, theta buffers, and batched branch-length Newton.

TPU-native re-design of the reference's per-branch machinery:

* The reference optimizes one branch at a time: compute the two directed
  partials at the branch, fill the `theta` buffer (elementwise product in
  eigen-basis), then run 1-D Newton where each iteration is a dot product
  with exp(lambda * rate * t) weights (phylokernel.h:485-1022,
  phylotree.cpp:2148 optimizeOneBranch, optimization.cpp:388
  minimizeNewton).

* Here, ONE upward pass + ONE downward pass produce outside partials for
  every node simultaneously; thetas for ALL 2N-3 branches are then a
  batched einsum, and Newton runs on every branch at once (Jacobi-style
  sweeps instead of Gauss-Seidel).  An outer loop re-runs the passes so
  stale thetas converge; each outer iteration is monotone-guarded by an
  lnL evaluation with step backtracking.

Definitions (per category c, state s, pattern p; scaled, with per-node
log-scale accumulators):
  U[v]  inside partial: data below v given state at v          (upward)
  M[v]  = P(blen[v]) @ U[v]: message from v to its parent
  D[u]  outside partial: data outside subtree(u) given state at u
  O[v]  = D[parent(v)] * M[sibling(v)]: outside-excluding-edge-v,
          expressed at the parent end of edge v
  L_p(t_v) = sum_c w_c sum_j  (V^T O[v])_j exp(lam_j r_c t_v) (V^-1 U[v])_j
           = sum_cj theta[v,c,j,p] exp(lam_j r_c t_v)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .likelihood import (
    ModelArrays,
    SCALE_TINY,
    SiteData,
    TreeArrays,
    branch_transition_mats,
    root_loglik,
    tip_partials,
    upward_pass,
)

HIGHEST = jax.lax.Precision.HIGHEST

MIN_BLEN = 1e-6
MAX_BLEN = 100.0

# CLI-adjustable bounds (-blmin/-blmax, reference tools.cpp:1978-1996).
# Mutable list so every engine module sees updates; set_blen_bounds must
# run before the first trace (jit closures bake the values in).
_BLEN_BOUNDS = [MIN_BLEN, MAX_BLEN]


def blen_bounds():
    """(min, max) branch-length bounds currently in effect."""
    return _BLEN_BOUNDS[0], _BLEN_BOUNDS[1]


def set_blen_bounds(min_blen=None, max_blen=None):
    """Set global branch-length bounds (-blmin/-blmax).  Call before any
    likelihood/branch-optimization function is traced."""
    if min_blen is not None:
        _BLEN_BOUNDS[0] = float(min_blen)
    if max_blen is not None:
        _BLEN_BOUNDS[1] = float(max_blen)


def downward_pass(
    tree: TreeArrays,
    trans: jnp.ndarray,  # [2N, C, S, S] (device numbering)
    mb: jnp.ndarray,  # [2N+W, 2, C, S, P] upward message mailbox
    msc: jnp.ndarray,  # [2N+W, 2, P] mailbox log-scales
    state_freq: jnp.ndarray,  # [S]
    with_d: bool = False,
):
    """Reverse sweep computing outside partials (mailbox dataflow).

    Returns (outside O [2N+W,C,S,P], o_scale [2N+W,P]); O[v] is the
    outside partial at the *parent end* of the edge above v.  Entries for
    the root and padding are zero.

    With with_d=True additionally returns (D, d_scale): D[v] is the
    outside message expressed at v itself (transported through v's own
    edge), needed by the NNI evaluator.

    Each reversed schedule row u reads its own D (pushed by its parent
    earlier, scatter write) and BOTH child messages from the upward
    mailbox at its own contiguous index (dynamic slice): no gathers from
    the loop carry, so the buffers update in-place.
    """
    from .likelihood import SCHED_WIDTH, pad_trans

    W = SCHED_WIDTH
    n_slots = tree.n_slots
    C, S, P = trans.shape[1], trans.shape[2], mb.shape[4]
    dtype = trans.dtype
    root = tree.root
    dummy = tree.dummy

    trans_p = pad_trans(trans, W)
    children_p = jnp.concatenate(
        [tree.children, jnp.full((W, 2), dummy, tree.children.dtype)]
    )

    o = jnp.zeros((n_slots + W, C, S, P), dtype=dtype)
    os_ = jnp.zeros((n_slots + W, P), dtype=dtype)
    d = jnp.zeros((n_slots + W, C, S, P), dtype=dtype)
    ds = jnp.zeros((n_slots + W, P), dtype=dtype)
    d = d.at[root].set(
        jnp.broadcast_to(state_freq[:, :, None], (C, S, P)).astype(dtype)
    )

    def row_step(j, carry):
        o, os_, d, ds = carry
        i = tree.n_rows - 1 - j  # reverse level order: parents first
        s = tree.row_start[i]
        ln = tree.row_len[i]
        z = jnp.zeros((), s.dtype)
        du = jax.lax.dynamic_slice(d, (s, z, z, z), (W, C, S, P))
        dsu = jax.lax.dynamic_slice(ds, (s, z), (W, P))
        blk = jax.lax.dynamic_slice(mb, (s, z, z, z, z), (W, 2, C, S, P))
        sbk = jax.lax.dynamic_slice(msc, (s, z, z), (W, 2, P))
        ml, mr = blk[:, 0], blk[:, 1]
        sml, smr = sbk[:, 0], sbk[:, 1]

        def out_for(m_sib, sib_scale):
            y = du * m_sib
            mx = jnp.maximum(jnp.max(y, axis=(1, 2)), SCALE_TINY)  # [W,P]
            return y / mx[:, None, None, :], dsu + sib_scale + jnp.log(mx)

        ol, ol_s = out_for(mr, smr)
        or_, or_s = out_for(ml, sml)
        valid = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0] < ln
        ch = jax.lax.dynamic_slice(children_p, (s, z), (W, 2))
        l = jnp.where(valid, ch[:, 0], dummy)
        r = jnp.where(valid, ch[:, 1], dummy)
        o = o.at[l].set(ol).at[r].set(or_)
        os_ = os_.at[l].set(ol_s).at[r].set(or_s)
        # push down through the edges: D[child] = P(blen_child)^T @ O[child]
        # (trans gathered at child ids — gathers from non-carried inputs
        # are fine; only carry gathers force copies)
        dl = jnp.einsum("wcst,wcsp->wctp", trans_p[l], ol, precision=HIGHEST)
        dr = jnp.einsum("wcst,wcsp->wctp", trans_p[r], or_, precision=HIGHEST)
        d = d.at[l].set(dl).at[r].set(dr)
        ds = ds.at[l].set(ol_s).at[r].set(or_s)
        return o, os_, d, ds

    o, os_, d, ds = jax.lax.fori_loop(0, tree.n_rows, row_step, (o, os_, d, ds))
    if with_d:
        return o, os_, d, ds
    return o, os_


class ThetaBuffers(NamedTuple):
    """Per-branch eigen-basis products for fast 1-D branch likelihoods."""

    theta: jnp.ndarray  # [2N-1, C, S, P]
    scale: jnp.ndarray  # [2N-1, P] log-scale of theta
    ptn_invar: jnp.ndarray  # [P]


class GenericBuffers(NamedTuple):
    """Raw inside/outside partials for qmat (non-reversible) models,
    where no eigen-basis theta exists; branch derivatives rebuild P(t)
    by expm and use dP/dt = r_c Q P."""

    up: jnp.ndarray  # [2N+W, C, S, P]
    out: jnp.ndarray  # [2N+W, C, S, P]
    scale: jnp.ndarray  # [2N+W, P] combined log-scale
    ptn_invar: jnp.ndarray  # [P]


def compute_thetas(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    up: jnp.ndarray,
    up_scale: jnp.ndarray,
    out: jnp.ndarray,
    out_scale: jnp.ndarray,
) -> ThetaBuffers:
    """theta[v,c,j,p] = (V^T O[v])_j * (V^-1 U[v])_j for every branch v
    (batched analogue of computeThetaEigen, phylokernel.h:485-540).

    qmat models (UNREST) have no eigen basis; the raw partials are kept
    instead (GenericBuffers) and branch_lnl_derivs dispatches on type."""
    scale = up_scale + out_scale
    S = model.num_states
    mean_freq = model.mean_freq
    pi_ext = jnp.concatenate([mean_freq, jnp.ones((1,), mean_freq.dtype)])
    w = jnp.where(site.const_state >= 0, pi_ext[jnp.clip(site.const_state, 0, S)], 0.0)
    if model.qmat is not None:
        return GenericBuffers(up, out, scale, model.p_invar * w)
    vt_o = jnp.einsum("csj,vcsp->vcjp", model.eigvec, out, precision=HIGHEST)
    vi_u = jnp.einsum("cjs,vcsp->vcjp", model.inv_eigvec, up, precision=HIGHEST)
    theta = vt_o * vi_u
    return ThetaBuffers(theta, scale, model.p_invar * w)


def branch_lnl_derivs(
    theta: ThetaBuffers,
    model: ModelArrays,
    site: SiteData,
    blen: jnp.ndarray,  # [2N-1] current branch lengths
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For every branch simultaneously: (lnL[v], dlnL/dt[v], d2lnL/dt2[v]).

    Mirrors computeLikelihoodDervEigenSIMD + computeLikelihoodFromBuffer
    (phylokernel.h:485,1022) but batched over branches.  GenericBuffers
    (qmat models) rebuild P(t) by expm per call: f_k contracts the raw
    outside/inside partials with (r_c Q)^k P."""
    nv = blen.shape[0]
    if isinstance(theta, GenericBuffers):
        nbuf = theta.up.shape[0]
        blen_p = jnp.concatenate(
            [blen, jnp.zeros((nbuf - nv,), blen.dtype)]
        )
        trans = branch_transition_mats(model, blen_p)  # [V,C,S,S] expm
        rq = model.qmat * model.rates[:, None, None]  # [C,S,S]
        qp = jnp.einsum("cij,vcjk->vcik", rq, trans, precision=HIGHEST)
        qqp = jnp.einsum("cij,vcjk->vcik", rq, qp, precision=HIGHEST)

        def fk(m):
            msg = jnp.einsum("vcst,vctp->vcsp", m, theta.up, precision=HIGHEST)
            return jnp.einsum(
                "c,vcsp,vcsp->vp", model.props, theta.out, msg,
                precision=HIGHEST,
            )

        f0, f1, f2 = fk(trans), fk(qp), fk(qqp)
    else:
        lam_r = model.eigenvalues * model.rates[:, None]  # [C, S(j)]
        # pad blen to the (padded) theta buffer length; outputs sliced back
        blen_p = jnp.concatenate(
            [blen, jnp.zeros((theta.theta.shape[0] - nv,), blen.dtype)]
        )
        # E[v,c,j] = w_c exp(lam_j r_c t_v)
        e = model.props[None, :, None] * jnp.exp(lam_r[None] * blen_p[:, None, None])
        f0 = jnp.einsum("vcj,vcjp->vp", e, theta.theta, precision=HIGHEST)
        f1 = jnp.einsum("vcj,cj,vcjp->vp", e, lam_r, theta.theta, precision=HIGHEST)
        f2 = jnp.einsum("vcj,cj,vcjp->vp", e, lam_r * lam_r, theta.theta,
                        precision=HIGHEST)
    f0 = jnp.maximum(f0, SCALE_TINY)
    # denominator in true space: f0 + ptn_invar * exp(-scale); keep in the
    # scaled frame: denom = f0 + invar_term
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
    d2 = jnp.einsum("p,vp->v", site.pattern_freq, r2 - r1 * r1, precision=HIGHEST)
    # +ASC: total lnL gains -n*log(1-q(t)), q = sum_asc L_p(t); with
    # q'  = sum_asc L_p r1_p and q'' = sum_asc L_p r2_p the chain rule gives
    # the extra d1/d2 terms below (asc_mask==0 makes all of this vanish).
    L_asc = site.asc_mask[None, :] * jnp.exp(
        jnp.minimum(lnl_p, 0.0)
    )  # [v,p], uncorrected likelihoods of unobserved constants
    q = jnp.sum(L_asc, axis=1)
    one_m_q = jnp.maximum(1.0 - q, 1e-10)
    n_sites = jnp.sum(site.pattern_freq)
    q1 = jnp.einsum("vp,vp->v", L_asc, r1, precision=HIGHEST)
    q2 = jnp.einsum("vp,vp->v", L_asc, r2, precision=HIGHEST)
    lnl = lnl - n_sites.astype(jnp.float64) * jnp.log(one_m_q).astype(jnp.float64)
    d1 = d1 + n_sites * q1 / one_m_q
    d2 = d2 + n_sites * (q2 / one_m_q + (q1 / one_m_q) ** 2)
    return lnl[:nv], d1[:nv], d2[:nv]


def all_passes(tree: TreeArrays, model: ModelArrays, site: SiteData):
    """(up, up_scale, out, out_scale, trans) for the current tree."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    up, up_scale, mb, msc = upward_pass(tree, trans, tips, return_mailbox=True)
    out, out_scale = downward_pass(tree, trans, mb, msc, model.state_freq)
    return up, up_scale, out, out_scale, trans


def pad_site_patterns(site: SiteData, P_pad: int) -> SiteData:
    """Append inert patterns (freq 0, non-constant, no ASC) so site
    reductions align with tile-padded kernel outputs."""
    P = site.pattern_freq.shape[0]
    if P_pad == P:
        return site
    return site._replace(
        pattern_freq=jnp.pad(site.pattern_freq, (0, P_pad - P)),
        const_state=jnp.pad(site.const_state, (0, P_pad - P),
                            constant_values=-1),
        asc_mask=jnp.pad(site.asc_mask, (0, P_pad - P)),
    )


def fused_all_passes(
    tree: TreeArrays, model: ModelArrays, site: SiteData, steps, n_slots
):
    """all_passes entirely on the fused Pallas store sweeps: the packed
    CS kernels for DNA-class shapes, the unpacked store kernels for
    everything else (protein/codon/mixture).  Round 3 still ran the XLA
    mailbox downward here; the fused downward-store sweep (round 4)
    removes the last mailbox pass from the theta path.  Outputs are
    PADDED to the kernel's pattern tile; the returned SiteData is padded
    to match."""
    from .kernels.cs_kernels import fused_nni_passes_cs
    from .kernels.pruning import _cs_packable, fused_nni_passes_general

    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    C, S = model.ncat, model.num_states
    if _cs_packable(C, S):
        up, usc, out, out_scale = fused_nni_passes_cs(
            steps, n_slots, trans, tips, model.props, model.state_freq)
        n_nodes, _, P_pad = up.shape
        up = up.reshape(n_nodes, C, S, P_pad)
        out = out.reshape(n_nodes, C, S, P_pad)
    else:
        up, usc, out, out_scale = fused_nni_passes_general(
            steps, n_slots, trans, tips, model.props, model.state_freq)
    return (up, usc, out, out_scale, trans,
            pad_site_patterns(site, up.shape[-1]))


def optimize_branch_mask(tree: TreeArrays) -> jnp.ndarray:
    """[2N-1] bool: which entries of blen are free parameters.

    Excludes the virtual root and its non-tip0 child (that half-edge is
    pinned to 0; tip0 carries the pendant edge length — see trees/tree.py)."""
    n = tree.n_slots
    root = tree.root
    c0 = tree.children[root, 0]
    c1 = tree.children[root, 1]
    pinned = jnp.where(c0 == 0, c1, c0)
    mask = jnp.ones((n,), dtype=bool)
    mask = mask.at[root].set(False).at[pinned].set(False)
    mask = mask.at[tree.dummy].set(False)
    return mask


def newton_target(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    blen: jnp.ndarray,
    min_blen: float = None,
    max_blen: float = None,
) -> jnp.ndarray:
    """Safeguarded per-branch Newton target from (d1, d2): same update
    rule as the reference's minimizeNewton (optimization.cpp:388) —
    t* = clip(t - f'/f''), falling back to a doubling/halving move along
    the gradient when curvature is not negative."""
    if min_blen is None or max_blen is None:
        b0, b1 = blen_bounds()
        min_blen = b0 if min_blen is None else min_blen
        max_blen = b1 if max_blen is None else max_blen
    newton = blen - d1 / jnp.minimum(d2, -1e-12)
    fallback = jnp.where(d1 > 0, blen * 2.0, blen * 0.5)
    target = jnp.where(d2 < -1e-12, newton, fallback)
    return jnp.clip(target, min_blen, max_blen)


def newton_direction(
    theta: ThetaBuffers,
    model: ModelArrays,
    site: SiteData,
    blen: jnp.ndarray,
    min_blen: float = None,
    max_blen: float = None,
) -> jnp.ndarray:
    """Per-branch Newton target lengths (the full step), safeguarded."""
    _, d1, d2 = branch_lnl_derivs(theta, model, site, blen)
    return newton_target(d1, d2, blen, min_blen, max_blen)


def optimize_all_branches(
    tree: TreeArrays,
    model: ModelArrays,
    site: SiteData,
    n_sweeps: int = 100,
    tol: float = 1e-5,
    max_backtracks: int = 8,
    steps=None,
    n_slots: int = 0,
) -> Tuple[TreeArrays, jnp.ndarray]:
    """Batched analogue of PhyloTree::optimizeAllBranches
    (phylotree.cpp:2252).

    Each sweep: full up+down passes -> thetas -> simultaneous Newton
    direction on every branch -> backtracking line search on the joint
    step (monotone lnL).  Plain Jacobi steps oscillate (neighbouring
    branches overshoot jointly); the line search restores global
    convergence and in testing reaches optima slightly *better* than the
    reference's sequential Newton.  Returns (tree with new blen, lnL)."""
    mask = optimize_branch_mask(tree)
    tips = tip_partials(site, model.ncat)

    # the fused Newton-derivative kernel serves packable shapes without
    # +ASC (ASC adds per-branch correction terms the kernel doesn't
    # carry; unobserved-pattern workloads fall back to the theta path);
    # round 5 extended it past DNA: protein runs the wide-CS streaming
    # reverse sweep (newton_kernel_serves, cs_kernels.py)
    from .kernels.cs_kernels import newton_kernel_serves

    try:
        has_asc = bool(np.any(np.asarray(site.asc_mask)))
    except Exception:
        has_asc = True
    # wide-CS shapes take the kernel only on real TPU backends: in
    # interpret mode (CPU tests/difftest) the batched-XLA theta path is
    # far faster than an interpreted 96-lane reverse sweep, and it is
    # the long-standing CPU behavior for protein
    from .kernels.pruning import _cs_packable

    wide_ok = jax.default_backend() in ("tpu", "axon")
    use_newton_kernel = (
        steps is not None
        and model.qmat is None
        and not has_asc
        and (_cs_packable(model.ncat, model.num_states)
             or (wide_ok and newton_kernel_serves(model.ncat,
                                                  model.num_states)))
    )

    if steps is not None:
        from .kernels.pruning import fused_compute_loglik

        def true_lnl(b):
            lnl, _ = fused_compute_loglik(
                tree.with_blen(b), model, site, steps, n_slots
            )
            return lnl
    else:
        def true_lnl(b):
            tt = tree.with_blen(b)
            trans2 = branch_transition_mats(model, tt.blen)
            u2, s2 = upward_pass(tt, trans2, tips)
            root = tt.root
            lnl, _ = root_loglik(model, site, u2[root], s2[root])
            return lnl

    def sweep(carry):
        blen, last_lnl, it, _ = carry
        t = tree.with_blen(blen)
        if use_newton_kernel:
            from .kernels.cs_kernels import fused_newton_derivs
            from .nni import _ptn_invar

            d1, d2 = fused_newton_derivs(
                steps, n_slots, model, blen, tips, site.pattern_freq,
                _ptn_invar(model, site),
            )
            target = newton_target(d1[: blen.shape[0]], d2[: blen.shape[0]],
                                   blen)
        else:
            if steps is not None:
                up, us, out, os_, _, site_p = fused_all_passes(
                    t, model, site, steps, n_slots
                )
            else:
                up, us, out, os_, _ = all_passes(t, model, site)
                site_p = site
            theta = compute_thetas(t, model, site_p, up, us, out, os_)
            target = newton_direction(theta, model, site_p, blen)
        direction = jnp.where(mask, target - blen, 0.0)

        def bt_cond(s):
            step, lnl_new, k = s
            return jnp.logical_and(k < max_backtracks, lnl_new < last_lnl)

        def bt_body(s):
            step, _, k = s
            step = step * 0.5
            lnl_new = true_lnl(blen + step * direction)
            return step, lnl_new, k + 1

        step0 = jnp.asarray(1.0, dtype=blen.dtype)
        lnl_full = true_lnl(blen + direction)
        step, lnl_new, _ = jax.lax.while_loop(
            bt_cond, bt_body, (step0, lnl_full, jnp.asarray(0))
        )
        # if even the smallest step failed, stay put (improved=0 stops loop)
        accept = lnl_new >= last_lnl
        new_blen = jnp.where(accept, blen + step * direction, blen)
        lnl_out = jnp.where(accept, lnl_new, last_lnl)
        return new_blen, lnl_out, it + 1, lnl_out - last_lnl

    def cond(carry):
        _, _, it, improved = carry
        return jnp.logical_and(it < n_sweeps, improved > tol)

    lnl0 = true_lnl(tree.blen)
    blen, lnl, _, _ = jax.lax.while_loop(
        cond,
        sweep,
        (
            tree.blen,
            lnl0,
            jnp.asarray(0),
            jnp.asarray(jnp.inf, dtype=lnl0.dtype),
        ),
    )
    return tree.with_blen(blen), lnl
