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


def _loglik_bwd(res, cotangents, steps=None, n_slots=0):
    tree, model, site = res
    g_total, g_pat = cotangents
    site0 = site
    P0 = site.pattern_freq.shape[0]

    # recompute the upward sweep (rematerialization)
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    usc8 = None
    use_cs = False
    if steps is not None:
        from .kernels.pruning import _cs_packable

        use_cs = _cs_packable(model.ncat, model.num_states)
    if use_cs:
        # CS-packed store: up is [2N, CS, P_pad] (half the HBM traffic
        # of the padded [2N, C, S_pad8, P] layout at DNA shapes)
        from .derivatives import pad_site_patterns
        from .kernels.cs_kernels import fused_upward_store_cs

        up_cs, usc8_cs = fused_upward_store_cs(steps, n_slots, trans, tips)
        usc_cs = usc8_cs[:, :1, :]
        P_pad = up_cs.shape[-1]
        if P_pad != P0:
            tips = jnp.pad(tips, ((0, 0), (0, 0), (0, P_pad - P0)),
                           constant_values=1.0)
            g_pat = jnp.pad(g_pat, (0, P_pad - P0))
        site = pad_site_patterns(site, P_pad)
        C = model.ncat
        S = model.num_states
        root = tree.root
        up_root = up_cs[root].reshape(C, S, P_pad)
        up_scale_root = usc_cs[root, 0]
    elif steps is not None:
        # fused Pallas upward (9x the XLA mailbox sweep at 1000 taxa);
        # NO mailbox writes — the fused downward recomputes the child
        # messages from `up` with the MXU instead of streaming a
        # [2N,2,C,S,P] mailbox through HBM.  Outputs are pattern-tile
        # padded — pad the site arrays to match.
        from .derivatives import pad_site_patterns
        from .kernels.pruning import fused_upward_store

        up, up_scale, usc8 = fused_upward_store(
            steps, n_slots, trans, tips, want_scale8=True,
        )
        P_pad = up.shape[-1]
        if P_pad != P0:
            tips = jnp.pad(tips, ((0, 0), (0, 0), (0, P_pad - P0)),
                           constant_values=1.0)
            g_pat = jnp.pad(g_pat, (0, P_pad - P0))
        site = pad_site_patterns(site, P_pad)
    else:
        up, up_scale, mb, msc = upward_pass(
            tree, trans, tips, return_mailbox=True
        )
    root = tree.root
    S = tips.shape[1]
    if not use_cs:
        up_root = up[root][:, :S, :]
        up_scale_root = up_scale[root]

    # root-level vjp: props, state_freq, p_invar, pattern_freq (and lnl_p)
    # (the fused store pads the state axis to a sublane multiple for
    # S=20 protein etc. — slice the root partial back to S)
    def root_fn(model_, pattern_freq_):
        site_ = site._replace(pattern_freq=pattern_freq_)
        return root_loglik(model_, site_, up_root, up_scale_root)

    (lnl_total, lnl_p), root_vjp = jax.vjp(root_fn, model, site.pattern_freq)
    model_bar, pattern_freq_bar = root_vjp((g_total, g_pat))

    # per-pattern weight: d(outputs)/d lnl_p pulled back (g_total may be
    # f64 from the high-precision total; the backward runs in f32).
    # With +ASC both outputs also depend on the raw lnl of the unobserved
    # patterns through the correction scalar; using
    # exp(lnl_corrected) = exp(lnl_raw)/(1-q), the extra pullback is
    # (g_total*n + sum(g_pat)) * asc_mask * exp(lnl_corrected).
    gt = g_total.astype(site.pattern_freq.dtype)
    w_p = gt * site.pattern_freq + g_pat  # [P]
    n_sites = jnp.sum(site.pattern_freq)
    w_p = w_p + (gt * n_sites + jnp.sum(g_pat)) * site.asc_mask * jnp.exp(
        jnp.minimum(lnl_p.astype(w_p.dtype), 30.0)
    )

    # edge-level cotangents accumulated INSIDE the downward sweep (the
    # outside partials are consumed row-by-row, never materialized).
    # The sweep's identity divides by the RAW per-pattern likelihood;
    # undo the +ASC shift (raw = corrected + log(1-q), with
    # 1-q = 1/(1+u), u = sum_asc exp(corrected)).
    u_asc = jnp.sum(
        site.asc_mask * jnp.exp(jnp.minimum(lnl_p.astype(w_p.dtype), 30.0))
    )
    lnl_raw = (lnl_p - jnp.log1p(u_asc)).astype(tips.dtype)
    if use_cs:
        from .kernels.cs_kernels import _fill_tip_rows_cs, fused_tbar_cs

        up_cs, usc_cs = _fill_tip_rows_cs(up_cs, usc_cs, tips,
                                          tree.n_taxa, model.ncat)
        trans_bar = fused_tbar_cs(
            steps, n_slots, trans, tips, model.props, model.state_freq,
            lnl_raw, w_p.astype(tips.dtype), up=up_cs, usc=usc_cs,
        )
    elif steps is not None:
        from .kernels.pruning import fused_downward_tbar

        # the fused reverse sweep reads EVERY child (tips included)
        # uniformly from the up buffer: fill tip rows + zero tip scales
        # (tip rows padded to the store's sublane-aligned state axis)
        S_pad = up.shape[2]
        tips_f = (jnp.pad(tips, ((0, 0), (0, S_pad - S), (0, 0)))
                  if S_pad != S else tips)
        up = up.at[: tree.n_taxa].set(tips_f[:, None, :, :])
        usc8 = usc8.at[: tree.n_taxa].set(0.0)
        trans_bar = fused_downward_tbar(
            steps, n_slots, trans, tips, up, usc8, model.state_freq,
            model.props, lnl_raw, w_p.astype(up.dtype),
        )
    else:
        trans_bar = _downward_trans_bar(
            tree, trans, mb, msc, up, up_scale, model.props,
            model.state_freq, lnl_raw, w_p,
        )[: tree.n_slots]

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
        tip_codes=_int_zero(site0.tip_codes),
        code_masks=jnp.zeros_like(site0.code_masks),
        pattern_freq=pattern_freq_bar[:P0],
        const_state=_int_zero(site0.const_state),
        asc_mask=jnp.zeros_like(site0.asc_mask),
    )
    return tree_bar, model_bar, site_bar


def _int_zero(x):
    """float0 cotangent for integer-valued primal arrays."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


_FUSED_CACHE = {}


def loglik_fused_fn(n_slots: int, tile: int = None):
    """custom-VJP likelihood whose FORWARD runs the fused Pallas kernel.

    The XLA forward streams ~4GB of mailbox/partial buffers through HBM
    per call; inside optimizer loops (L-BFGS line searches) several such
    computations are live at once, which overflowed HBM at 1000 taxa and
    crashed the TPU worker.  The fused kernel's working set is a few MB
    of VMEM, so value evaluations become nearly free; the backward is the
    same analytic sweep as `loglik`.

    Signature of the returned fn: (tree, model, site, steps) ->
    (lnL_f64, site_lnl); `steps` is the device-numbered slot schedule
    (kernels/schedule.py via kernels.pruning.device_slot_schedule)."""
    key = (n_slots, tile)
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]

    from .kernels.pruning import fused_compute_loglik

    @jax.custom_vjp
    def f(tree, model, site, steps):
        return fused_compute_loglik(tree, model, site, steps, n_slots, tile)

    def fwd(tree, model, site, steps):
        out = f(tree, model, site, steps)
        return out, (tree, model, site, steps)

    def bwd(res, cotangents):
        tree, model, site, steps = res
        tree_bar, model_bar, site_bar = _loglik_bwd(
            (tree, model, site), cotangents, steps=steps, n_slots=n_slots
        )
        return tree_bar, model_bar, site_bar, _int_zero(steps)

    f.defvjp(fwd, bwd)
    _FUSED_CACHE[key] = f
    return f


def _downward_trans_bar(
    tree, trans, mb, msc, up, up_scale, props, state_freq, lnl_p, w_p
):
    """Downward sweep fused with per-edge transition-matrix cotangents.

    For edge e (child of a row node):
      trans_bar[e,c,s,t] = w_c sum_p O_e[c,s,p] U_e[c,t,p]
                             * exp(scaleO_e + scaleU_e - lnl_p) * w_p
    The O rows are computed and consumed in-row; only D (the recursion
    state) and the [2N,C,S,S] cotangent accumulator are carried.  Reads
    from the carry are contiguous dynamic slices; writes are scatters —
    the in-place pattern (see upward_pass docstring).
    """
    from .likelihood import SCHED_WIDTH, SCALE_TINY, pad_trans

    W = SCHED_WIDTH
    n_slots = tree.n_slots
    C, S = trans.shape[1], trans.shape[2]
    P = mb.shape[4]
    dtype = trans.dtype
    root = tree.root
    dummy = tree.dummy

    trans_p = pad_trans(trans, W)
    children_p = jnp.concatenate(
        [tree.children, jnp.full((W, 2), dummy, tree.children.dtype)]
    )

    d = jnp.zeros((n_slots + W, C, S, P), dtype=dtype)
    ds = jnp.zeros((n_slots + W, P), dtype=dtype)
    d = d.at[root].set(
        jnp.broadcast_to(state_freq[:, :, None], (C, S, P)).astype(dtype)
    )
    tb = jnp.zeros((n_slots + W, C, S, S), dtype=dtype)

    def row_step(j, carry):
        d, ds, tb = carry
        i = tree.n_rows - 1 - j
        s = tree.row_start[i]
        ln = tree.row_len[i]
        z = jnp.zeros((), s.dtype)
        du = jax.lax.dynamic_slice(d, (s, z, z, z), (W, C, S, P))
        dsu = jax.lax.dynamic_slice(ds, (s, z), (W, P))
        blk = jax.lax.dynamic_slice(mb, (s, z, z, z, z), (W, 2, C, S, P))
        sbk = jax.lax.dynamic_slice(msc, (s, z, z), (W, 2, P))
        valid = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0] < ln
        ch = jax.lax.dynamic_slice(children_p, (s, z), (W, 2))
        l = jnp.where(valid, ch[:, 0], dummy)
        r = jnp.where(valid, ch[:, 1], dummy)

        def side(child_ids, m_sib, s_sib):
            y = du * m_sib  # O_child (unnormalized) [W,C,S,P]
            mx = jnp.maximum(jnp.max(y, axis=(1, 2)), SCALE_TINY)
            o = y / mx[:, None, None, :]
            osc = dsu + s_sib + jnp.log(mx)
            u_c = up[child_ids]  # gather from non-carried input: fine
            us_c = up_scale[child_ids]
            fac = jnp.exp(
                jnp.clip(osc + us_c - lnl_p[None, :], max=80.0)
            ) * w_p[None, :]
            tbar = jnp.einsum(
                "wcsp,wctp,wp,c->wcst", o, u_c, fac, props,
                precision=HIGHEST,
            )
            d_c = jnp.einsum(
                "wcst,wcsp->wctp", trans_p[child_ids], o, precision=HIGHEST
            )
            return o, osc, tbar, d_c

        ol, ol_s, tb_l, dl = side(l, blk[:, 1], sbk[:, 1])
        or_, or_s, tb_r, dr = side(r, blk[:, 0], sbk[:, 0])
        d = d.at[l].set(dl).at[r].set(dr)
        ds = ds.at[l].set(ol_s).at[r].set(or_s)
        tb = tb.at[l].set(tb_l).at[r].set(tb_r)
        return d, ds, tb

    _, _, tb = jax.lax.fori_loop(0, tree.n_rows, row_step, (d, ds, tb))
    # dummy/padding rows absorbed garbage; zero them
    tb = tb.at[dummy].set(0.0)
    return tb


loglik.defvjp(_loglik_fwd, _loglik_bwd)
