"""Felsenstein pruning on array-encoded trees (JAX).

TPU-native replacement for the reference likelihood kernels
(/root/reference/phylokernel.h:70-1260, phylotreesse.cpp): instead of a
recursive DFS over pointer-linked PhyloNeighbors with dirty bits, the tree
topology is *data* (post-order index arrays) and the pruning runs as a
`lax.scan` over internal nodes, each step a batched [C,S,S]x[C,S,P]
contraction with the pattern axis P on the TPU lane dimension.

Numerical scaling: the reference rescales per-pattern when the partial
max drops below 2^-256 and counts scale events (phylokernel.h:381-390,
phylotree.h:52-54).  Here every internal node renormalizes by its
per-pattern max and accumulates log-scale, which is branchless and exact:
  lnl[p] = logaddexp(scale_root[p] + log(site_mix[p]), log(ptn_invar[p]))

Layouts:
  tip codes          int32 [N_taxa, P]
  partials buffer    [2N-1, C, S, P]
  log-scale buffer   [2N-1, P]
  transition mats    [2N-1, C, S, S]
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eigen import transition_matrices
from ..models.rates import RateModel
from ..models.subst import ReversibleModel
from ..trees.tree import PhyloTree

# Floor for per-pattern renormalization factors: prevents division by zero
# on impossible states; any real pattern likelihood is far above this.
SCALE_TINY = 1e-30


SCHED_WIDTH = 32  # nodes per pruning row (trees/tree.py device_layout)


class TreeArrays(NamedTuple):
    """Device view of one topology + branch lengths (mailbox layout).

    Internal nodes use a level-contiguous DEVICE numbering
    (trees/tree.py device_layout): tips keep host ids 0..N-1, internal
    nodes are N..2N-2 in schedule-row order (device root is always
    2N-2), plus one dummy slot 2N-1 that absorbs padded writes.  d2h/h2d
    translate to the host PhyloTree numbering.

    Why this layout: the pruning loops read each row with contiguous
    dynamic slices and write results by scattering to parents ("push").
    A vector gather from a loop-carried buffer forces XLA to copy the
    whole buffer every iteration on TPU (measured 20x); contiguous reads
    + scatter-only writes stay in-place.
    """

    children: jnp.ndarray  # [2N, 2] device ids; dummy row = (dummy, dummy)
    parent: jnp.ndarray  # [2N] device ids; parent[root] = parent[dummy] = dummy
    side: jnp.ndarray  # [2N] mailbox slot (0/1) in the parent
    blen: jnp.ndarray  # [2N] float (device numbering), blen[dummy] = 0
    row_start: jnp.ndarray  # [N-1] int32 device-id range starts
    row_len: jnp.ndarray  # [N-1] int32
    n_rows: jnp.ndarray  # scalar int32
    d2h: jnp.ndarray  # [2N-1] device -> host node id
    h2d: jnp.ndarray  # [2N-1] host -> device node id

    @property
    def n_slots(self) -> int:
        return self.children.shape[0]

    @property
    def n_nodes(self) -> int:
        return self.children.shape[0] - 1

    @property
    def n_taxa(self) -> int:
        return (self.n_nodes + 1) // 2

    @property
    def dummy(self) -> int:
        return self.n_nodes

    @property
    def root(self) -> int:
        return self.n_nodes - 1  # device root is always the last real node

    @classmethod
    def from_tree(cls, tree: PhyloTree, dtype=jnp.float32) -> "TreeArrays":
        n = tree.n_nodes
        dummy = n
        lay = tree.device_layout(SCHED_WIDTH)
        d2h, h2d = lay["d2h"], lay["h2d"]
        # device-numbered structure arrays (vectorized remap)
        children = np.full((n + 1, 2), dummy, dtype=np.int32)
        parent = np.full(n + 1, dummy, dtype=np.int32)
        side = np.zeros(n + 1, dtype=np.int32)
        blen = np.zeros(n + 1, dtype=np.float64)
        blen[:n] = tree.blen[d2h]
        hp = tree.parent[d2h]  # [2N-1] host parents in device order
        has_p = hp >= 0
        parent[:n][has_p] = h2d[hp[has_p]]
        side[:n][has_p] = (
            tree.children[hp[has_p], 0] != d2h[has_p]
        ).astype(np.int32)
        internal = d2h >= tree.n_taxa
        children[:n][internal] = h2d[tree.children[d2h[internal]]]
        return cls(
            children=jnp.asarray(children),
            parent=jnp.asarray(parent),
            side=jnp.asarray(side),
            blen=jnp.asarray(blen, dtype=dtype),
            row_start=jnp.asarray(lay["row_start"]),
            row_len=jnp.asarray(lay["row_len"]),
            n_rows=jnp.asarray(lay["n_rows"], dtype=jnp.int32),
            d2h=jnp.asarray(d2h),
            h2d=jnp.asarray(h2d),
        )

    def with_blen(self, blen: jnp.ndarray) -> "TreeArrays":
        return self._replace(blen=blen)

    def parent_of(self, v):
        return self.parent[v]

    def host_blen(self) -> np.ndarray:
        """Branch lengths mapped back to the host PhyloTree numbering."""
        dev = np.asarray(self.blen, dtype=np.float64)[:-1]
        out = np.empty_like(dev)
        out[np.asarray(self.d2h)] = dev
        return out


class ModelArrays(NamedTuple):
    """Device view of (substitution model x rate heterogeneity).

    All eigen-data carries a leading fused category axis C = (mixture
    classes x rate classes); non-mixture models store C identical copies
    (the reference's fused_mix_rate layout, phylotreesse.cpp:99-136), so
    ONE engine serves plain, +G/+R, and mixture models alike."""

    eigenvalues: jnp.ndarray  # [C, S]
    eigvec: jnp.ndarray  # [C, S, S]
    inv_eigvec: jnp.ndarray  # [C, S, S]
    state_freq: jnp.ndarray  # [C, S] per-class root/stationary frequencies
    rates: jnp.ndarray  # [C]
    props: jnp.ndarray  # [C]
    p_invar: jnp.ndarray  # scalar
    # Non-reversible models only (UNREST, models/nonrev.py): the rate
    # matrix itself; P(t) then goes through expm instead of the eigen
    # path (reference: ModelNonRev::computeTransMatrix via matexp,
    # /root/reference/model/modelnonrev.cpp:246).  None for reversible.
    qmat: Optional[jnp.ndarray] = None  # [C, S, S] or None

    @property
    def num_states(self) -> int:
        return self.eigenvalues.shape[-1]

    @property
    def ncat(self) -> int:
        return self.rates.shape[0]

    @property
    def mean_freq(self) -> jnp.ndarray:
        """[S] class-weighted stationary frequencies (for the invariable
        class and reporting)."""
        w = self.props / jnp.maximum(self.props.sum(), 1e-12)
        return jnp.einsum("c,cs->s", w, self.state_freq)

    @classmethod
    def from_model(
        cls, subst, rate: RateModel, dtype=jnp.float32
    ) -> "ModelArrays":
        from ..models.mixture import MixtureModel
        from ..models.nonrev import NonRevModel

        if isinstance(subst, MixtureModel):
            return cls.from_mixture(subst, rate, dtype)
        if isinstance(subst, NonRevModel):
            from ..models.nonrev import nonrev_qmat

            q, pi = nonrev_qmat(
                jnp.asarray(subst.nr_rates, dtype=dtype), subst.num_states
            )
            r, w = rate.category_rates()
            C, S = r.shape[0], subst.num_states
            eye = jnp.broadcast_to(jnp.eye(S, dtype=dtype), (C, S, S))
            return cls(
                eigenvalues=jnp.zeros((C, S), dtype),
                eigvec=eye,
                inv_eigvec=eye,
                state_freq=jnp.broadcast_to(pi.astype(dtype), (C, S)),
                rates=jnp.asarray(r, dtype=dtype),
                props=jnp.asarray(w, dtype=dtype),
                p_invar=jnp.asarray(rate.p_invar, dtype=dtype),
                qmat=jnp.broadcast_to(q.astype(dtype), (C, S, S)),
            )
        lam, v, vinv = subst.eigen()
        r, w = rate.category_rates()
        C = r.shape[0]
        S = lam.shape[0]
        return cls(
            eigenvalues=jnp.broadcast_to(
                jnp.asarray(lam, dtype=dtype), (C, S)
            ),
            eigvec=jnp.broadcast_to(jnp.asarray(v, dtype=dtype), (C, S, S)),
            inv_eigvec=jnp.broadcast_to(
                jnp.asarray(vinv, dtype=dtype), (C, S, S)
            ),
            state_freq=jnp.broadcast_to(
                jnp.asarray(subst.state_freq, dtype=dtype), (C, S)
            ),
            rates=jnp.asarray(r, dtype=dtype),
            props=jnp.asarray(w, dtype=dtype),
            p_invar=jnp.asarray(rate.p_invar, dtype=dtype),
        )

    @classmethod
    def from_mixture(cls, mix, rate: RateModel, dtype=jnp.float32):
        """Fused (mixture x rate) category axis.  With
        mix.fused_with_rate (LG4M-style `*G4`), class m pairs with rate
        class m (C = M); otherwise C = M x R with m-major ordering."""
        lam_m, v_m, vinv_m, freq_m = mix.eigen_all()  # [M,S], [M,S,S], ...
        r, w = rate.category_rates()
        M, S = lam_m.shape
        R = r.shape[0]
        comp_rate = np.asarray(mix.comp_rates, dtype=np.float64)  # [M]
        if mix.fused_with_rate:
            if M != R:
                raise ValueError(
                    f"fused mixture has {M} classes but rate model has {R}"
                )
            rates = np.asarray(r) * comp_rate
            props = np.asarray(w) * 0 + np.asarray(mix.weights) * np.asarray(w).sum()
            # fused: weights are the mixture weights scaled by the total
            # non-invariant mass
            eigenvalues, eigvec, inv_eigvec, state_freq = lam_m, v_m, vinv_m, freq_m
        else:
            rates = (np.asarray(r)[None, :] * comp_rate[:, None]).reshape(-1)
            props = (
                np.asarray(mix.weights)[:, None] * np.asarray(w)[None, :]
            ).reshape(-1)
            eigenvalues = np.repeat(lam_m, R, axis=0)
            eigvec = np.repeat(v_m, R, axis=0)
            inv_eigvec = np.repeat(vinv_m, R, axis=0)
            state_freq = np.repeat(freq_m, R, axis=0)
        return cls(
            eigenvalues=jnp.asarray(eigenvalues, dtype=dtype),
            eigvec=jnp.asarray(eigvec, dtype=dtype),
            inv_eigvec=jnp.asarray(inv_eigvec, dtype=dtype),
            state_freq=jnp.asarray(state_freq, dtype=dtype),
            rates=jnp.asarray(rates, dtype=dtype),
            props=jnp.asarray(props, dtype=dtype),
            p_invar=jnp.asarray(rate.p_invar, dtype=dtype),
        )


class SiteData(NamedTuple):
    """Device view of the pattern-compressed alignment.

    Ascertainment-bias correction (+ASC, Lewis 2001): the S unobservable
    constant patterns are appended to the pattern axis with zero
    pattern_freq and asc_mask=1 (the reference's `unobserved_ptns`,
    /root/reference/model/modelfactory.h:212, modelfactory.cpp:355-368);
    every reduction then conditions on variability via
    lnl_p := lnl_p - log(1 - sum_asc exp(lnl))."""

    tip_codes: jnp.ndarray  # [N_taxa, P] int32
    code_masks: jnp.ndarray  # [n_codes, S]
    pattern_freq: jnp.ndarray  # [P]
    const_state: jnp.ndarray  # [P] int32: -1 | state | S (all-unknown)
    asc_mask: jnp.ndarray  # [P] 1.0 on appended unobserved-constant patterns

    @classmethod
    def from_alignment(cls, aln, dtype=jnp.float32, asc: bool = False) -> "SiteData":
        tip_codes = np.asarray(aln.patterns)
        pattern_freq = np.asarray(aln.pattern_freq, dtype=np.float64)
        const_state = np.asarray(aln.const_state)
        asc_mask = np.zeros(tip_codes.shape[1], dtype=np.float64)
        if asc:
            S = aln.num_states
            N = tip_codes.shape[0]
            const_cols = np.tile(np.arange(S, dtype=tip_codes.dtype), (N, 1))
            tip_codes = np.concatenate([tip_codes, const_cols], axis=1)
            pattern_freq = np.concatenate([pattern_freq, np.zeros(S)])
            const_state = np.concatenate(
                [const_state, np.arange(S, dtype=const_state.dtype)]
            )
            asc_mask = np.concatenate([asc_mask, np.ones(S)])
        out = cls(
            tip_codes=jnp.asarray(tip_codes),
            code_masks=jnp.asarray(aln.states.code_masks, dtype=dtype),
            pattern_freq=jnp.asarray(pattern_freq, dtype=dtype),
            const_state=jnp.asarray(const_state),
            asc_mask=jnp.asarray(asc_mask, dtype=dtype),
        )
        # active device mesh => shard the pattern axis here, the single
        # choke point every pipeline (search/UFBoot/partition/CLI) builds
        # its SiteData through; padding patterns are inert, and host-side
        # consumers slice engine outputs to the true pattern count
        from ..parallel import get_mesh

        mesh = get_mesh()
        if mesh is not None and mesh.size > 1:
            from ..parallel import shard_site_data

            out = shard_site_data(out, mesh)
        return out


def branch_transition_mats(model: ModelArrays, blen: jnp.ndarray) -> jnp.ndarray:
    """P(blen[v] * rate[c]) for every node and category: [2N-1, C, S, S].

    Batched analogue of the per-node eleft/eright computation in the
    reference kernels (phylokernel.h:163-181)."""
    t = blen[:, None] * model.rates[None, :]  # [V, C]
    if model.qmat is not None:
        # non-reversible path: P = expm(Q * r_c * t_v), batched over
        # nodes x categories (ModelNonRev::computeTransMatrix,
        # /root/reference/model/modelnonrev.cpp:246); solve-free expm
        # because TPU XLA has no f64 LU (models/nonrev.py)
        from ..models.nonrev import expm_taylor

        qt = model.qmat[None, :, :, :] * t[:, :, None, None]  # [V,C,S,S]
        return expm_taylor(qt)
    return transition_matrices(model.eigenvalues, model.eigvec, model.inv_eigvec, t)


def tip_partials(site: SiteData, ncat: int) -> jnp.ndarray:
    """[N_taxa, S, P] state-indicator partials from integer codes
    (TPU analogue of computeTipPartialLikelihood,
    /root/reference/phylotreesse.cpp:359)."""
    masks = site.code_masks[site.tip_codes]  # [N, P, S]
    return jnp.swapaxes(masks, 1, 2)  # [N, S, P]


def pad_trans(trans: jnp.ndarray, width: int = SCHED_WIDTH) -> jnp.ndarray:
    """Append `width` identity rows so W-wide dynamic slices near the end
    of the node range never clamp."""
    C, S = trans.shape[1], trans.shape[2]
    eye = jnp.broadcast_to(jnp.eye(S, dtype=trans.dtype), (width, C, S, S))
    return jnp.concatenate([trans, eye], axis=0)


def upward_pass(
    tree: TreeArrays,
    trans: jnp.ndarray,  # [2N, C, S, S] (device numbering; dummy row P(0)=I)
    tips: jnp.ndarray,  # [N_taxa, S, P]
    return_mailbox: bool = False,
):
    """Mailbox pruning; returns (partials U [2N+W,C,S,P], logscale
    [2N+W,P]) and optionally the message mailbox.

    U[v] is the *scaled* conditional likelihood of the subtree below v
    given the state at v (entries beyond 2N-1 are padding garbage).  The
    mailbox mb[u, k] holds the transition-applied message of u's k-th
    child — each schedule row reads its own contiguous id range from the
    mailbox, combines the two child messages, and pushes its message to
    its parent's mailbox slot.  Only contiguous dynamic-slice reads and
    scatter writes touch the loop carry, which XLA keeps in-place (a
    vector gather from the carry costs a full buffer copy per row).

    The reference's recursive DFS (phylokernel.h:80-126) is inherently
    serial per node; here a balanced N-taxon tree takes ~N/(W log) steps.
    """
    W = SCHED_WIDTH
    n_slots = tree.n_slots
    n_taxa = tree.n_taxa
    C = trans.shape[1]
    S = tips.shape[1]
    P = tips.shape[2]
    dtype = trans.dtype
    dummy = tree.dummy
    HP = jax.lax.Precision.HIGHEST

    trans_p = pad_trans(trans, W)
    # pad index arrays so W-wide slices near the end never clamp
    parent_p = jnp.concatenate(
        [tree.parent, jnp.full((W,), dummy, tree.parent.dtype)]
    )
    side_p = jnp.concatenate([tree.side, jnp.zeros((W,), tree.side.dtype)])

    # prologue: tip messages into parents' mailboxes
    m_tip = jnp.einsum("ncst,ntp->ncsp", trans[:n_taxa], tips, precision=HP)
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
        # message to parent: trans of these very nodes (contiguous read)
        tr = jax.lax.dynamic_slice(trans_p, (s, z, z, z), (W, C, S, S))
        m = jnp.einsum("wcst,wctp->wcsp", tr, y, precision=HP)
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


def root_loglik(
    model: ModelArrays,
    site: SiteData,
    root_partial: jnp.ndarray,  # [C, S, P]
    root_scale: jnp.ndarray,  # [P]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(total lnL float64-ish scalar, per-pattern lnl [P]).

    lh mix = sum_c prop_c sum_s pi_s X[c,s,p]; invariable-site class added
    in log space (reference adds ptn_invar linearly and skips scaling of
    constant patterns, phylokernel.h:617)."""
    S = model.num_states
    mix = jnp.einsum("c,cs,csp->p", model.props, model.state_freq, root_partial)
    mix = jnp.maximum(mix, SCALE_TINY)
    lnl_var = root_scale + jnp.log(mix)
    # ptn_invar[p] = p_inv * (1 if const==S else pi[const] if const>=0 else 0)
    const = site.const_state
    mean_freq = model.mean_freq
    pi_ext = jnp.concatenate([mean_freq, jnp.ones((1,), mean_freq.dtype)])
    w = jnp.where(const >= 0, pi_ext[jnp.clip(const, 0, S)], 0.0)
    ptn_invar = model.p_invar * w
    lnl = jnp.where(
        ptn_invar > 0,
        jnp.logaddexp(lnl_var, jnp.log(jnp.maximum(ptn_invar, SCALE_TINY))),
        lnl_var,
    )
    lnl = lnl - asc_correction(site, lnl)
    # accumulate the total in f64 (requires jax x64 enabled; arrays stay
    # f32): at |lnL| ~ 1e6+ the f32 resolution (0.25) is coarser than
    # every convergence tolerance in the system
    total = jnp.sum(
        site.pattern_freq.astype(jnp.float64) * lnl.astype(jnp.float64)
    )
    return total, lnl


def asc_correction(site: SiteData, site_lnl: jnp.ndarray) -> jnp.ndarray:
    """log(1 - q), q = sum over unobserved constant patterns of their
    (uncorrected) likelihood; identically 0 without +ASC.  Shifting every
    per-pattern lnl by this scalar makes any downstream weighted reduction
    (total lnL, RELL rescoring, site-lnL output) Lewis-corrected."""
    q = jnp.sum(site.asc_mask * jnp.exp(jnp.minimum(site_lnl, 0.0)))
    return jnp.log1p(-jnp.minimum(q, 1.0 - 1e-10))


def compute_loglik(
    tree: TreeArrays, model: ModelArrays, site: SiteData
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tree log-likelihood (the public entry; cf. PhyloTree::computeLikelihood,
    /root/reference/phylotree.cpp:1031).  Returns (lnL, pattern_lnl)."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    x, scale = upward_pass(tree, trans, tips)
    root = tree.root
    return root_loglik(model, site, x[root], scale[root])


def pattern_lnl_categories(tree, model: ModelArrays, site: SiteData):
    """[P, C] per-class pattern log-likelihood contributions
    log(prop_c * L_cp) for the -wslr/-wslm/-wslmr writers
    (printSiteLhCategory, /root/reference/phylotesting.cpp:243-310).

    Matches the reference convention: the +I invariable class is NOT
    split into the columns (its mass lives in the total only), and
    props already carry the (1 - p_inv) scaling."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    up, up_scale = upward_pass(tree, trans, tips)
    root = tree.root
    l_cp = jnp.einsum(
        "cs,csp->cp", model.state_freq, up[root],
        precision=jax.lax.Precision.HIGHEST,
    )
    l_cp = jnp.maximum(l_cp * model.props[:, None], SCALE_TINY)
    return (jnp.log(l_cp) + up_scale[root][None, :]).T  # [P, C]
