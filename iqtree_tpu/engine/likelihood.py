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


class TreeArrays(NamedTuple):
    """Device view of one topology + branch lengths."""

    postorder: jnp.ndarray  # [N-1] int32 internal nodes, root last
    children: jnp.ndarray  # [2N-1, 2] int32
    parent: jnp.ndarray  # [2N-1] int32, -1 at root
    blen: jnp.ndarray  # [2N-1] float

    @property
    def n_nodes(self) -> int:
        return self.children.shape[0]

    @property
    def n_taxa(self) -> int:
        return (self.n_nodes + 1) // 2

    @classmethod
    def from_tree(cls, tree: PhyloTree, dtype=jnp.float32) -> "TreeArrays":
        return cls(
            postorder=jnp.asarray(tree.postorder()),
            children=jnp.asarray(tree.children),
            parent=jnp.asarray(tree.parent),
            blen=jnp.asarray(tree.blen, dtype=dtype),
        )

    def with_blen(self, blen: jnp.ndarray) -> "TreeArrays":
        return self._replace(blen=blen)

    def parent_of(self, v):
        return self.parent[v]


class ModelArrays(NamedTuple):
    """Device view of (substitution model x rate heterogeneity)."""

    eigenvalues: jnp.ndarray  # [S]
    eigvec: jnp.ndarray  # [S, S]
    inv_eigvec: jnp.ndarray  # [S, S]
    state_freq: jnp.ndarray  # [S]
    rates: jnp.ndarray  # [C]
    props: jnp.ndarray  # [C]
    p_invar: jnp.ndarray  # scalar

    @property
    def num_states(self) -> int:
        return self.eigenvalues.shape[0]

    @property
    def ncat(self) -> int:
        return self.rates.shape[0]

    @classmethod
    def from_model(
        cls, subst: ReversibleModel, rate: RateModel, dtype=jnp.float32
    ) -> "ModelArrays":
        lam, v, vinv = subst.eigen()
        r, w = rate.category_rates()
        return cls(
            eigenvalues=jnp.asarray(lam, dtype=dtype),
            eigvec=jnp.asarray(v, dtype=dtype),
            inv_eigvec=jnp.asarray(vinv, dtype=dtype),
            state_freq=jnp.asarray(subst.state_freq, dtype=dtype),
            rates=jnp.asarray(r, dtype=dtype),
            props=jnp.asarray(w, dtype=dtype),
            p_invar=jnp.asarray(rate.p_invar, dtype=dtype),
        )


class SiteData(NamedTuple):
    """Device view of the pattern-compressed alignment."""

    tip_codes: jnp.ndarray  # [N_taxa, P] int32
    code_masks: jnp.ndarray  # [n_codes, S]
    pattern_freq: jnp.ndarray  # [P]
    const_state: jnp.ndarray  # [P] int32: -1 | state | S (all-unknown)

    @classmethod
    def from_alignment(cls, aln, dtype=jnp.float32) -> "SiteData":
        return cls(
            tip_codes=jnp.asarray(aln.patterns),
            code_masks=jnp.asarray(aln.states.code_masks, dtype=dtype),
            pattern_freq=jnp.asarray(aln.pattern_freq, dtype=dtype),
            const_state=jnp.asarray(aln.const_state),
        )


def branch_transition_mats(model: ModelArrays, blen: jnp.ndarray) -> jnp.ndarray:
    """P(blen[v] * rate[c]) for every node and category: [2N-1, C, S, S].

    Batched analogue of the per-node eleft/eright computation in the
    reference kernels (phylokernel.h:163-181)."""
    t = blen[:, None] * model.rates[None, :]  # [V, C]
    return transition_matrices(model.eigenvalues, model.eigvec, model.inv_eigvec, t)


def tip_partials(site: SiteData, ncat: int) -> jnp.ndarray:
    """[N_taxa, S, P] state-indicator partials from integer codes
    (TPU analogue of computeTipPartialLikelihood,
    /root/reference/phylotreesse.cpp:359)."""
    masks = site.code_masks[site.tip_codes]  # [N, P, S]
    return jnp.swapaxes(masks, 1, 2)  # [N, S, P]


def upward_pass(
    tree: TreeArrays,
    trans: jnp.ndarray,  # [2N-1, C, S, S]
    tips: jnp.ndarray,  # [N_taxa, S, P]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Post-order pruning; returns (partials [2N-1,C,S,P], logscale [2N-1,P]).

    partials[v] holds the *scaled* conditional likelihood of the subtree
    below v given the state at v; logscale[v] the accumulated per-pattern
    log renormalization."""
    n_nodes = tree.n_nodes
    n_taxa = tree.n_taxa
    C = trans.shape[1]
    S = tips.shape[1]
    P = tips.shape[2]
    dtype = trans.dtype

    x0 = jnp.zeros((n_nodes, C, S, P), dtype=dtype)
    x0 = x0.at[:n_taxa].set(tips[:, None, :, :])
    s0 = jnp.zeros((n_nodes, P), dtype=dtype)

    def step(carry, node):
        x, scale = carry
        l = tree.children[node, 0]
        r = tree.children[node, 1]
        # HIGHEST precision: bf16 MXU rounding of near-zero transition rows
        # creates negative partials (-> NaN in log); these contractions are
        # bandwidth-bound at S<=64, so full f32 costs nothing.
        ml = jnp.einsum("cst,ctp->csp", trans[l], x[l],
                        precision=jax.lax.Precision.HIGHEST)
        mr = jnp.einsum("cst,ctp->csp", trans[r], x[r],
                        precision=jax.lax.Precision.HIGHEST)
        y = ml * mr
        m = jnp.maximum(jnp.max(y, axis=(0, 1)), SCALE_TINY)  # [P]
        y = y / m
        sc = scale[l] + scale[r] + jnp.log(m)
        x = x.at[node].set(y)
        scale = scale.at[node].set(sc)
        return (x, scale), None

    (x, scale), _ = jax.lax.scan(step, (x0, s0), tree.postorder)
    return x, scale


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
    mix = jnp.einsum("c,s,csp->p", model.props, model.state_freq, root_partial)
    mix = jnp.maximum(mix, SCALE_TINY)
    lnl_var = root_scale + jnp.log(mix)
    # ptn_invar[p] = p_inv * (1 if const==S else pi[const] if const>=0 else 0)
    const = site.const_state
    pi_ext = jnp.concatenate([model.state_freq, jnp.ones((1,), model.state_freq.dtype)])
    w = jnp.where(const >= 0, pi_ext[jnp.clip(const, 0, S)], 0.0)
    ptn_invar = model.p_invar * w
    lnl = jnp.where(
        ptn_invar > 0,
        jnp.logaddexp(lnl_var, jnp.log(jnp.maximum(ptn_invar, SCALE_TINY))),
        lnl_var,
    )
    total = jnp.sum(site.pattern_freq * lnl)
    return total, lnl


def compute_loglik(
    tree: TreeArrays, model: ModelArrays, site: SiteData
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tree log-likelihood (the public entry; cf. PhyloTree::computeLikelihood,
    /root/reference/phylotree.cpp:1031).  Returns (lnL, pattern_lnl)."""
    trans = branch_transition_mats(model, tree.blen)
    tips = tip_partials(site, model.ncat)
    x, scale = upward_pass(tree, trans, tips)
    root = tree.postorder[-1]
    return root_loglik(model, site, x[root], scale[root])
