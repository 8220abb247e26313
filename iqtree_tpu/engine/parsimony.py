"""Bit-parallel Fitch parsimony + stepwise-addition start trees (device).

TPU-native re-expression of the reference parsimony engine
(/root/reference/phylotreepars.cpp:18 bit-parallel Fitch over packed
bitsets; SIMD variant /root/reference/phylokernel.h:1264; stepwise
addition `computeParsimonyTree` used for start trees, iqtree.cpp:524).

Design: state sets are uint32 bitmask words, shape [nodes, W, P] with
W = ceil(S/32) words (DNA/protein W=1, codon W=2) and the pattern axis P
on the lane dimension.  The Fitch combine is branchless:

    inter = a & b
    empty = all-words(inter == 0)
    out   = where(empty, a | b, inter);  cost += empty * pattern_freq

The up pass reuses the level-batched mailbox row schedule of the
likelihood engine (engine/likelihood.py upward_pass), so one compiled
program serves every topology of a given size.  For stepwise addition a
reversed (root-to-tips) pass produces the directed state set of the tree
*minus* each subtree ("rest"); the marginal cost of attaching a new leaf
onto the edge above node v is then

    delta(v) = sum_p freq[p] * [leaf_mask & (up[v] | rest[v]) == 0]

evaluated for every edge of the current tree in one batched device call
(the reference walks candidate branches serially per added taxon).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.alignment import Alignment
from ..trees.tree import MIN_BLEN, PhyloTree
from .likelihood import SCHED_WIDTH, TreeArrays

FULL = np.uint32(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# bit packing
# ---------------------------------------------------------------------------


def pack_tip_masks(aln: Alignment) -> np.ndarray:
    """[N_taxa, W, P] uint32 state-set bitmasks from the encoded patterns.

    Ambiguity codes map to multi-bit masks via the alignment's code->state
    table (the parsimony analogue of likelihood tip_partials)."""
    S = aln.num_states
    W = (S + 31) // 32
    code_masks = np.asarray(aln.states.code_masks) > 0  # [n_codes, S]
    n_codes = code_masks.shape[0]
    packed = np.zeros((n_codes, W), dtype=np.uint32)
    for s in range(S):
        packed[:, s // 32] |= code_masks[:, s].astype(np.uint32) << np.uint32(
            s % 32
        )
    return np.ascontiguousarray(packed[aln.patterns].transpose(0, 2, 1))


def _combine(a, b):
    """Fitch combine on uint32 word stacks [..., W, P]; returns
    (state set, empty-intersection bool [..., P])."""
    inter = a & b
    empty = jnp.all(inter == 0, axis=-2)
    out = jnp.where(empty[..., None, :], a | b, inter)
    return out, empty


# ---------------------------------------------------------------------------
# up pass (score) over the TreeArrays mailbox schedule
# ---------------------------------------------------------------------------


def _fitch_up(
    parent: jnp.ndarray,  # [n_slots] int32 (dummy-terminated)
    side: jnp.ndarray,  # [n_slots] int32
    row_start: jnp.ndarray,  # [R] int32
    row_len: jnp.ndarray,  # [R] int32
    n_rows: jnp.ndarray,  # scalar int32
    tips: jnp.ndarray,  # [n_slots, W, P] uint32; tip rows set, rest 0
    n_taxa_slots: int,  # static: ids < this are (potential) tips
    freq: jnp.ndarray,  # [P] float
):
    """Returns (up [n_slots+SW, W, P], cost scalar, per-pattern steps [P])."""
    SW = SCHED_WIDTH
    n_slots = parent.shape[0]
    W, P = tips.shape[1], tips.shape[2]
    dummy = n_slots - 1

    parent_p = jnp.concatenate([parent, jnp.full((SW,), dummy, parent.dtype)])
    side_p = jnp.concatenate([side, jnp.zeros((SW,), side.dtype)])

    mb = jnp.zeros((n_slots + SW, 2, W, P), dtype=jnp.uint32)
    # prologue: tip state sets into their parents' mailboxes (absent tips
    # have parent == dummy, so their writes land in the scratch slot)
    mb = mb.at[parent[:n_taxa_slots], side[:n_taxa_slots]].set(
        tips[:n_taxa_slots]
    )
    up0 = jnp.zeros((n_slots + SW, W, P), dtype=jnp.uint32)
    up0 = up0.at[:n_taxa_slots].set(tips[:n_taxa_slots])
    steps0 = jnp.zeros((P,), dtype=freq.dtype)

    def row_step(i, carry):
        mb, up, steps = carry
        s = row_start[i]
        ln = row_len[i]
        z = jnp.zeros((), s.dtype)
        blk = jax.lax.dynamic_slice(mb, (s, z, z, z), (SW, 2, W, P))
        y, empty = _combine(blk[:, 0], blk[:, 1])  # [SW,W,P], [SW,P]
        valid = jax.lax.broadcasted_iota(jnp.int32, (SW,), 0) < ln
        steps = steps + jnp.sum(
            jnp.where(valid[:, None], empty, False).astype(steps.dtype), axis=0
        )
        up = jax.lax.dynamic_update_slice(up, y, (s, z, z))
        p = jnp.where(valid, jax.lax.dynamic_slice(parent_p, (s,), (SW,)), dummy)
        sd = jax.lax.dynamic_slice(side_p, (s,), (SW,))
        mb = mb.at[p, sd].set(y)
        return mb, up, steps

    mb, up, steps = jax.lax.fori_loop(0, n_rows, row_step, (mb, up0, steps0))
    cost = jnp.sum(freq * steps)
    return up, cost, steps


def parsimony_score(tree: PhyloTree, aln: Alignment) -> float:
    """Unrooted Fitch parsimony score (PhyloTree::computeParsimony
    equivalent).  The virtual root is degree-2, which leaves the Fitch
    count unchanged (rooting on an edge is score-invariant)."""
    ta = TreeArrays.from_tree(tree)
    tips = np.zeros(
        (ta.n_slots,) + pack_tip_masks(aln).shape[1:], dtype=np.uint32
    )
    tips[: aln.n_taxa] = pack_tip_masks(aln)
    _, cost, _ = _score_jit(
        ta.parent,
        ta.side,
        ta.row_start,
        ta.row_len,
        ta.n_rows,
        jnp.asarray(tips),
        aln.n_taxa,
        jnp.asarray(aln.pattern_freq, jnp.float32),
    )
    return float(cost)


from functools import partial


@partial(jax.jit, static_argnums=(6,))
def _score_jit(parent, side, row_start, row_len, n_rows, tips, n_taxa, freq):
    return _fitch_up(
        parent, side, row_start, row_len, n_rows, tips, n_taxa, freq
    )


# ---------------------------------------------------------------------------
# stepwise addition
# ---------------------------------------------------------------------------


def _insertion_scores(
    parent, side, sib, row_start, row_len, n_rows, tips, n_taxa, leaf, freq
):
    """[n_slots] insertion cost for attaching `leaf` above every node.

    Invalid slots return garbage; the host masks them.  rest[root] is the
    full mask, which makes the root's children uniform under the combine
    rule (combine(ones, x) = x)."""
    up, cost, _ = _fitch_up(
        parent, side, row_start, row_len, n_rows, tips, n_taxa, freq
    )
    SW = SCHED_WIDTH
    n_slots = parent.shape[0]
    W, P = tips.shape[1], tips.shape[2]
    dummy = n_slots - 1

    dpad = jnp.full((SW,), dummy, parent.dtype)
    parent_p = jnp.concatenate([parent, dpad])
    sib_p = jnp.concatenate([sib, dpad])
    rest0 = jnp.zeros((n_slots + SW, W, P), dtype=jnp.uint32)
    # root = last internal node; host passes its id via sib[dummy]
    root = sib[dummy]
    rest0 = rest0.at[root].set(jnp.full((W, P), FULL, dtype=jnp.uint32))

    def row_step(k, rest):
        i = n_rows - 1 - k
        s = row_start[i]
        z = jnp.zeros((), s.dtype)
        p = jax.lax.dynamic_slice(parent_p, (s,), (SW,))
        sb = jax.lax.dynamic_slice(sib_p, (s,), (SW,))
        rp = rest[p]  # [SW, W, P] gather
        us = up[sb]
        y, _ = _combine(rp, us)
        rest = jax.lax.dynamic_update_slice(rest, y, (s, z, z))
        return rest

    rest = jax.lax.fori_loop(0, n_rows, row_step, rest0)
    # tips in one batch
    tp = parent[:n_taxa]
    ts = sib[:n_taxa]
    ty, _ = _combine(rest[tp], up[ts])
    rest = rest.at[:n_taxa].set(ty)

    un = up[:n_slots] | rest[:n_slots]  # [n_slots, W, P]
    hit = jnp.any((leaf[None] & un) != 0, axis=1)  # [n_slots, P]
    delta = jnp.sum(
        jnp.where(hit, 0.0, 1.0).astype(freq.dtype) * freq[None, :], axis=1
    )
    return delta, cost


_insertion_jit = jax.jit(_insertion_scores, static_argnums=(7,))


def _partial_layout(
    adj: Dict[int, List[int]],
    first_tip: int,
    n_taxa: int,
    width: int = SCHED_WIDTH,
):
    """Level schedule for a partial tree given as an undirected adjacency
    over tips (original taxon ids < n_taxa) and internal nodes (any ids).
    Internal nodes are renumbered to n_taxa.. contiguously in row order;
    a virtual root is appended splitting first_tip's pendant edge.

    Returns padded numpy arrays sized for the FULL n_taxa tree so the
    jitted scorer compiles once: parent[2N], side[2N], sib[2N],
    row_start[N-1], row_len[N-1], n_rows, root_id, valid_nodes (new ids).
    """
    N = n_taxa
    n_slots = 2 * N
    dummy = n_slots - 1

    (c_old,) = adj[first_tip]
    # rooted DFS away from first_tip assigning depths
    children_old: Dict[int, Tuple[int, int]] = {}
    depth: Dict[int, int] = {}
    order_internal: List[int] = []
    stack = [(c_old, first_tip, False)]
    while stack:
        v, p, done = stack.pop()
        if v < N:
            depth[v] = 0
            continue
        kids = [u for u in adj[v] if u != p]
        if done:
            children_old[v] = (kids[0], kids[1])
            depth[v] = max(depth[kids[0]], depth[kids[1]]) + 1
            order_internal.append(v)
        else:
            stack.append((v, p, True))
            for u in kids:
                stack.append((u, v, False))
    # group into width-limited rows by depth (post-order list is already
    # depth-compatible but not depth-sorted; sort stably by depth)
    order_internal.sort(key=lambda v: depth[v])
    rows: List[Tuple[int, int]] = []
    new_id: Dict[int, int] = {}
    dvals = [depth[v] for v in order_internal]
    i = 0
    nid = N
    while i < len(order_internal):
        j = i
        while j < len(order_internal) and j - i < width and dvals[j] == dvals[i]:
            j += 1
        rows.append((nid, j - i))
        for v in order_internal[i:j]:
            new_id[v] = nid
            nid += 1
        i = j
    root = nid  # virtual root: one more internal node
    rows.append((root, 1))
    nid += 1

    parent = np.full(n_slots, dummy, dtype=np.int32)
    side = np.zeros(n_slots, dtype=np.int32)
    sib = np.full(n_slots, dummy, dtype=np.int32)

    def nd(v):
        return v if v < N else new_id[v]

    parent[first_tip] = root
    side[first_tip] = 0
    c_new = nd(c_old)
    parent[c_new] = root
    side[c_new] = 1
    sib[first_tip] = c_new
    sib[c_new] = first_tip
    for v, (a, b) in children_old.items():
        va, vb = nd(a), nd(b)
        parent[va] = nd(v)
        parent[vb] = nd(v)
        side[va] = 0
        side[vb] = 1
        sib[va] = vb
        sib[vb] = va
    sib[dummy] = root  # channel the root id to the device fn

    row_start = np.zeros(N - 1, dtype=np.int32)
    row_len = np.zeros(N - 1, dtype=np.int32)
    for r, (s, ln) in enumerate(rows):
        row_start[r] = s
        row_len[r] = ln
    valid = [t for t in adj if t < N]
    return parent, side, sib, row_start, row_len, len(rows), root, valid


def parsimony_stepwise_tree(
    aln: Alignment,
    rng: np.random.Generator,
    mean_blen: float = 0.1,
) -> PhyloTree:
    """Random-order stepwise-addition maximum-parsimony start tree
    (IQTree::computeParsimonyTree, /root/reference/iqtree.cpp:524; core
    loop phylotreepars.cpp).  Every insertion evaluates all current edges
    in one batched device call."""
    N = aln.n_taxa
    if N < 4:
        from ..trees.tree import random_tree

        return random_tree(N, rng, mean_blen)
    masks = pack_tip_masks(aln)  # [N, W, P]
    W, P = masks.shape[1], masks.shape[2]
    n_slots = 2 * N
    tips = np.zeros((n_slots, W, P), dtype=np.uint32)
    tips[:N] = masks
    tips_j = jnp.asarray(tips)
    freq = jnp.asarray(aln.pattern_freq, jnp.float32)

    order = [int(t) for t in rng.permutation(N)]
    a, b, c = order[0], order[1], order[2]
    center = N  # provisional internal id (renumbered every step)
    adj: Dict[int, List[int]] = {a: [center], b: [center], c: [center],
                                 center: [a, b, c]}
    next_internal = N + 1
    first_tip = a

    for t in order[3:]:
        parent, side, sib, row_start, row_len, n_rows, root, _ = (
            _partial_layout(adj, first_tip, N)
        )
        delta, _ = _insertion_jit(
            jnp.asarray(parent),
            jnp.asarray(side),
            jnp.asarray(sib),
            jnp.asarray(row_start),
            jnp.asarray(row_len),
            jnp.asarray(n_rows, jnp.int32),
            tips_j,
            N,
            tips_j[t],
            freq,
        )
        delta = np.asarray(delta, dtype=np.float64)
        # valid attachment edges: every present node with a parent, except
        # the root itself and the non-first-tip root child (same unrooted
        # edge as first_tip's)
        mask = np.full(n_slots, np.inf)
        # rebuild new-id <-> old-id view: recompute mapping from layout
        # (tips are identity; internal new ids are parent[] refs) — we
        # only need which slots are valid, i.e. have a real parent.
        has_parent = parent != (n_slots - 1)
        mask[has_parent] = delta[has_parent]
        # exclude the duplicate pendant half-edge (root child, side 1)
        root_c1 = np.nonzero((parent == root) & (side == 1))[0]
        mask[root_c1] = np.inf
        best = float(mask.min())
        cands = np.nonzero(mask <= best + 1e-9)[0]
        pick = int(cands[rng.integers(len(cands))])

        # translate the picked slot back to an (u, v) edge in `adj`:
        # slots < N are tips (identity); internal slots correspond to the
        # renumbering done in _partial_layout — recompute it here.
        slot_to_old = _slot_map(adj, first_tip, N)
        v_old = slot_to_old[pick]
        p_old = _adj_parent(adj, first_tip, v_old)
        w = next_internal
        next_internal += 1
        adj[v_old].remove(p_old)
        adj[p_old].remove(v_old)
        adj[v_old].append(w)
        adj[p_old].append(w)
        adj[w] = [v_old, p_old, t]
        adj[t] = [w]

    # branch lengths: Fitch-count based init is done by the caller's
    # branch optimizer; use exponential draws like random_tree
    adj_len = {
        v: [(u, float(rng.exponential(mean_blen)) + MIN_BLEN) for u in us]
        for v, us in adj.items()
    }
    # make lengths symmetric
    for v, us in adj.items():
        for idx, u in enumerate(us):
            if u < v:
                l = next(l for (x, l) in adj_len[u] if x == v)
                adj_len[v][idx] = (u, l)
    return PhyloTree.from_adjacency(N, adj_len)


def _slot_map(adj, first_tip, n_taxa) -> Dict[int, int]:
    """slot id -> old adjacency id, matching _partial_layout's numbering."""
    N = n_taxa
    (c_old,) = adj[first_tip]
    depth: Dict[int, int] = {}
    order_internal: List[int] = []
    stack = [(c_old, first_tip, False)]
    while stack:
        v, p, done = stack.pop()
        if v < N:
            depth[v] = 0
            continue
        kids = [u for u in adj[v] if u != p]
        if done:
            depth[v] = max(depth[kids[0]], depth[kids[1]]) + 1
            order_internal.append(v)
        else:
            stack.append((v, p, True))
            for u in kids:
                stack.append((u, v, False))
    order_internal.sort(key=lambda v: depth[v])
    out = {i: i for i in range(N)}
    nid = N
    i = 0
    dvals = [depth[v] for v in order_internal]
    while i < len(order_internal):
        j = i
        while (
            j < len(order_internal)
            and j - i < SCHED_WIDTH
            and dvals[j] == dvals[i]
        ):
            j += 1
        for v in order_internal[i:j]:
            out[nid] = v
            nid += 1
        i = j
    return out


def _adj_parent(adj, first_tip, v_old) -> int:
    """Parent of v_old in the rooted-at-first_tip orientation."""
    (c_old,) = adj[first_tip]
    if v_old == first_tip:
        return c_old  # pendant edge: attach between first_tip and c_old
    prev = {first_tip: None}
    stack = [(c_old, first_tip)]
    while stack:
        v, p = stack.pop()
        prev[v] = p
        if v == v_old:
            return p
        if v >= len(adj) and v not in adj:
            continue
        for u in adj[v]:
            if u != p:
                stack.append((u, v))
    raise KeyError(v_old)
