"""Splits, split frequency counting, consensus trees, branch supports.

Host-side replacement for the reference's Split/SplitGraph/SplitIntMap
machinery (/root/reference/split.h:40, splitgraph.h:45, hashsplitset.h:89,
mtreeset.cpp consensus).  Splits are frozensets of taxon indices,
canonicalized to the side containing taxon 0 (matching
PhyloTree.splits_key).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Iterable, List, Optional, Tuple

import numpy as np

from .tree import MIN_BLEN, PhyloTree

Split = FrozenSet[int]


def tree_splits(tree: PhyloTree, with_nodes: bool = False):
    """Nontrivial splits of a tree; optionally with the child node of the
    defining edge."""
    N = tree.n_taxa
    all_taxa = frozenset(range(N))
    below: Dict[int, frozenset] = {}
    for v in tree.postorder():
        parts = []
        for c in tree.children[v]:
            c = int(c)
            parts.append(below.get(c, frozenset([c]) if c < N else frozenset()))
        below[int(v)] = frozenset().union(*parts)
    out = []
    for v in tree.internal_edges():
        s = below[int(v)]
        if 0 not in s:
            s = all_taxa - s
        if 1 < len(s) < N - 1:
            out.append((s, int(v)) if with_nodes else s)
    return out


class SplitCounter:
    """Weighted split frequencies across a collection of trees."""

    def __init__(self, n_taxa: int):
        self.n_taxa = n_taxa
        self.counts: Dict[Split, float] = {}
        self.total_weight = 0.0

    def add_tree(self, tree: PhyloTree, weight: float = 1.0):
        self.add_splits(tree_splits(tree), weight)

    def add_splits(self, splits: Iterable[Split], weight: float = 1.0):
        for s in splits:
            self.counts[s] = self.counts.get(s, 0.0) + weight
        self.total_weight += weight

    def support(self, split: Split) -> float:
        if self.total_weight == 0:
            return 0.0
        return self.counts.get(split, 0.0) / self.total_weight

    def frequency_vector(self, splits: List[Split]) -> np.ndarray:
        return np.array([self.support(s) for s in splits])


def splits_compatible(a: Split, b: Split, n_taxa: int) -> bool:
    """Two splits are compatible iff one of the four intersections is
    empty (split.h compatible())."""
    full = frozenset(range(n_taxa))
    a2, b2 = full - a, full - b
    return not (a & b) or not (a & b2) or not (a2 & b) or not (a2 & b2)


def consensus_tree(
    counter: SplitCounter,
    threshold: float = 0.5,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[PhyloTree, Dict[frozenset, float]]:
    """Majority-rule (extended) consensus: accept splits by decreasing
    support, keeping compatibility (MTreeSet::convertSplits + greedy,
    mtreeset.cpp).  Returns (tree, accepted split supports).  Splits
    below `threshold` are still added greedily if compatible (the
    "extended" rule, like the reference's sumtree default)."""
    N = counter.n_taxa
    items = sorted(counter.counts.items(), key=lambda kv: -kv[1])
    accepted: List[Tuple[Split, float]] = []
    for s, w in items:
        sup = w / max(counter.total_weight, 1e-12)
        if sup < threshold and threshold > 0:
            # extended rule: still accept if compatible with all accepted
            pass
        if all(splits_compatible(s, t, N) for t, _ in accepted):
            accepted.append((s, sup))
    # build the tree by nesting: each split (side without taxon 0) is a
    # cluster; nest clusters by containment
    clusters = sorted(
        [(frozenset(range(N)) - s if 0 in s else s, sup) for s, sup in accepted],
        key=lambda cs: -len(cs[0]),
    )
    # start from a star tree rooted at an internal node adjacent to all
    adj: Dict[int, List[Tuple[int, float]]] = {}
    next_id = [N]

    def new_node():
        v = next_id[0]
        next_id[0] += 1
        return v

    root = new_node()
    parent_of = {i: root for i in range(N)}
    children: Dict[int, List[int]] = {root: list(range(N))}
    cluster_node: Dict[int, frozenset] = {}
    supports: Dict[int, float] = {}
    for cl, sup in clusters:
        if len(cl) < 2 or len(cl) > N - 2:
            continue
        # find the node whose child-set contains cl
        host = root
        changed = True
        while changed:
            changed = False
            for ch in children.get(host, []):
                if ch >= N and cluster_node.get(ch) and cl <= cluster_node[ch]:
                    host = ch
                    changed = True
                    break
        members = [
            ch for ch in children[host]
            if (frozenset([ch]) if ch < N else cluster_node[ch]) <= cl
        ]
        covered = frozenset().union(
            *[(frozenset([ch]) if ch < N else cluster_node[ch]) for ch in members]
        ) if members else frozenset()
        if covered != cl:
            continue  # incompatible placement (shouldn't happen)
        v = new_node()
        cluster_node[v] = cl
        supports[v] = sup
        children[v] = members
        children[host] = [ch for ch in children[host] if ch not in members] + [v]
    # binarize multifurcations arbitrarily (0-length), then convert
    adj = {}

    def add_edge(a, b, l):
        adj.setdefault(a, []).append((b, l))
        adj.setdefault(b, []).append((a, l))

    def emit(v) -> int:
        """Return adj vertex for node v, binarizing children."""
        if v < N:
            return v
        kids = [emit(c) for c in children[v]]
        while len(kids) > 2:
            a = kids.pop()
            b = kids.pop()
            w = new_node()
            add_edge(w, a, MIN_BLEN)
            add_edge(w, b, MIN_BLEN)
            kids.append(w)
        w = new_node()
        for k in kids:
            add_edge(w, k, MIN_BLEN)
        return w

    kids = [emit(c) for c in children[root]]
    while len(kids) > 3:
        a = kids.pop()
        b = kids.pop()
        w = new_node()
        add_edge(w, a, MIN_BLEN)
        add_edge(w, b, MIN_BLEN)
        kids.append(w)
    top = new_node()
    for k in kids:
        add_edge(top, k, MIN_BLEN)
    if len(kids) == 2:
        # degenerate: splice top out
        (a, la), (b, lb) = adj[top]
        adj[a] = [(x, l) for x, l in adj[a] if x != top] + [(b, la + lb)]
        adj[b] = [(x, l) for x, l in adj[b] if x != top] + [(a, la + lb)]
        del adj[top]
    # renumber internal vertices contiguously for from_adjacency
    tree = PhyloTree.from_adjacency(N, adj)
    sup_map = {cl: sup for cl, sup in clusters}
    return tree, {s: w / max(counter.total_weight, 1e-12) for s, w in counter.counts.items()}


def map_supports(
    tree: PhyloTree, counter: SplitCounter, scale: float = 100.0
) -> Dict[int, str]:
    """Support labels for the tree's internal nodes (percent of trees in
    the counter containing each split) — MTreeSet::assignBranchSupport."""
    out = {}
    for s, v in tree_splits(tree, with_nodes=True):
        out[v] = str(int(round(counter.support(s) * scale)))
    return out


def robinson_foulds_matrix(trees: List[PhyloTree]) -> np.ndarray:
    """Pairwise RF distances (mtreeset.cpp computeRFDist)."""
    sets = [frozenset(tree_splits(t)) for t in trees]
    n = len(trees)
    out = np.zeros((n, n), dtype=np.int32)
    for i in range(n):
        for j in range(i + 1, n):
            d = len(sets[i] ^ sets[j])
            out[i, j] = out[j, i] = d
    return out
