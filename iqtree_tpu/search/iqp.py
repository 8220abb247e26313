"""IQP perturbation: Important Quartet Puzzling leaf re-insertion.

Re-expresses IQTree::doIQP (/root/reference/iqtree.cpp:1343) — the
original IQPNNI perturbation (Vinh & von Haeseler 2004): randomly delete
k leaves (deleteLeaves, iqtree.cpp:1013), then re-insert each one at the
branch with the highest "important quartet" bonus (reinsertLeaves,
iqtree.cpp:1225; assessQuartets :1153; findRepresentLeaves :886).

This is a host-side topology operation (the reference also runs it on
the host between device-heavy NNI rounds); the quartet assessment uses
the ML pairwise distance matrix already computed for the BIONJ start
tree (assessQuartet, iqtree.cpp:1044 — IQP_DISTANCE mode, the default,
tools.cpp:787).

k_delete defaults follow the reference's taxon-count tiers
(iqtree.cpp:214-234): p_delete = 0.5 (<51 taxa), 0.3 (<100), 0.2 (<200),
0.1 (<400), 0.05 otherwise; k_delete = ceil(p_delete * n), capped at
n - 4.  Representative-set size k_represent = 4 (tools.cpp:742).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..trees.tree import MIN_BLEN, PhyloTree


def default_p_delete(n_taxa: int) -> float:
    """Reference tier table, iqtree.cpp:214-231."""
    if n_taxa < 4:
        return 0.0
    if n_taxa == 4:
        return 0.25
    if n_taxa == 5:
        return 0.4
    if n_taxa < 51:
        return 0.5
    if n_taxa < 100:
        return 0.3
    if n_taxa < 200:
        return 0.2
    if n_taxa < 400:
        return 0.1
    return 0.05


class _Adj:
    """Undirected adjacency view of an unrooted tree (host scratch)."""

    def __init__(self, tree: PhyloTree):
        self.n_taxa = tree.n_taxa
        self.nbr: Dict[int, Dict[int, float]] = {}
        R = tree.root
        for v in range(tree.n_nodes - 1):  # skip virtual root
            p = int(tree.parent[v])
            l = float(tree.blen[v])
            if p == R:
                continue
            self._add(v, p, l)
        # merge the two half-edges through the virtual root
        c0, c1 = int(tree.children[R, 0]), int(tree.children[R, 1])
        self._add(c0, c1, float(tree.blen[c0]) + float(tree.blen[c1]))
        self.next_id = tree.n_nodes

    def _add(self, a: int, b: int, l: float):
        self.nbr.setdefault(a, {})[b] = l
        self.nbr.setdefault(b, {})[a] = l

    def _remove(self, a: int, b: int):
        del self.nbr[a][b]
        del self.nbr[b][a]

    def delete_leaf(self, leaf: int) -> float:
        """PhyloTree::deleteLeaf (phylotree.cpp:4110): remove the leaf,
        suppress its degree-2 neighbor.  Returns the pendant length."""
        (near, plen), = self.nbr[leaf].items()
        self._remove(leaf, near)
        del self.nbr[leaf]
        (n1, l1), (n2, l2) = self.nbr[near].items()
        self._remove(near, n1)
        self._remove(near, n2)
        del self.nbr[near]
        self._add(n1, n2, l1 + l2)
        return plen

    def insert_leaf(self, leaf: int, pend_len: float, u: int, v: int):
        """PhyloTree::reinsertLeaf (phylotree.cpp:4132): split edge (u,v)
        in half, attach leaf at the midpoint with its old pendant length."""
        length = max(self.nbr[u][v], MIN_BLEN * 2)
        m = self.next_id
        self.next_id += 1
        self._remove(u, v)
        self._add(u, m, length / 2)
        self._add(m, v, length / 2)
        self._add(leaf, m, pend_len)

    def edges(self) -> List[Tuple[int, int]]:
        out = []
        for a, nb in self.nbr.items():
            for b in nb:
                if a < b:
                    out.append((a, b))
        return out

    def to_tree(self) -> PhyloTree:
        adj = {a: list(nb.items()) for a, nb in self.nbr.items()}
        return PhyloTree.from_adjacency(self.n_taxa, adj)


def _represent_leaves(
    adj: _Adj, k_represent: int, rng: np.random.Generator
) -> Dict[Tuple[int, int], List[Tuple[int, int]]]:
    """For every directed edge (dad -> node): the <= k_represent nearest
    leaves (by hop height) in the subtree behind node, as (leaf, height)
    sorted ascending (findRepresentLeaves, iqtree.cpp:886).  Iterative
    post-order over directed edges."""
    rep: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for dad in adj.nbr:
        for node in adj.nbr[dad]:
            key = (dad, node)
            if key in rep:
                continue
            # iterative DFS computing rep for (dad,node)
            stack = [(dad, node, False)]
            while stack:
                d, n, done = stack.pop()
                if (d, n) in rep:
                    continue
                if n < adj.n_taxa:
                    rep[(d, n)] = [(n, 0)]
                    continue
                kids = [w for w in adj.nbr[n] if w != d]
                if not done:
                    stack.append((d, n, True))
                    for w in kids:
                        stack.append((n, w, False))
                    continue
                # merge the (already sorted) child sets by height,
                # random tie-break like the reference
                its = [rep[(n, w)] for w in kids]
                pos = [0] * len(its)
                merged: List[Tuple[int, int]] = []
                while len(merged) < k_represent:
                    avail = [
                        i for i in range(len(its)) if pos[i] < len(its[i])
                    ]
                    if not avail:
                        break
                    hmin = min(its[i][pos[i]][1] for i in avail)
                    best = [i for i in avail if its[i][pos[i]][1] == hmin]
                    i = best[int(rng.integers(len(best)))] if len(best) > 1 else best[0]
                    leaf, h = its[i][pos[i]]
                    merged.append((leaf, h + 1))
                    pos[i] += 1
                rep[(d, n)] = merged
    return rep


class IQP:
    """Stateful IQP perturbator (one instance per search)."""

    def __init__(
        self,
        dist_matrix: np.ndarray,
        p_delete: Optional[float] = None,
        k_represent: int = 4,
    ):
        self.dist = np.asarray(dist_matrix, dtype=np.float64)
        self.p_delete = p_delete
        self.k_represent = max(1, int(k_represent))

    def _assess_quartet(self, l0: int, l1: int, l2: int, dl: int) -> int:
        """assessQuartet (iqtree.cpp:1044): join dl with the leaf whose
        pairing minimizes the 4-point sum."""
        d = self.dist
        s0 = d[l0, dl] + d[l1, l2]
        s1 = d[l1, dl] + d[l0, l2]
        s2 = d[l2, dl] + d[l0, l1]
        if s0 < s1 and s0 < s2:
            return 0
        if s1 < s2:
            return 1
        return 2

    def perturb(self, tree: PhyloTree, rng: np.random.Generator) -> PhyloTree:
        n = tree.n_taxa
        p_del = (
            self.p_delete if self.p_delete is not None else default_p_delete(n)
        )
        k_delete = min(int(np.ceil(p_del * n)), n - 4)
        if k_delete <= 0:
            return tree.copy()
        adj = _Adj(tree)

        # ---- deleteLeaves (iqtree.cpp:1013): random without replacement
        order = rng.permutation(n)[:k_delete]
        pend = {int(lf): adj.delete_leaf(int(lf)) for lf in order}

        # ---- reinsertLeaves (iqtree.cpp:1225): one leaf at a time ------
        for lf in order:
            lf = int(lf)
            rep = _represent_leaves(adj, self.k_represent, rng)
            bonus: Dict[Tuple[int, int], float] = {}
            for x in list(adj.nbr):
                if x < adj.n_taxa or len(adj.nbr[x]) != 3:
                    continue
                nbrs = list(adj.nbr[x])
                sets = [rep[(x, w)] for w in nbrs]
                b = [0.0, 0.0, 0.0]
                for a, _ in sets[0]:
                    for c, _ in sets[1]:
                        for e, _ in sets[2]:
                            b[self._assess_quartet(a, c, e, lf)] += 1.0
                for i, w in enumerate(nbrs):
                    if b[i] > 0:
                        bonus[(x, w)] = bonus.get((x, w), 0.0) + b[i]

            # partial(node->dad): bonuses behind node flowing toward dad
            # (computePartialBonus, iqtree.cpp:1115)
            partial: Dict[Tuple[int, int], float] = {}

            def get_partial(node: int, dad: int) -> float:
                stack = [(node, dad, False)]
                while stack:
                    nn, dd, done = stack.pop()
                    if (nn, dd) in partial:
                        continue
                    kids = [w for w in adj.nbr[nn] if w != dd]
                    if not done:
                        stack.append((nn, dd, True))
                        for w in kids:
                            stack.append((w, nn, False))
                        continue
                    partial[(nn, dd)] = bonus.get((nn, dd), 0.0) + sum(
                        partial[(w, nn)] for w in kids
                    )
                return partial[(node, dad)]

            best_score, best_edges = -1.0, []
            for u, v in adj.edges():
                s = get_partial(u, v) + get_partial(v, u)
                if s > best_score + 1e-12:
                    best_score, best_edges = s, [(u, v)]
                elif s >= best_score - 1e-12:
                    best_edges.append((u, v))
            u, v = best_edges[int(rng.integers(len(best_edges)))]
            adj.insert_leaf(lf, pend[lf], u, v)

        return adj.to_tree()
