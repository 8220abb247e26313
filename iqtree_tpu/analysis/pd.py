"""Phylogenetic diversity (PD) taxon selection — the reference's PDA
application core (/root/reference/pda.cpp:468 runPDTree; greedy
algorithm greedy.h, pruning algorithm pruning.h, PDTree pdtree.h).

PD(S) = total branch length of the minimal subtree spanning taxon set S.
* max-PD: the greedy algorithm (add the taxon with the largest path
  length to the current subtree) is provably optimal on trees (Steel
  2005), matching the reference's Greedy (greedy.h, O(n log k)).
* min-PD: iteratively prune the leaf with the smallest pendant
  contribution (pruning.h semantics).

Budget / area / split-network / GSS variants (the reference's
pdnetwork.h + lp_solve/Gurobi ILP) live in analysis/pdnetwork.py,
solved exactly by scipy's HiGHS MILP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..trees.tree import PhyloTree


def _undirected_adj(tree: PhyloTree):
    adj = {v: [] for v in range(tree.n_nodes)}
    for v in range(tree.n_nodes - 1):
        p = int(tree.parent[v])
        if p < 0:
            continue
        l = float(tree.blen[v])
        adj[v].append((p, l))
        adj[p].append((v, l))
    return adj


def pd_score(tree: PhyloTree, subset: Sequence[int]) -> float:
    """PD of a taxon subset: length of the spanning subtree."""
    subset = set(int(t) for t in subset)
    if len(subset) < 2:
        return 0.0
    # mark nodes on paths between subset members: a node is in the
    # spanning subtree iff >= 2 of its adjacent components contain subset
    # members; easier: prune leaves not in subset repeatedly
    adj = _undirected_adj(tree)
    deg = {v: len(e) for v, e in adj.items()}
    alive = {v: True for v in adj}
    removed_len = 0.0
    total_len = sum(float(tree.blen[v]) for v in range(tree.n_nodes - 1)
                    if tree.parent[v] >= 0)
    stack = [v for v in adj if deg[v] == 1 and v not in subset]
    neigh = {v: dict(adj[v]) for v in adj}
    while stack:
        v = stack.pop()
        if not alive[v] or v in subset:
            continue
        if len(neigh[v]) != 1:
            continue
        (u, l), = neigh[v].items()
        alive[v] = False
        removed_len += l
        del neigh[u][v]
        neigh[v] = {}
        if len(neigh[u]) == 1 and u not in subset:
            stack.append(u)
    # degree-2 interior nodes remain but contribute their edges correctly
    return total_len - removed_len


@dataclass
class PDResult:
    order: List[int]  # taxa in greedy insertion order
    scores: List[float]  # PD after each insertion (PD of first k taxa)

    def subset(self, k: int) -> List[int]:
        return self.order[:k]

    def score(self, k: int) -> float:
        """PD of the greedy subset of size k (scores[0] is k=2)."""
        return self.scores[k - 2]


def greedy_max_pd(tree: PhyloTree, k: Optional[int] = None) -> PDResult:
    """Greedy max-PD selection (optimal on trees): returns the nested
    family of optimal subsets for every size 2..k."""
    N = tree.n_taxa
    k = k or N
    adj = _undirected_adj(tree)

    def far(src: int):
        dist = np.full(tree.n_nodes, -1.0)
        dist[src] = 0.0
        stack = [src]
        while stack:
            v = stack.pop()
            for u, l in adj[v]:
                if dist[u] < 0:
                    dist[u] = dist[v] + l
                    stack.append(u)
        leaves = dist[:N]
        return int(np.argmax(leaves)), dist

    # diameter pair
    a, _ = far(0)
    b, dist_a = far(a)
    order = [a, b]
    # incremental: maintain d[v] = distance from v to the subtree; after
    # adding leaf t, relax distances from the path newly added
    INF = np.inf
    d = np.full(tree.n_nodes, INF)
    prev = np.full(tree.n_nodes, -1, dtype=np.int64)

    def relax_from(sources: List[int]):
        stack = list(sources)
        for s in sources:
            d[s] = 0.0
        while stack:
            v = stack.pop()
            for u, l in adj[v]:
                nd = d[v] + l
                if nd < d[u] - 1e-15:
                    d[u] = nd
                    prev[u] = v
                    stack.append(u)

    def path_to_tree(t: int) -> List[int]:
        path = [t]
        v = t
        while d[v] > 0:
            v = int(prev[v])
            path.append(v)
        return path

    relax_from([a])
    # add b (completing the diameter pair)
    pd = float(d[b])
    relax_from(path_to_tree(b))
    scores = [pd]  # PD of {a, b}
    while len(order) < k:
        cand = np.array([
            d[v] if v not in set(order) else -INF for v in range(N)
        ])
        t = int(np.argmax(cand))
        gain = float(cand[t])
        if not np.isfinite(gain) or gain <= 0:
            break
        path = path_to_tree(t)
        order.append(t)
        pd += gain
        scores.append(pd)
        relax_from(path)
    # scores[i] = PD of order[:i+2]
    return PDResult(order=order, scores=scores)


def min_pd_order(tree: PhyloTree) -> List[int]:
    """Pruning order for min-PD: repeatedly remove the leaf with the
    smallest pendant branch (pruning.h semantics).  Returns taxa in
    removal order; the min-PD k-subset is the LAST k entries kept."""
    adj = {v: dict() for v in range(tree.n_nodes)}
    for v in range(tree.n_nodes - 1):
        p = int(tree.parent[v])
        if p < 0:
            continue
        adj[v][p] = float(tree.blen[v])
        adj[p][v] = float(tree.blen[v])
    N = tree.n_taxa
    alive = set(range(tree.n_nodes))
    leaves = {v for v in range(N)}
    removal = []
    while len(leaves) > 2:
        t = min(leaves, key=lambda v: next(iter(adj[v].values())))
        (u, l), = adj[t].items()
        removal.append(t)
        leaves.discard(t)
        alive.discard(t)
        del adj[u][t]
        adj[t] = {}
        # splice degree-2 interior nodes
        while u >= N and len(adj[u]) == 2 and u in alive:
            (x, lx), (y, ly) = adj[u].items()
            del adj[x][u]
            del adj[y][u]
            adj[x][y] = lx + ly
            adj[y][x] = lx + ly
            alive.discard(u)
            u = x
    return removal


def run_pd_analysis(tree_file: str, out_prefix: str, k: Optional[int] = None,
                    min_k: Optional[int] = None, max_k: Optional[int] = None,
                    log=print) -> PDResult:
    """-k / -mink -maxk driver: greedy PD subsets written to .pda
    (format inspired by the reference's summarizeTree, pda.cpp)."""
    from .treeutils import read_trees

    trees, names = read_trees(tree_file)
    tree = trees[0]
    res = greedy_max_pd(tree, max_k or k or tree.n_taxa)
    lo = min_k or k or 2
    hi = max_k or k or tree.n_taxa
    lines = ["Phylogenetic diversity (PD) taxon selection", ""]
    total = pd_score(tree, list(range(tree.n_taxa)))
    lines.append(f"Tree: {tree.n_taxa} taxa, total PD {total:.6g}")
    lines.append("")
    for kk in range(max(lo, 2), min(hi, len(res.order)) + 1):
        lines.append(f"For k = {kk} the optimal PD score is "
                     f"{res.score(kk):.6g}")
        lines.append("The optimal PD set has %d taxa:" % kk)
        for t in sorted(res.subset(kk)):
            lines.append(f"  {names[t]}")
        lines.append("")
    out = out_prefix + ".pda"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"PD analysis written to {out}")
    return res
