"""BIONJ distance-based tree construction (Gascuel 1997).

Host-side NumPy re-implementation of the algorithm the reference vendors
in /root/reference/bionj.h:31 (790 LoC header) — neighbor joining with
variance-weighted branch estimates.  O(N^3), used for start trees and as
the -t BIONJ option.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .tree import MIN_BLEN, PhyloTree


def bionj_tree(dist: np.ndarray) -> PhyloTree:
    """Build an unrooted binary tree from a distance matrix [N, N]."""
    n = dist.shape[0]
    if n < 3:
        raise ValueError("BIONJ needs >= 3 taxa")
    d = dist.astype(np.float64).copy()
    v = d.copy()  # variance matrix, initialized to distances (BIONJ)
    active: List[int] = list(range(n))  # maps working index -> adj vertex id
    adj: Dict[int, List[Tuple[int, float]]] = {i: [] for i in range(n)}
    next_id = n

    def add_edge(a, b, l):
        l = max(float(l), MIN_BLEN)
        adj.setdefault(a, []).append((b, l))
        adj.setdefault(b, []).append((a, l))

    while len(active) > 3:
        m = len(active)
        # Q criterion
        r = d.sum(axis=1)
        q = (m - 2) * d - r[:, None] - r[None, :]
        np.fill_diagonal(q, np.inf)
        i, j = np.unravel_index(np.argmin(q), q.shape)
        if i > j:
            i, j = j, i
        dij = d[i, j]
        # branch lengths to the new node u
        bi = 0.5 * dij + (r[i] - r[j]) / (2.0 * (m - 2))
        bj = dij - bi
        # BIONJ lambda: weight for variance reduction
        vij = v[i, j]
        if vij > 0 and m > 3:
            # Gascuel's weight: lambda = 1/2 + sum_k (V_jk - V_ik) / (2(m-2)V_ij)
            lam = 0.5 + (
                (np.delete(v[j, :], [i, j]).sum() - np.delete(v[i, :], [i, j]).sum())
                / (2.0 * (m - 2) * vij)
            )
            lam = min(max(lam, 0.0), 1.0)
        else:
            lam = 0.5
        u = next_id
        next_id += 1
        add_edge(u, active[i], bi)
        add_edge(u, active[j], bj)
        # distances/variances to the new node
        du = lam * (d[i, :] - bi) + (1 - lam) * (d[j, :] - bj)
        vu = lam * v[i, :] + (1 - lam) * v[j, :] - lam * (1 - lam) * vij
        keep = [k for k in range(m) if k not in (i, j)]
        d = np.vstack([d[keep][:, keep], du[keep][None, :]])
        d = np.hstack([d, np.append(du[keep], 0.0)[:, None]])
        v2 = np.vstack([v[keep][:, keep], vu[keep][None, :]])
        v2 = np.hstack([v2, np.append(vu[keep], 0.0)[:, None]])
        v = v2
        active = [active[k] for k in keep] + [u]

    # final 3-star
    c = next_id
    (a, b, cc) = active
    da, db, dc = d[0, 1], d[0, 2], d[1, 2]
    la = 0.5 * (da + db - dc)
    lb = 0.5 * (da + dc - db)
    lc = 0.5 * (db + dc - da)
    add_edge(c, a, la)
    add_edge(c, b, lb)
    add_edge(c, cc, lc)
    return PhyloTree.from_adjacency(n, adj)
