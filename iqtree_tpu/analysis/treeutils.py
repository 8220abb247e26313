"""Tree-collection utilities: multi-tree IO, consensus, RF, support
mapping, random tree generation.

Covers the reference modes dispatched at /root/reference/pda.cpp:2436-2480:
consensus tree (-con, MTreeSet::createConsensusTree), support assignment
(-sup, assignBranchSupport), RF distances (-rf/-rf_all,
mtreeset.cpp computeRFDist), random trees (-r, MExtTree generators:
Yule-Harding / uniform / caterpillar / balanced / star).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io.newick import parse_newick
from ..trees.splits import (
    SplitCounter,
    consensus_tree,
    map_supports,
    robinson_foulds_matrix,
)
from ..trees.tree import MIN_BLEN, PhyloTree, random_tree


def _leaf_names(node, out):
    if node.is_leaf:
        out.append(node.name)
    for c in node.children:
        _leaf_names(c, out)


def read_trees(path: str, taxon_names: Optional[List[str]] = None,
               rng: Optional[np.random.Generator] = None,
               burnin: int = 0, max_count: int = 0,
               ) -> Tuple[List[PhyloTree], List[str]]:
    """Read a file of newick trees (one per line / ;-separated).
    Taxon-name order is taken from the first tree unless given.
    burnin/max_count implement -bi/-tm (skip the first `burnin` trees,
    then keep at most `max_count`; tools.cpp:1444,1452)."""
    text = open(path).read()
    chunks = [c.strip() + ";" for c in text.split(";") if c.strip()]
    if burnin:
        if burnin >= len(chunks):
            raise ValueError(f"-bi {burnin} >= number of trees in {path}")
        chunks = chunks[burnin:]
    if max_count:
        chunks = chunks[:max_count]
    if not chunks:
        raise ValueError(f"no trees in {path}")
    if taxon_names is None:
        names: List[str] = []
        _leaf_names(parse_newick(chunks[0]), names)
        taxon_names = sorted(names)
    trees = [PhyloTree.from_newick(c, taxon_names, rng=rng) for c in chunks]
    return trees, taxon_names


def run_consensus(tree_file: str, out_prefix: str, minsup: float = 0.0,
                  log=print, burnin: int = 0, max_count: int = 0,
                  ) -> PhyloTree:
    """-con: majority-rule (extended) consensus of a tree set."""
    trees, names = read_trees(tree_file, burnin=burnin, max_count=max_count)
    counter = SplitCounter(trees[0].n_taxa)
    for t in trees:
        counter.add_tree(t)
    cons, _ = consensus_tree(counter, threshold=max(minsup, 0.5) if minsup
                             else 0.5)
    sup = map_supports(cons, counter)
    out = out_prefix + ".contree"
    with open(out, "w") as f:
        f.write(cons.to_newick(names, support=sup) + "\n")
    log(f"Consensus tree of {len(trees)} trees written to {out}")
    return cons


def run_support_assignment(target_file: str, tree_file: str,
                           out_prefix: str, log=print,
                           burnin: int = 0, max_count: int = 0,
                           ) -> PhyloTree:
    """-sup: map split frequencies of a tree set onto a target tree."""
    trees, names = read_trees(tree_file, burnin=burnin, max_count=max_count)
    target, _ = read_trees(target_file, taxon_names=names)
    target = target[0]
    counter = SplitCounter(target.n_taxa)
    for t in trees:
        counter.add_tree(t)
    sup = map_supports(target, counter)
    out = out_prefix + ".suptree"
    with open(out, "w") as f:
        f.write(target.to_newick(names, support=sup) + "\n")
    log(f"Support values ({len(trees)} trees) written to {out}")
    return target


def run_rf_distance(tree_file: str, out_prefix: str, tree_file2: str = None,
                    log=print) -> np.ndarray:
    """-rf_all (all-vs-all within a file) or -rf (pairwise between two
    files, row i vs row i)."""
    trees, names = read_trees(tree_file)
    if tree_file2:
        trees2, _ = read_trees(tree_file2, taxon_names=names)
        d = np.array([t1.robinson_foulds(t2)
                      for t1, t2 in zip(trees, trees2)])
    else:
        d = robinson_foulds_matrix(trees)
    out = out_prefix + ".rfdist"
    with open(out, "w") as f:
        if d.ndim == 1:
            f.write(" ".join(str(int(x)) for x in d) + "\n")
        else:
            f.write(f"{len(trees)}\n")
            for i, row in enumerate(d):
                f.write(f"Tree{i}      " + " ".join(str(int(x)) for x in row)
                        + "\n")
    log(f"Robinson-Foulds distances written to {out}")
    return d


# ---------------------------------------------------------------------------
# random tree generation (-r; MExtTree::generateRandomTree, mexttree.cpp)
# ---------------------------------------------------------------------------


def generate_random_tree(
    n_taxa: int,
    rng: np.random.Generator,
    mode: str = "yule",  # yule | uniform | caterpillar | balanced | star
    mean_blen: float = 0.1,
    min_len: float = None,
    mean_len: float = None,
    max_len: float = None,
) -> PhyloTree:
    if mean_len is not None:
        mean_blen = mean_len
    t = _generate_random_tree(n_taxa, rng, mode, mean_blen)
    if min_len is not None or max_len is not None:
        # -rlen MIN MEAN MAX: clamp branch lengths into [MIN, MAX]
        # (reference params.min_len/max_len, tools.cpp:1213-1219)
        lo = min_len if min_len is not None else 0.0
        hi = max_len if max_len is not None else np.inf
        zero = t.blen == 0.0  # pinned root-child edge stays zero
        t.blen = np.where(zero, 0.0, np.clip(t.blen, lo, hi))
    return t


def _generate_random_tree(
    n_taxa: int,
    rng: np.random.Generator,
    mode: str = "yule",
    mean_blen: float = 0.1,
) -> PhyloTree:
    if mode == "yule":
        # Yule-Harding: split a random *pendant* edge (speciation at tips)
        return _grow_tree(n_taxa, rng, mean_blen, pendant_only=True)
    if mode == "uniform":
        # uniform over topologies: split a uniformly random edge (PDA model)
        return _grow_tree(n_taxa, rng, mean_blen, pendant_only=False)
    if mode == "caterpillar":
        nwk = f"t0:{_bl(rng, mean_blen)}"
        for i in range(1, n_taxa):
            nwk = f"({nwk},t{i}:{_bl(rng, mean_blen)}):{_bl(rng, mean_blen)}"
        return PhyloTree.from_newick(nwk + ";",
                                     [f"t{i}" for i in range(n_taxa)])
    if mode == "balanced":
        def build(lo, hi):
            if hi - lo == 1:
                return f"t{lo}:{_bl(rng, mean_blen)}"
            mid = (lo + hi) // 2
            return (f"({build(lo, mid)},{build(mid, hi)})"
                    f":{_bl(rng, mean_blen)}")
        return PhyloTree.from_newick(build(0, n_taxa) + ";",
                                     [f"t{i}" for i in range(n_taxa)])
    if mode == "star":
        kids = ",".join(f"t{i}:{_bl(rng, mean_blen)}" for i in range(n_taxa))
        return PhyloTree.from_newick(f"({kids});",
                                     [f"t{i}" for i in range(n_taxa)],
                                     rng=rng)
    raise ValueError(f"unknown random tree mode {mode!r}")


def _bl(rng, mean):
    return float(rng.exponential(mean)) + MIN_BLEN


def _grow_tree(n_taxa, rng, mean_blen, pendant_only: bool) -> PhyloTree:
    adj: Dict[int, List[Tuple[int, float]]] = {}
    nxt = [n_taxa]

    def add_edge(a, b, l):
        adj.setdefault(a, []).append((b, l))
        adj.setdefault(b, []).append((a, l))

    c = nxt[0]
    nxt[0] += 1
    for t in range(3):
        add_edge(c, t, _bl(rng, mean_blen))
    edges = [(c, 0), (c, 1), (c, 2)]
    for t in range(3, n_taxa):
        if pendant_only:
            cand = [e for e in edges if e[1] < n_taxa]
        else:
            cand = edges
        i = rng.integers(len(cand))
        a, b = cand[i]
        idx = edges.index((a, b))
        l_ab = next(l for (x, l) in adj[a] if x == b)
        w = nxt[0]
        nxt[0] += 1
        adj[a] = [(x, l) for (x, l) in adj[a] if x != b]
        adj[b] = [(x, l) for (x, l) in adj[b] if x != a]
        l1 = l_ab * rng.uniform()
        add_edge(a, w, max(l1, MIN_BLEN))
        add_edge(w, b, max(l_ab - l1, MIN_BLEN))
        add_edge(w, t, _bl(rng, mean_blen))
        edges[idx] = (a, w)
        edges.append((w, b))
        edges.append((w, t))
    return PhyloTree.from_adjacency(n_taxa, adj)


def run_branch_stats(tree_file: str, out_prefix: str, log=print) -> None:
    """-stats: branch-length statistics (branchStats, pda.cpp:1512)."""
    trees, names = read_trees(tree_file)
    tree = trees[0]
    N = tree.n_taxa
    R = tree.root
    rows, internal = [], []
    for v in range(tree.n_nodes - 1):
        p = int(tree.parent[v])
        if p == R and 0 in tree.children[R]:
            continue  # half-edges of the virtual root handled below
        rows.append((v, p, float(tree.blen[v]), v >= N))
        if v >= N and p != R:
            internal.append(float(tree.blen[v]))
    c0, c1 = int(tree.children[R, 0]), int(tree.children[R, 1])
    pend = float(tree.blen[c0]) + float(tree.blen[c1])
    rows.append((c0, c1, pend, False))
    lens = np.array([r[2] for r in rows])
    with open(out_prefix + ".stats", "w") as f:
        f.write(f"Branches: {len(rows)}\n")
        f.write(f"Total tree length: {lens.sum():.6g}\n")
        f.write(f"Min/Mean/Max branch length: {lens.min():.6g} "
                f"{lens.mean():.6g} {lens.max():.6g}\n\n")
        f.write("node1\tnode2\tlength\tinternal\n")
        for v, p, l, isint in rows:
            f.write(f"{v}\t{p}\t{l:.6g}\t{int(isint)}\n")
    with open(out_prefix + ".inlen", "w") as f:
        for l in internal:
            f.write(f"{l:.6g}\n")
    log(f"Branch statistics written to {out_prefix}.stats (+ .inlen)")


def run_scale_branch_length(tree_file: str, factor: float,
                            out_prefix: str, log=print) -> None:
    """-scale: multiply all branch lengths (scaleBranchLength,
    pda.cpp run_mode SCALE_BRANCH_LEN)."""
    trees, names = read_trees(tree_file)
    with open(out_prefix + ".scaled.treefile", "w") as f:
        for t in trees:
            t.blen = t.blen * factor
            f.write(t.to_newick(names) + "\n")
    log(f"Scaled tree(s) (x{factor}) written to "
        f"{out_prefix}.scaled.treefile")


def run_consensus_network(tree_file: str, out_prefix: str,
                          cutoff: float = 0.0, log=print,
                          burnin: int = 0, max_count: int = 0,
                          precision: int = 6) -> None:
    """-net: consensus network — ALL splits above the support cutoff
    (compatible or not) as a weighted split system in NEXUS format
    (computeConsensusNetwork, phyloanalysis.cpp:2877;
    SplitGraph::saveFileNexus output layout, splitgraph.cpp:562)."""
    from ..trees.splits import SplitCounter, tree_splits

    trees, names = read_trees(tree_file, burnin=burnin, max_count=max_count)
    N = trees[0].n_taxa
    counter = SplitCounter(N)
    for t in trees:
        counter.add_tree(t)
    splits = [
        (s, counter.support(s))
        for s in counter.counts
        if counter.support(s) > cutoff
    ]
    # include the trivial splits with weight 1 (every tree has them)
    out = [f"#nexus", "", "BEGIN Taxa;", f"DIMENSIONS ntax={N};",
           "TAXLABELS"]
    for i, n in enumerate(names):
        out.append(f"[{i + 1}] '{n}'")
    out += [";", "END; [Taxa]", "", "BEGIN Splits;",
            f"DIMENSIONS ntax={N} nsplits={len(splits) + N};",
            "FORMAT labels=no weights=yes confidences=no intervals=no;",
            "MATRIX"]
    for i in range(N):
        out.append(f"\t1.0\t {i + 1},")
    for s, w in sorted(splits, key=lambda e: -e[1]):
        ids = " ".join(str(i + 1) for i in sorted(s))
        out.append(f"\t{w:.{precision}g}\t {ids},")
    out += [";", "END; [Splits]", ""]
    path = out_prefix + ".nex"
    with open(path, "w") as f:
        f.write("\n".join(out))
    log(f"Consensus network ({len(splits)} non-trivial splits) printed "
        f"to {path}")
