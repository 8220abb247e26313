"""NCBI taxonomy -> Newick extraction.

Re-expresses NCBITree (/root/reference/ncbitree.h, ncbitree.cpp;
dispatched by `-dmp <taxid>` with `-dmprank/-dmpignore/-dmpname`,
pda.cpp:2415, tools.cpp:2313-2340): parse NCBI nodes.dmp, take the
subtree below a root taxon id, optionally cut at a taxonomy rank
(nodes AT the rank become leaves), set branch lengths to 1 (0 for an
ignored rank), and attach scientific names from names.dmp.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional


def parse_nodes_dmp(path: str):
    """-> (parent: {id: parent_id}, rank: {id: rank}) from the
    pipe-delimited nodes.dmp format (ncbitree.cpp readNCBITree)."""
    parent: Dict[int, int] = {}
    rank: Dict[int, str] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            cols = [c.strip() for c in line.split("|")]
            if len(cols) < 3:
                raise ValueError(f"bad nodes.dmp line: {line!r}")
            nid, pid = int(cols[0]), int(cols[1])
            if nid <= 0 or pid <= 0:
                raise ValueError("wrong node/parent ID")
            if nid in parent:
                raise ValueError(f"duplicated node ID {nid}")
            parent[nid] = pid
            rank[nid] = cols[2]
    return parent, rank


def parse_names_dmp(path: str, name_type: str = "scientific name"):
    """-> {id: name} (NCBITree::readNCBINames)."""
    names: Dict[int, str] = {}
    with open(path) as f:
        for line in f:
            cols = [c.strip() for c in line.split("|")]
            if len(cols) >= 4 and cols[3] == name_type:
                names[int(cols[0])] = cols[1]
    return names


def ncbi_subtree_newick(
    nodes_dmp: str,
    root_id: int,
    taxon_rank: Optional[str] = None,
    ignore_rank: Optional[str] = None,
    names_dmp: Optional[str] = None,
    log: Callable = print,
) -> str:
    parent, rank = parse_nodes_dmp(nodes_dmp)
    if root_id not in parent:
        raise ValueError(f"root taxon id {root_id} not in {nodes_dmp}")
    children: Dict[int, List[int]] = {}
    for nid, pid in parent.items():
        if nid == pid:  # the taxonomy root points to itself
            continue
        children.setdefault(pid, []).append(nid)

    names = parse_names_dmp(names_dmp) if names_dmp else {}

    def label(nid: int) -> str:
        nm = names.get(nid, str(nid))
        return nm.replace(" ", "_").replace("(", "").replace(")", "") \
            .replace(",", "").replace(":", "").replace(";", "")

    pruned = [0]
    n_leaves = [0]
    n_nodes = [0]

    def build(nid: int) -> str:
        n_nodes[0] += 1
        blen = 0.0 if (ignore_rank and rank.get(nid) == ignore_rank) else 1.0
        kids = children.get(nid, [])
        if taxon_rank and rank.get(nid) == taxon_rank:
            # cut here: this node becomes a leaf (pruneTaxa,
            # ncbitree.cpp:194)
            def count(v):
                return 1 + sum(count(w) for w in children.get(v, []))

            pruned[0] += sum(count(k) for k in kids)
            kids = []
        if not kids:
            n_leaves[0] += 1
            return f"{label(nid)}:{blen:g}"
        inner = ",".join(build(k) for k in sorted(kids))
        return f"({inner}){label(nid)}:{blen:g}"

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 4 * len(parent) + 1000))
    try:
        nwk = "(" + build(root_id) + ");"
    finally:
        sys.setrecursionlimit(old)
    if taxon_rank:
        log(f"{pruned[0]} nodes below {taxon_rank} are pruned")
    log(f"{len(parent)} NCBI nodes, {n_nodes[0]} tree nodes, "
        f"{n_leaves[0]} leaves")
    return nwk
