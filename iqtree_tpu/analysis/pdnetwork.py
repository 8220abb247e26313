"""PD on split networks, budgets, areas, ILP — and GSS.

Re-expresses the reference's PDNetwork / GSSNetwork
(/root/reference/pdnetwork.h:30, pdnetwork.cpp; gss.h:32, gss.cpp:329)
with the exact ILP it writes for lp_solve/Gurobi (LP formulation
pdnetwork.h:207-218, transformLP*), solved here by scipy's HiGHS MILP:

  maximize   sum_s w_s y_s           (split diversity)
  subject to y_s <= sum_{i in A_s} x_i,  y_s <= sum_{i in B_s} x_i
             sum_i x_i = k            (or sum_i c_i x_i <= budget)
             x binary, 0 <= y <= 1

For trees, every branch is a split, so the same code is the exact
budgeted tree-PD solver.  In AREA mode the x variables range over taxon
SETS (areas) and side coverage goes through the area-taxa incidence
(pdnetwork.cpp transformLP_Area).  GSS (gene set selection, gss.cpp)
is the area problem over gene sets with an extra coverage reward
sum_j p_j z_j, z_j <= sum_{areas containing gene j} x_a.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class SplitSystem:
    """Weighted split system over a fixed taxon set."""

    names: List[str]
    sides: np.ndarray  # [n_splits, n_taxa] bool: True = taxon in side A
    weights: np.ndarray  # [n_splits]

    @property
    def n_taxa(self) -> int:
        return len(self.names)

    @property
    def n_splits(self) -> int:
        return self.sides.shape[0]

    @classmethod
    def from_tree(cls, tree, names: Optional[List[str]] = None
                  ) -> "SplitSystem":
        """Every branch is one split (weight = branch length); the two
        virtual-root half-edges merge into the pendant split of taxon 0."""
        N = tree.n_taxa
        names = names or [str(i) for i in range(N)]
        R = tree.root
        sides, weights = [], []
        below = np.zeros((tree.n_nodes, N), dtype=bool)
        below[np.arange(N), np.arange(N)] = True
        for v in tree.postorder():
            below[v] = below[tree.children[v, 0]] | below[tree.children[v, 1]]
        for v in range(tree.n_nodes - 1):
            p = int(tree.parent[v])
            if p == R:
                continue
            w = float(tree.blen[v])
            sides.append(below[v].copy())
            weights.append(w)
        c0, c1 = int(tree.children[R, 0]), int(tree.children[R, 1])
        sides.append(below[0].copy())
        weights.append(float(tree.blen[c0]) + float(tree.blen[c1]))
        return cls(names, np.asarray(sides), np.asarray(weights, float))

    @classmethod
    def from_nexus(cls, path: str) -> "SplitSystem":
        """SplitsTree/IQ-TREE .splits.nex (SplitGraph::saveFileNexus,
        /root/reference/splitgraph.cpp:562): TAXLABELS + a MATRIX of
        `weight taxon-ids,` rows."""
        text = open(path).read()
        text = re.sub(r"\[[^\]]*\]", " ", text)  # strip comments
        m = re.search(r"taxlabels(.*?);", text, re.I | re.S)
        if not m:
            raise ValueError(f"no TAXLABELS block in {path}")
        names = re.findall(r"'([^']+)'|(\S+)", m.group(1))
        names = [a or b for a, b in names]
        m = re.search(
            r"begin\s+splits.*?matrix(.*?);", text, re.I | re.S
        )
        if not m:
            raise ValueError(f"no Splits MATRIX block in {path}")
        sides, weights = [], []
        for row in m.group(1).split(","):
            toks = row.split()
            if not toks:
                continue
            w = float(toks[0])
            side = np.zeros(len(names), dtype=bool)
            for t in toks[1:]:
                side[int(t) - 1] = True
            sides.append(side)
            weights.append(w)
        return cls(names, np.asarray(sides), np.asarray(weights, float))

    def pd_of(self, subset: Sequence[int]) -> float:
        """Split diversity of a taxon subset: sum of weights of splits
        with subset members on BOTH sides (PDNetwork::calcPD)."""
        mask = np.zeros(self.n_taxa, dtype=bool)
        mask[list(subset)] = True
        in_a = (self.sides & mask).any(axis=1)
        in_b = (~self.sides & mask).any(axis=1)
        return float(self.weights[in_a & in_b].sum())


@dataclass
class PDSolution:
    taxa: List[int]
    names: List[str]
    score: float
    k: int


def _solve_milp(c_obj, constraints, integrality, bounds):
    from scipy.optimize import milp

    res = milp(
        c=c_obj,
        constraints=constraints,
        integrality=integrality,
        bounds=bounds,
    )
    if not res.success:
        raise RuntimeError(f"MILP failed: {res.message}")
    return res


def max_pd_ilp(
    ss: SplitSystem,
    k: Optional[int] = None,
    costs: Optional[np.ndarray] = None,
    budget: Optional[float] = None,
    initial: Sequence[int] = (),
    area_taxa: Optional[np.ndarray] = None,  # [n_areas, n_taxa] bool
    gene_rewards: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    # (p [n_genes], incidence [n_areas, n_genes]) for GSS
) -> PDSolution:
    """Exact PD/SD selection by MILP (transformLP_PD/Area/GSS).

    Either `k` (size constraint, sum x = k) or `budget` with `costs`
    (sum c x <= budget).  With area_taxa, x ranges over areas."""
    from scipy.optimize import Bounds, LinearConstraint

    n_splits = ss.n_splits
    if area_taxa is not None:
        inc = np.asarray(area_taxa, dtype=float)  # [n_units, n_taxa]
    else:
        inc = np.eye(ss.n_taxa)
    n_units = inc.shape[0]

    n_genes = 0
    if gene_rewards is not None:
        pvals, gene_inc = gene_rewards
        n_genes = len(pvals)

    nvar = n_units + n_splits + n_genes  # x, y, z
    c_obj = np.zeros(nvar)
    c_obj[n_units:n_units + n_splits] = -ss.weights  # maximize
    if n_genes:
        c_obj[n_units + n_splits:] = -np.asarray(pvals, float)

    rows, lbs, ubs = [], [], []
    # y_s <= coverage of side A and side B
    cov_a = inc @ ss.sides.T  # [n_units, n_splits]
    cov_b = inc @ (~ss.sides).T
    for s in range(n_splits):
        for cov in (cov_a[:, s], cov_b[:, s]):
            row = np.zeros(nvar)
            row[:n_units] = -cov
            row[n_units + s] = 1.0
            rows.append(row)
            lbs.append(-np.inf)
            ubs.append(0.0)
    # z_j <= sum of units containing gene j
    if n_genes:
        for j in range(n_genes):
            row = np.zeros(nvar)
            row[:n_units] = -np.asarray(gene_inc, float)[:, j]
            row[n_units + n_splits + j] = 1.0
            rows.append(row)
            lbs.append(-np.inf)
            ubs.append(0.0)
    # size or budget constraint
    row = np.zeros(nvar)
    if budget is not None:
        if costs is None:
            raise ValueError("budget mode needs costs")
        row[:n_units] = np.asarray(costs, float)
        rows.append(row)
        lbs.append(-np.inf)
        ubs.append(float(budget))
    else:
        if k is None:
            raise ValueError("need k or budget")
        row[:n_units] = 1.0
        rows.append(row)
        lbs.append(float(k))
        ubs.append(float(k))

    lo = np.zeros(nvar)
    hi = np.ones(nvar)
    for t in initial:  # pre-included units (initialset, pda.cpp)
        lo[int(t)] = 1.0
    integrality = np.zeros(nvar)
    integrality[:n_units] = 1  # x binary; y,z relax exactly

    res = _solve_milp(
        c_obj,
        [LinearConstraint(np.asarray(rows), lbs, ubs)],
        integrality,
        Bounds(lo, hi),
    )
    x = res.x[:n_units]
    chosen = [i for i in range(n_units) if x[i] > 0.5]
    return PDSolution(
        taxa=chosen,
        names=[ss.names[i] for i in chosen] if area_taxa is None else [],
        score=-float(res.fun),
        k=len(chosen),
    )


def read_costs_file(path: str, names: List[str]) -> np.ndarray:
    """`name cost` per line (budget file, pdnetwork budget mode)."""
    costs = np.ones(len(names))
    idx = {n: i for i, n in enumerate(names)}
    with open(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2 and toks[0] in idx:
                costs[idx[toks[0]]] = float(toks[1])
    return costs


def read_taxa_sets(path: str) -> Dict[str, List[str]]:
    """NEXUS `sets` block with `taxset name = a b c;` entries, or plain
    `name: a b c` lines (areas / gene sets)."""
    text = open(path).read()
    out: Dict[str, List[str]] = {}
    if text.lstrip().lower().startswith("#nexus"):
        text2 = re.sub(r"\[[^\]]*\]", " ", text)
        for m in re.finditer(
            r"taxset\s+(\S+)\s*=\s*([^;]+);", text2, re.I
        ):
            out[m.group(1)] = m.group(2).split()
    else:
        for line in text.splitlines():
            if ":" in line:
                nm, rest = line.split(":", 1)
                if nm.strip():
                    out[nm.strip()] = rest.split()
    return out


def run_gss(
    network_file: str,
    sets_file: str,
    pvalue_file: str,
    k: int,
    out_prefix: str,
    log: Callable = print,
) -> PDSolution:
    """Gene-set selection (runGSSAnalysis, gss.cpp:329): pick k gene
    sets maximizing split diversity over sets + sum of covered genes'
    p-value weights."""
    ss = _load_split_system(network_file)
    sets = read_taxa_sets(sets_file)
    if len(sets) != ss.n_taxa:
        raise ValueError(
            f"number of gene sets ({len(sets)}) does not match network "
            f"taxa ({ss.n_taxa})"
        )
    # genes across all sets
    genes: List[str] = []
    gidx: Dict[str, int] = {}
    for members in sets.values():
        for g in members:
            if g not in gidx:
                gidx[g] = len(genes)
                genes.append(g)
    # area incidence: network taxon (= set name) -> genes
    set_by_name = {n: i for i, n in enumerate(ss.names)}
    gene_inc = np.zeros((ss.n_taxa, len(genes)))
    for nm, members in sets.items():
        if nm not in set_by_name:
            raise ValueError(f"set {nm} not a taxon of the network")
        for g in members:
            gene_inc[set_by_name[nm], gidx[g]] = 1.0
    pvals = np.full(len(genes), -1.0)
    with open(pvalue_file) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2 and toks[0] in gidx:
                pvals[gidx[toks[0]]] = float(toks[1])
    if (pvals < 0).any() or (pvals > 1).any():
        raise ValueError("missing or out-of-range gene p-values")

    sol = max_pd_ilp(
        ss, k=k,
        area_taxa=np.eye(ss.n_taxa),
        gene_rewards=(pvals, gene_inc),
    )
    sol.names = [ss.names[i] for i in sol.taxa]
    log(f"{len(genes)} genes and {ss.n_taxa} gene sets detected")
    log(f"Optimal GSS set (k={k}, score {sol.score:.4f}): "
        + " ".join(sol.names))
    with open(out_prefix + ".gss", "w") as f:
        f.write(f"k = {k}, score = {sol.score:.6f}\n")
        for nm in sol.names:
            f.write(nm + "\n")
    return sol


def read_food_web(path: str):
    """ECOpd diet-composition matrix (ECOpd::readDAG,
    /root/reference/ecopd.cpp:83): first line = number of species, then
    one row per PREDATOR: `name w_1 ... w_n` with w_ij > 0 meaning j is
    part of i's diet (weights = diet portions)."""
    toks = open(path).read().split()
    n = int(toks[0])
    names, rows = [], []
    pos = 1
    for _ in range(n):
        names.append(toks[pos])
        pos += 1
        row = [float(x) for x in toks[pos:pos + n]]
        if len(row) != n or any(x < 0 for x in row):
            raise ValueError("bad food-web matrix row")
        rows.append(row)
        pos += n
    return names, np.asarray(rows)


def run_ecopd(
    tree_file: str,
    dag_file: str,
    k: int,
    out_prefix: str,
    diet_frac: float = 0.0,
    initial: Sequence[str] = (),
    log: Callable = print,
) -> PDSolution:
    """ECOpd: PD selection with food-web viability constraints
    (processECOpd, pda.cpp:2417; IP formulation printECOlpRooted,
    ecopd.cpp:400).  A predator may only be conserved if (unweighted)
    at least one prey is, or (weighted, `-diet d`) if the conserved
    prey cover >= d of its diet:
        sum_prey w_ij x_i - T x_j >= 0,  T = d * sum_i w_ij.
    Species in the food web but absent from the tree contribute no PD
    but still constrain viability (ECOpd::OUT_tree)."""
    from scipy.optimize import Bounds, LinearConstraint

    ss = _load_split_system(tree_file)
    web_names, web = read_food_web(dag_file)
    # unified variable set: tree taxa first, then web-only species
    names = list(ss.names)
    idx = {n: i for i, n in enumerate(names)}
    for n in web_names:
        if n not in idx:
            idx[n] = len(names)
            names.append(n)
    n_units = len(names)
    n_splits = ss.n_splits

    nvar = n_units + n_splits
    c_obj = np.zeros(nvar)
    c_obj[n_units:] = -ss.weights

    rows, lbs, ubs = [], [], []
    # split coverage on both sides (tree taxa columns only)
    for s in range(n_splits):
        for side in (ss.sides[s], ~ss.sides[s]):
            row = np.zeros(nvar)
            row[: ss.n_taxa] = -side.astype(float)
            row[n_units + s] = 1.0
            rows.append(row)
            lbs.append(-np.inf)
            ubs.append(0.0)
    # viability: for each predator with prey
    for j, pred in enumerate(web_names):
        prey_w = web[j]
        if prey_w.sum() <= 0:
            continue  # basal species
        row = np.zeros(nvar)
        for i, prey in enumerate(web_names):
            if prey_w[i] > 0:
                row[idx[prey]] += float(prey_w[i])
        thresh = (
            diet_frac * prey_w.sum() if diet_frac > 0 else
            float(prey_w[prey_w > 0].min())
        )
        row[idx[pred]] -= thresh
        rows.append(row)
        lbs.append(0.0)
        ubs.append(np.inf)
    # size constraint
    row = np.zeros(nvar)
    row[:n_units] = 1.0
    rows.append(row)
    lbs.append(-np.inf)
    ubs.append(float(k))

    lo = np.zeros(nvar)
    hi = np.ones(nvar)
    for nm in initial:
        if nm not in idx:
            raise ValueError(f"initial taxon {nm} unknown")
        lo[idx[nm]] = 1.0
    integrality = np.zeros(nvar)
    integrality[:n_units] = 1

    res = _solve_milp(
        c_obj,
        [LinearConstraint(np.asarray(rows), lbs, ubs)],
        integrality,
        Bounds(lo, hi),
    )
    x = res.x[:n_units]
    chosen = [i for i in range(n_units) if x[i] > 0.5]
    sol = PDSolution(
        taxa=chosen,
        names=[names[i] for i in chosen],
        score=-float(res.fun),
        k=len(chosen),
    )
    log(f"ECOpd optimal viable set (k<={k}, PD {sol.score:.4f}): "
        + " ".join(sol.names))
    with open(out_prefix + ".ecopd", "w") as f:
        f.write(f"k = {k}, PD = {sol.score:.6f}\n")
        for nm in sol.names:
            f.write(nm + "\n")
    return sol


def _load_split_system(path: str) -> SplitSystem:
    head = open(path).read(200).lstrip().lower()
    if head.startswith("#nexus"):
        return SplitSystem.from_nexus(path)
    from ..io.newick import parse_newick
    from ..trees.tree import PhyloTree

    text = open(path).read()
    node = parse_newick(text)

    def leaf_names(n):
        if n.is_leaf:
            return [n.name]
        return [x for c in n.children for x in leaf_names(c)]

    names = sorted(leaf_names(node))
    tree = PhyloTree.from_newick(text, names)
    return SplitSystem.from_tree(tree, names)
