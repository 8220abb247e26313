"""Partitioned model selection and PartitionFinder-style merging.

Re-expresses testPartitionModel (/root/reference/phylotesting.cpp:833):

  1. select the best-fit model for every charset independently
     (`-m TEST` per partition);
  2. with merge=True (`-m TESTMERGE`/`TESTMERGEONLY`), run the greedy
     agglomeration of Lanfear et al. (2012): repeatedly evaluate merging
     every same-type partition pair (restricted to the rcluster% pairs
     with the closest tree lengths, phylotesting.cpp:966-996), accept
     the merge that most improves the global information criterion,
     stop when no merge improves it (phylotesting.cpp:1089).

Scoring: criterion(lnL_sum, df_sum, total sites) exactly as
computeInformationScore (phylotesting.cpp:174-188); every per-set
evaluation result is cached by set name so re-examined pairs are free
(phylotesting.cpp:1019-1030).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..io.alignment import Alignment
from ..io.superalignment import SuperAlignment
from .model_select import information_scores, run_model_selection


def _criterion_score(lnl: float, df: int, ssize: int, criterion: str) -> float:
    aic, aicc, bic = information_scores(lnl, df, ssize)
    return {"AIC": aic, "AICC": aicc, "BIC": bic}[criterion.upper()]


@dataclass
class PartitionScheme:
    """Result of (merged) partition model selection."""

    gene_sets: List[List[int]]  # indices into the ORIGINAL partitions
    model_names: List[str]
    set_names: List[str]
    score: float
    lnl: float
    df: int
    tables: Dict[str, str] = field(default_factory=dict)

    def merged_superalignment(self, saln: SuperAlignment) -> SuperAlignment:
        """New SuperAlignment with each gene set concatenated
        (mergePartitions, /root/reference/phylotesting.cpp:723)."""
        from ..io.partition import PartitionDef

        parts, defs = [], []
        for gs, name, model in zip(
            self.gene_sets, self.set_names, self.model_names
        ):
            aln = (
                saln.partitions[gs[0]]
                if len(gs) == 1
                else Alignment.concatenate([saln.partitions[k] for k in gs])
            )
            sites = np.concatenate([saln.defs[k].sites for k in gs])
            defs.append(
                PartitionDef(
                    name=name,
                    sites=sites,
                    seq_type=saln.defs[gs[0]].seq_type,
                    model=model,
                )
            )
            parts.append(aln)
        return SuperAlignment(
            names=list(saln.names), partitions=parts, defs=defs
        )

    def nexus_scheme(self, saln: SuperAlignment) -> str:
        """`.best_scheme.nex` content (printBestPartition,
        /root/reference/phylosupertree.cpp)."""

        def ranges(sites: np.ndarray) -> str:
            sites = np.sort(sites) + 1  # 1-based
            out, start, prev = [], sites[0], sites[0]
            for s in sites[1:]:
                if s == prev + 1:
                    prev = s
                    continue
                out.append(f"{start}-{prev}" if prev > start else f"{start}")
                start = prev = s
            out.append(f"{start}-{prev}" if prev > start else f"{start}")
            return " ".join(out)

        L = ["#nexus", "begin sets;"]
        clean = [nm.replace("+", "_") for nm in self.set_names]
        for nm, gs in zip(clean, self.gene_sets):
            sites = np.concatenate([saln.defs[k].sites for k in gs])
            L.append(f"  charset {nm} = {ranges(sites)};")
        entries = [
            f"    {model}: {nm}"
            for model, nm in zip(self.model_names, clean)
        ]
        L.append("  charpartition mymodels =")
        L.append(",\n".join(entries) + ";")
        L.append("end;")
        return "\n".join(L) + "\n"


def test_partition_model(
    saln: SuperAlignment,
    dtype=None,
    log: Callable = print,
    criterion: str = "BIC",
    merge: bool = False,
    rcluster: float = 100.0,
    rate_classes=None,
) -> PartitionScheme:
    import jax.numpy as jnp

    dtype = dtype or jnp.float64
    n = saln.n_parts
    ssize = saln.n_sites
    names = [d.name for d in saln.defs]
    seq_types = [p.states.seq_type for p in saln.partitions]

    # cache: frozenset(ids) -> (model, lnl, df, tree_len, table)
    cache: Dict[frozenset, Tuple[str, float, int, float, str]] = {}

    def evaluate(idset: List[int]):
        key = frozenset(idset)
        if key in cache:
            return cache[key]
        aln = (
            saln.partitions[idset[0]]
            if len(idset) == 1
            else Alignment.concatenate([saln.partitions[k] for k in idset])
        )
        best, table, det = run_model_selection(
            aln, dtype=dtype, log=lambda s: None, criterion=criterion,
            rate_classes=rate_classes, return_details=True,
        )
        out = (best, det["lnl"], det["df"], det["tree_len"], table)
        cache[key] = out
        return out

    log(
        f"Selecting individual models for {n} charsets using "
        f"{criterion}..."
    )
    model_names, lhvec, dfvec, lenvec, tables = [], [], [], [], {}
    for i in range(n):
        model, lnl, df, tlen, table = evaluate([i])
        model_names.append(model)
        lhvec.append(lnl)
        dfvec.append(df)
        lenvec.append(tlen)
        tables[names[i]] = table
        score = _criterion_score(lnl, df, saln.partitions[i].n_sites,
                                 criterion)
        log(f" {i + 1:>3} {model:<16} {score:<12.3f} {names[i]}")

    gene_sets = [[i] for i in range(n)]
    set_names = list(names)
    lhsum, dfsum = float(np.sum(lhvec)), int(np.sum(dfvec))
    inf_score = _criterion_score(lhsum, dfsum, ssize, criterion)

    if not merge or n < 2:
        return PartitionScheme(
            gene_sets, model_names, set_names, inf_score, lhsum, dfsum,
            tables,
        )

    log(
        f"Full partition model {criterion} score: {inf_score:.3f} "
        f"(lh={lhsum:.3f} df={dfsum})"
    )
    log("Merging models to increase model fit...")

    while len(gene_sets) >= 2:
        # candidate pairs: same data type, rcluster% closest tree lengths
        pairs = [
            (p1, p2)
            for p1 in range(len(gene_sets) - 1)
            for p2 in range(p1 + 1, len(gene_sets))
            if seq_types[gene_sets[p1][0]] == seq_types[gene_sets[p2][0]]
        ]
        if not pairs:
            break
        if rcluster < 100:
            pairs.sort(key=lambda pq: abs(lenvec[pq[0]] - lenvec[pq[1]]))
            keep = max(1, int(round(len(pairs) * rcluster / 100.0)))
            pairs = pairs[:keep]

        best = None  # (score, p1, p2, model, lnl, df, tlen, set_name)
        for p1, p2 in pairs:
            merged = gene_sets[p1] + gene_sets[p2]
            set_name = "+".join(names[k] for k in merged)
            model, lnl, df, tlen, table = evaluate(merged)
            tables[set_name] = table
            lhnew = lhsum - lhvec[p1] - lhvec[p2] + lnl
            dfnew = dfsum - dfvec[p1] - dfvec[p2] + df
            score = _criterion_score(lhnew, dfnew, ssize, criterion)
            if best is None or score < best[0]:
                best = (score, p1, p2, model, lnl, df, tlen, set_name)

        score, p1, p2, model, lnl, df, tlen, set_name = best
        if score >= inf_score:
            break
        inf_score = score
        lhsum = lhsum - lhvec[p1] - lhvec[p2] + lnl
        dfsum = dfsum - dfvec[p1] - dfvec[p2] + df
        log(
            f"Merging {set_name} with {criterion} score: {score:.3f} "
            f"(lh={lhsum:.3f} df={dfsum})"
        )
        gene_sets[p1] = gene_sets[p1] + gene_sets[p2]
        set_names[p1] = set_name
        model_names[p1] = model
        lhvec[p1], dfvec[p1], lenvec[p1] = lnl, df, tlen
        for vec in (gene_sets, set_names, model_names, lhvec, dfvec, lenvec):
            del vec[p2]

    log("BEST-FIT PARTITION MODEL:")
    log(
        "  charpartition " + criterion + " = "
        + ", ".join(
            f"{m}: {nm}" for m, nm in zip(model_names, set_names)
        )
        + ";"
    )
    return PartitionScheme(
        gene_sets, model_names, set_names, inf_score, lhsum, dfsum, tables
    )
