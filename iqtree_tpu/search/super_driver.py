"""Partitioned (supertree) search driver.

The partitioned analogues of NNIEngine + run_search (nni_search.py,
driver.py), against the partition engine (engine/partition.py).
Mirrors the reference's PhyloSuperTree / PhyloSuperTreePlen search
(/root/reference/phylosupertree.cpp, phylosupertreeplen.cpp): the
topology search is identical to the single-alignment case; only the
likelihood/branch machinery differs per branch-length mode.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.likelihood import ModelArrays, SiteData, TreeArrays
from ..engine.nni import evaluate_nnis
from ..engine.parsimony import parsimony_stepwise_tree
from ..engine.partition import (
    MODE_JOINT,
    MODE_PROPORTIONAL,
    MODE_UNLINKED,
    PartitionOptimizer,
    optimize_all_branches_joint,
    optimize_all_branches_unlinked,
    optimize_partitioned,
    partition_loglik,
)
from ..io.superalignment import SuperAlignment
from ..models.factory import default_model, parse_model_string
from ..models.optimize import ModelOptimizer
from ..trees.tree import PhyloTree, random_tree
from .candidate_set import CandidateSet
from .driver import SearchParams, random_nni_perturb
from .nni_search import LOGL_EPSILON, NNISearchResult
from .stoprule import StopRule


def _host_to_dev_blen(ta: TreeArrays, host_blen: np.ndarray) -> jnp.ndarray:
    dev = np.zeros(ta.n_slots, dtype=np.float64)
    dev[: ta.n_nodes] = np.asarray(host_blen)[np.asarray(ta.d2h)]
    return jnp.asarray(dev, dtype=ta.blen.dtype)


class PartitionedNNIEngine:
    """NNIEngine-compatible interface over K partitions."""

    def __init__(
        self,
        models: Tuple[ModelArrays, ...],
        sites: Tuple[SiteData, ...],
        n_taxa: int,
        dtype=jnp.float64,
        nni5: bool = True,
        mode: str = MODE_JOINT,
    ):
        self.models = tuple(models)
        self.sites = tuple(sites)
        self.dtype = dtype
        self.mode = mode
        K = len(models)
        self.n_parts = K
        w = np.array([float(np.sum(s.pattern_freq)) for s in sites])
        self._weights = w / w.sum()
        # per-partition branch lengths (host node numbering), unlinked mode
        self.part_blens = np.full((K, 2 * n_taxa - 1), 0.1)

        def _eval_all(ta, models, blens_dev, edges):
            lnl_sum = 0.0
            centers = []
            for k in range(K):
                t_k = ta.with_blen(blens_dev[k])
                ev = evaluate_nnis(t_k, models[k], self.sites[k], edges,
                                   nni5=nni5)
                lnl_sum = lnl_sum + ev.lnl
                centers.append(ev.center_blen)
            return lnl_sum, jnp.stack(centers)  # [K, E, 2]

        self._eval_jit = jax.jit(_eval_all)

        if mode == MODE_UNLINKED:
            def _brlen(ta, blens_dev, n):
                return optimize_all_branches_unlinked(
                    ta, blens_dev, self.models, self.sites, n_sweeps=n
                )
        else:
            def _brlen(ta, _unused, n):
                t, lnl = optimize_all_branches_joint(
                    ta, self.models, self.sites, n_sweeps=n
                )
                return t.blen, lnl

        self._brlen_jit = jax.jit(_brlen, static_argnames=("n",))

        def _patlnl(ta, blens_dev):
            _, pats = partition_loglik(
                ta, tuple(blens_dev[k] for k in range(K)), self.models,
                self.sites,
            )
            return jnp.concatenate(pats)

        self._patlnl_jit = jax.jit(_patlnl)

    # -- helpers ---------------------------------------------------------
    def arrays(self, tree: PhyloTree) -> TreeArrays:
        return TreeArrays.from_tree(tree, self.dtype)

    def _blens_dev(self, ta: TreeArrays) -> jnp.ndarray:
        if self.mode == MODE_UNLINKED:
            return jnp.stack(
                [_host_to_dev_blen(ta, b) for b in self.part_blens]
            )
        return jnp.stack([ta.blen] * self.n_parts)

    def pattern_lnl(self, tree: PhyloTree) -> np.ndarray:
        ta = self.arrays(tree)
        return np.asarray(self._patlnl_jit(ta, self._blens_dev(ta)))

    def optimize_branches(
        self, tree: PhyloTree, n_sweeps: int = 100
    ) -> Tuple[PhyloTree, float]:
        ta = self.arrays(tree)
        if self.mode == MODE_UNLINKED:
            blens, lnl = self._brlen_jit(ta, self._blens_dev(ta), n_sweeps)
            blens = np.asarray(blens)
            d2h = np.asarray(ta.d2h)
            for k in range(self.n_parts):
                host = np.empty(ta.n_nodes)
                host[d2h] = blens[k][: ta.n_nodes]
                self.part_blens[k] = host
            # weighted mean for host bookkeeping / reporting
            tree.blen = (self._weights[:, None] * self.part_blens).sum(0)
        else:
            blen, lnl = self._brlen_jit(ta, None, n_sweeps)
            tree.blen = np.asarray(
                ta.with_blen(blen).host_blen(), dtype=np.float64
            )
        return tree, float(lnl)

    # -- hill climbing (IQTree::optimizeNNI semantics) -------------------
    def hill_climb(
        self,
        tree: PhyloTree,
        max_steps: Optional[int] = None,
        on_tree: Optional[Callable[[PhyloTree, float], None]] = None,
    ) -> NNISearchResult:
        n_taxa = tree.n_taxa
        max_steps = max_steps or n_taxa
        tree, cur = self.optimize_branches(tree, 100)
        nni_count = 0
        steps = 0
        for step in range(1, max_steps + 1):
            steps = step
            old = cur
            if on_tree is not None:
                on_tree(tree, cur)
            edges = tree.internal_edges()
            if len(edges) == 0:
                break
            ta = self.arrays(tree)
            edges_dev = np.asarray(ta.h2d)[edges]
            lnls, centers = self._eval_jit(
                ta, self.models, self._blens_dev(ta), jnp.asarray(edges_dev)
            )
            lnls = np.asarray(lnls)
            centers = np.asarray(centers)  # [K, E, 2]
            delta = lnls - cur
            pos = np.argwhere(delta > LOGL_EPSILON)
            if len(pos) == 0:
                break
            order = pos[np.argsort(-delta[pos[:, 0], pos[:, 1]])]
            chosen: List[Tuple[int, int]] = []
            used = set()
            for k, s in order:
                v = int(edges[k])
                u = int(tree.parent[v])
                if v in used or u in used:
                    continue
                used.update((v, u))
                chosen.append((k, int(s)))

            mean_centers = (
                self._weights[:, None, None] * centers
            ).sum(0)  # [E, 2]

            def apply_set(tr: PhyloTree, picks):
                for k, s in picks:
                    v = int(edges[k])
                    tr.apply_nni(v, s)
                    tr.blen[v] = mean_centers[k, s]
                    if self.mode == MODE_UNLINKED:
                        self.part_blens[:, v] = centers[:, k, s]
                return tr

            saved_part = self.part_blens.copy()
            trial = apply_set(tree.copy(), chosen)
            trial, new_lnl = self.optimize_branches(trial, 2)
            if new_lnl > cur + LOGL_EPSILON:
                tree, cur = trial, new_lnl
                nni_count += len(chosen)
            else:
                self.part_blens = saved_part.copy()
                trial = apply_set(tree.copy(), [chosen[0]])
                trial, new_lnl = self.optimize_branches(trial, 2)
                if new_lnl >= cur - LOGL_EPSILON:
                    tree, cur = trial, new_lnl
                    nni_count += 1
                else:
                    self.part_blens = saved_part
                    break
            if cur - old < 0.1:
                break
        tree, cur = self.optimize_branches(tree, 100)
        return NNISearchResult(tree=tree, lnl=cur, nni_count=nni_count,
                               steps=steps)


@dataclass
class PartitionedSearchResult:
    best_tree: PhyloTree
    best_lnl: float
    models: list  # [(subst, rate)] per partition
    scales: np.ndarray
    part_blens: Optional[np.ndarray]
    iterations: int
    wall_time: float
    saln: SuperAlignment
    popt: PartitionOptimizer = None
    params: dict = None


def run_search_partitioned(
    saln: SuperAlignment,
    params: SearchParams,
    mode: str = MODE_JOINT,
    model_strs: Optional[List[Optional[str]]] = None,
    pattern_freqs: Optional[List[np.ndarray]] = None,
    fix_topology: bool = False,
) -> PartitionedSearchResult:
    """fix_topology (-te): skip NNI search entirely; optimize partition
    models + branch lengths on the user topology only (the reference's
    -spp/-sp -te behavior, phyloanalysis.cpp runTreeReconstruction with
    params.min_iterations == 0)."""
    t_start = time.time()
    rng = np.random.default_rng(params.seed)
    log = params.log
    dtype = params.dtype

    # per-partition models (charpartition model or CLI -m or default)
    opts = []
    sites = []
    for k, aln_k in enumerate(saln.partitions):
        ms = None
        if model_strs:
            ms = model_strs[k]
        ms = ms or saln.defs[k].model or params.model or default_model(aln_k)
        subst, rate = parse_model_string(ms, aln_k)
        opts.append(ModelOptimizer(subst, rate, dtype=dtype))
        sd = SiteData.from_alignment(aln_k, dtype,
                                     asc=getattr(subst, "asc", False))
        if pattern_freqs is not None:
            # bootstrap resample (-b under -sp/-spp; -bspec GENE/GENESITE
            # semantics resolved by SuperAlignment.bootstrap_pattern_freqs)
            pf = np.asarray(sd.pattern_freq).copy()
            pf[: len(pattern_freqs[k])] = pattern_freqs[k]  # +ASC rows stay 0
            sd = sd._replace(pattern_freq=jnp.asarray(pf, dtype))
        sites.append(sd)
        log(f"Partition {saln.defs[k].name}: {aln_k.n_sites} sites, "
            f"{aln_k.n_patterns} patterns, model {ms}")
    popt = PartitionOptimizer(opts, mode=mode, dtype=dtype)
    sites = tuple(sites)

    # ---- start tree: stepwise-addition parsimony on the largest
    # same-type partition set (concatenated if homogeneous)
    n_taxa = saln.n_taxa
    if params.start_tree:
        tree = PhyloTree.from_newick(params.start_tree, saln.names, rng=rng)
        log("Using user start tree")
    else:
        seq_types = {a.states.seq_type for a in saln.partitions}
        big = max(saln.partitions, key=lambda a: a.n_sites)
        log("Computing stepwise-addition parsimony start tree...")
        tree = parsimony_stepwise_tree(big, rng)

    # ---- model + branch init -------------------------------------------
    log("Optimizing partition model parameters on the start tree...")
    ta = TreeArrays.from_tree(tree, dtype)
    K = popt.n_parts
    blens0 = jnp.stack([ta.blen] * K)
    mparams = popt.init_params()
    ta, blens, mparams, lnl = optimize_partitioned(
        popt, ta, blens0, sites, params=mparams, rounds=8, tol=0.1
    )
    tree.blen = ta.host_blen()
    log(f"Start tree lnL: {lnl:.4f}")

    models = jax.jit(popt.build)(mparams)
    engine = PartitionedNNIEngine(
        models, sites, n_taxa, dtype=dtype, nni5=params.nni5, mode=mode
    )
    if fix_topology:
        # -te: no search — the "best" tree IS the user tree; fall through
        # to the final model optimization below
        best_lnl, best_tree = lnl, tree.copy()
        if mode == MODE_UNLINKED:
            d2h = np.asarray(ta.d2h)
            bl = np.asarray(blens)
            for k in range(K):
                host = np.empty(ta.n_nodes)
                host[d2h] = bl[k][: ta.n_nodes]
                engine.part_blens[k] = host
        stop = StopRule(unsuccess_iteration=0, fixed_iterations=0)
        return _finalize_partitioned(
            popt, engine, best_tree, best_lnl, sites, mparams, mode, K,
            dtype, log, stop, saln, t_start)
    if mode == MODE_UNLINKED:
        d2h = np.asarray(ta.d2h)
        bl = np.asarray(blens)
        for k in range(K):
            host = np.empty(ta.n_nodes)
            host[d2h] = bl[k][: ta.n_nodes]
            engine.part_blens[k] = host

    # ---- candidate set + stochastic loop --------------------------------
    cand = CandidateSet(max_size=params.max_candidates,
                        pop_size=params.pop_size)
    res = engine.hill_climb(tree)
    cand.update(res.tree, res.lnl)
    best_lnl, best_tree = res.lnl, res.tree.copy()
    log(f"Initial NNI tree lnL: {best_lnl:.4f}")

    n_perturb = max(1, int(params.pers * (n_taxa - 3)))
    stop = StopRule(
        unsuccess_iteration=params.unsuccess_iteration,
        fixed_iterations=params.fixed_iterations,
        max_seconds=params.max_seconds,
    )
    while not stop.should_stop():
        t = cand.random_candidate(rng)
        random_nni_perturb(t, n_perturb, rng)
        r = engine.hill_climb(t)
        improved = r.lnl > best_lnl + 1e-6
        cand.update(r.tree, r.lnl)
        if improved:
            best_lnl, best_tree = r.lnl, r.tree.copy()
            log(f"BETTER TREE FOUND at iteration {stop.cur_iteration + 1}: "
                f"{best_lnl:.4f}")
        stop.iteration_done(improved)

    return _finalize_partitioned(
        popt, engine, best_tree, best_lnl, sites, mparams, mode, K,
        dtype, log, stop, saln, t_start)


def _finalize_partitioned(popt, engine, best_tree, best_lnl, sites,
                          mparams, mode, K, dtype, log, stop, saln,
                          t_start):
    # ---- final model optimization ---------------------------------------
    log("Final partition model optimization...")
    ta = TreeArrays.from_tree(best_tree, dtype)
    if mode == MODE_UNLINKED:
        blens = jnp.stack(
            [_host_to_dev_blen(ta, b) for b in engine.part_blens]
        )
    else:
        blens = jnp.stack([ta.blen] * K)
    ta, blens, mparams, best_lnl = optimize_partitioned(
        popt, ta, blens, sites, params=mparams, rounds=10, tol=0.01
    )
    best_tree.blen = ta.host_blen()
    model_list, scales = popt.unpack(mparams)
    log(f"BEST SCORE FOUND: {best_lnl:.4f}")

    part_blens = None
    if mode == MODE_UNLINKED:
        d2h = np.asarray(ta.d2h)
        bl = np.asarray(blens)
        part_blens = np.empty((K, ta.n_nodes))
        for k in range(K):
            part_blens[k][d2h] = bl[k][: ta.n_nodes]

    return PartitionedSearchResult(
        best_tree=best_tree,
        best_lnl=float(best_lnl),
        models=model_list,
        scales=scales,
        part_blens=part_blens,
        iterations=stop.cur_iteration,
        wall_time=time.time() - t_start,
        saln=saln,
        popt=popt,
        params=mparams,
    )
