"""Top-level stochastic tree search (the IQTree class equivalent).

Mirrors runTreeReconstruction + IQTree::doTreeSearch
(/root/reference/phyloanalysis.cpp:1611, iqtree.cpp:1834):

  1. initial tree: BIONJ on batched pairwise ML distances
  2. joint model-parameter + branch-length optimization (L-BFGS + Newton)
  3. initial candidate set: random + perturbed variants, NNI-climbed
  4. stochastic loop: pick a random candidate, perturb with random NNIs
     (strength 0.5 like initPS, tools.cpp:865), NNI hill-climb, update
     candidate set; stop after `unsuccess_iteration` non-improving rounds
  5. final thorough model re-optimization on the best tree

All heavy steps run as jitted device programs with topology as data, so
the whole search reuses a handful of compiled executables.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.distances import ml_distances
from ..engine.parsimony import parsimony_stepwise_tree
from ..engine.likelihood import ModelArrays, SiteData, TreeArrays
from ..io.alignment import Alignment
from ..models.factory import parse_model_string
from ..models.optimize import ModelOptimizer, optimize_model_and_branches
from ..trees.bionj import bionj_tree
from ..trees.tree import PhyloTree, random_tree
from .candidate_set import CandidateSet
from .nni_search import NNIEngine
from .stoprule import StopRule


@dataclass
class SearchParams:
    model: str = "HKY+G"
    seed: int = 1
    n_init_trees: int = 20  # reference numInitTrees=100 (parsimony-based)
    n_top_init: int = 5  # reference numNNITrees=20
    pop_size: int = 5
    max_candidates: int = 10
    pers: float = 0.5  # perturbation strength (initPS, tools.cpp:865)
    use_iqp: bool = False  # -iqp: IQP leaf re-insertion perturbation
    p_delete: Optional[float] = None  # -pdel (IQP deletion fraction)
    k_represent: int = 4  # -krep (IQP representative-set size)
    ub_filter: bool = False  # -upNNI upper-bound prefilter
    ub_frac: float = 0.0  # -upFrac
    fix_stable_splits: bool = False  # -fss (freeze 100%-support splits)
    num_support_trees: int = 20  # -nsupport
    unsuccess_iteration: int = 100
    fixed_iterations: Optional[int] = None
    max_seconds: Optional[float] = None
    # -sr: Weibull predicted-iteration stopping (SC_WEIBULL)
    weibull_max_iterations: Optional[int] = None
    stop_confidence: float = 0.95
    # -me/-eps: lnL tolerance of the final model-parameter optimization
    # (params.modeps; reference modelfactory.cpp:937 epsilon)
    model_eps: Optional[float] = None
    dtype: object = jnp.float64
    nni5: bool = True
    # reference speedNNI reduction (-speednni): after a full first scan
    # only branches near applied NNIs are re-evaluated.  Default OFF
    # here (the reference defaults ON, tools.cpp:880): the batched
    # evaluator scores every branch in one device program, so full
    # re-scans cost little, and measured 1000-taxon searches show the
    # reduction loses hundreds of lnL for <5% wall saving.
    speednni: bool = False
    start_tree: Optional[str] = None  # newick string (-t/-te)
    start_tree_mode: str = "BIONJ"  # -starttree BIONJ|PARS
    dist_file: Optional[str] = None  # -d: user distances feed BIONJ
    log: Callable[[str], None] = print
    # UFBoot (-bb): replicates; correlation checked every step_iterations
    ufboot: int = 0
    ufboot_epsilon: float = 0.5  # -beps (RELL tie slack, iqtree.cpp:2738)
    step_iterations: int = 100
    min_correlation: float = 0.99
    max_boot_iterations: int = 1000
    checkpoint: object = None  # utils.checkpoint.Checkpoint for resume
    verbose: int = 0  # -v[v] ladder (VB_MED/VB_MAX, tools.h:323)
    # -fs site-specific frequency model: (class_freq [K,S], ptn_class [P]);
    # the whole search then runs on the SSF engine (engine/sitemodel.py)
    ssf: object = None
    # -mem: HBM budget in bytes for the fused store buffers; exceeding it
    # degrades to the mailbox engine instead of OOMing (the reference's
    # mem-save decision, phyloanalysis.cpp:1697-1725)
    mem_cap: Optional[int] = None
    # standard bootstrap support: replace pattern frequencies (the
    # resampled alignment has the same patterns with new weights, so the
    # same compiled programs serve every replicate)
    pattern_freq: Optional[np.ndarray] = None
    # -wt2/-wt3: called with every intermediate (tree, lnl) the climbs
    # visit (reference write_intermediate_trees, printIntermediateTree)
    on_visit: object = None


@dataclass
class SearchResult:
    best_tree: PhyloTree
    best_lnl: float
    subst: object
    rate: object
    iterations: int
    wall_time: float
    aln: Alignment
    candidates: CandidateSet
    model_opt: ModelOptimizer = None
    params_vec: dict = None
    ufboot: object = None  # UFBoot instance when -bb was requested


def _mparams_dump(mparams: dict) -> dict:
    """Model-parameter pytree -> JSON-serializable dict (CKP_SAVE of the
    model variables, reference modelgtr.cpp saveCheckpoint)."""
    return {k: np.asarray(v).tolist() for k, v in mparams.items()}


def _mparams_restore(blob: dict, template: dict) -> dict:
    """Inverse of _mparams_dump; dtypes/shapes taken from the template
    produced by ModelOptimizer.init_params()."""
    out = {}
    for k, v in template.items():
        if k in blob:
            out[k] = jnp.asarray(blob[k], dtype=v.dtype).reshape(v.shape)
        else:
            out[k] = v
    return out


def random_nni_perturb(tree: PhyloTree, n_moves: int, rng: np.random.Generator):
    """IQTree::doRandomNNIs (/root/reference/iqtree.cpp:1302)."""
    for _ in range(n_moves):
        edges = tree.internal_edges()
        if len(edges) == 0:
            return
        v = int(edges[rng.integers(len(edges))])
        tree.apply_nni(v, int(rng.integers(2)))


def _optimize_mb(opt, ta, site, params=None, rounds=10, tol=0.1,
                 steps=None, n_slots=0):
    """Dispatch model+branch optimization on optimizer type (SSF
    models use forward-mode L-BFGS + the per-pattern-basis Newton).

    (steps, n_slots): slot schedule routing the branch sweeps through
    the fused Pallas kernels — before round 5 the search's model-opt
    phases always ran the XLA mailbox path, ~25x slower at 1000 taxa
    than the engine the rest of the search uses."""
    from ..models.sitefreq import SSFOptimizer, optimize_ssf_model_and_branches

    if isinstance(opt, SSFOptimizer):
        ta, p, lnl = optimize_ssf_model_and_branches(
            opt, ta, site, params=params, rounds=rounds, tol=tol
        )
        return ta, p, lnl
    return optimize_model_and_branches(
        opt, ta, site, params=params, rounds=rounds, tol=tol,
        steps=steps, n_slots=n_slots,
    )


def run_search(aln: Alignment, params: SearchParams) -> SearchResult:
    t_start = time.time()
    rng = np.random.default_rng(params.seed)
    log = params.log
    dtype = params.dtype

    subst, rate = parse_model_string(params.model, aln)
    if params.ssf is not None:
        from ..models.sitefreq import SSFOptimizer

        class_freq, ptn_class = params.ssf
        opt = SSFOptimizer(subst=subst, rate=rate, dtype=dtype,
                           class_freq=class_freq, ptn_class=ptn_class)
    else:
        opt = ModelOptimizer(subst, rate, dtype=dtype)
    site = SiteData.from_alignment(aln, dtype, asc=subst.asc)
    if params.pattern_freq is not None:
        site = site._replace(
            pattern_freq=jnp.asarray(params.pattern_freq, dtype)
        )
    mparams = opt.init_params()

    # ---- initial tree -------------------------------------------------
    # resume gates (phase flags like finishedModelInit/finishedCandidateSet,
    # phyloanalysis.cpp:1757-1876): skip completed phases instead of
    # re-running them and overwriting afterwards (they cost minutes at
    # 1000 taxa and would consume rng draws that the restored rng state
    # then has to paper over)
    ckp = params.checkpoint
    resumed_init = ckp is not None and ckp.has("search.mparams")
    resumed_search = ckp is not None and ckp.has("search.best_tree")
    dist = None
    if resumed_init:
        tree = None  # restored below at the model-init gate
    elif params.start_tree:
        tree = PhyloTree.from_newick(params.start_tree, aln.names, rng=rng)
        log("Using user start tree")
    elif params.dist_file:
        # -d: user-supplied distances replace the ML-distance pass
        # (computeInitialDist, /root/reference/phyloanalysis.cpp:1222)
        from ..io.alignment import read_dist_file

        log(f"Reading distance matrix from {params.dist_file}...")
        dist = read_dist_file(params.dist_file, aln.names)
        tree = bionj_tree(dist)
        log("BIONJ start tree from user distances")
    elif params.start_tree_mode.upper().startswith("PARS"):
        # -starttree PARS: randomized stepwise-addition parsimony start
        # (reference STT_PARSIMONY, tools.cpp:1604-1613)
        log("Computing parsimony stepwise-addition start tree...")
        tree = parsimony_stepwise_tree(aln, rng)
    else:
        log("Computing ML pairwise distances + BIONJ start tree...")
        ma0 = ModelOptimizer(subst, rate, dtype=dtype).build(
            ModelOptimizer(subst, rate, dtype=dtype).init_params()
        ) if params.ssf is not None else opt.build(mparams)
        dist = np.asarray(jax.jit(ml_distances)(ma0, site))
        tree = bionj_tree(dist)

    # ---- perturbation operator (doRandomNNIs vs doIQP, iqtree.cpp:1939)
    iqp = None
    if params.use_iqp:
        from .iqp import IQP

        if dist is None:
            ma0 = opt.build(mparams)
            dist = np.asarray(jax.jit(ml_distances)(ma0, site))
        iqp = IQP(dist, p_delete=params.p_delete,
                  k_represent=params.k_represent)

    def perturb(t: PhyloTree) -> PhyloTree:
        if iqp is not None:
            return iqp.perturb(t, rng)
        random_nni_perturb(t, n_perturb, rng)
        return t

    # ---- engine (built BEFORE model init: the model-opt phases route
    # their branch sweeps through the engine's fused schedules; the
    # model itself is passed as an argument to the jitted programs, so
    # the same engine serves every parameter update) ---------------------
    def build_arrays(p):
        return (jax.jit(opt.build_ssf)(p) if params.ssf is not None
                else jax.jit(opt.build)(p))

    model_arrays = build_arrays(mparams)
    engine = NNIEngine(model_arrays, site, dtype=dtype, nni5=params.nni5,
                       ub_filter=params.ub_filter, ub_frac=params.ub_frac,
                       mem_cap=params.mem_cap, speednni=params.speednni)
    if engine.decision is not None and params.ssf is None:
        # reference-style startup banner: which kernel path and why,
        # plus the pre-run memory estimate (pda.cpp:2252-2322,
        # phylotree.cpp:763 getMemoryRequired)
        from ..engine.banner import engine_banner

        for line in engine_banner(
            engine.decision, aln.n_taxa, model_arrays.ncat,
            model_arrays.num_states, int(site.tip_codes.shape[1]),
        ).splitlines():
            log(line)

    def fit_model(tree_obj, ta, rounds, tol):
        """Model+branch optimization on the fused engine when available."""
        if engine.fused:
            steps, n_slots = engine._schedule(tree_obj, ta)
            return _optimize_mb(opt, ta, site, params=mparams,
                                rounds=rounds, tol=tol,
                                steps=steps, n_slots=n_slots)
        return _optimize_mb(opt, ta, site, params=mparams,
                            rounds=rounds, tol=tol)

    # ---- model initialization on the start tree ----------------------
    # (phase-gated like finishedModelInit, phyloanalysis.cpp:1757)
    if resumed_init:
        mparams = _mparams_restore(ckp.get("search.mparams"), mparams)
        tree = PhyloTree.from_newick(ckp.get("search.init_tree"), aln.names)
        log("Restored model parameters + start tree from checkpoint")
        engine.model = model_arrays = build_arrays(mparams)
    else:
        log("Optimizing model parameters on the start tree...")
        ta = TreeArrays.from_tree(tree, dtype)
        ta, mparams, lnl = fit_model(tree, ta, rounds=10, tol=0.1)
        tree.blen = ta.host_blen()
        log(f"Start tree lnL: {lnl:.4f}")
        engine.model = model_arrays = build_arrays(mparams)
        if ckp is not None:
            # precision=17: %.17g round-trips f64 exactly, so a resumed
            # run restarts from bit-identical branch lengths (a 10-digit
            # round trip makes hill-climb trajectories diverge and
            # breaks -bb resume determinism)
            ckp.put("search.mparams", _mparams_dump(mparams))
            ckp.put("search.init_tree",
                    tree.to_newick(aln.names, precision=17))
            ckp.dump(force=True)

    # ---- ML-distance BIONJ refresh (computeMLDist,
    # phyloanalysis.cpp:1827): pairwise ML distances under the DEFAULT
    # model compress large distances badly (no fitted alpha/rates),
    # which costs the BIONJ start tree thousands of lnL at 1000 taxa;
    # recompute them with the OPTIMIZED model and keep the better tree.
    if (not resumed_search
            and params.start_tree is None and params.dist_file is None
            and params.ssf is None
            and not params.start_tree_mode.upper().startswith("PARS")):
        log("Recomputing ML distances with the optimized model...")
        dist = np.asarray(jax.jit(ml_distances)(model_arrays, site))
        tree2 = bionj_tree(dist)
        tree, lnl_a = engine.optimize_branches(tree, 30, tol=0.05)
        tree2, lnl_b = engine.optimize_branches(tree2, 30, tol=0.05)
        if lnl_b > lnl_a:
            tree = tree2
            log(f"ML-distance BIONJ tree is better "
                f"({lnl_b:.4f} vs {lnl_a:.4f})")

    # ---- UFBoot setup -------------------------------------------------
    ufboot = None
    on_tree = None
    if params.ufboot > 0:
        from .ufboot import UFBoot

        ufboot = UFBoot(aln, params.ufboot, rng, dtype=dtype,
                        epsilon=params.ufboot_epsilon)
        log(f"Ultrafast bootstrap: {params.ufboot} replicates (RELL on MXU)")

        def on_tree(t, lnl):
            ufboot.save_tree(t, engine.pattern_lnl(t))
            if params.on_visit is not None:
                params.on_visit(t, lnl)

    if on_tree is None and params.on_visit is not None:
        on_tree = params.on_visit

    # ---- initial candidate set ---------------------------------------
    n_taxa = aln.n_taxa
    n_perturb = max(1, int(params.pers * (n_taxa - 3)))
    cand = CandidateSet(max_size=params.max_candidates, pop_size=params.pop_size)
    best_lnl = -np.inf
    best_tree = None

    def reopt_model(tree_obj, lnl_now, tol):
        """Model-parameter refresh on an improved tree (the reference
        re-estimates the model EVERY time a better tree is found,
        iqtree.cpp:2013-2016 and :751-753; searching with parameters
        fitted to the distant start tree costs hundreds of lnL at 1000
        taxa).  Returns the refreshed lnl; updates engine.model."""
        nonlocal mparams, model_arrays
        ta2 = TreeArrays.from_tree(tree_obj, dtype)
        ta2, mparams, lnl2 = fit_model(tree_obj, ta2, rounds=4, tol=tol)
        engine.model = model_arrays = build_arrays(mparams)
        if float(lnl2) > lnl_now:
            tree_obj.blen = ta2.host_blen()
            return float(lnl2)
        return lnl_now

    if not resumed_search:
        res = engine.hill_climb(tree, on_tree=on_tree)
        # model refresh on the climbed tree (initCandidateTreeSet
        # re-estimates at modeps*10 on improvement, iqtree.cpp:751-753)
        lnl0 = reopt_model(res.tree, res.lnl, tol=0.1)
        cand.update(res.tree, lnl0)
        best_lnl = lnl0
        best_tree = res.tree.canonical()
        log(f"BIONJ + NNI tree lnL: {best_lnl:.4f} "
            f"[{time.time() - t_start:.0f}s]")

        init_variants: List[PhyloTree] = []
        for i in range(params.n_init_trees - 1):
            if i % 2 == 0:
                t = best_tree.copy()
                random_nni_perturb(t, n_perturb, rng)
            else:
                # randomized stepwise-addition parsimony trees, like the
                # reference's nParTrees in initCandidateTreeSet
                # (iqtree.cpp:695)
                t = parsimony_stepwise_tree(aln, rng)
            init_variants.append(t)
        # quick-score variants by branch-length optimization only (the
        # reference scores init trees with optimizeBranches(2),
        # iqtree.cpp:672; our variants start from default lengths, so a
        # few more sweeps with a loose tolerance)
        # a -maxtime budget must bound the init phase too, not just the
        # stochastic loop (the reference's doTreeSearch checks
        # params.maxtime throughout): stop admitting work once 60% of
        # the budget is gone — the loop still gets its share
        def init_budget_left() -> bool:
            return (params.max_seconds is None
                    or time.time() - t_start < 0.6 * params.max_seconds)

        scored = []
        for t in init_variants:
            if not init_budget_left():
                log(f"init-variant scoring stopped at {len(scored)}/"
                    f"{len(init_variants)} (time budget)")
                break
            t, l = engine.optimize_branches(t, 8, tol=0.1)
            scored.append((l, t))
        scored.sort(key=lambda e: -e[0])
        for i, (l, t) in enumerate(scored[: params.n_top_init]):
            if i > 0 and not init_budget_left():
                log("init-variant climbing stopped (time budget)")
                break
            r = engine.hill_climb(t, on_tree=on_tree)
            improved = cand.update(r.tree, r.lnl)
            if r.lnl > best_lnl:
                best_lnl, best_tree = r.lnl, r.tree.canonical()
        log(f"Initial candidate set done, best lnL: {best_lnl:.4f} "
            f"[{time.time() - t_start:.0f}s]")

    # ---- stochastic search loop --------------------------------------
    stop = StopRule(
        unsuccess_iteration=params.unsuccess_iteration,
        fixed_iterations=params.fixed_iterations,
        max_seconds=params.max_seconds,
        min_iterations=params.step_iterations if ufboot else 0,
        weibull=params.weibull_max_iterations is not None,
        max_iterations=params.weibull_max_iterations or 1000000,
        confidence=params.stop_confidence,
    )
    boot_converged = ufboot is None

    def keep_searching() -> bool:
        nonlocal boot_converged
        if ufboot is not None and params.fixed_iterations is None:
            it = stop.cur_iteration
            if it >= params.max_boot_iterations:
                return False
            if it > 0 and it % params.step_iterations == 0:
                corr = ufboot.check_convergence()
                boot_converged = corr >= params.min_correlation
                log(f"UFBoot split correlation at iteration {it}: {corr:.4f}")
            if not boot_converged:
                return True
        return not stop.should_stop()

    # ---- checkpoint resume (phase gates like phyloanalysis.cpp:1757) --
    if resumed_search:
        from ..trees.tree import PhyloTree as _PT

        log("Resuming search from checkpoint...")
        best_lnl = float(ckp.get("search.best_lnl"))
        best_tree = _PT.from_newick(ckp.get("search.best_tree"), aln.names)
        cand = CandidateSet(
            max_size=params.max_candidates, pop_size=params.pop_size
        )
        for nwk, score in ckp.get("search.candidates", []):
            cand.update(_PT.from_newick(nwk, aln.names), float(score))
        stop.restore(ckp.get("search.stoprule", {}))
        rng.bit_generator.state = ckp.get("search.rng_state")
        if ufboot is not None and ckp.has("search.ufboot"):
            # a resumed -bb run must not silently lose its bootstrap
            # progress (boot_logl / per-sample best trees)
            ufboot.restore(ckp.get("search.ufboot"), aln.names)
            log(f"Restored UFBoot state "
                f"({len(ufboot._trees)} distinct bootstrap trees)")

    def save_checkpoint():
        if ckp is None:
            return
        ckp.put("search.best_lnl", best_lnl)
        ckp.put("search.best_tree",
                best_tree.to_newick(aln.names, precision=17))
        ckp.put(
            "search.candidates",
            [(t.to_newick(aln.names, precision=17), s)
             for s, t in cand.sorted_entries()],
        )
        ckp.put("search.stoprule", stop.state())
        ckp.put("search.rng_state", rng.bit_generator.state)
        # model params refresh on improvements (reopt_model) — a resumed
        # run must restore the CURRENT parameters, not the start-tree fit
        ckp.put("search.mparams", _mparams_dump(mparams))
        if ufboot is not None:
            ckp.put("search.ufboot", ufboot.state(aln.names))
        ckp.dump(force=False)

    while keep_searching():
        t = perturb(cand.random_candidate(rng))
        frozen = (
            cand.stable_splits(params.num_support_trees)
            if params.fix_stable_splits else None
        )
        r = engine.hill_climb(t, on_tree=on_tree, frozen_splits=frozen)
        improved = r.lnl > best_lnl + 1e-6
        r_lnl = r.lnl
        if improved:
            # model refresh on every improvement (doTreeSearch,
            # iqtree.cpp:2013-2016: "if snni: optimizeModelParameters")
            r_lnl = reopt_model(r.tree, r.lnl, tol=0.01)
        cand.update(r.tree, r_lnl)
        if improved:
            best_lnl, best_tree = r_lnl, r.tree.canonical()
            log(
                f"BETTER TREE FOUND at iteration {stop.cur_iteration + 1}: "
                f"{best_lnl:.4f}"
            )
        stop.iteration_done(improved)
        save_checkpoint()
        if params.verbose >= 1 or stop.cur_iteration % 10 == 0:
            log(
                f"Iteration {stop.cur_iteration} / LogL: {r.lnl:.3f} / "
                f"best: {best_lnl:.3f} / {time.time() - t_start:.1f}s"
            )

    # ---- final model optimization on the best tree -------------------
    log("Final model parameter optimization...")
    ta = TreeArrays.from_tree(best_tree, dtype)
    ta, mparams, best_lnl = fit_model(
        best_tree, ta, rounds=15,
        tol=params.model_eps if params.model_eps else 0.001,
    )
    best_tree.blen = ta.host_blen()
    # multi-host: rank 0's final tree is authoritative so every host
    # writes identical outputs even if tie-breaking diverged (the PLL
    # master-topology broadcast, genericParallelization.c:138-171);
    # no-op single-process
    from ..parallel.multihost import broadcast_host_data, is_multihost

    if is_multihost():
        nwk = broadcast_host_data(best_tree.to_newick(aln.names))
        best_tree = PhyloTree.from_newick(nwk, aln.names)
    subst, rate = opt.unpack(mparams)
    if ckp is not None:
        # separate key: overwriting search.mparams here would make a
        # resumed run start from post-final-optimization parameters and
        # diverge from an uninterrupted run
        ckp.put("search.final_mparams", _mparams_dump(mparams))
        ckp.dump(force=True)
    log(f"BEST SCORE FOUND: {best_lnl:.4f}")
    if engine.profile:
        for line in engine.profile_summary().splitlines():
            log(line)
    return SearchResult(
        best_tree=best_tree,
        best_lnl=best_lnl,
        subst=subst,
        rate=rate,
        iterations=stop.cur_iteration,
        wall_time=time.time() - t_start,
        aln=aln,
        candidates=cand,
        model_opt=opt,
        params_vec=mparams,
        ufboot=ufboot,
    )
