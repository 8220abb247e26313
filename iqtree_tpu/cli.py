"""Command-line driver (the reference's main / runPhyloAnalysis).

Dispatch mirrors /root/reference/pda.cpp:2137 + phyloanalysis.cpp:2453:
read alignment -> (model selection) -> tree reconstruction or fixed-tree
evaluation -> reports (.iqtree, .treefile, .log, .sitelh).
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    from .config import parse_args

    cfg = parse_args(argv)
    command = "iqtree-tpu " + " ".join(argv)

    import jax
    import jax.numpy as jnp

    if cfg.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if cfg.f64 else jnp.float32

    prefix = cfg.out_prefix
    log_lines: List[str] = []

    def log(msg: str = ""):
        log_lines.append(str(msg))
        if not cfg.quiet:
            print(msg, flush=True)

    t0 = time.time()
    from . import __version__

    log(f"IQ-TREE-TPU {__version__} starting: {command}")
    log(f"Devices: {jax.devices()}")

    from .io.alignment import read_alignment

    aln = read_alignment(cfg.aln_file, seq_type=cfg.seq_type)
    log(
        f"Alignment: {aln.n_taxa} sequences, {aln.n_sites} sites, "
        f"{aln.n_patterns} patterns ({aln.states.seq_type})"
    )

    from .models.factory import default_model, parse_model_string

    model_str = cfg.model or default_model(aln)

    if cfg.model_test:
        from .search.model_select import run_model_selection

        best, table = run_model_selection(aln, dtype=dtype, log=log)
        log(f"Best-fit model: {best} chosen according to BIC")
        model_str = best
        with open(prefix + ".model", "w") as f:
            f.write(table)
        if cfg.model_test_only:
            _finish(prefix, log_lines, t0, log)
            return 0

    result = None
    if cfg.fix_topology:
        result = _run_fixed_topology(cfg, aln, model_str, dtype, log)
    else:
        result = _run_search(cfg, aln, model_str, dtype, log)

    tree, subst, rate, lnl, iters, pattern_lnl = result

    if cfg.ufboot > 0 and not cfg.fix_topology:
        log("NOTE: UFBoot support records during search; see .splits.nex")

    # ---- outputs -----------------------------------------------------
    with open(prefix + ".treefile", "w") as f:
        f.write(tree.to_newick(aln.names) + "\n")
    from .io.report import write_report, write_site_lnl

    write_report(
        prefix + ".iqtree",
        aln,
        subst,
        rate,
        tree,
        lnl,
        command,
        time.time() - t0,
        iterations=iters,
    )
    if cfg.write_site_lnl and pattern_lnl is not None:
        write_site_lnl(prefix + ".sitelh", aln, pattern_lnl)
    log(f"BEST SCORE FOUND : {lnl:.4f}")
    log(f"Total wall-clock time used: {time.time() - t0:.3f} sec")
    log("")
    log(f"  IQ-TREE report:                {prefix}.iqtree")
    log(f"  Maximum-likelihood tree:       {prefix}.treefile")
    log(f"  Screen log file:               {prefix}.log")
    _finish(prefix, log_lines, t0, log)
    return 0


def _finish(prefix, log_lines, t0, log):
    with open(prefix + ".log", "w") as f:
        f.write("\n".join(log_lines) + "\n")


def _run_fixed_topology(cfg, aln, model_str, dtype, log):
    """-te: fixed topology; optimize model (+ branch lengths unless
    -blfix)."""
    import jax
    import jax.numpy as jnp

    from .engine.grad import loglik
    from .engine.likelihood import SiteData, TreeArrays
    from .models.factory import parse_model_string
    from .models.optimize import ModelOptimizer, fit_model_step, optimize_model_and_branches
    from .trees.tree import PhyloTree

    rng = np.random.default_rng(cfg.seed)
    tree = PhyloTree.from_newick(open(cfg.user_tree).read(), aln.names, rng=rng)
    subst, rate = parse_model_string(model_str, aln)
    opt = ModelOptimizer(subst, rate, dtype=dtype)
    site = SiteData.from_alignment(aln, dtype)
    ta = TreeArrays.from_tree(tree, dtype)
    if cfg.fix_branch_lengths:
        params = opt.init_params()
        params, lnl = jax.jit(
            lambda t, p: fit_model_step(opt, t, site, p, 100)
        )(ta, params)
        log(f"Optimal log-likelihood: {float(lnl):.4f}")
    else:
        ta, params, lnl = optimize_model_and_branches(opt, ta, site, tol=0.001)
        tree.blen = np.asarray(ta.blen, dtype=np.float64)
        log(f"Optimal log-likelihood: {float(lnl):.4f}")
    subst, rate = opt.unpack(params)
    ma = jax.jit(opt.build)(params)
    _, pattern_lnl = jax.jit(loglik)(ta, ma, site)
    return tree, subst, rate, float(lnl), 0, np.asarray(pattern_lnl)


def _run_search(cfg, aln, model_str, dtype, log):
    import jax

    from .engine.grad import loglik
    from .engine.likelihood import SiteData, TreeArrays
    from .search.driver import SearchParams, run_search

    sp = SearchParams(
        model=model_str,
        seed=cfg.seed,
        n_init_trees=cfg.n_init_trees,
        n_top_init=cfg.n_top_init,
        pers=cfg.pers,
        unsuccess_iteration=cfg.unsuccess_iteration,
        fixed_iterations=cfg.n_iterations,
        max_seconds=cfg.max_seconds,
        dtype=dtype,
        start_tree=open(cfg.user_tree).read() if cfg.user_tree else None,
        log=log,
    )
    res = run_search(aln, sp)
    site = SiteData.from_alignment(aln, dtype)
    ma = jax.jit(res.model_opt.build)(res.params_vec)
    ta = TreeArrays.from_tree(res.best_tree, dtype)
    _, pattern_lnl = jax.jit(loglik)(ta, ma, site)
    return (
        res.best_tree,
        res.subst,
        res.rate,
        res.best_lnl,
        res.iterations,
        np.asarray(pattern_lnl),
    )


if __name__ == "__main__":
    sys.exit(main())
