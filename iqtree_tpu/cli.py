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


def _install_crash_handlers(log_lines: List[str], prefix: str):
    """Crash resilience (reference funcAbort, pda.cpp:2221-2225): on
    SIGSEGV/SIGFPE/SIGILL/SIGBUS/SIGABRT print a native traceback plus
    the tail of the run log, and flush the .log file so the crash
    context is not lost."""
    import faulthandler
    import signal

    faulthandler.enable()

    def on_signal(signum, frame):
        sys.stderr.write(
            f"\n*** iqtree-tpu CRASHES WITH SIGNAL "
            f"{signal.Signals(signum).name} ***\n*** last log lines:\n"
        )
        for ln in log_lines[-15:]:
            sys.stderr.write("    " + ln + "\n")
        sys.stderr.write(f"*** full log: {prefix}.log\n")
        try:
            with open(prefix + ".log", "w") as f:
                f.write("\n".join(log_lines) + "\n")
        except OSError:
            pass
        signal.signal(signum, signal.SIG_DFL)
        signal.raise_signal(signum)

    for sig in (signal.SIGSEGV, signal.SIGFPE, signal.SIGILL,
                signal.SIGBUS, signal.SIGABRT):
        try:
            signal.signal(sig, on_signal)
        except (OSError, ValueError):
            pass  # not installable on this platform / non-main thread


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    from .config import parse_args

    cfg = parse_args(argv)
    command = "iqtree-tpu " + " ".join(argv)

    import os as _os

    import jax
    import jax.numpy as jnp

    # IQTREE_TPU_PLATFORM=cpu forces the backend (e.g. differential runs
    # beside a busy TPU); must be a config update, not an env var — the
    # environment may pin JAX_PLATFORMS before we are ever imported
    if _os.environ.get("IQTREE_TPU_PLATFORM"):
        jax.config.update("jax_platforms",
                          _os.environ["IQTREE_TPU_PLATFORM"])

    from .utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    if cfg.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if cfg.f64 else jnp.float32

    # -blmin/-blmax: global branch-length bounds; must be installed
    # before anything is traced (jit closures bake the bounds in)
    if cfg.min_branch_length != 1e-6 or cfg.max_branch_length != 100.0:
        from .engine.derivatives import set_blen_bounds

        set_blen_bounds(cfg.min_branch_length, cfg.max_branch_length)
    if cfg.optimize_mixmodel_weight:
        from .models import mixture

        mixture.FORCE_OPT_WEIGHTS = True

    prefix = cfg.out_prefix
    log_lines: List[str] = []

    def log(msg: str = ""):
        log_lines.append(str(msg))
        if not cfg.quiet:
            print(msg, flush=True)

    _install_crash_handlers(log_lines, prefix)

    t0 = time.time()
    from . import __version__

    log(f"IQ-TREE-TPU {__version__} starting: {command}")
    log(f"Devices: {jax.devices()}")

    # -nt: parallelism degree = number of TPU devices (the reference's
    # OpenMP thread count maps to the `sites` mesh axis, SURVEY.md §2c).
    # 0 = all visible devices; a 1-device mesh stays on the fast
    # unsharded path.
    from . import parallel

    if parallel.init_multihost():
        # multi-host pod slice (SURVEY §2c P6): global mesh over every
        # process's devices; lnL psum rides ICI in-slice, DCN across
        log(f"Multi-host run: process {jax.process_index()} of "
            f"{jax.process_count()}")
    n_dev = cfg.n_threads if cfg.n_threads > 0 else len(jax.devices())
    if n_dev > 1:
        mesh = parallel.make_mesh(min(n_dev, len(jax.devices())))
        parallel.set_mesh(mesh)
        log(f"Pattern-axis sharding over {mesh.size} devices")

    # ---- utility modes (no alignment; pda.cpp:2436-2480 dispatch) -----
    if (cfg.consensus_file or cfg.network_file or cfg.sup_target or cfg.rf_file
            or cfg.random_tree_n or cfg.pd_k or cfg.pd_max_k
            or cfg.pd_budget or cfg.gene_pvalue_file or cfg.ncbi_taxid
            or cfg.ngs_file or cfg.branch_stats or cfg.scale_blen
            or cfg.eco_dag_file):
        rc = _run_utility(cfg, log)
        _finish(prefix, log_lines, t0, log)
        return rc
    if not cfg.aln_file:
        log("ERROR: -s <alignment> is required for this mode")
        return 2

    # checkpoint gate (reference: pda.cpp:2187-2210)
    from .utils.checkpoint import Checkpoint

    ckp = Checkpoint(prefix + ".ckp.gz", dump_interval=cfg.ckp_interval)
    if ckp.load():
        if ckp.is_finished("all") and not cfg.redo:
            log(
                f"Checkpoint ({ckp.path}) indicates a finished run; use "
                "-redo to overwrite."
            )
            return 2
        if cfg.redo:
            ckp.data = {}
        else:
            log(f"Resuming from checkpoint {ckp.path}")
            prev_cmd = ckp.get("command")
            if prev_cmd and prev_cmd != command:
                # reference warns when the restored run used different
                # options (pda.cpp:2357-2378 checkCommandLine)
                log("WARNING: Command-line differs from the checkpoint:")
                log(f"WARNING:   checkpoint: {prev_cmd}")
                log(f"WARNING:   current:    {command}")
                log("WARNING: Continuing anyway; use -redo to restart")
    ckp.put("command", command)

    from .io.alignment import read_alignment

    seq_type = cfg.seq_type
    gcode = cfg.genetic_code
    if seq_type and seq_type.upper().startswith("CODON"):
        # -st CODON / CODON2 / ... (reference: -st CODON with code id)
        if len(seq_type) > 5:
            gcode = int(seq_type[5:])
        seq_type = "CODON"

    if cfg.partition_file:
        rc = _run_partitioned(cfg, seq_type, gcode, dtype, log, command, t0)
        ckp.mark_finished("all")
        ckp.dump(force=True)
        _finish(prefix, log_lines, t0, log)
        return rc

    aln = read_alignment(cfg.aln_file, seq_type=seq_type, genetic_code=gcode)
    if cfg.freq_const_patterns:
        # -fconst: append constant sites (alignment.cpp addConstPatterns)
        aln = aln.add_const_patterns(cfg.freq_const_patterns)
        log(f"Added constant sites (-fconst {cfg.freq_const_patterns})")
    log(
        f"Alignment: {aln.n_taxa} sequences, {aln.n_sites} sites, "
        f"{aln.n_patterns} patterns ({aln.states.seq_type})"
    )

    if cfg.outgroup:
        # -o: display rooting — taxon 0's pendant edge is where printed
        # trees trifurcate (trees/tree.py to_newick), so moving the
        # outgroup to index 0 roots every output tree on it (the
        # reference's root_outgroup semantics, tools.cpp '-o')
        from .io.alignment import Alignment as _Aln

        og = cfg.outgroup.split(",")[0]
        if og not in aln.names:
            log(f"ERROR: outgroup taxon {og} not found in alignment")
            return 2
        k = aln.names.index(og)
        perm = [k] + [i for i in range(aln.n_taxa) if i != k]
        aln = _Aln(
            names=[aln.names[i] for i in perm],
            patterns=aln.patterns[perm],
            pattern_freq=aln.pattern_freq,
            site_to_pattern=aln.site_to_pattern,
            states=aln.states,
        )
        log(f"Rooting output trees at outgroup {og}")

    # ---- alignment utility modes (pda.cpp:2420-2427 dispatch) ---------
    if cfg.site_lnl_file or cfg.mprob_ref or cfg.pars_multistate:
        if cfg.site_lnl_file:
            from .analysis.guided_bootstrap import (
                guided_bootstrap,
                read_site_lnl_file,
            )

            site_lnl = read_site_lnl_file(cfg.site_lnl_file)
            guided_bootstrap(aln, site_lnl, prefix, log=log)
        if cfg.mprob_ref:
            from .analysis.guided_bootstrap import multinomial_prob_of

            ref = read_alignment(cfg.mprob_ref, seq_type=seq_type,
                                 genetic_code=gcode)
            p = multinomial_prob_of(aln, ref)
            with open(prefix + ".mprob", "w") as f:
                f.write(f"{p:.10g}\n")
            log(f"Log multinomial probability of {cfg.aln_file} given "
                f"{cfg.mprob_ref}: {p:.6f}")
        if cfg.pars_multistate:
            # -tina: multistate parsimony score on the -t tree
            # (doParsMultiState, parsmultistate.cpp)
            from .engine.parsimony import parsimony_score
            from .trees.tree import PhyloTree

            if not cfg.user_tree:
                log("ERROR: -tina needs -t <tree>")
                return 2
            t = PhyloTree.from_newick(open(cfg.user_tree).read(), aln.names)
            score = parsimony_score(t, aln)
            log(f"Parsimony score is: {int(score)}")
        _finish(prefix, log_lines, t0, log)
        return 0

    # remove identical sequences for plain searches (reference default,
    # PhyloTree::removeIdenticalSeqs, phyloanalysis.cpp:2545); they are
    # re-inserted next to their twins in the output tree.  Kept with
    # -keep-ident, fixed topologies, site models, or bootstrap/branch
    # tests (supports must cover all taxa).
    ident_pairs = []
    orig_aln = aln
    if (not cfg.keep_identical and not cfg.fix_topology
            and not cfg.site_freq_file and cfg.ufboot == 0
            and cfg.std_bootstrap == 0 and cfg.alrt == 0
            and cfg.lbp == 0 and not cfg.abayes and not cfg.alrt_parametric
            and not cfg.treeset_file):
        keep, ident_pairs = aln.identical_groups()
        if ident_pairs:
            log(f"NOTE: {len(ident_pairs)} identical sequences will be "
                "ignored during the analysis and re-inserted at the end")
            for r, t in ident_pairs:
                log(f"NOTE: {r} (identical to {t}) is ignored")
            aln = aln.subset_taxa(keep)

    from .models.factory import default_model, parse_model_string

    model_str = cfg.model or default_model(aln)

    if cfg.model_test:
        from .search.model_select import run_model_selection

        # model-selection result is cached in the checkpoint; -mredo
        # forces a rerun (reference model_test_again, tools.cpp:1789,
        # CheckpointFactory caching in phylotesting.cpp testModel)
        cached = ckp.get("modeltest.best") if ckp is not None else None
        if cached and not cfg.model_test_redo and not cfg.redo:
            best = cached
            table = ckp.get("modeltest.table", "")
            log(f"CHECKPOINT: best-fit model {best} restored "
                "(-mredo to re-test)")
        else:
            best, table = run_model_selection(
                aln, dtype=dtype, log=log,
                criterion=cfg.model_test_criterion,
                model_set=cfg.model_set, model_subset=cfg.model_subset,
                freq_set=cfg.freq_set,
                extra_models=cfg.model_add,
                rate_scan=cfg.model_test_rate_scan,
                min_rate_cats=cfg.min_rate_cats,
                max_rate_cats=cfg.max_rate_cats,
            )
            if ckp is not None:
                ckp.put("modeltest.best", best)
                ckp.put("modeltest.table", table)
                ckp.dump(force=True)
        log(f"Best-fit model: {best} chosen according to "
            f"{cfg.model_test_criterion}")
        model_str = best
        with open(prefix + ".model", "w") as f:
            f.write(table)
        if cfg.model_test_only:
            _finish(prefix, log_lines, t0, log)
            return 0

    if cfg.write_site_freq and not cfg.site_freq_file:
        log("WARNING: -wsf has no effect without -fs (the model carries "
            "no site-specific frequencies)")

    # ---- -bo/-bc: bootstrap replicates WITHOUT the original-alignment
    # ML tree (runStandardBootstrap with compute_ml_tree=false,
    # tools.cpp:2044-2077, phyloanalysis.cpp:2222) -----------------------
    if cfg.std_bootstrap > 0 and cfg.std_boot_mode in ("only", "consensus"):
        from .search.driver import SearchParams, run_search
        from .trees.splits import SplitCounter, consensus_tree, map_supports

        rng = np.random.default_rng(cfg.seed + 1000)
        counter = SplitCounter(aln.n_taxa)
        boot_trees = []
        for b in range(cfg.std_bootstrap):
            freqs = aln.bootstrap_pattern_freq(rng)
            sp = SearchParams(
                model=model_str, seed=cfg.seed + b + 1,
                n_init_trees=4, n_top_init=2,
                unsuccess_iteration=min(cfg.unsuccess_iteration, 50),
                fixed_iterations=cfg.n_iterations,
                dtype=dtype, log=lambda s: None, pattern_freq=freqs,
            )
            r = run_search(aln, sp)
            counter.add_tree(r.best_tree)
            boot_trees.append(r.best_tree)
            log(f"Bootstrap replicate {b + 1}/{cfg.std_bootstrap}: "
                f"lnL {r.best_lnl:.3f}")
        with open(prefix + ".boottrees", "w") as f:
            for t in boot_trees:
                f.write(t.to_newick(aln.names) + "\n")
        log(f"  Bootstrap trees:               {prefix}.boottrees")
        if cfg.std_boot_mode == "consensus":
            cons, _ = consensus_tree(counter)
            with open(prefix + ".contree", "w") as f:
                f.write(cons.to_newick(
                    aln.names, support=map_supports(cons, counter)) + "\n")
            log(f"  Consensus tree:                {prefix}.contree")
        _finish(prefix, log_lines, t0, log)
        return 0

    result = None
    if cfg.site_freq_file:
        # -fs: site-specific state-frequency model (+SSF / ModelSet,
        # modelfactory.cpp:301-345); replaces aln with the class-pure
        # regrouped alignment (regroupSitePattern semantics)
        aln, result = _run_ssf(cfg, aln, model_str, dtype, log)
    elif cfg.fix_topology:
        result = _run_fixed_topology(cfg, aln, model_str, dtype, log)
    else:
        result = _run_search(cfg, aln, model_str, dtype, log, ckp)

    tree, subst, rate, lnl, iters, pattern_lnl, ufboot = result

    if cfg.site_freq_file and (cfg.alrt or cfg.lmap or cfg.write_site_rates
                               or cfg.std_bootstrap):
        log("WARNING: -alrt/-lmap/-wsr/-b are not supported together with "
            "-fs; skipping those analyses")
        cfg.alrt = cfg.lmap = cfg.std_bootstrap = 0
        cfg.write_site_rates = False

    # ---- standard bootstrap (-b): full re-analysis per replicate ------
    # (runStandardBootstrap, phyloanalysis.cpp:2222; each replicate is the
    # same compiled search program with resampled pattern weights)
    std_boot_support = None
    if cfg.std_bootstrap > 0 and not cfg.fix_topology:
        from .search.driver import SearchParams, run_search
        from .trees.splits import SplitCounter, consensus_tree, map_supports

        rng = np.random.default_rng(cfg.seed + 1000)
        counter = SplitCounter(aln.n_taxa)
        boot_trees = []
        for b in range(cfg.std_bootstrap):
            freqs = aln.bootstrap_pattern_freq(rng)
            sp = SearchParams(
                model=cfg.model or model_str,
                seed=cfg.seed + b + 1,
                n_init_trees=4,
                n_top_init=2,
                unsuccess_iteration=min(cfg.unsuccess_iteration, 50),
                dtype=dtype,
                log=lambda s: None,
                pattern_freq=freqs,
            )
            r = run_search(aln, sp)
            counter.add_tree(r.best_tree)
            boot_trees.append(r.best_tree)
            log(f"Bootstrap replicate {b + 1}/{cfg.std_bootstrap}: "
                f"lnL {r.best_lnl:.3f}")
        with open(prefix + ".boottrees", "w") as f:
            for t in boot_trees:
                f.write(t.to_newick(aln.names) + "\n")
        cons, _ = consensus_tree(counter)
        with open(prefix + ".contree", "w") as f:
            f.write(cons.to_newick(aln.names,
                                   support=map_supports(cons, counter)) + "\n")
        std_boot_support = map_supports(tree, counter)
        log(f"  Bootstrap trees:               {prefix}.boottrees")
        log(f"  Consensus tree:                {prefix}.contree")

    # ---- branch tests (-alrt/-lbp/-abayes; phylotree.cpp:4058
    # testAllBranches — label order SH-aLRT/LBP/aLRT/aBayes :4078-4090) --
    alrt_labels = None
    if cfg.alrt > 0 or cfg.lbp > 0 or cfg.alrt_parametric or cfg.abayes:
        import jax

        from .engine.branch_tests import test_all_branches
        from .engine.likelihood import SiteData, TreeArrays
        from .models.factory import parse_model_string
        from .models.optimize import ModelOptimizer

        wanted = []
        if cfg.alrt > 0:
            wanted.append(f"SH-aLRT ({cfg.alrt} replicates)")
        if cfg.lbp > 0:
            wanted.append(f"local-BP ({cfg.lbp} replicates)")
        if cfg.alrt_parametric:
            wanted.append("parametric aLRT")
        if cfg.abayes:
            wanted.append("aBayes")
        log(f"Testing branches with {', '.join(wanted)}...")
        subst2, rate2 = subst, rate
        opt2 = ModelOptimizer(subst2, rate2, dtype=dtype)
        ma2 = jax.jit(opt2.build)(opt2.init_params())
        bt = test_all_branches(
            TreeArrays.from_tree(tree, dtype),
            ma2,
            SiteData.from_alignment(aln, dtype, asc=subst2.asc),
            pattern_lnl,
            lnl,
            aln.n_sites,
            # 0 when only parametric aLRT/aBayes are wanted: the RELL
            # resampling is skipped entirely (reference skips it too when
            # reps == lbp_reps == 0, phylotree.cpp:4013)
            reps=max(cfg.alrt, cfg.lbp),
            rng=np.random.default_rng(cfg.seed),
            host_tree=tree,
        )
        alrt_labels = bt.labels(
            sh=cfg.alrt > 0, lbp=cfg.lbp > 0,
            alrt=cfg.alrt_parametric, abayes=cfg.abayes,
        )

    # ---- WH-test (-m WHTEST; phyloanalysis.cpp:1886, whtest/) ---------
    whtest_section = None
    if cfg.whtest:
        from .analysis.whtest import run_whtest

        log("")
        log("Testing model homogeneity by Weiss & von Haeseler (2003)...")
        wh_alpha = rate.alpha if getattr(rate, "has_gamma", False) else 100.0
        wh = run_whtest(aln, alpha=wh_alpha, n_sim=cfg.whtest_sim,
                        seed=cfg.seed, log=log)
        whtest_section = wh.report()
        with open(prefix + ".whtest", "w") as f:
            f.write(whtest_section)
        log(whtest_section)
        log(f"  WH-test report:                {prefix}.whtest")

    # ---- likelihood mapping (-lmap; quartet.cpp doLikelihoodMapping) --
    if cfg.lmap > 0 or cfg.lmap_cluster_file:
        import jax

        from .engine.likelihood import SiteData, TreeArrays
        from .engine.quartet import likelihood_mapping, read_lmap_clusters
        from .models.optimize import ModelOptimizer

        clusters = None
        if cfg.lmap_cluster_file:
            clusters = read_lmap_clusters(cfg.lmap_cluster_file, aln.names)
            log(f"Likelihood mapping with {clusters.n_groups} clusters "
                f"({', '.join(clusters.names)}); "
                f"{clusters.unique_quartets()} unique quartets")
        log(f"Likelihood mapping with "
            f"{cfg.lmap or 'all unique'} quartets...")
        opt_lm = ModelOptimizer(subst, rate, dtype=dtype)
        ma_lm = jax.jit(opt_lm.build)(opt_lm.init_params())
        lm = likelihood_mapping(
            ma_lm,
            SiteData.from_alignment(aln, dtype, asc=getattr(subst, "asc", False)),
            aln.n_taxa,
            cfg.lmap,
            np.random.default_rng(cfg.seed),
            clusters=clusters,
        )
        lm.write_svg(prefix + ".lmap.svg")
        lm.write_eps(prefix + ".lmap.eps")
        log(lm.summary())
        log(f"  Likelihood mapping plot:       {prefix}.lmap.svg / .eps")
        if cfg.write_quartet_lh:
            with open(prefix + ".quartetlh", "w") as f:
                for q, l, w in zip(lm.quartets, lm.lnls, lm.weights):
                    f.write(
                        "\t".join(map(str, q)) + "\t"
                        + "\t".join(f"{x:.6f}" for x in l) + "\t"
                        + "\t".join(f"{x:.6f}" for x in w) + "\n"
                    )

    # ---- user-tree evaluation + topology tests (-z/-zb/-zw/-au) -------
    # (evaluateTrees, phylotesting.cpp:2053; report section
    # phyloanalysis.cpp:860-984)
    topotest_section = None
    if cfg.treeset_file:
        from .analysis.topotest import report_section, run_topotest

        if 0 < cfg.topotest_replicates < 1000:
            log("ERROR: -zb requires at least 1000 replicates")
            return 2
        tt = run_topotest(cfg, aln, subst, rate, dtype, log=log)
        topotest_section = report_section(tt, prefix)
        log(f"  User trees (with lnL):         {prefix}.trees")
        if cfg.print_tree_lh:
            log(f"  User-tree log-likelihoods:     {prefix}.treelh")

    # ---- outputs -----------------------------------------------------
    support = None
    if ufboot is not None:
        support = ufboot.supports_for(tree)
        if cfg.write_boot_trees:
            from .utils.gzout import out_name

            ufboot.write_ufboot(prefix + ".ufboot", aln.names,
                                with_lengths=cfg.write_boot_tree_blens,
                                compress=cfg.compress_output)
            log(f"  UFBoot trees:                  "
                f"{out_name(prefix + '.ufboot', cfg.compress_output)}")
        ufboot.write_splits_nex(prefix + ".splits.nex", aln.names)
        contree = ufboot.consensus()
        with open(prefix + ".contree", "w") as f:
            # -wbl: print branch lengths in the consensus tree
            # (params.print_branch_lengths, tools.cpp:2111)
            f.write(
                contree.to_newick(
                    aln.names, support=ufboot.supports_for(contree),
                    with_lengths=cfg.print_branch_lengths,
                )
                + "\n"
            )
        log(f"  Split support values:          {prefix}.splits.nex")
        log(f"  Consensus tree:                {prefix}.contree")
    if support is None and std_boot_support is not None:
        support = std_boot_support
    if alrt_labels is not None and support is not None:
        # reference label order: SH-aLRT/UFboot
        support = {
            v: f"{alrt_labels.get(v, '')}/{support.get(v, '')}"
            for v in set(alrt_labels) | set(support)
        }
    elif alrt_labels is not None:
        support = alrt_labels
    out_nwk = tree.to_newick(aln.names, support=support)
    if ident_pairs:
        out_nwk = _graft_identical(out_nwk, ident_pairs)
    with open(prefix + ".treefile", "w") as f:
        f.write(out_nwk + "\n")
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
        extra_sections=[topotest_section] if topotest_section else None,
    )
    if cfg.write_site_lnl and pattern_lnl is not None:
        if cfg.wsl_mode:
            # -wslr/-wslm/-wslmr per-class columns
            # (printSiteLhCategory, phylotesting.cpp:243)
            import jax

            from .engine.likelihood import (SiteData, TreeArrays,
                                            pattern_lnl_categories)
            from .io.report import write_site_lnl_category
            from .models.mixture import MixtureModel
            from .models.optimize import ModelOptimizer

            mode = cfg.wsl_mode
            is_mix = isinstance(subst, MixtureModel)
            n_mix = subst.n_mix if is_mix else 1
            if not is_mix and mode != "RATECAT":
                log("WARNING: switch now to '-wslr' as it is the only "
                    "option for non-mixture model")
                mode = "RATECAT"
            if (is_mix and mode == "MIXTURE_RATECAT"
                    and subst.fused_with_rate):
                log("WARNING: -wslmr is not suitable for fused mixture "
                    "model, switch now to -wslm")
                mode = "MIXTURE"
            opt_w = ModelOptimizer(subst, rate, dtype=dtype)
            ma_w = jax.jit(opt_w.build)(opt_w.init_params())
            cat = jax.jit(pattern_lnl_categories)(
                TreeArrays.from_tree(tree, dtype), ma_w,
                SiteData.from_alignment(aln, dtype,
                                        asc=getattr(subst, "asc", False)),
            )
            n_rate = ma_w.ncat // max(n_mix, 1)
            rr = np.asarray(ma_w.rates)
            write_site_lnl_category(
                prefix + ".sitelh", aln, pattern_lnl, np.asarray(cat),
                mode, rr[:n_rate] if not is_mix else rr[:n_rate],
                n_mix=n_mix, n_rate=n_rate,
            )
        else:
            write_site_lnl(prefix + ".sitelh", aln, pattern_lnl,
                           compress=cfg.compress_output)
    if cfg.write_site_rates:
        import jax

        from .engine.likelihood import SiteData, TreeArrays
        from .engine.site_rates import posterior_mean_rates, write_site_rates
        from .models.optimize import ModelOptimizer

        opt_r = ModelOptimizer(subst, rate, dtype=dtype)
        ma_r = jax.jit(opt_r.build)(opt_r.init_params())
        rates_p, _ = jax.jit(posterior_mean_rates)(
            TreeArrays.from_tree(tree, dtype),
            ma_r,
            SiteData.from_alignment(aln, dtype,
                                    asc=getattr(subst, "asc", False)),
        )
        write_site_rates(prefix + ".rate", aln, np.asarray(rates_p))
        log(f"  Site rates:                    {prefix}.rate")
    if cfg.mh_rates and not cfg.site_freq_file:
        # -mh: ML site rates (Meyer & von Haeseler 2003) -> .mhrate;
        # -mhcat K adds the RateMeyerDiscrete k-means categorization
        # (the reference's -mh parsing is commented out in 1.4.3,
        # tools.cpp:1814, but the machinery is ratemeyerhaeseler.cpp /
        # ratemeyerdiscrete.cpp and usage still documents it)
        import jax

        from .engine.likelihood import SiteData, TreeArrays
        from .engine.site_rates import (
            discrete_ml_site_rates,
            ml_site_rates,
            write_site_rates,
        )
        from .models.optimize import ModelOptimizer

        opt_m = ModelOptimizer(subst, rate, dtype=dtype)
        ma_m = jax.jit(opt_m.build)(opt_m.init_params())
        ta_m = TreeArrays.from_tree(tree, dtype)
        sd_m = SiteData.from_alignment(aln, dtype,
                                       asc=getattr(subst, "asc", False))
        if cfg.mh_cats > 0:
            cat_rates, cats, ptn_rates = discrete_ml_site_rates(
                ta_m, ma_m, sd_m, cfg.mh_cats,
                use_log=not cfg.mcat_nolog,
                per_site_weights=cfg.mcat_site,
            )
            write_site_rates(
                prefix + ".mhrate", aln, ptn_rates, categories=cats,
                method=f"Meyer & von Haeseler (2003), discretized into "
                       f"{cfg.mh_cats} categories by k-means",
            )
            log("Discrete category rates: "
                + " ".join(f"{r:.4f}" for r in cat_rates))
        else:
            mh = np.asarray(jax.jit(ml_site_rates)(ta_m, ma_m, sd_m))
            write_site_rates(prefix + ".mhrate", aln, mh,
                             method="Meyer & von Haeseler (2003) ML")
        log(f"  MH site rates:                 {prefix}.mhrate")
    log(f"BEST SCORE FOUND : {lnl:.4f}")
    log(f"Total wall-clock time used: {time.time() - t0:.3f} sec")
    log("")
    log(f"  IQ-TREE report:                {prefix}.iqtree")
    log(f"  Maximum-likelihood tree:       {prefix}.treefile")
    log(f"  Screen log file:               {prefix}.log")
    ckp.mark_finished("all")
    ckp.dump(force=True)
    _finish(prefix, log_lines, t0, log)
    return 0


def _graft_identical(nwk: str, pairs) -> str:
    """Re-insert removed duplicate taxa next to their twins in a newick
    string (PhyloTree::reinsertIdenticalSeqs, phylotree.cpp:4344): the
    twin leaf "T:len" becomes "(T:0,R:0):len"."""
    import re as _re

    for removed, twin in pairs:
        pat = _re.compile(
            r"([(,])" + _re.escape(twin) + r":([0-9eE.+-]+)"
        )
        m = pat.search(nwk)
        if m:
            nwk = (nwk[: m.start()] + m.group(1) + "(" + twin + ":0,"
                   + removed + ":0):" + m.group(2) + nwk[m.end():])
        else:  # twin itself was grafted already: attach to its 0-edge
            pat2 = _re.compile(r"([(,])" + _re.escape(twin) + r":0")
            m2 = pat2.search(nwk)
            if m2:
                nwk = (nwk[: m2.start()] + m2.group(1) + "(" + twin
                       + ":0," + removed + ":0):0" + nwk[m2.end():])
    return nwk


def _run_utility(cfg, log) -> int:
    """Tree utility modes: -con, -sup, -rf/-rf_all, -r, -k (PD)."""
    from .analysis import treeutils

    prefix = cfg.prefix or "iqtree_tpu_util"
    if cfg.ngs_file:
        # -sf: NGS position-specific rate analysis (runNGSAnalysis,
        # ngs.cpp:1103)
        from .analysis.ngs import run_ngs_analysis

        run_ngs_analysis(cfg.ngs_file, prefix, log=log)
        return 0
    if cfg.branch_stats:
        if not cfg.user_tree:
            log("ERROR: -stats needs -t <tree>")
            return 2
        treeutils.run_branch_stats(cfg.user_tree, prefix, log=log)
        return 0
    if cfg.scale_blen:
        if not cfg.user_tree:
            log("ERROR: -scale needs -t <tree>")
            return 2
        treeutils.run_scale_branch_length(cfg.user_tree, cfg.scale_blen,
                                          prefix, log=log)
        return 0
    if cfg.ncbi_taxid:
        # -dmp TAXID: NCBI taxonomy extraction (pda.cpp:2415)
        from .analysis.ncbitree import ncbi_subtree_newick

        if not cfg.user_tree:
            log("ERROR: -dmp needs -t <nodes.dmp>")
            return 2
        nwk = ncbi_subtree_newick(
            cfg.user_tree, cfg.ncbi_taxid, taxon_rank=cfg.ncbi_rank,
            ignore_rank=cfg.ncbi_ignore, names_dmp=cfg.ncbi_names, log=log,
        )
        out = cfg.user_tree + ".tree" if not cfg.prefix else prefix + ".tree"
        with open(out, "w") as f:
            f.write(nwk + "\n")
        log(f"NCBI tree printed to {out}")
        return 0
    if cfg.consensus_file:
        treeutils.run_consensus(cfg.consensus_file, prefix,
                                minsup=cfg.min_support, log=log,
                                burnin=cfg.tree_burnin,
                                max_count=cfg.tree_max_count)
        return 0
    if cfg.network_file:
        treeutils.run_consensus_network(
            cfg.network_file, prefix, cutoff=cfg.min_support, log=log,
            burnin=cfg.tree_burnin, max_count=cfg.tree_max_count,
            precision=cfg.numeric_precision or 6,
        )
        return 0
    if cfg.sup_target:
        if not cfg.user_tree:
            log("ERROR: -sup needs -t <trees file>")
            return 2
        treeutils.run_support_assignment(cfg.sup_target, cfg.user_tree,
                                         prefix, log=log,
                                         burnin=cfg.tree_burnin,
                                         max_count=cfg.tree_max_count)
        return 0
    if cfg.rf_file:
        treeutils.run_rf_distance(cfg.rf_file, prefix,
                                  tree_file2=cfg.rf_file2, log=log)
        return 0
    if cfg.random_tree_n:
        rng = np.random.default_rng(cfg.seed)
        t = treeutils.generate_random_tree(
            cfg.random_tree_n, rng, cfg.random_tree_mode,
            min_len=cfg.random_tree_min_len,
            mean_len=cfg.random_tree_mean_len,
            max_len=cfg.random_tree_max_len,
        )
        names = [f"t{i}" for i in range(cfg.random_tree_n)]
        out = prefix + ".treefile"
        with open(out, "w") as f:
            f.write(t.to_newick(names) + "\n")
        log(f"Random {cfg.random_tree_mode} tree with "
            f"{cfg.random_tree_n} taxa written to {out}")
        return 0
    if cfg.eco_dag_file:
        # ECOpd (processECOpd, pda.cpp:2417)
        from .analysis.pdnetwork import run_ecopd

        if not (cfg.user_tree and cfg.pd_k):
            log("ERROR: ECOpd needs -t <tree>, -eco <food web>, -k <size>")
            return 2
        run_ecopd(cfg.user_tree, cfg.eco_dag_file, cfg.pd_k, prefix,
                  diet_frac=cfg.eco_diet, log=log)
        return 0
    if cfg.gene_pvalue_file:
        # GSS: gene-set selection (runGSSAnalysis, gss.cpp:329)
        from .analysis.pdnetwork import run_gss

        if not (cfg.user_tree and cfg.taxa_sets_file and cfg.pd_k):
            log("ERROR: GSS needs -t <network>, -ts <sets>, -pval <file>, "
                "-k <size>")
            return 2
        run_gss(cfg.user_tree, cfg.taxa_sets_file, cfg.gene_pvalue_file,
                cfg.pd_k, prefix, log=log)
        return 0
    if cfg.pd_k or cfg.pd_max_k or cfg.pd_budget:
        if not cfg.user_tree:
            log("ERROR: PD selection needs -t <tree/splits file>")
            return 2
        head = open(cfg.user_tree).read(200).lstrip().lower()
        is_network = head.startswith("#nexus")
        if is_network or cfg.pd_budget or cfg.costs_file or \
                cfg.taxa_sets_file:
            # exact ILP path: split networks / budgets / areas
            # (PDNetwork::findPD, pdnetwork.cpp)
            from .analysis.pdnetwork import (
                _load_split_system,
                max_pd_ilp,
                read_costs_file,
                read_taxa_sets,
            )

            ss = _load_split_system(cfg.user_tree)
            area_taxa = None
            unit_names = ss.names
            if cfg.taxa_sets_file:
                sets = read_taxa_sets(cfg.taxa_sets_file)
                idx = {n: i for i, n in enumerate(ss.names)}
                area_taxa = np.zeros((len(sets), ss.n_taxa), dtype=bool)
                unit_names = list(sets)
                for a, (nm, members) in enumerate(sets.items()):
                    for t in members:
                        if t not in idx:
                            log(f"ERROR: taxon {t} of set {nm} not found")
                            return 2
                        area_taxa[a, idx[t]] = True
            costs = (
                read_costs_file(cfg.costs_file, unit_names)
                if cfg.costs_file else np.ones(len(unit_names))
            )
            lines = ["Phylogenetic diversity selection (exact ILP)", ""]
            ks = (
                [None] if cfg.pd_budget
                else range(max(cfg.pd_min_k or cfg.pd_k, 2),
                           (cfg.pd_max_k or cfg.pd_k) + 1)
            )
            for kk in ks:
                sol = max_pd_ilp(
                    ss, k=kk, area_taxa=area_taxa,
                    costs=costs if cfg.pd_budget else None,
                    budget=cfg.pd_budget or None,
                )
                what = f"budget = {cfg.pd_budget}" if kk is None else f"k = {kk}"
                lines.append(f"For {what} the optimal PD score is "
                             f"{sol.score:.6g}")
                lines.append(f"The optimal set has {sol.k} elements:")
                for i in sorted(sol.taxa):
                    lines.append(f"  {unit_names[i]}")
                lines.append("")
            with open(prefix + ".pda", "w") as f:
                f.write("\n".join(lines) + "\n")
            log(f"PD analysis written to {prefix}.pda")
            return 0
        from .analysis.pd import run_pd_analysis

        run_pd_analysis(cfg.user_tree, prefix, k=cfg.pd_k or None,
                        min_k=cfg.pd_min_k or None,
                        max_k=cfg.pd_max_k or None, log=log)
        return 0
    return 2


def _run_partitioned(cfg, seq_type, gcode, dtype, log, command, t0):
    """Partitioned analysis (-sp/-spp/-q), phylosupertree.cpp analogue."""
    import time as _time

    from .io.superalignment import SuperAlignment
    from .search.driver import SearchParams
    from .search.super_driver import run_search_partitioned

    prefix = cfg.out_prefix
    saln = SuperAlignment.from_files(
        cfg.aln_file, cfg.partition_file, seq_type, gcode
    )
    log(
        f"Partitioned alignment: {saln.n_taxa} sequences, "
        f"{saln.n_parts} partitions, {saln.n_sites} sites "
        f"({cfg.partition_mode} branch lengths)"
    )

    # ---- partitioned model selection (-m TEST / TESTMERGE[ONLY]) ------
    # (testPartitionModel, /root/reference/phylotesting.cpp:833)
    if cfg.model_test:
        from .search.partition_select import test_partition_model

        scheme = test_partition_model(
            saln, dtype=dtype, log=log, merge=cfg.model_test_merge,
        )
        with open(prefix + ".best_scheme.nex", "w") as f:
            f.write(scheme.nexus_scheme(saln))
        with open(prefix + ".model", "w") as f:
            for nm in scheme.set_names:
                f.write(f"CHARSET {nm}\n{scheme.tables[nm]}\n\n")
        log(f"  Best partition scheme:         {prefix}.best_scheme.nex")
        if cfg.model_test_merge:
            saln = scheme.merged_superalignment(saln)
            log(f"Merged to {saln.n_parts} partitions")
        else:
            for k, m in enumerate(scheme.model_names):
                saln.defs[k].model = m
        if cfg.model_test_only:
            _finish(prefix, [], t0, log)
            return 0

    sp = SearchParams(
        model=cfg.model,
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
    res = run_search_partitioned(saln, sp, mode=cfg.partition_mode,
                                 fix_topology=cfg.fix_topology)

    # ---- partitioned standard bootstrap (-b [-bspec GENE|GENESITE]) ---
    # (runStandardBootstrap over SuperAlignment resamples,
    # superalignment.cpp:333-367 createBootstrapAlignment)
    if cfg.std_bootstrap > 0:
        from dataclasses import replace as _dc_replace

        from .trees.splits import SplitCounter, consensus_tree, map_supports

        rng_b = np.random.default_rng(cfg.seed + 1000)
        counter = SplitCounter(saln.n_taxa)
        boot_trees = []
        for b in range(cfg.std_bootstrap):
            freqs = saln.bootstrap_pattern_freqs(rng_b, cfg.bootstrap_spec)
            sp_b = _dc_replace(
                sp, seed=cfg.seed + b + 1, n_init_trees=4, n_top_init=2,
                unsuccess_iteration=min(cfg.unsuccess_iteration, 50),
                log=lambda s: None,
            )
            r_b = run_search_partitioned(saln, sp_b,
                                         mode=cfg.partition_mode,
                                         pattern_freqs=freqs)
            counter.add_tree(r_b.best_tree)
            boot_trees.append(r_b.best_tree)
            log(f"Bootstrap replicate {b + 1}/{cfg.std_bootstrap}"
                f"{' (' + cfg.bootstrap_spec + ')' if cfg.bootstrap_spec else ''}:"
                f" lnL {r_b.best_lnl:.3f}")
        with open(prefix + ".boottrees", "w") as f:
            for t in boot_trees:
                f.write(t.to_newick(saln.names) + "\n")
        cons, _ = consensus_tree(counter)
        with open(prefix + ".contree", "w") as f:
            f.write(cons.to_newick(
                saln.names, support=map_supports(cons, counter)) + "\n")
        log(f"  Bootstrap trees:               {prefix}.boottrees")
        log(f"  Consensus tree:                {prefix}.contree")

    with open(prefix + ".treefile", "w") as f:
        f.write(res.best_tree.to_newick(saln.names) + "\n")
    # per-partition report
    from .io.report import write_report

    extra = ["PARTITION SUMMARY", "-----------------",
             " ID  Name           Sites  Model            Rate-scale"]
    for k, d in enumerate(saln.defs):
        (s_k, r_k) = res.models[k]
        extra.append(
            f" {k + 1:<3} {d.name:<14} {saln.partitions[k].n_sites:<6} "
            f"{s_k.name}{r_k.name_suffix():<16} {res.scales[k]:.4f}"
        )
    write_report(
        prefix + ".iqtree",
        saln.partitions[0],
        res.models[0][0],
        res.models[0][1],
        res.best_tree,
        res.best_lnl,
        command,
        res.wall_time,
        iterations=res.iterations,
        extra_sections=["\n".join(extra)],
    )
    log(f"BEST SCORE FOUND : {res.best_lnl:.4f}")
    log(f"Total wall-clock time used: {_time.time() - t0:.3f} sec")
    log("")
    log(f"  IQ-TREE report:                {prefix}.iqtree")
    log(f"  Maximum-likelihood tree:       {prefix}.treefile")
    log(f"  Screen log file:               {prefix}.log")
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
    site = SiteData.from_alignment(aln, dtype, asc=subst.asc)
    ta = TreeArrays.from_tree(tree, dtype)
    # engine selection + banner (round-4: the -te fast path previously
    # required calling the library directly with a slot schedule)
    from .engine.banner import decide_engine, engine_banner
    from .models.nonrev import NonRevModel

    ncat = len(rate.category_rates()[0])
    dec = decide_engine(
        aln.n_taxa, ncat, subst.num_states,
        int(site.tip_codes.shape[1]), dtype, has_asc=subst.asc,
        is_nonrev=isinstance(subst, NonRevModel), mem_cap=cfg.mem_cap)
    for line in engine_banner(dec, aln.n_taxa, ncat, subst.num_states,
                              int(site.tip_codes.shape[1])).splitlines():
        log(line)
    steps, n_slots = None, 0
    if dec.fused:
        from .engine.kernels.pruning import (device_slot_schedule,
                                             fitting_pack)

        pk = fitting_pack(aln.n_taxa, ncat, subst.num_states, dtype)
        steps, n_slots = device_slot_schedule(tree, ta, pack=pk)
        steps = jnp.asarray(steps)
    if cfg.fix_branch_lengths:
        params = opt.init_params()
        params, lnl = jax.jit(
            lambda t, p: fit_model_step(opt, t, site, p, 100,
                                        steps=steps, n_slots=n_slots)
        )(ta, params)
        log(f"Optimal log-likelihood: {float(lnl):.4f}")
    else:
        ta, params, lnl = optimize_model_and_branches(
            opt, ta, site, tol=cfg.model_eps if cfg.model_eps else 0.001,
            steps=steps, n_slots=n_slots)
        tree.blen = ta.host_blen()
        log(f"Optimal log-likelihood: {float(lnl):.4f}")
    subst, rate = opt.unpack(params)
    ma = jax.jit(opt.build)(params)
    _, pattern_lnl = jax.jit(loglik)(ta, ma, site)
    return tree, subst, rate, float(lnl), 0, np.asarray(pattern_lnl), None


def _run_ssf(cfg, aln, model_str, dtype, log):
    """-fs: site-specific state-frequency (+SSF) analysis.

    Mirrors the reference's ModelSet path (modelfactory.cpp:301-345):
    read the frequency file, regroup patterns to be class-pure, build one
    eigensystem per class sharing the exchangeabilities, then optimize
    shared model parameters + branch lengths with the per-pattern-class
    engine (engine/sitemodel.py).

    Topology: with -te the user topology is used directly (as in the
    reference).  Without -te, the topology is first inferred by the
    standard search under the base model (+F empirical), then refit under
    +SSF — a documented deviation (the reference searches under ModelSet
    itself); logged below.
    """
    import jax
    import jax.numpy as jnp

    from .engine.likelihood import SiteData, TreeArrays
    from .engine.sitemodel import ssf_compute_loglik
    from .models.factory import parse_model_string
    from .models.sitefreq import (
        SSFOptimizer,
        optimize_ssf_model_and_branches,
        read_site_freq_file,
        regroup_by_class,
    )
    from .trees.tree import PhyloTree

    log(f"Reading site-specific state frequency file "
        f"{cfg.site_freq_file} ...")
    site_class, class_freq = read_site_freq_file(cfg.site_freq_file, aln)
    if cfg.write_site_freq:
        # -wsf: the per-site state-frequency vectors in effect
        # (printSiteStateFreq, tools.cpp:2209 / phylotesting.cpp)
        out_sf = cfg.out_prefix + ".sitefreq"
        with open(out_sf, "w") as f:
            for i, c in enumerate(site_class):
                f.write(f"{i + 1} " + " ".join(
                    f"{x:.6f}" for x in class_freq[c]) + "\n")
        log(f"  Site state frequencies:        {out_sf}")
    base = model_str.split("+")[0].upper()
    if base in ("JC", "POISSON", "JC69"):
        raise SystemExit("JC is not suitable for site-specific model")
    log("Regrouping alignment sites...")
    new_aln, ptn_class = regroup_by_class(aln, site_class)
    log(f"Site-specific frequency model: {class_freq.shape[0]} classes, "
        f"{new_aln.n_patterns} class-pure patterns")

    subst, rate = parse_model_string(model_str, new_aln)
    if getattr(subst, "asc", False):
        raise SystemExit("+ASC is not supported with -fs")

    rng = np.random.default_rng(cfg.seed)
    iters = 0
    if cfg.fix_topology:
        tree = PhyloTree.from_newick(
            open(cfg.user_tree).read(), new_aln.names, rng=rng
        )
        opt = SSFOptimizer(
            subst=subst, rate=rate, dtype=dtype,
            class_freq=class_freq, ptn_class=ptn_class,
        )
        site = SiteData.from_alignment(new_aln, dtype)
        ta = TreeArrays.from_tree(tree, dtype)
        ta, params, lnl = optimize_ssf_model_and_branches(opt, ta, site)
        tree.blen = ta.host_blen()
        subst, rate = opt.unpack(params)
        ssf_arrays = opt.build_ssf(params)
    else:
        # full stochastic search on the SSF engine (the reference runs
        # its NNI search over the sitemodel kernels the same way)
        from .search.driver import SearchParams, run_search

        sp = SearchParams(
            model=model_str, seed=cfg.seed,
            n_init_trees=cfg.n_init_trees, n_top_init=cfg.n_top_init,
            unsuccess_iteration=cfg.unsuccess_iteration,
            fixed_iterations=cfg.n_iterations,
            max_seconds=cfg.max_seconds, dtype=dtype, log=log,
            ufboot=cfg.ufboot, ufboot_epsilon=cfg.ufboot_epsilon,
            ssf=(class_freq, ptn_class),
        )
        res = run_search(new_aln, sp)
        tree, lnl, iters = res.best_tree, res.best_lnl, res.iterations
        subst, rate = res.subst, res.rate
        opt = res.model_opt
        site = SiteData.from_alignment(new_aln, dtype)
        ta = TreeArrays.from_tree(tree, dtype)
        ssf_arrays = opt.build_ssf(res.params_vec)
    log(f"Optimal log-likelihood (+SSF): {lnl:.4f}")
    subst.name = subst.name + "+SSF"
    _, pattern_lnl = jax.jit(ssf_compute_loglik)(ta, ssf_arrays, site)
    return new_aln, (tree, subst, rate, float(lnl), iters,
                     np.asarray(pattern_lnl), None)


def _run_search(cfg, aln, model_str, dtype, log, ckp=None):
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
        use_iqp=cfg.use_iqp,
        p_delete=cfg.p_delete,
        k_represent=cfg.k_represent,
        ub_filter=cfg.ub_nni,
        ub_frac=cfg.ub_frac,
        fix_stable_splits=cfg.fix_stable_splits,
        unsuccess_iteration=cfg.unsuccess_iteration,
        fixed_iterations=cfg.n_iterations,
        max_seconds=cfg.max_seconds,
        model_eps=cfg.model_eps,
        mem_cap=cfg.mem_cap,
        weibull_max_iterations=cfg.weibull_max_iterations,
        stop_confidence=cfg.stop_confidence,
        dtype=dtype,
        nni5=cfg.nni5,
        speednni=cfg.speednni and not cfg.allnni,
        start_tree_mode=cfg.start_tree_mode,
        start_tree=open(cfg.user_tree).read() if cfg.user_tree else None,
        dist_file=cfg.dist_file,
        log=log,
        ufboot=cfg.ufboot,
        ufboot_epsilon=cfg.ufboot_epsilon,
        min_correlation=cfg.min_correlation,
        step_iterations=cfg.step_iterations,
        verbose=cfg.verbose,
        checkpoint=ckp,
    )
    visited = []
    if cfg.write_intermediate_level >= 2:
        # -wt2/-wt3: record every intermediate tree the climbs visit
        # (reference write_intermediate_trees=2/3 + print_tree_lh,
        # tools.cpp:2099-2110)
        sp.on_visit = lambda t, lnl: visited.append(
            (t.to_newick(aln.names), float(lnl)))
    res = run_search(aln, sp)
    from .utils.gzout import open_out, out_name

    gz = cfg.compress_output
    if cfg.write_intermediate_level >= 2:
        with open_out(cfg.out_prefix + ".treels", gz) as f:
            for nwk, _ in visited:
                f.write(nwk + "\n")
        with open_out(cfg.out_prefix + ".treelh", gz) as f:
            for _, lnl in visited:
                f.write(f"{lnl:.6f}\n")
        log(f"  Intermediate trees:            "
            f"{out_name(cfg.out_prefix + '.treels', gz)}")
        log(f"  Intermediate tree lnLs:        "
            f"{out_name(cfg.out_prefix + '.treelh', gz)}")
    elif cfg.write_local_trees:
        # -wt: all locally optimal (candidate) trees -> .treels
        # (reference print_tree_lh/.treels, tools.cpp '-wt')
        with open_out(cfg.out_prefix + ".treels", gz) as f:
            for s, t in res.candidates.sorted_entries():
                f.write(t.to_newick(aln.names) + "\n")
        log(f"  Locally optimal trees:         "
            f"{out_name(cfg.out_prefix + '.treels', gz)}")
    site = SiteData.from_alignment(aln, dtype, asc=res.subst.asc)
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
        res.ufboot,
    )


if __name__ == "__main__":
    sys.exit(main())
