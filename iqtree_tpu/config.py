"""Run configuration and IQ-TREE-compatible command line.

A typed subset of the reference's 500-field Params singleton + 357-branch
parseArg (/root/reference/tools.h:420, tools.cpp parseArg), keeping the
same flag names (-s -m -pre -t -te -blfix -seed -n -nt -bb -alrt ...) so
reference command lines work unchanged for the features we support.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class RunConfig:
    aln_file: str = ""
    seq_type: Optional[str] = None  # -st DNA/AA/BIN/MORPH/CODON[n]
    genetic_code: int = 1  # CODONn suffix
    model: Optional[str] = None  # -m
    prefix: Optional[str] = None  # -pre
    user_tree: Optional[str] = None  # -t/-te file
    fix_topology: bool = False  # -te given
    fix_branch_lengths: bool = False  # -blfix / -fixbr
    site_freq_file: Optional[str] = None  # -fs (+SSF site-specific freqs)
    dist_file: Optional[str] = None  # -d user pairwise distances -> BIONJ
    treeset_file: Optional[str] = None  # -z user trees to evaluate/test
    topotest_replicates: int = 0  # -zb RELL replicates for topology tests
    do_weighted_test: bool = False  # -zw (WKH + WSH)
    do_au_test: bool = False  # -au (approximately unbiased test)
    print_tree_lh: bool = False  # -wtl (.treelh per user tree)
    outgroup: Optional[str] = None  # -o taxon[,taxon...] (display rooting)
    verbose: int = 0  # -v[v] verbosity ladder (VB_MED/VB_MAX, tools.h:323)
    write_boot_trees: bool = False  # -wbt (.ufboot only when asked, like ref)
    write_local_trees: bool = False  # -wt (.treels: all locally optimal trees)
    # -wt2/-wt3: write every VISITED intermediate tree (+ .treelh tree
    # log-likelihoods), reference write_intermediate_trees levels
    write_intermediate_level: int = 0
    print_branch_lengths: bool = False  # -wbl (lengths in consensus trees)
    compress_output: bool = False  # -gz (gzip large output files)
    model_test_redo: bool = False  # -mredo (ignore cached model selection)
    model_add: Optional[str] = None  # -madd extra models for -m TEST
    ckp_interval: float = 30.0  # -cptime seconds between checkpoint dumps
    min_correlation: float = 0.99  # -bcor UFBoot convergence correlation
    step_iterations: int = 100  # -nstep UFBoot correlation check interval
    keep_identical: bool = False  # -keep-ident (keep duplicate sequences)
    seed: int = 1  # -seed
    n_iterations: Optional[int] = None  # -n (fixed)
    unsuccess_iteration: int = 100  # -nstop
    weibull_max_iterations: Optional[int] = None  # -sr (SC_WEIBULL)
    stop_confidence: float = 0.95  # -sc
    max_seconds: Optional[float] = None  # -maxtime (minutes in ref)
    n_threads: int = 0  # -nt (0 = all devices)
    write_site_lnl: bool = False  # -wsl
    wsl_mode: str = ""  # -wslr/-wslg RATECAT, -wslm MIXTURE, -wslmr MIXTURE_RATECAT
    write_site_rates: bool = False  # -wsr
    mh_rates: bool = False  # -mh (Meyer-von Haeseler ML site rates)
    mh_cats: int = 0  # -mhcat k (RateMeyerDiscrete k-means categories)
    mcat_mean: bool = False  # -cat_mean (unsupported placeholder)
    mcat_nolog: bool = False  # -cat_nolog (k-means in rate, not log-rate)
    mcat_site: bool = False  # -cat_site (weight patterns by site count)
    redo: bool = False  # -redo
    quiet: bool = False  # -quiet
    ufboot: int = 0  # -bb replicates
    std_bootstrap: int = 0  # -b replicates (standard, full re-analysis)
    # -b: replicates + ML tree + consensus; -bc: replicates + consensus
    # only; -bo: replicates only (tools.cpp:2044-2077 compute_ml_tree /
    # consensus_type switches)
    std_boot_mode: str = "full"  # full | consensus | only
    bootstrap_spec: Optional[str] = None  # -bspec GENE|GENESITE
    alrt: int = 0  # -alrt replicates
    alrt_parametric: bool = False  # -alrt 0 (parametric aLRT test)
    abayes: bool = False  # -abayes
    lbp: int = 0  # -lbp replicates (local bootstrap probability)
    model_test: bool = False  # -m TEST/TESTONLY
    model_set: Optional[str] = None  # -mset raxml/phyml/mrbayes or list
    model_subset: Optional[str] = None  # -msub nuclear/mitochondrial/...
    freq_set: Optional[str] = None  # -mfreq restriction (e.g. "FU,F")
    model_test_criterion: str = "BIC"  # -AIC/-AICc/-BIC
    model_test_only: bool = False
    model_test_merge: bool = False  # -m TESTMERGE[ONLY]
    model_test_rate_scan: bool = False  # -m TESTNEW*: include +R2..+Rcmax
    whtest: bool = False  # -m WHTEST (Weiss-von Haeseler homogeneity test)
    whtest_sim: int = 1000  # -ns
    pers: float = 0.5  # -pers
    use_iqp: bool = False  # -iqp (IQP perturbation instead of random NNIs)
    p_delete: Optional[float] = None  # -pdel
    k_represent: int = 4  # -krep
    ub_nni: bool = False  # -upNNI (upper-bound NNI prefilter)
    ub_frac: float = 0.0  # -upFrac
    fix_stable_splits: bool = False  # -fss
    n_init_trees: int = 20  # -ninit (reference 100)
    n_top_init: int = 5  # -ntop (reference 20)
    f64: bool = False  # --f64 : full double precision
    float32: bool = True
    partition_file: Optional[str] = None  # -sp/-spp/-q/-spj file
    partition_mode: Optional[str] = None  # unlinked|proportional|joint
    lmap: int = 0  # -lmap: number of likelihood-mapping quartets
    lmap_cluster_file: Optional[str] = None  # -lmclust 2/3/4-cluster file
    write_quartet_lh: bool = False  # -wql
    # utility modes (no alignment required; pda.cpp:2436-2480 dispatch)
    consensus_file: Optional[str] = None  # -con FILE
    network_file: Optional[str] = None  # -net FILE (consensus network)
    min_support: float = 0.0  # -minsup
    sup_target: Optional[str] = None  # -sup TARGET (trees from -t)
    rf_file: Optional[str] = None  # -rf_all FILE | -rf FILE FILE2
    rf_file2: Optional[str] = None
    random_tree_n: int = 0  # -r N
    random_tree_mode: str = "yule"  # -rand yule|uniform|caterpillar|balanced|star
    site_lnl_file: Optional[str] = None  # -gbo FILE (guided bootstrap)
    mprob_ref: Optional[str] = None  # -mprob REF_ALIGNMENT
    pars_multistate: bool = False  # -tina (multistate parsimony score)
    ncbi_taxid: int = 0  # -dmp TAXID (nodes.dmp via -t)
    ncbi_rank: Optional[str] = None  # -dmprank
    ncbi_ignore: Optional[str] = None  # -dmpignore
    ncbi_names: Optional[str] = None  # -dmpname names.dmp
    pd_k: int = 0  # -k N (PD selection on -t tree)
    pd_min_k: int = 0  # -mink
    pd_max_k: int = 0  # -maxk
    pd_budget: float = 0.0  # -budget (costs via -costs)
    costs_file: Optional[str] = None  # -costs FILE (name cost per line)
    taxa_sets_file: Optional[str] = None  # -ts FILE (areas / gene sets)
    gene_pvalue_file: Optional[str] = None  # -pval FILE (GSS)
    ngs_file: Optional[str] = None  # -sf FILE (NGS Fritz-format counts)
    branch_stats: bool = False  # -stats (branch-length statistics of -t)
    scale_blen: float = 0.0  # -scale FACTOR (scale -t branch lengths)
    eco_dag_file: Optional[str] = None  # -eco FILE (food web, ECOpd)
    eco_diet: float = 0.0  # -diet d (% of diet to conserve)
    # optimization / search knobs (reference defaults, tools.cpp:687-871)
    min_branch_length: float = 1e-6  # -blmin
    max_branch_length: float = 100.0  # -blmax
    model_eps: Optional[float] = None  # -me lnL tolerance (None = per-mode default)
    mem_cap: Optional[int] = None  # -mem HBM budget in bytes (None = auto)
    min_rate_cats: int = 2  # -cmin (+R scan lower bound)
    max_rate_cats: int = 10  # -cmax (+R scan upper bound)
    nni5: bool = True  # -nni5/-fivebran vs -nni1/-onebran
    allnni: bool = False  # -allnni: disable the speedNNI reduction
    speednni: bool = False  # -speednni: opt into the reduced re-scan
    start_tree_mode: str = "BIONJ"  # -starttree BIONJ|PARS
    freq_const_patterns: Optional[str] = None  # -fconst f_A,f_C,...
    tree_burnin: int = 0  # -bi (skip first trees in -con/-net/-sup)
    tree_max_count: int = 0  # -tm (stop reading trees after this many)
    optimize_mixmodel_weight: bool = False  # -mwopt
    numeric_precision: int = 0  # -prec (0 = per-output defaults)
    write_site_freq: bool = False  # -wsf (.sitefreq of +SSF/per-site freqs)
    write_boot_tree_blens: bool = False  # -wbtl (implies -wbt)
    random_tree_min_len: float = 0.001  # -rlen MIN MEAN MAX
    random_tree_mean_len: float = 0.1
    random_tree_max_len: float = 0.999
    ufboot_epsilon: float = 0.5  # -beps (UFBoot logl cutoff slack)

    @property
    def out_prefix(self) -> str:
        return self.prefix or self.aln_file or "iqtree_tpu_util"


def _parse_mem_arg(s, p):
    if s is None:
        return None
    try:
        from .engine.banner import parse_mem

        v = parse_mem(s)
        if v <= 0:
            raise ValueError(s)
        return v
    except ValueError:
        p.error(f"-mem: cannot parse '{s}' (use e.g. 8G, 500M)")


def parse_args(argv) -> RunConfig:
    p = argparse.ArgumentParser(
        prog="iqtree-tpu",
        description="TPU-native maximum-likelihood phylogenetic inference "
        "(IQ-TREE-compatible interface)",
    )
    p.add_argument("-s", dest="aln_file", default=None, help="alignment file")
    p.add_argument("-st", dest="seq_type", default=None,
                   help="sequence type (DNA/AA/BIN/MORPH/CODON[n], "
                        "n = NCBI genetic code id)")
    p.add_argument("-m", dest="model", default=None,
                   help="model string, e.g. GTR+G, HKY+I+G, LG+G, TEST")
    p.add_argument("-pre", dest="prefix", default=None, help="output prefix")
    p.add_argument("-t", dest="start_tree", default=None,
                   help="starting tree file (topology may change)")
    p.add_argument("-te", dest="user_tree", default=None,
                   help="user tree file (fixed topology)")
    p.add_argument("-d", dest="dist_file", default=None,
                   help="user pairwise-distance file (PHYLIP square) "
                        "for the BIONJ start tree")
    p.add_argument("-fs", dest="site_freq_file", default=None,
                   help="site-specific state-frequency file (+SSF model)")
    p.add_argument("-z", dest="treeset_file", default=None,
                   help="evaluate a set of user trees (topology tests "
                        "with -zb)")
    p.add_argument("-zb", dest="topotest_replicates", type=int, default=0,
                   help="RELL replicates (>=1000) for KH/SH/ELW topology "
                        "tests of the -z trees")
    p.add_argument("-zw", dest="do_weighted_test", action="store_true",
                   help="also perform weighted KH and SH tests")
    p.add_argument("-au", dest="do_au_test", action="store_true",
                   help="also perform the approximately unbiased (AU) test")
    p.add_argument("-wtl", dest="print_tree_lh", action="store_true",
                   help="write user-tree log-likelihoods to .treelh")
    p.add_argument("-blfix", "-fixbr", dest="fix_bl", action="store_true",
                   help="fix branch lengths of the user tree")
    p.add_argument("-seed", dest="seed", type=int, default=1)
    p.add_argument("-o", dest="outgroup", default=None,
                   help="outgroup taxon for display rooting")
    p.add_argument("-v", dest="verbose", action="count", default=0,
                   help="verbose mode (repeat for more)")
    p.add_argument("-i", dest="p_invar_fix", type=float, default=None,
                   help="fix proportion of invariable sites")
    p.add_argument("-a", dest="alpha_fix", type=float, default=None,
                   help="fix Gamma shape parameter")
    p.add_argument("-gmedian", dest="gmedian", action="store_true",
                   help="median (not mean) discrete-Gamma category rates")
    p.add_argument("-wbt", dest="wbt", action="store_true",
                   help="write UFBoot trees to .ufboot")
    p.add_argument("-wt", dest="wt", action="store_true",
                   help="write all locally optimal trees to .treels")
    p.add_argument("-wt2", dest="wt2", action="store_true",
                   help="write all intermediate trees to .treels + .treelh")
    p.add_argument("-wt3", dest="wt3", action="store_true",
                   help="write all intermediate trees incl. NNI steps")
    p.add_argument("-wbl", dest="wbl", action="store_true",
                   help="print branch lengths in consensus trees")
    p.add_argument("-gz", dest="gz", action="store_true",
                   help="gzip-compress large output files "
                        "(.treels/.sitelh/.ufboot/.boottrees)")
    p.add_argument("-mredo", dest="mredo", action="store_true",
                   help="redo model selection even if a cached result "
                        "exists in the checkpoint")
    p.add_argument("-madd", dest="madd", default=None,
                   help="comma-separated extra models for -m TEST")
    p.add_argument("-cptime", dest="cptime", type=float, default=30.0,
                   help="min seconds between periodic checkpoint dumps")
    p.add_argument("-bcor", dest="bcor", type=float, default=0.99,
                   help="min UFBoot split correlation for convergence")
    p.add_argument("-nstep", dest="nstep", type=int, default=100,
                   help="UFBoot correlation check interval")
    p.add_argument("-keep_ident", "-keep-ident", dest="keep_ident",
                   action="store_true",
                   help="keep identical sequences during the analysis")
    p.add_argument("-n", dest="n_iterations", type=int, default=None,
                   help="fixed number of search iterations")
    p.add_argument("-nstop", dest="unsuccess", type=int, default=100)
    p.add_argument("-sr", "-nm", dest="weibull_max", type=int, default=None,
                   help="Weibull stopping rule with max iterations "
                        "(reference SC_WEIBULL, tools.cpp:2001)")
    p.add_argument("-sc", dest="stop_confidence", type=float, default=0.95,
                   help="confidence for the Weibull stopping rule")
    p.add_argument("-maxtime", dest="maxtime", type=float, default=None,
                   help="max wall time in minutes")
    p.add_argument("-nt", dest="n_threads", type=int, default=0)
    p.add_argument("-wslr", "-wslg", dest="wslr", action="store_true",
                   help="write site log-likelihoods per rate category")
    p.add_argument("-wslm", dest="wslm", action="store_true",
                   help="write site log-likelihoods per mixture class")
    p.add_argument("-wslmr", "-wslrm", dest="wslmr", action="store_true",
                   help="write site log-likelihoods per mixture+rate class")
    p.add_argument("-wsl", dest="wsl", action="store_true",
                   help="write site log-likelihoods")
    p.add_argument("-mh", dest="mh", action="store_true",
                   help="ML site rates (Meyer & von Haeseler 2003) to .mhrate")
    p.add_argument("-mhcat", dest="mhcat", type=int, default=0,
                   help="discretize -mh rates into K categories (k-means)")
    p.add_argument("-cat_nolog", dest="cat_nolog", action="store_true")
    p.add_argument("-cat_site", dest="cat_site", action="store_true")
    p.add_argument("-wsr", dest="wsr", action="store_true",
                   help="write site-specific rates (.rate)")
    p.add_argument("-redo", dest="redo", action="store_true")
    p.add_argument("-quiet", dest="quiet", action="store_true")
    p.add_argument("-bb", dest="ufboot", type=int, default=0,
                   help="ultrafast bootstrap replicates (>=1000)")
    p.add_argument("-bspec", dest="bootstrap_spec", default=None,
                   help="bootstrap resampling spec for partitioned data: "
                        "GENE (resample whole partitions) or GENESITE "
                        "(genes, then sites within genes)")
    p.add_argument("-b", dest="std_boot", type=int, default=0,
                   help="standard nonparametric bootstrap replicates")
    p.add_argument("-bc", dest="std_boot_cons", type=int, default=0,
                   help="bootstrap + consensus tree only (no ML tree)")
    p.add_argument("-bo", dest="std_boot_only", type=int, default=0,
                   help="bootstrap replicates only (no ML/consensus tree)")
    p.add_argument("-mset", dest="model_set", default=None,
                   help="restrict -m TEST candidates: raxml/phyml/mrbayes "
                        "or a comma-separated model list")
    p.add_argument("-msub", dest="model_subset", default=None,
                   help="AA source for -m TEST: nuclear/mitochondrial/"
                        "chloroplast/viral")
    p.add_argument("-mfreq", dest="freq_set", default=None,
                   help="restrict frequency types in -m TEST (e.g. FU,F)")
    p.add_argument("-AIC", dest="crit_aic", action="store_true",
                   help="rank -m TEST models by AIC")
    p.add_argument("-AICc", "-AICC", dest="crit_aicc", action="store_true",
                   help="rank -m TEST models by AICc")
    p.add_argument("-BIC", dest="crit_bic", action="store_true",
                   help="rank -m TEST models by BIC (default)")
    p.add_argument("-alrt", dest="alrt", type=int, default=None,
                   help="SH-aLRT replicates (0 = parametric aLRT test)")
    p.add_argument("-abayes", dest="abayes", action="store_true",
                   help="aBayes branch test (Anisimova et al. 2011)")
    p.add_argument("-lbp", dest="lbp", type=int, default=0,
                   help="local bootstrap probability replicates")
    p.add_argument("-pers", dest="pers", type=float, default=0.5)
    p.add_argument("-iqp", dest="iqp", action="store_true",
                   help="IQP leaf re-insertion perturbation (iqtree.cpp:1939)")
    p.add_argument("-pdel", dest="pdel", type=float, default=None,
                   help="IQP leaf-deletion fraction")
    p.add_argument("-krep", dest="krep", type=int, default=4,
                   help="IQP representative-leaf-set size")
    p.add_argument("-upNNI", dest="ub_nni", action="store_true",
                   help="skip NNIs with hopeless likelihood upper bounds")
    p.add_argument("-upFrac", dest="ub_frac", type=float, default=0.0)
    p.add_argument("-fss", dest="fss", action="store_true",
                   help="fix stable splits (100%% support in candidates)")
    p.add_argument("-ns", dest="whtest_sim", type=int, default=1000,
                   help="number of WH-test simulations (-m WHTEST)")
    p.add_argument("-ninit", dest="ninit", type=int, default=20)
    p.add_argument("-ntop", dest="ntop", type=int, default=5)
    p.add_argument("--f64", dest="f64", action="store_true",
                   help="compute in float64 (slow on TPU; for parity runs)")
    p.add_argument("-sp", dest="sp", default=None, metavar="FILE",
                   help="partition file; edge-unlinked (separate branch "
                        "lengths per partition)")
    p.add_argument("-spp", dest="spp", default=None, metavar="FILE",
                   help="partition file; edge-linked proportional")
    p.add_argument("-q", "-spj", dest="spj", default=None, metavar="FILE",
                   help="partition file; edge-linked equal (joint)")
    p.add_argument("-lmap", dest="lmap", type=int, default=0,
                   help="likelihood mapping with this many random quartets")
    p.add_argument("-lmclust", dest="lmclust", default=None,
                   help="likelihood-mapping cluster file (2-4 clusters, "
                        "NEXUS taxsets or '(t1,t2,...) Name' lines)")
    p.add_argument("-wql", dest="wql", action="store_true",
                   help="write quartet log-likelihoods (-lmap)")
    p.add_argument("-con", dest="con", default=None, metavar="FILE",
                   help="majority-rule consensus of trees in FILE")
    p.add_argument("-net", dest="net", default=None, metavar="FILE",
                   help="consensus network of trees in FILE")
    p.add_argument("-minsup", dest="minsup", type=float, default=0.0)
    p.add_argument("-sup", dest="sup", default=None, metavar="TARGET",
                   help="assign support of trees (-t FILE) onto TARGET tree")
    p.add_argument("-rf", dest="rf", nargs=2, default=None,
                   metavar=("FILE", "FILE2"),
                   help="RF distances between tree pairs of two files")
    p.add_argument("-rf_all", dest="rf_all", default=None, metavar="FILE",
                   help="all-vs-all RF distances of trees in FILE")
    p.add_argument("-r", dest="rand_n", type=int, default=0, metavar="N",
                   help="generate a random N-taxon tree")
    p.add_argument("-rand", dest="rand_mode", default="yule",
                   choices=["yule", "uniform", "caterpillar", "balanced",
                            "star"])
    p.add_argument("-gbo", dest="gbo", default=None, metavar="SITELH",
                   help="guided bootstrap from a site log-likelihood file")
    p.add_argument("-mprob", dest="mprob", default=None, metavar="REF",
                   help="multinomial probability of -s given REF alignment")
    p.add_argument("-tina", dest="tina", action="store_true",
                   help="parsimony score of -t tree on -s (multistate) data")
    p.add_argument("-dmp", dest="dmp", type=int, default=0, metavar="TAXID",
                   help="extract NCBI taxonomy subtree (nodes.dmp via -t)")
    p.add_argument("-dmprank", "-dmplevel", dest="dmprank", default=None)
    p.add_argument("-dmpignore", dest="dmpignore", default=None)
    p.add_argument("-dmpname", dest="dmpname", default=None)
    p.add_argument("-k", dest="pd_k", type=int, default=0,
                   help="PD taxon selection of size k on the -t tree")
    p.add_argument("-mink", dest="pd_mink", type=int, default=0)
    p.add_argument("-budget", dest="pd_budget", type=float, default=0.0,
                   help="budgeted PD selection (costs from -costs)")
    p.add_argument("-costs", dest="costs_file", default=None)
    p.add_argument("-ts", dest="taxa_sets", default=None, metavar="FILE",
                   help="taxon sets (areas / gene sets) for PD/GSS")
    p.add_argument("-pval", dest="pval_file", default=None, metavar="FILE",
                   help="gene p-values (GSS mode)")
    p.add_argument("-sf", dest="ngs_file", default=None, metavar="FILE",
                   help="NGS pairwise count file (position-specific rates)")
    p.add_argument("-stats", dest="stats", action="store_true",
                   help="branch-length statistics of the -t tree")
    p.add_argument("-scale", dest="scale", type=float, default=0.0,
                   help="scale branch lengths of the -t tree")
    p.add_argument("-eco", dest="eco", default=None, metavar="FILE",
                   help="ECOpd: food-web viability constraints file")
    p.add_argument("-diet", dest="diet", type=float, default=0.0,
                   help="ECOpd: %% of diet that must be conserved")
    p.add_argument("-maxk", dest="pd_maxk", type=int, default=0)
    p.add_argument("-blmin", dest="blmin", type=float, default=1e-6,
                   help="minimum branch length (tools.cpp:1978)")
    p.add_argument("-blmax", dest="blmax", type=float, default=100.0,
                   help="maximum branch length")
    p.add_argument("-me", "-eps", dest="model_eps", type=float, default=None,
                   help="lnL epsilon for model-parameter optimization")
    p.add_argument("-mem", dest="mem", type=str, default=None,
                   help="memory budget for engine buffers, e.g. 8G / 500M "
                        "(phyloanalysis.cpp:1697 mem-save decision); "
                        "exceeding it degrades to the low-memory engine")
    p.add_argument("-cmin", dest="cmin", type=int, default=2,
                   help="min rate categories for the +R scan (-m TESTNEW)")
    p.add_argument("-cmax", dest="cmax", type=int, default=10,
                   help="max rate categories for the +R scan (-m TESTNEW)")
    p.add_argument("-nni5", "-fivebran", dest="nni5", action="store_true",
                   default=True,
                   help="re-optimize 5 local branches per NNI (default)")
    p.add_argument("-nni1", "-onebran", dest="nni5", action="store_false",
                   help="re-optimize only the central branch per NNI")
    p.add_argument("-allnni", dest="allnni", action="store_true",
                   help="re-evaluate NNIs on ALL branches every hill-climb "
                        "step (the default here; see -speednni)")
    p.add_argument("-speednni", dest="speednni", action="store_true",
                   help="opt into the reference's speedNNI reduction "
                        "(tools.cpp:880): after the first full scan only "
                        "branches near applied NNIs are re-evaluated, with "
                        "a verifying full rescan before each stop")
    p.add_argument("-starttree", dest="starttree", default="BIONJ",
                   choices=["BIONJ", "PARS", "PLLPARS"],
                   help="starting tree: BIONJ (ML distances) or PARS "
                        "(randomized stepwise-addition parsimony)")
    p.add_argument("-fconst", dest="fconst", default=None,
                   help="append constant patterns with these per-state "
                        "frequencies, e.g. 10,20,15,40 (tools.cpp:1902)")
    p.add_argument("-bi", dest="tree_burnin", type=int, default=0,
                   help="burn-in: skip this many first trees of the input "
                        "tree set (-con/-net/-sup)")
    p.add_argument("-tm", dest="tree_max_count", type=int, default=0,
                   help="read at most this many trees of the input set")
    p.add_argument("-mwopt", dest="mwopt", action="store_true",
                   help="always optimize mixture-class weights")
    p.add_argument("-prec", dest="prec", type=int, default=0,
                   help="numeric precision of report output")
    p.add_argument("-wsf", dest="wsf", action="store_true",
                   help="write the site state-frequency vectors (.sitefreq)")
    p.add_argument("-wbtl", dest="wbtl", action="store_true",
                   help="write UFBoot trees with branch lengths "
                        "(implies -wbt)")
    p.add_argument("-rlen", dest="rlen", nargs=3, type=float, default=None,
                   metavar=("MIN", "MEAN", "MAX"),
                   help="random-tree branch lengths (-r): min mean max")
    p.add_argument("-beps", dest="beps", type=float, default=0.5,
                   help="UFBoot logl-cutoff epsilon")
    p.add_argument("-numpars", dest="ninit", type=int,
                   default=argparse.SUPPRESS,
                   help=argparse.SUPPRESS)  # reference alias for numInitTrees
    a = p.parse_args(argv)
    if a.beps <= 0:
        p.error("-beps epsilon must be positive")  # tools.cpp:2404
    if a.cmin < 2 or a.cmax < a.cmin:
        p.error("-cmin must be >= 2 and -cmax >= -cmin")

    # parse-time validation matching the reference's outError calls, so a
    # flag mistake fails in milliseconds instead of after the tree search
    if a.alrt is not None and 0 < a.alrt < 1000:
        p.error("-alrt requires at least 1000 replicates "
                "(or 0 for the parametric aLRT test)")  # tools.cpp:2158
    if 0 < a.lbp < 1000:
        p.error("-lbp requires at least 1000 replicates")  # tools.cpp:2182
    if 0 < a.topotest_replicates < 1000:
        p.error("-zb requires at least 1000 replicates")  # tools.cpp:1523

    model = a.model
    model_test = model_test_only = False
    model_test_merge = False
    whtest = False
    if model == "WHTEST":
        # reference substitutes GTR+G and runs the WH-test afterwards
        # (phyloanalysis.cpp:1298,1886)
        whtest = True
        model = "GTR+G"

    model_test_rate_scan = False
    if model in ("TEST", "TESTONLY", "TESTNEW", "TESTNEWONLY"):
        # TESTNEW additionally scans FreeRate +R{cmin..cmax} classes
        # (tools.cpp:3113, phylotesting.cpp getModelList new_rates)
        model_test = True
        model_test_only = model.endswith("ONLY")
        model_test_rate_scan = model.startswith("TESTNEW")
        model = None
    elif model in ("TESTMERGE", "TESTMERGEONLY",
                   "TESTNEWMERGE", "TESTNEWMERGEONLY"):
        # PartitionFinder-style charset merging (phylotesting.cpp:833)
        model_test = True
        model_test_merge = True
        model_test_only = model.endswith("ONLY")
        model_test_rate_scan = model.startswith("TESTNEW")
        model = None
    # -i/-a/-gmedian pin rate parameters by rewriting the model string
    # (the reference sets Params fields consumed by the factory,
    # tools.cpp '-i'/'-a'/'-gmedian' branches)
    import re as _re

    if model:
        if a.alpha_fix is not None:
            model = _re.sub(r"\+G(\d*)(?!\{|\d)",
                            lambda m: f"+G{m.group(1)}{{{a.alpha_fix}}}",
                            model, count=1)
        if a.p_invar_fix is not None:
            model = _re.sub(r"\+I(?!\{)",
                            f"+I{{{a.p_invar_fix}}}", model, count=1)
        if a.gmedian:
            model = _re.sub(r"\+G(\d*)(?!M)", r"+GM\1", model, count=1)
    return RunConfig(
        aln_file=a.aln_file,
        seq_type=a.seq_type,
        model=model,
        prefix=a.prefix,
        user_tree=a.user_tree or a.start_tree,
        fix_topology=a.user_tree is not None,
        fix_branch_lengths=a.fix_bl,
        site_freq_file=a.site_freq_file,
        dist_file=a.dist_file,
        treeset_file=a.treeset_file,
        topotest_replicates=a.topotest_replicates,
        do_weighted_test=a.do_weighted_test,
        do_au_test=a.do_au_test,
        print_tree_lh=a.print_tree_lh,
        outgroup=a.outgroup,
        verbose=a.verbose,
        write_boot_trees=a.wbt or a.wbtl,
        write_local_trees=a.wt or a.wt2 or a.wt3,
        write_intermediate_level=3 if a.wt3 else (2 if a.wt2 else 0),
        print_branch_lengths=a.wbl,
        compress_output=a.gz,
        model_test_redo=a.mredo,
        model_add=a.madd,
        ckp_interval=a.cptime,
        min_correlation=a.bcor,
        step_iterations=a.nstep,
        keep_identical=a.keep_ident,
        seed=a.seed,
        n_iterations=a.n_iterations,
        unsuccess_iteration=a.unsuccess,
        weibull_max_iterations=a.weibull_max,
        stop_confidence=a.stop_confidence,
        max_seconds=a.maxtime * 60 if a.maxtime else None,
        n_threads=a.n_threads,
        write_site_lnl=a.wsl or a.wslr or a.wslm or a.wslmr,
        wsl_mode=("MIXTURE_RATECAT" if a.wslmr else
                  "MIXTURE" if a.wslm else
                  "RATECAT" if a.wslr else ""),
        write_site_rates=a.wsr,
        mh_rates=a.mh or a.mhcat > 0,
        mh_cats=a.mhcat,
        mcat_nolog=a.cat_nolog,
        mcat_site=a.cat_site,
        redo=a.redo,
        quiet=a.quiet,
        ufboot=a.ufboot,
        std_bootstrap=(a.std_boot or a.std_boot_cons or a.std_boot_only),
        std_boot_mode=("only" if a.std_boot_only else
                       "consensus" if a.std_boot_cons else "full"),
        bootstrap_spec=a.bootstrap_spec,
        alrt=a.alrt if a.alrt else 0,
        alrt_parametric=a.alrt == 0,  # -alrt 0 = parametric aLRT
        abayes=a.abayes,
        lbp=a.lbp,
        model_test=model_test,
        model_set=a.model_set,
        model_subset=a.model_subset,
        freq_set=a.freq_set,
        model_test_criterion=("AIC" if a.crit_aic
                              else "AICC" if a.crit_aicc else "BIC"),
        model_test_only=model_test_only,
        model_test_merge=model_test_merge,
        model_test_rate_scan=model_test_rate_scan,
        whtest=whtest,
        whtest_sim=a.whtest_sim,
        pers=a.pers,
        use_iqp=a.iqp,
        p_delete=a.pdel,
        k_represent=a.krep,
        ub_nni=a.ub_nni,
        ub_frac=a.ub_frac,
        fix_stable_splits=a.fss,
        n_init_trees=a.ninit,
        n_top_init=a.ntop,
        f64=a.f64,
        partition_file=a.sp or a.spp or a.spj,
        partition_mode=(
            "unlinked" if a.sp else
            "proportional" if a.spp else
            "joint" if a.spj else None
        ),
        lmap=a.lmap,
        lmap_cluster_file=a.lmclust,
        write_quartet_lh=a.wql,
        consensus_file=a.con,
        network_file=a.net,
        min_support=a.minsup,
        sup_target=a.sup,
        rf_file=(a.rf[0] if a.rf else a.rf_all),
        rf_file2=(a.rf[1] if a.rf else None),
        random_tree_n=a.rand_n,
        random_tree_mode=a.rand_mode,
        site_lnl_file=a.gbo,
        mprob_ref=a.mprob,
        pars_multistate=a.tina,
        ncbi_taxid=a.dmp,
        ncbi_rank=a.dmprank,
        ncbi_ignore=a.dmpignore,
        ncbi_names=a.dmpname,
        pd_k=a.pd_k,
        pd_min_k=a.pd_mink,
        pd_max_k=a.pd_maxk,
        pd_budget=a.pd_budget,
        costs_file=a.costs_file,
        taxa_sets_file=a.taxa_sets,
        gene_pvalue_file=a.pval_file,
        ngs_file=a.ngs_file,
        branch_stats=a.stats,
        scale_blen=a.scale,
        eco_dag_file=a.eco,
        # -diet is strictly a percentage in (0, 100] (reference
        # tools.cpp:2356 "-diet <d in %>"); always divide — guessing
        # units misread e.g. "-diet 1" (1%) as 100%
        eco_diet=a.diet / 100.0,
        min_branch_length=a.blmin,
        max_branch_length=a.blmax,
        model_eps=a.model_eps,
        mem_cap=_parse_mem_arg(a.mem, p),
        min_rate_cats=a.cmin,
        max_rate_cats=a.cmax,
        nni5=a.nni5,
        allnni=a.allnni,
        speednni=a.speednni,
        start_tree_mode=a.starttree,
        freq_const_patterns=a.fconst,
        tree_burnin=a.tree_burnin,
        tree_max_count=a.tree_max_count,
        optimize_mixmodel_weight=a.mwopt,
        numeric_precision=a.prec,
        write_site_freq=a.wsf,
        write_boot_tree_blens=a.wbtl,
        random_tree_min_len=a.rlen[0] if a.rlen else 0.001,
        random_tree_mean_len=a.rlen[1] if a.rlen else 0.1,
        random_tree_max_len=a.rlen[2] if a.rlen else 0.999,
        ufboot_epsilon=a.beps,
    )
