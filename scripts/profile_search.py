#!/usr/bin/env python
"""Profile the stochastic search's phase breakdown at 1000 taxa.

Round-4 verdict weakness 6: the ~630 s warm search was unattributed.
This runs a bounded search on the flagship bench workload with
IQTREE_TPU_SEARCH_PROFILE=1 so NNIEngine accumulates wall time per
phase (host schedule builds vs the NNI-eval / branch-Newton device
programs), and optionally captures a jax.profiler trace of the
stochastic loop (IQTREE_TPU_PROFILE=<dir>).

Usage: python scripts/profile_search.py [--iters 2] [--init 4] [--top 2]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("IQTREE_TPU_SEARCH_PROFILE", "1")
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--init", type=int, default=4)
    ap.add_argument("--top", type=int, default=2)
    ap.add_argument("--speednni", action="store_true")
    ap.add_argument("--protein", action="store_true",
                    help="profile the 300x2000 AA LG+G search instead "
                         "of the 1000-taxon DNA workload")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--trace", default=os.environ.get("IQTREE_TPU_PROFILE"))
    a = ap.parse_args()

    import jax

    from iqtree_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from iqtree_tpu.io.alignment import Alignment
    from iqtree_tpu.search.driver import SearchParams, run_search

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if a.protein:
        z = np.load(os.path.join(repo, "bench_data_protein.npz"),
                    allow_pickle=True)
        aln = Alignment.from_sequences(list(z["names"]), list(z["seqs"]),
                                       "AA")
        model = "LG+G"
    else:
        z = np.load(os.path.join(repo, "bench_data.npz"), allow_pickle=True)
        aln = Alignment.from_sequences(list(z["names"]), list(z["seqs"]),
                                       "DNA")
        model = "GTR+G"

    t0 = time.time()
    sp = SearchParams(
        model=model, seed=a.seed, n_init_trees=a.init, n_top_init=a.top,
        fixed_iterations=a.iters, dtype=jnp.float32, speednni=a.speednni,
        log=lambda m: sys.stderr.write(f"[{time.time()-t0:7.1f}s] {m}\n"))
    if a.trace:
        jax.profiler.start_trace(a.trace)
    res = run_search(aln, sp)
    if a.trace:
        jax.profiler.stop_trace()
        sys.stderr.write(f"trace -> {a.trace}\n")
    sys.stderr.write(
        f"total {time.time()-t0:.1f}s lnL {res.best_lnl:.2f} "
        f"iters {res.iterations}\n")


if __name__ == "__main__":
    main()
