#!/usr/bin/env python
"""Warm per-call timings of the search's device programs at 1000 taxa.

Separates compile time from steady state for: the fused lnl eval, the
fused Newton-derivs kernel, optimize_all_branches at n_sweeps 2/20/100,
and the batched NNI evaluation — the programs the round-5 search profile
shows dominating wall time."""

import os
import sys
import time

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(f, n=5):
    f()  # compile+warm
    t0 = time.perf_counter()
    t1 = t0
    import jax
    for _ in range(n):
        out = f()
    jax.block_until_ready(out)
    return (time.perf_counter() - t1) / n


def main():
    import jax

    from iqtree_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from iqtree_tpu.io.alignment import Alignment
    from iqtree_tpu.engine.likelihood import SiteData, TreeArrays
    from iqtree_tpu.models.factory import parse_model_string
    from iqtree_tpu.models.optimize import ModelOptimizer
    from iqtree_tpu.trees.tree import PhyloTree
    from iqtree_tpu.search.nni_search import NNIEngine

    z = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_data.npz"), allow_pickle=True)
    aln = Alignment.from_sequences(list(z["names"]), list(z["seqs"]), "DNA")
    tree = PhyloTree.from_newick(str(z["tree"]), aln.names)
    dtype = jnp.float32
    subst, rate = parse_model_string("GTR+G", aln)
    opt = ModelOptimizer(subst, rate, dtype=dtype)
    site = SiteData.from_alignment(aln, dtype)
    model = jax.jit(opt.build)(opt.init_params())

    eng = NNIEngine(model, site, dtype=dtype)
    ta = eng.arrays(tree)
    steps, n_slots = eng._schedule(tree, ta)
    print(f"schedule: rows={steps.shape[0]} slots={n_slots} "
          f"pack={eng._pack} paired={eng._paired} "
          f"edge_chunk={eng._edge_chunk}", flush=True)

    from iqtree_tpu.engine.kernels.pruning import fused_compute_loglik
    from iqtree_tpu.engine.kernels.cs_kernels import fused_newton_derivs
    from iqtree_tpu.engine.nni import _ptn_invar
    from iqtree_tpu.engine.likelihood import tip_partials

    f_lnl = jax.jit(lambda t_, m: fused_compute_loglik(
        t_, m, site, steps, n_slots)[0])
    c0 = time.perf_counter()
    f_lnl(ta, model).block_until_ready()
    print(f"lnl: first {time.perf_counter()-c0:.2f}s "
          f"warm {t(lambda: f_lnl(ta, model))*1000:.1f} ms", flush=True)

    tips = tip_partials(site, model.ncat)
    inv = _ptn_invar(model, site)
    f_nd = jax.jit(lambda b: fused_newton_derivs(
        steps, n_slots, model, b, tips, site.pattern_freq, inv))
    c0 = time.perf_counter()
    jax.block_until_ready(f_nd(ta.blen))
    print(f"newton_derivs: first {time.perf_counter()-c0:.2f}s "
          f"warm {t(lambda: f_nd(ta.blen))*1000:.1f} ms", flush=True)

    for n in (2, 20, 100):
        c0 = time.perf_counter()
        eng.optimize_branches(tree.copy(), n)
        first = time.perf_counter() - c0
        c0 = time.perf_counter()
        K = 3
        for _ in range(K):
            eng.optimize_branches(tree.copy(), n)
        print(f"optimize_branches({n}): first {first:.2f}s "
              f"warm {(time.perf_counter()-c0)/K*1000:.0f} ms", flush=True)

    edges = tree.internal_edges()
    edges_dev = np.asarray(ta.h2d)[edges]
    c0 = time.perf_counter()
    out = eng._evaluate(tree, ta, edges_dev)
    jax.block_until_ready(out.lnl)
    first = time.perf_counter() - c0
    c0 = time.perf_counter()
    K = 3
    for _ in range(K):
        out = eng._evaluate(tree, ta, edges_dev)
    jax.block_until_ready(out.lnl)
    print(f"evaluate_nnis(E={len(edges)}): first {first:.2f}s "
          f"warm {(time.perf_counter()-c0)/K*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
