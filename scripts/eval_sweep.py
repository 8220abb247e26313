#!/usr/bin/env python
"""Sweep evaluate_nnis edge_chunk sizes + paired on/off at 1000 taxa.

The NNI evaluator splits edges into lax.map chunks to bound peak HBM;
chunk size trades sequential launches against working-set size.  This
measures warm wall per full-tree evaluation for several chunk sizes, and
the paired-vs-unpaired cost ratio."""

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


def main():
    import jax

    from iqtree_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from iqtree_tpu.io.alignment import Alignment
    from iqtree_tpu.engine.likelihood import SiteData
    from iqtree_tpu.engine.nni import evaluate_nnis
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
    edges = tree.internal_edges()
    edges_dev = jnp.asarray(np.asarray(ta.h2d)[edges])

    for paired in (True, False):
        for chunk in (128, 256, 512):
            f = jax.jit(
                lambda t, m, e: evaluate_nnis(
                    t, m, site, e, nni5=True, steps=steps, n_slots=n_slots,
                    edge_chunk=chunk, paired=paired))
            try:
                t0 = time.perf_counter()
                out = f(ta, model, edges_dev)
                jax.block_until_ready(out.lnl)
                first = time.perf_counter() - t0
                t0 = time.perf_counter()
                K = 3
                for _ in range(K):
                    out = f(ta, model, edges_dev)
                jax.block_until_ready(out.lnl)
                warm = (time.perf_counter() - t0) / K
                print(f"paired={paired} chunk={chunk}: first {first:.1f}s "
                      f"warm {warm*1000:.0f} ms", flush=True)
            except Exception as e:
                print(f"paired={paired} chunk={chunk}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
