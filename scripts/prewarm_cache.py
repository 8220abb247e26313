#!/usr/bin/env python
"""Prewarm the persistent XLA compilation cache with the flagship
executables (round-4 verdict item 6: cut cold-start).

A cold machine pays ~9 min of Mosaic/XLA compiles before the first
1000-taxon fit; this script compiles the benchmark-shape programs once
so every later process (bench.py, CLI runs at the same shapes) loads
them from ~/.cache/iqtree_tpu/jax_cache in seconds.  Run it after
install, or in CI before benchmarking:

    python scripts/prewarm_cache.py [n_taxa] [n_sites]

The cache is keyed by program shape; prewarming the default benchmark
shape (1000 x 10000) covers the driver's bench run.
"""
import os
import sys
import time

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

from iqtree_tpu.utils.jaxcache import enable_compilation_cache

cache = enable_compilation_cache()
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

t0 = time.time()
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
SITES = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

npz = os.path.join(REPO, "bench_data.npz")
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.trees.tree import PhyloTree

if os.path.exists(npz) and N == 1000 and SITES == 10000:
    z = np.load(npz, allow_pickle=True)
    aln = Alignment.from_sequences(list(z["names"]), list(z["seqs"]), "DNA")
    tree = PhyloTree.from_newick(str(z["tree"]), aln.names)
else:
    from iqtree_tpu.utils.simulate import make_benchmark_alignment

    tree, names, seqs = make_benchmark_alignment(N, SITES, 2024)
    aln = Alignment.from_sequences(names, seqs, "DNA")

from iqtree_tpu.engine.kernels.pruning import (device_slot_schedule,
                                               fused_compute_loglik,
                                               schedule_pack)
from iqtree_tpu.engine.likelihood import SiteData, TreeArrays
from iqtree_tpu.engine.nni import evaluate_nnis
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.models.optimize import ModelOptimizer, optimize_model_and_branches

dtype = jnp.float32
subst, rate = parse_model_string("GTR+G", aln)
opt = ModelOptimizer(subst, rate, dtype=dtype)
site = SiteData.from_alignment(aln, dtype)
ta = TreeArrays.from_tree(tree, dtype)
steps, n_slots = device_slot_schedule(tree, ta, pack=schedule_pack(4, 4))
steps = jnp.asarray(steps)

print(f"[prewarm] cache {cache}; compiling fit path...", flush=True)
optimize_model_and_branches(opt, ta, site, rounds=1, tol=1e9,
                            steps=steps, n_slots=n_slots)
print(f"[prewarm] fit path done at {time.time()-t0:.0f}s; eval...",
      flush=True)
ma = jax.jit(opt.build)(opt.init_params())
jax.jit(lambda t, m: fused_compute_loglik(t, m, site, steps, n_slots)[0])(
    ta, ma).block_until_ready()
print(f"[prewarm] eval done at {time.time()-t0:.0f}s; search NNI "
      "evaluator...", flush=True)
from iqtree_tpu.search.nni_search import NNIEngine

eng = NNIEngine(ma, site, dtype=dtype)
edges = tree.internal_edges()
ta2 = eng.arrays(tree)
eng._evaluate(tree, ta2, np.asarray(ta2.h2d)[edges])
print(f"[prewarm] complete in {time.time()-t0:.0f}s "
      f"(subsequent processes load these programs from cache)",
      flush=True)
