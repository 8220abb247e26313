#!/usr/bin/env python
"""Quantify the XLA prep costs around the CS kernel at bench scale."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

import jax

from iqtree_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.time() - t0) / reps


def main():
    t0 = time.time()
    from bench import load_workload
    from iqtree_tpu.engine.kernels.pruning import (
        _fused_site_lnl_cs_local, device_slot_schedule, pack_pair_mats)
    from iqtree_tpu.engine.likelihood import (SiteData, TreeArrays,
                                              branch_transition_mats,
                                              tip_partials)
    from iqtree_tpu.engine.nni import _ptn_invar
    from iqtree_tpu.models.factory import parse_model_string
    from iqtree_tpu.models.optimize import ModelOptimizer
    from iqtree_tpu.trees.tree import PhyloTree

    aln, tree_nwk = load_workload()
    tree = PhyloTree.from_newick(tree_nwk, aln.names)
    subst, rate = parse_model_string("GTR+G", aln)
    opt = ModelOptimizer(subst, rate, dtype=jnp.float32)
    site = SiteData.from_alignment(aln, jnp.float32)
    ta = TreeArrays.from_tree(tree, jnp.float32)
    steps_np, n_slots = device_slot_schedule(tree, ta)
    steps = jnp.asarray(steps_np, jnp.int32)
    ma = jax.jit(opt.build)(opt.init_params())
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    f_trans = jax.jit(lambda: branch_transition_mats(ma, ta.blen))
    trans = f_trans()
    print(f"branch_transition_mats: {timeit(f_trans)*1000:.2f} ms",
          flush=True)

    f_tips = jax.jit(lambda: tip_partials(site, ma.ncat))
    tips = f_tips()
    print(f"tip_partials:           {timeit(f_tips)*1000:.2f} ms",
          flush=True)

    f_pair = jax.jit(lambda tr: pack_pair_mats(tr, steps))
    print(f"pack_pair_mats:         {timeit(f_pair, trans)*1000:.2f} ms",
          flush=True)

    f_inv = jax.jit(lambda: _ptn_invar(ma, site))
    ptn_invar = f_inv()
    print(f"ptn_invar:              {timeit(f_inv)*1000:.2f} ms",
          flush=True)

    f_kern = jax.jit(lambda tr, tp, pi: _fused_site_lnl_cs_local(
        steps, tr, tp, ma.props, ma.state_freq, pi, n_slots=n_slots))
    print(f"cs kernel (pre tips):   "
          f"{timeit(f_kern, trans, tips, ptn_invar)*1000:.2f} ms",
          flush=True)

    def full():
        tr = branch_transition_mats(ma, ta.blen)
        tp = tip_partials(site, ma.ncat)
        pi = _ptn_invar(ma, site)
        s = _fused_site_lnl_cs_local(steps, tr, tp, ma.props,
                                     ma.state_freq, pi, n_slots=n_slots)
        return jnp.sum(site.pattern_freq.astype(jnp.float64)
                       * s.astype(jnp.float64))

    f_full = jax.jit(full)
    print(f"full eval (one jit):    {timeit(f_full)*1000:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
