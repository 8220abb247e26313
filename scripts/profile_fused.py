#!/usr/bin/env python
"""Profile the fused-kernel hot path on the real chip at bench scale.

Times, at 1000 taxa x 10k sites GTR+G4 (the BASELINE.md north-star
workload):
  * fused forward lnL at several pattern tiles
  * XLA mailbox forward (the round-2 bench metric, for comparison)
  * fused value+grad (L-BFGS inner step)
  * one branch-Newton sweep (fused passes + theta + derivs)
Optionally captures a jax.profiler trace (IQTREE_TPU_PROFILE=dir).

Usage: python scripts/profile_fused.py [--tiles 256,512] [--trace DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()


def timeit(f, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.time() - t0) / reps


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="")
    ap.add_argument("--trace", default=os.environ.get("IQTREE_TPU_PROFILE"))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    from iqtree_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    t0 = time.time()
    sys.path.insert(0, "/root/repo")
    from bench import load_workload

    aln, tree_nwk = load_workload()
    from iqtree_tpu.engine.grad import loglik, loglik_fused_fn
    from iqtree_tpu.engine.kernels.pruning import (
        device_slot_schedule, fused_compute_loglik)
    from iqtree_tpu.engine.likelihood import (SiteData, TreeArrays,
                                              compute_loglik)
    from iqtree_tpu.engine.derivatives import optimize_all_branches
    from iqtree_tpu.models.factory import parse_model_string
    from iqtree_tpu.models.optimize import ModelOptimizer
    from iqtree_tpu.trees.tree import PhyloTree

    dtype = jnp.float32
    tree = PhyloTree.from_newick(tree_nwk, aln.names)
    subst, rate = parse_model_string("GTR+G", aln)
    opt = ModelOptimizer(subst, rate, dtype=dtype)
    site = SiteData.from_alignment(aln, dtype)
    ta = TreeArrays.from_tree(tree, dtype)
    steps_np, n_slots = device_slot_schedule(tree, ta)
    steps = jnp.asarray(steps_np)
    params = opt.init_params()
    ma = jax.jit(opt.build)(params)
    P = int(site.tip_codes.shape[1])
    print(f"setup {time.time()-t0:.1f}s  P={P} n_slots={n_slots}",
          flush=True)

    results = {}

    # fused forward at various tiles
    tiles = [int(t) for t in args.tiles.split(",") if t] or [None]
    for tile in tiles:
        f = jax.jit(lambda ta, ma, site, steps, tile=tile:
                    fused_compute_loglik(ta, ma, site, steps, n_slots,
                                         tile=tile)[0])
        tc = time.time()
        try:
            dt = timeit(f, ta, ma, site, steps, reps=args.reps)
        except Exception as e:
            print(f"fused fwd tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        results[f"fused_fwd_tile{tile}"] = dt
        print(f"fused fwd tile={tile}: {dt*1000:.2f} ms "
              f"(compile {time.time()-tc-dt*args.reps:.0f}s)", flush=True)

    # XLA mailbox forward
    f_xla = jax.jit(lambda ta, ma, site: compute_loglik(ta, ma, site)[0])
    dt = timeit(f_xla, ta, ma, site, reps=max(3, args.reps // 2))
    results["xla_fwd"] = dt
    print(f"XLA mailbox fwd: {dt*1000:.2f} ms", flush=True)

    # fused value+grad wrt model params (the L-BFGS inner op)
    lfn = loglik_fused_fn(n_slots)

    def vg(p):
        def neg(p):
            return -lfn(ta, opt.build(p), site, steps)[0]
        return jax.value_and_grad(neg)(p)

    vgj = jax.jit(vg)
    dt = timeit(vgj, params, reps=args.reps)
    results["fused_value_and_grad"] = dt
    print(f"fused value+grad: {dt*1000:.2f} ms", flush=True)

    # one fused branch-Newton sweep
    sweep = jax.jit(lambda ta: optimize_all_branches(
        ta, ma, site, n_sweeps=1, steps=steps, n_slots=n_slots))
    dt = timeit(sweep, ta, reps=max(3, args.reps // 2))
    results["newton_sweep1"] = dt
    print(f"1 branch-Newton sweep: {dt*1000:.2f} ms", flush=True)

    if args.trace:
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            vgj(params)
        f = jax.jit(lambda: fused_compute_loglik(
            ta, ma, site, steps, n_slots)[0])
        for _ in range(3):
            out = f()
        out.block_until_ready()
        jax.profiler.stop_trace()
        print(f"trace -> {args.trace}", flush=True)

    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))
