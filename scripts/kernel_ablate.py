#!/usr/bin/env python
"""Ablation micro-benchmark of the CS-packed pruning kernel on the chip.

Builds kernel variants with individual per-step components disabled to
find where the per-step time actually goes at bench scale.  Variants:

  full        the production _kernel_cs step
  nomatmul    staging + rescale + writes, matmul replaced by xstage copy
  norescale   matmul + writes, no max/div/log (scale = sl + sr)
  nostage     matmul reads a fixed xstage (no per-step staging writes)
  noscale     no scale reads/writes at all
  highprec3   matmul precision HIGH (3-pass f32) instead of HIGHEST (6)
  empty       loop body does nothing (loop + scalar-read floor)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iqtree_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

CS = 16
S_T = 4
TINY = 1e-30


def make_kernel(variant, n_steps, n_taxa, prec):
    def kern(steps_ref, tips_ref, pair_ref, out_ref, slots_ref,
             sscale_ref, xstage_ref):
        f32 = out_ref.dtype
        xstage_ref[...] = jnp.zeros(xstage_ref.shape, f32)
        sscale_ref[...] = jnp.zeros(sscale_ref.shape, f32)

        def stage(b, c_node, c_slot):
            @pl.when(c_slot < 0)
            def _tip():
                xstage_ref[pl.ds(b * CS, S_T)] = tips_ref[
                    jnp.minimum(c_node, n_taxa - 1)]

            @pl.when(c_slot >= 0)
            def _slot():
                xstage_ref[pl.ds(b * CS, CS)] = slots_ref[
                    jnp.maximum(c_slot, 0)]

            if variant == "noscale":
                return jnp.zeros((slots_ref.shape[2],), f32)
            return sscale_ref[jnp.maximum(c_slot, 0)] * (c_slot >= 0)

        def step(i, _):
            l = steps_ref[i, 0]
            r = steps_ref[i, 1]
            ls = steps_ref[i, 2]
            rs = steps_ref[i, 3]
            out_slot = steps_ref[i, 4]
            if variant == "empty":
                return 0
            sl = stage(0, l, ls) if variant != "nostage" else sscale_ref[0]
            sr = stage(1, r, rs) if variant != "nostage" else sscale_ref[1]
            if variant == "nomatmul":
                m = xstage_ref[...]
            else:
                m = jax.lax.dot_general(
                    pair_ref[i], xstage_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=prec)
            y = m[:CS] * m[CS:]
            if variant == "norescale":
                slots_ref[out_slot] = y
                sscale_ref[out_slot] = sl + sr
            else:
                mx = jnp.maximum(jnp.max(y, axis=0), TINY)
                slots_ref[out_slot] = y / mx[None, :]
                sscale_ref[out_slot] = sl + sr + jnp.log(mx)
            return 0

        jax.lax.fori_loop(0, n_steps, step, 0)
        root_slot = steps_ref[n_steps - 1, 4]
        out_ref[0, :] = sscale_ref[jnp.maximum(root_slot, 0)]

    return kern


def build(variant, steps, tips, pair, n_slots, tile, prec):
    n_taxa = tips.shape[0]
    n_steps = steps.shape[0]
    P = tips.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // tile,),
        in_specs=[
            pl.BlockSpec((n_taxa, S_T, tile), lambda i, s: (i * 0, i * 0, i)),
            pl.BlockSpec(pair.shape, lambda i, s: (i * 0, i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, s: (i * 0, i)),
        scratch_shapes=[
            pltpu.VMEM((n_slots, CS, tile), jnp.float32),
            pltpu.VMEM((n_slots, tile), jnp.float32),
            pltpu.VMEM((2 * CS, tile), jnp.float32),
        ],
    )
    return pl.pallas_call(
        make_kernel(variant, n_steps, n_taxa, prec),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
    )


def main():
    t0 = time.time()
    from bench import load_workload
    from iqtree_tpu.engine.kernels.pruning import (device_slot_schedule,
                                                   pack_pair_mats)
    from iqtree_tpu.engine.likelihood import SiteData, TreeArrays
    from iqtree_tpu.trees.tree import PhyloTree

    aln, tree_nwk = load_workload()
    tree = PhyloTree.from_newick(tree_nwk, aln.names)
    site = SiteData.from_alignment(aln, jnp.float32)
    ta = TreeArrays.from_tree(tree, jnp.float32)
    steps_np, n_slots = device_slot_schedule(tree, ta)
    steps = jnp.asarray(steps_np, jnp.int32)
    rng = np.random.default_rng(0)
    n_nodes = 2 * aln.n_taxa - 1
    trans = jnp.asarray(rng.random((n_nodes, 4, 4, 4)), jnp.float32)
    pair = pack_pair_mats(trans, steps)
    P = site.tip_codes.shape[1]
    tile = 512
    P_pad = ((P + tile - 1) // tile) * tile
    from iqtree_tpu.engine.likelihood import tip_partials
    tips = tip_partials(site, 1)[:, 0] if False else None
    # simple random tips [N, S, P_pad]
    tips = jnp.asarray(rng.random((aln.n_taxa, S_T, P_pad)), jnp.float32)
    print(f"setup {time.time()-t0:.1f}s  P_pad={P_pad}", flush=True)

    H = jax.lax.Precision.HIGHEST
    variants = [
        ("full", "full", H),
        ("highprec3", "full", jax.lax.Precision.HIGH),
        ("defprec", "full", jax.lax.Precision.DEFAULT),
        ("nomatmul", "nomatmul", H),
        ("norescale", "norescale", H),
        ("nostage", "nostage", H),
        ("noscale", "noscale", H),
        ("empty", "empty", H),
    ]
    for name, variant, prec in variants:
        try:
            f = jax.jit(build(variant, steps, tips, pair, n_slots, tile,
                              prec))
            out = f(steps, tips, pair)
            out.block_until_ready()
            t1 = time.time()
            K = 20
            for _ in range(K):
                out = f(steps, tips, pair)
            out.block_until_ready()
            dt = (time.time() - t1) / K
            print(f"{name:12s} {dt*1000:8.2f} ms "
                  f"({dt/ (steps.shape[0] * P_pad // tile) * 1e6:.2f} "
                  f"us/step)", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
