#!/usr/bin/env python
"""Round-4 kernel ablation: packed (VMEM tips) vs streaming (HBM tips +
group mats, big tiles) forward kernel, and multi-tree batched eval.

Run on the TPU:  python scripts/kernel_ablate3.py [n_taxa] [n_sites]
Prints one JSON line per variant with ms/eval and effective MFU.
"""
import json
import os
import sys
import time

_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=65536"
if _VMEM_FLAG.split("=")[0] not in os.environ.get("LIBTPU_INIT_ARGS", ""):
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from iqtree_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from iqtree_tpu.engine.likelihood import (ModelArrays, SiteData, TreeArrays,
                                          branch_transition_mats,
                                          tip_partials)
from iqtree_tpu.engine.nni import _ptn_invar
from iqtree_tpu.engine.kernels.pruning import (device_slot_schedule,
                                               fused_multi_tree_lnl,
                                               fused_site_lnl,
                                               fused_site_lnl_cs_stream,
                                               multi_tree_schedule,
                                               schedule_pack)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.trees.tree import PhyloTree

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
SITES = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
K = int(os.environ.get("ABLATE_K", "8"))

z = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_data.npz"), allow_pickle=True)
aln = Alignment.from_sequences(list(z["names"]), list(z["seqs"]), "DNA")
tree = PhyloTree.from_newick(str(z["tree"]), aln.names)

from iqtree_tpu.models.dna import create_dna_model
from iqtree_tpu.models.rates import RateModel

s = create_dna_model("GTR")
r = RateModel.make(gamma_cats=4, alpha=0.6)
dtype = jnp.float32
ma = ModelArrays.from_model(s, r, dtype)
site = SiteData.from_alignment(aln, dtype)
ta = TreeArrays.from_tree(tree, dtype)
P = int(site.tip_codes.shape[1])
pack = schedule_pack(ma.ncat, ma.num_states)

# useful FLOPs of ONE tree eval (pruning only; bench.py model)
C, S = 4, 4
n_nodes = 2 * aln.n_taxa - 2
flops1 = n_nodes * C * (2 * S * S * P + 4 * S * P)
PEAK = 197e12 / 2


def timeit(f, reps=30):
    f().block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = f()
    out.block_until_ready()
    return (time.time() - t0) / reps


steps, n_slots = device_slot_schedule(tree, ta, pack=pack)
steps = jnp.asarray(steps)
trans = branch_transition_mats(ma, ta.blen)
tips = tip_partials(site, ma.ncat)
inv = _ptn_invar(ma, site)

f_packed = jax.jit(lambda t: fused_site_lnl(
    steps, n_slots, branch_transition_mats(ma, t), tips, ma.props,
    ma.state_freq, inv))
dt = timeit(lambda: f_packed(ta.blen))
print(json.dumps({"variant": "packed_vmem_tips", "ms_per_eval":
                  round(dt * 1e3, 3), "mfu_pct":
                  round(100 * flops1 / dt / PEAK, 2)}), flush=True)

f_stream = jax.jit(lambda t: fused_site_lnl_cs_stream(
    steps, n_slots, branch_transition_mats(ma, t), tips, ma.props,
    ma.state_freq, inv))
dt = timeit(lambda: f_stream(ta.blen))
print(json.dumps({"variant": "stream_hbm_tips", "ms_per_eval":
                  round(dt * 1e3, 3), "mfu_pct":
                  round(100 * flops1 / dt / PEAK, 2)}), flush=True)

# ---- multi-tree batch: K perturbed topologies in one launch ----------
rng = np.random.default_rng(0)
trees = [tree]
for _ in range(K - 1):
    t2 = trees[-1].copy()
    e = t2.internal_edges()
    for _ in range(3):
        t2.apply_nni(int(e[rng.integers(len(e))]), int(rng.integers(2)))
        e = t2.internal_edges()
    trees.append(t2)
pairs = [(t2, TreeArrays.from_tree(t2, dtype)) for t2 in trees]
sk, sg, ns_m, roots = multi_tree_schedule(pairs, pack)
sk, sg, roots = jnp.asarray(sk), jnp.asarray(sg), jnp.asarray(roots)
blens = jnp.stack([p[1].blen for p in pairs])


def multi(blens_k):
    tr = jnp.concatenate([branch_transition_mats(ma, b) for b in blens_k])
    return fused_site_lnl_cs_stream(
        sk, ns_m, tr, tips, ma.props, ma.state_freq, inv, roots=roots,
        gather_steps=sg)


f_multi = jax.jit(multi)
dt = timeit(lambda: f_multi(blens), reps=10)
print(json.dumps({"variant": f"stream_multi_tree_K{K}",
                  "ms_per_eval": round(dt * 1e3 / K, 3),
                  "ms_per_launch": round(dt * 1e3, 3),
                  "mfu_pct": round(100 * K * flops1 / dt / PEAK, 2)}),
      flush=True)
