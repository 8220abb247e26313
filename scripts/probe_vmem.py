"""Probe: does the store-variant fused kernel compile+run at bench scale?

Usage: python scripts/probe_vmem.py TILE [scoped_kib]
"""
import os, sys, time
tile = int(sys.argv[1])
if len(sys.argv) > 2:
    os.environ["LIBTPU_INIT_ARGS"] = os.environ.get("LIBTPU_INIT_ARGS", "") + \
        f" --xla_tpu_scoped_vmem_limit_kib={int(sys.argv[2])}"
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iqtree_tpu.engine.kernels.pruning import fused_upward_store

n_taxa, C, S = 1000, 4, 4
P = 9857  # ~bench pattern count
n_nodes = 2 * n_taxa
n_slots = 11
rng = np.random.default_rng(0)
# synthetic schedule: caterpillar-ish is fine for compile/runtime probing;
# build a valid balanced slot schedule instead: pair up nodes
steps = []
# simple: left-deep chain, slot 0/1 alternating won't exercise slots; use a
# real schedule from a random tree instead
from iqtree_tpu.trees.tree import random_tree
from iqtree_tpu.engine.likelihood import TreeArrays
from iqtree_tpu.engine.kernels.pruning import device_slot_schedule
tree = random_tree(n_taxa, np.random.default_rng(1))
ta = TreeArrays.from_tree(tree, jnp.float32)
steps, n_slots = device_slot_schedule(tree, ta)
print("n_slots", n_slots, "tile", tile, flush=True)
steps = jnp.asarray(steps)
trans = jnp.asarray(rng.uniform(0.1, 1.0, (n_nodes, C, S, S)), jnp.float32)
tips = jnp.asarray(rng.uniform(0.1, 1.0, (n_taxa, S, P)), jnp.float32)

f = jax.jit(lambda tr, tp: fused_upward_store(steps, n_slots, tr, tp,
                                              tile=tile, want_mailbox=True,
                                              mb_rows=n_nodes + 32))
t0 = time.time()
try:
    out = f(trans, tips)
    jax.block_until_ready(out)
    print(f"OK compile+run {time.time()-t0:.1f}s", flush=True)
    t1 = time.time()
    for _ in range(5):
        out = f(trans, tips)
    jax.block_until_ready(out)
    print(f"steady {(time.time()-t1)/5*1000:.1f} ms/call", flush=True)
except Exception as e:
    print("FAIL:", str(e)[-1500:], flush=True)
    sys.exit(1)
