#!/usr/bin/env python
"""Real-TPU (Mosaic) smoke lane for the fused Pallas kernels.

The unit-test suite runs Pallas in interpret mode on CPU, which cannot
catch Mosaic-specific failures (VMEM accounting, layout/tiling limits,
DMA alignment) — exactly the class of bug that broke round 1's benchmark
(scoped-VMEM OOM at 1000 taxa, BENCH_r01).  This script compiles and
runs the fused forward kernel AND the store-variant backward path
non-interpreted at several sizes and state counts, checking against the
XLA engine, and must pass before any bench/perf work ships.

Run (on the TPU worker):  python tests/tpu/smoke.py
Exit code 0 = all configurations pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import iqtree_tpu  # noqa: F401  (sets LIBTPU_INIT_ARGS before jax loads)
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from iqtree_tpu.engine.grad import loglik, loglik_fused_fn
from iqtree_tpu.engine.kernels.pruning import device_slot_schedule
from iqtree_tpu.engine.likelihood import (
    ModelArrays,
    SiteData,
    TreeArrays,
    compute_loglik,
)
from iqtree_tpu.io.alignment import Alignment
from iqtree_tpu.models.factory import parse_model_string
from iqtree_tpu.trees.tree import random_tree

# (n_taxa, n_patterns, alphabet, model) — covers the tile ladder and the
# S=4 / S=20 tiling regimes; 1000 taxa reproduces the round-1 OOM scale
CONFIGS = [
    (44, 355, "DNA", "GTR+G"),
    (200, 2000, "DNA", "GTR+G"),
    (1000, 10000, "DNA", "GTR+G"),
    (27, 269, "AA", "LG+G"),
    (200, 1000, "AA", "WAG+G"),
    # S=61 codon: the one tiling regime the lane previously missed
    # (state axis pads 61 -> 64; VERDICT r2 item 9)
    (16, 300, "CODON", "GY+F3X4"),
]

ALPHABETS = {
    "DNA": list("ACGT"),
    "AA": list("ARNDCQEGHILKMFPSTWYV"),
}

_CODONS = [a + b + c for a in "TCAG" for b in "TCAG" for c in "TCAG"
           if a + b + c not in ("TAA", "TAG", "TGA")]


def run_config(n_taxa, n_sites, st, model_str):
    rng = np.random.default_rng(1234)
    if st == "CODON":
        seqs = ["".join(rng.choice(_CODONS, n_sites)) for _ in range(n_taxa)]
    else:
        seqs = [
            "".join(rng.choice(ALPHABETS[st], n_sites)) for _ in range(n_taxa)
        ]
    aln = Alignment.from_sequences(
        [f"t{i}" for i in range(n_taxa)], seqs, st,
    )
    subst, rate = parse_model_string(model_str, aln)
    ma = ModelArrays.from_model(subst, rate, jnp.float32)
    tree = random_tree(n_taxa, rng)
    ta = TreeArrays.from_tree(tree, jnp.float32)
    site = SiteData.from_alignment(aln, jnp.float32)
    steps, n_slots = device_slot_schedule(tree, ta)
    steps = jnp.asarray(steps)

    t0 = time.time()
    # XLA engine value (the oracle)
    lnl_x = float(jax.jit(lambda: compute_loglik(ta, ma, site)[0])())

    # fused forward
    lfn = loglik_fused_fn(n_slots)
    lnl_f = float(jax.jit(lambda: lfn(ta, ma, site, steps)[0])())
    assert abs(lnl_f - lnl_x) < max(1e-3, 2e-8 * abs(lnl_x)), (
        f"fused forward mismatch: {lnl_f} vs {lnl_x}"
    )

    # fused backward (store variant + downward sweep) vs XLA custom VJP
    g_f = jax.jit(
        jax.grad(lambda b: lfn(ta.with_blen(b), ma, site, steps)[0])
    )(ta.blen)
    g_x = jax.jit(
        jax.grad(lambda b: loglik(ta.with_blen(b), ma, site)[0])
    )(ta.blen)
    g_f, g_x = np.asarray(g_f), np.asarray(g_x)
    assert np.isfinite(g_f).all(), "non-finite fused gradient"
    denom = np.maximum(np.abs(g_x), 1e-2 * np.abs(g_x).max() + 1e-6)
    rel = np.max(np.abs(g_f - g_x) / denom)
    # tightened from 5e-2 (VERDICT r2 item 9): a genuine cotangent bug
    # should not hide under a loose f32 bound; 2e-3 leaves room for the
    # fused kernels' different reduction order at f32
    assert rel < 2e-3, f"fused gradient mismatch: max rel {rel}"
    return time.time() - t0, lnl_f


def main():
    assert jax.default_backend() in ("tpu", "axon"), (
        f"smoke lane must run on TPU, got {jax.default_backend()}"
    )
    failures = 0
    for cfg in CONFIGS:
        n_taxa, n_sites, st, model_str = cfg
        try:
            dt, lnl = run_config(n_taxa, n_sites, st, model_str)
            print(f"OK   {st:3s} {model_str:8s} {n_taxa:5d} taxa x "
                  f"{n_sites} sites  lnl={lnl:.2f}  ({dt:.1f}s)",
                  flush=True)
        except Exception as e:
            failures += 1
            print(f"FAIL {st:3s} {model_str:8s} {n_taxa:5d} taxa: "
                  f"{str(e)[-400:]}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
