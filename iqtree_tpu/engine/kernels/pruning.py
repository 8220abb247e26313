"""Fused Pallas pruning kernel: whole-tree site log-likelihoods in VMEM.

The XLA engine streams [2N, C, S, P] buffers through HBM on every pass;
this kernel instead evaluates the ENTIRE post-order inside VMEM, one
pattern tile per grid step:

  * topology arrives as a Sethi-Ullman slot schedule (schedule.py):
    partials live in <= ceil(log2 N)+1 VMEM slots (5 slots for 1000
    taxa), freed as soon as the parent consumes them;
  * the transition matrices (all 2N of them: 2MB at 1000 taxa DNA+G4)
    and the tile's tip partials are resident in VMEM;
  * per step: two [C,S,S] x [C,S,T] contractions, rescale, accumulate
    per-pattern log-scale — no HBM traffic at all between nodes.

Output is the per-pattern log-likelihood vector; the weighted total is a
single dot outside.  This is the speed-of-light analogue of the
reference's AVX kernels + OpenMP pattern loop (phylokernel.h:70-472).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALE_TINY = 1e-30


def _kernel(steps_ref, tips_ref, trans_ref, rootw_ref, invar_ref,
            out_ref, slots_ref, sscale_ref, *, n_steps: int, n_taxa: int):
    C = trans_ref.shape[1]
    S = trans_ref.shape[2]
    T = tips_ref.shape[2]
    f32 = out_ref.dtype

    def child_message(c_node, c_slot):
        tr = trans_ref[c_node]  # [C, S, S]

        def tip_case(_):
            xp = tips_ref[jnp.minimum(c_node, n_taxa - 1)]  # [S, T]
            # m[c,s,:] = sum_t tr[c,s,t] * xp[t,:]
            m = jax.lax.dot_general(
                tr, xp,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [C, S, T]
            return m, jnp.zeros((T,), f32)

        def slot_case(_):
            x = slots_ref[jnp.maximum(c_slot, 0)]  # [C, S, T]
            m = jax.lax.dot_general(
                tr, x,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [C, S, T]
            return m, sscale_ref[jnp.maximum(c_slot, 0)]

        return jax.lax.cond(c_slot < 0, tip_case, slot_case, None)

    def step(i, _):
        l = steps_ref[i, 0]
        r = steps_ref[i, 1]
        ls = steps_ref[i, 2]
        rs = steps_ref[i, 3]
        out_slot = steps_ref[i, 4]
        ml, sl = child_message(l, ls)
        mr, sr = child_message(r, rs)
        y = ml * mr  # [C, S, T]
        mx = jnp.maximum(jnp.max(y, axis=(0, 1)), SCALE_TINY)  # [T]
        slots_ref[out_slot] = y / mx[None, None, :]
        sscale_ref[out_slot] = sl + sr + jnp.log(mx)
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)

    root_slot = steps_ref[n_steps - 1, 4]
    x = slots_ref[root_slot]  # [C, S, T]
    w = rootw_ref[...]  # [C, S] = props_c * pi_c
    mix = jnp.sum(w[:, :, None] * x, axis=(0, 1))  # [T]
    lnl = jnp.log(jnp.maximum(mix, SCALE_TINY)) + sscale_ref[root_slot]
    invar = invar_ref[0]
    out_ref[0, :] = jnp.where(
        invar > 0,
        jnp.logaddexp(lnl, jnp.log(jnp.maximum(invar, SCALE_TINY))),
        lnl,
    )


def fused_site_lnl(
    steps: jnp.ndarray,  # [N-1, 6] int32 slot schedule (device node ids)
    n_slots: int,
    trans: jnp.ndarray,  # [2N, C, S, S]
    tipsP: jnp.ndarray,  # [N, S, P] tip partials
    props: jnp.ndarray,  # [C]
    state_freq: jnp.ndarray,  # [C, S] per-class frequencies
    ptn_invar: jnp.ndarray,  # [P]
    tile: int = 256,
    interpret: bool = None,
) -> jnp.ndarray:
    """Per-pattern log-likelihood [P] via the fused kernel."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    # Mosaic rejects int64 scalar-prefetch refs (x64 mode promotes the
    # host schedule to i64); the node ids always fit in int32
    steps = steps.astype(jnp.int32)
    n_taxa, S, P = tipsP.shape
    C = trans.shape[1]
    n_steps = steps.shape[0]
    P_pad = ((P + tile - 1) // tile) * tile
    if P_pad != P:
        tipsP = jnp.pad(tipsP, ((0, 0), (0, 0), (0, P_pad - P)),
                        constant_values=1.0)
        ptn_invar = jnp.pad(ptn_invar, (0, P_pad - P))
    dtype = trans.dtype

    # constant block indices are written as i*0 so they inherit the
    # program id's int32 dtype: under jax_enable_x64 a literal 0 lowers
    # as i64 and Mosaic refuses the mixed (i64, i32) index-map signature
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P_pad // tile,),
        in_specs=[
            pl.BlockSpec((n_taxa, S, tile), lambda i, steps: (i * 0, i * 0, i)),
            pl.BlockSpec(trans.shape,
                         lambda i, steps: (i * 0, i * 0, i * 0, i * 0)),
            pl.BlockSpec((C, S), lambda i, steps: (i * 0, i * 0)),
            pl.BlockSpec((1, tile), lambda i, steps: (i * 0, i)),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, steps: (i * 0, i)),
        scratch_shapes=[
            pltpu.VMEM((n_slots, C, S, tile), dtype),
            pltpu.VMEM((n_slots, tile), dtype),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_steps=n_steps, n_taxa=n_taxa),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, P_pad), dtype),
        interpret=interpret,
    )(steps, tipsP, trans, props[:, None] * state_freq, ptn_invar[None, :])
    return out[0, :P]


def device_slot_schedule(tree_host, tree_arrays) -> Tuple[np.ndarray, int]:
    """Slot schedule with node ids translated to the device numbering
    used by TreeArrays / branch_transition_mats."""
    from .schedule import slot_schedule

    steps, n_slots = slot_schedule(tree_host)
    h2d = np.asarray(tree_arrays.h2d)
    steps = steps.copy()
    steps[:, 0] = h2d[steps[:, 0]]
    steps[:, 1] = h2d[steps[:, 1]]
    steps[:, 5] = h2d[steps[:, 5]]
    return steps, n_slots


def fused_compute_loglik(tree_arrays, model, site, steps, n_slots, tile=256):
    """(lnL, site_lnl) through the fused kernel (drop-in for
    compute_loglik when a slot schedule is available)."""
    from ..likelihood import branch_transition_mats, tip_partials
    from ..nni import _ptn_invar

    trans = branch_transition_mats(model, tree_arrays.blen)
    tips = tip_partials(site, model.ncat)
    ptn_invar = _ptn_invar(model, site)
    site_lnl = fused_site_lnl(
        jnp.asarray(steps), n_slots, trans, tips, model.props,
        model.state_freq, ptn_invar, tile=tile,
    )
    from ..likelihood import asc_correction

    site_lnl = site_lnl - asc_correction(site, site_lnl)
    # f64 total (matches root_loglik): f32 resolution at |lnL| ~ 1e6+ is
    # coarser than the optimizers' tolerances
    total = jnp.sum(
        site.pattern_freq.astype(jnp.float64) * site_lnl.astype(jnp.float64)
    )
    return total, site_lnl
