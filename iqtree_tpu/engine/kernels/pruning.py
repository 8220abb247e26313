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


def pick_tile(n_taxa: int, n_nodes: int, C: int, S: int, n_slots: int,
              dtype, budget: int = 48 * 2**20) -> int:
    """Largest pattern tile whose scoped-VMEM footprint fits the budget.

    Footprint model (validated against the Mosaic compiler's scoped
    accounting at 1000 taxa DNA+G4, which reported 23.66MB at tile 256):
      * grid inputs are DOUBLE-BUFFERED; the tips block
        [n_taxa, S, tile] dominates, with S padded to the f32 sublane
        multiple of 8;
      * the store variant adds slot/scale/message staging scratch;
      * ~4MB covers the kernel body's stack temporaries + semaphores.
    The budget tracks the raised --xla_tpu_scoped_vmem_limit_kib=65536
    set at package import (physical VMEM on v5e is 128MB); 48MB leaves
    a 16MB margin under the 64MB limit."""
    itemsize = jnp.dtype(dtype).itemsize
    S_pad = -(-S // 8) * 8
    trans_bytes = n_nodes * C * S * S * itemsize
    fudge = 4 * 2**20
    for tile in (1024, 512, 256, 128):
        tips2 = 2 * n_taxa * S_pad * tile * itemsize
        slots = n_slots * C * S_pad * tile * itemsize
        sstage = n_slots * 8 * tile * itemsize
        mstage = 4 * C * S_pad * tile * itemsize
        total = 2 * trans_bytes + tips2 + slots + sstage + mstage + fudge
        if total <= budget:
            return tile
    return 128


def fused_site_lnl(
    steps: jnp.ndarray,  # [N-1, 6] int32 slot schedule (device node ids)
    n_slots: int,
    trans: jnp.ndarray,  # [2N, C, S, S]
    tipsP: jnp.ndarray,  # [N, S, P] tip partials
    props: jnp.ndarray,  # [C]
    state_freq: jnp.ndarray,  # [C, S] per-class frequencies
    ptn_invar: jnp.ndarray,  # [P]
    tile: int = None,
    interpret: bool = None,
) -> jnp.ndarray:
    """Per-pattern log-likelihood [P] via the fused kernel.

    With an active device mesh (parallel.get_mesh()) the kernel runs
    per-shard under shard_map over the pattern axis — the SPMD analogue
    of the reference's OpenMP pattern loop (phylokernel.h:252); pattern
    padding then happens per shard and never escapes this function.

    tile=None picks the largest pattern tile whose VMEM working set
    (tips block + all transition matrices + slots) fits the budget:
    tile 512 measures ~40% faster than 256 at 1000 taxa (fewer
    sequential grid iterations)."""
    from ...parallel import PATTERN_AXIS, get_mesh

    mesh = get_mesh()
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as PS

        f = jax.shard_map(
            functools.partial(
                _fused_site_lnl_local, n_slots=n_slots, tile=tile,
                interpret=interpret,
            ),
            mesh=mesh,
            in_specs=(PS(), PS(), PS(None, None, PATTERN_AXIS), PS(),
                      PS(), PS(PATTERN_AXIS)),
            out_specs=PS(PATTERN_AXIS),
            check_vma=False,
        )
        return f(steps, trans, tipsP, props, state_freq, ptn_invar)
    return _fused_site_lnl_local(
        steps, trans, tipsP, props, state_freq, ptn_invar,
        n_slots=n_slots, tile=tile, interpret=interpret,
    )


def _fused_site_lnl_local(
    steps, trans, tipsP, props, state_freq, ptn_invar, *,
    n_slots: int, tile: int = None, interpret: bool = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if tile is None:
        tile = pick_tile(tipsP.shape[0], trans.shape[0], trans.shape[1],
                         trans.shape[2], n_slots, trans.dtype)
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


def _kernel_store(steps_ref, tips_ref, trans_ref, out_ref, up_ref,
                  usc_ref, *rest, n_steps: int, n_taxa: int, tile: int,
                  want_mb: bool):
    """Upward pass that also STORES every internal node's (normalized)
    partial and log-scale to HBM via per-slot async DMA — and, with
    want_mb, the parent-mailbox messages consumed by the downward pass.

    The XLA mailbox pass loses ~55% of its runtime to the dynamic-index
    scatter pushing messages to parents (measured 125ms -> 57ms with
    contiguous writes at 1000 taxa x 10k patterns); in VMEM the "push"
    is a plain slot write and the HBM traffic becomes pure streaming
    DMA.  up_ref/usc_ref/mb_ref live in ANY (HBM) space; DMAs overlap
    compute, synchronized per slot (and per double-buffered message
    stage) so a source is never overwritten while its copy is in
    flight."""
    if want_mb:
        (mb_ref, slots_ref, sscale_ref, sstage_ref, mstage_ref,
         sems, ssems, msems) = rest
    else:
        slots_ref, sscale_ref, sstage_ref, sems, ssems = rest
    f32 = out_ref.dtype
    n_slots = slots_ref.shape[0]
    i_tile = pl.program_id(0)

    def child_message(c_node, c_slot):
        tr = trans_ref[c_node]

        def tip_case(_):
            xp = tips_ref[jnp.minimum(c_node, n_taxa - 1)]
            m = jax.lax.dot_general(
                tr, xp, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return m, jnp.zeros((tile,), f32)

        def slot_case(_):
            x = slots_ref[jnp.maximum(c_slot, 0)]
            m = jax.lax.dot_general(
                tr, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return m, sscale_ref[jnp.maximum(c_slot, 0)]

        return jax.lax.cond(c_slot < 0, tip_case, slot_case, None)

    def copies(slot, node):
        c1 = pltpu.make_async_copy(
            slots_ref.at[slot],
            up_ref.at[node, :, :, pl.ds(i_tile * tile, tile)],
            sems.at[slot],
        )
        # scale rows DMA through an 8-sublane-replicated staging buffer:
        # Mosaic requires DMA slices aligned to the (8,128) tiling, so a
        # single [tile] row cannot be copied directly
        c2 = pltpu.make_async_copy(
            sstage_ref.at[slot],
            usc_ref.at[node, :, pl.ds(i_tile * tile, tile)],
            ssems.at[slot],
        )
        return c1, c2

    def msg_copy(stage, node, side):
        return pltpu.make_async_copy(
            mstage_ref.at[stage],
            mb_ref.at[node, side, :, :, pl.ds(i_tile * tile, tile)],
            msems.at[stage],
        )

    # prime: one no-op DMA per slot/stage (to an unused tip row), so
    # every source invariantly has exactly ONE in-flight copy — the
    # step loop can then wait/start unconditionally
    def prime(slot, _):
        c1, c2 = copies(slot, jnp.int32(0))
        c1.start()
        c2.start()
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_slots), prime, 0)
    if want_mb:
        def prime_m(k, _):
            msg_copy(k, jnp.int32(0), jnp.int32(0)).start()
            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(4), prime_m, 0)

    def step(i, _):
        l = steps_ref[i, 0]
        r = steps_ref[i, 1]
        ls = steps_ref[i, 2]
        rs = steps_ref[i, 3]
        out_slot = steps_ref[i, 4]
        node = steps_ref[i, 5]
        ml, sl = child_message(l, ls)
        mr, sr = child_message(r, rs)
        if want_mb:
            # double-buffered message staging: slots (2b, 2b+1); all
            # index arithmetic pinned to i32 (x64 mode promotes Python
            # literals to i64, which Mosaic rejects)
            b2 = jax.lax.bitwise_and(i, jnp.int32(1)) * jnp.int32(2)
            b3 = b2 + jnp.int32(1)
            cl = msg_copy(b2, node, jnp.int32(0))
            cr = msg_copy(b3, node, jnp.int32(1))
            cl.wait()
            cr.wait()
            mstage_ref[b2] = ml
            mstage_ref[b3] = mr
            cl = msg_copy(b2, node, jnp.int32(0))
            cr = msg_copy(b3, node, jnp.int32(1))
            cl.start()
            cr.start()
        y = ml * mr
        mx = jnp.maximum(jnp.max(y, axis=(0, 1)), SCALE_TINY)

        # wait for the in-flight DMA still reading this slot
        c1, c2 = copies(out_slot, node)
        c1.wait()
        c2.wait()
        slots_ref[out_slot] = y / mx[None, None, :]
        sc = sl + sr + jnp.log(mx)
        sscale_ref[out_slot] = sc
        sstage_ref[out_slot] = jnp.broadcast_to(sc[None, :], (8, tile))
        c1, c2 = copies(out_slot, node)
        c1.start()
        c2.start()
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), step, 0)

    # drain the last in-flight DMA of every slot/stage
    def drain(slot, _):
        c1, c2 = copies(slot, jnp.int32(0))
        c1.wait()
        c2.wait()
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_slots), drain, 0)
    if want_mb:
        def drain_m(k, _):
            msg_copy(k, jnp.int32(0), jnp.int32(0)).wait()
            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(4), drain_m, 0)

    root_slot = steps_ref[n_steps - 1, 4]
    out_ref[0, :] = sscale_ref[root_slot]


def fused_upward_store(
    steps: jnp.ndarray,
    n_slots: int,
    trans: jnp.ndarray,  # [2N, C, S, S]
    tipsP: jnp.ndarray,  # [N, S, P]
    tile: int = None,
    interpret: bool = None,
    want_mailbox: bool = False,
    mb_rows: int = None,
):
    """Upward pass that stores every internal partial to HBM; under an
    active mesh it runs per-shard (shard_map over the pattern axis) and
    the outputs come back SLICED to the true pattern count (per-shard
    tile padding must not interleave into the global array).  See
    _fused_upward_store_local for the single-device contract."""
    from ...parallel import PATTERN_AXIS, get_mesh

    mesh = get_mesh()
    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as PS

        def local(steps_, trans_, tips_):
            outs = _fused_upward_store_local(
                steps_, trans_, tips_, n_slots=n_slots, tile=tile,
                interpret=interpret, want_mailbox=want_mailbox,
                mb_rows=mb_rows,
            )
            P = tips_.shape[2]
            return tuple(o[..., :P] for o in outs)

        out_specs = (
            PS(None, None, None, PATTERN_AXIS),
            PS(None, PATTERN_AXIS),
        )
        if want_mailbox:
            out_specs = out_specs + (
                PS(None, None, None, None, PATTERN_AXIS),
            )
        f = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(PS(), PS(), PS(None, None, PATTERN_AXIS)),
            out_specs=out_specs,
            check_vma=False,
        )
        return f(steps, trans, tipsP)
    return _fused_upward_store_local(
        steps, trans, tipsP, n_slots=n_slots, tile=tile,
        interpret=interpret, want_mailbox=want_mailbox, mb_rows=mb_rows,
    )


def _fused_upward_store_local(
    steps: jnp.ndarray,
    trans: jnp.ndarray,  # [2N, C, S, S]
    tipsP: jnp.ndarray,  # [N, S, P]
    *,
    n_slots: int,
    tile: int = None,
    interpret: bool = None,
    want_mailbox: bool = False,
    mb_rows: int = None,
):
    """(up [2N, C, S, P_pad], up_scale [2N, P_pad][, mb]) with
    internal-node partials computed in VMEM and streamed to HBM.  Tip
    rows of up are NOT filled (callers use tip partials directly);
    padding patterns carry garbage — slice with [..., :P].

    With want_mailbox, additionally returns mb [mb_rows, 2, C, S, P_pad]
    — the transition-applied child messages in the (parent, slot)
    layout the XLA downward_pass consumes (message scales are the
    children's up_scale rows; gather them outside)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if tile is None:
        tile = pick_tile(tipsP.shape[0], trans.shape[0], trans.shape[1],
                         trans.shape[2], n_slots, trans.dtype)
    steps = steps.astype(jnp.int32)
    n_taxa, S, P = tipsP.shape
    C = trans.shape[1]
    n_nodes = trans.shape[0]
    n_steps = steps.shape[0]
    P_pad = ((P + tile - 1) // tile) * tile
    if P_pad != P:
        tipsP = jnp.pad(tipsP, ((0, 0), (0, 0), (0, P_pad - P)),
                        constant_values=1.0)
    dtype = trans.dtype

    out_specs = [
        pl.BlockSpec((1, tile), lambda i, steps: (i * 0, i)),
        pl.BlockSpec(memory_space=pltpu.ANY),  # up (full HBM buffer)
        pl.BlockSpec(memory_space=pltpu.ANY),  # up_scale
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, P_pad), dtype),
        jax.ShapeDtypeStruct((n_nodes, C, S, P_pad), dtype),
        jax.ShapeDtypeStruct((n_nodes, 8, P_pad), dtype),
    ]
    scratch = [
        pltpu.VMEM((n_slots, C, S, tile), dtype),
        pltpu.VMEM((n_slots, tile), dtype),
        pltpu.VMEM((n_slots, 8, tile), dtype),
    ]
    if want_mailbox:
        mb_rows = mb_rows or n_nodes
        out_specs.insert(3, pl.BlockSpec(memory_space=pltpu.ANY))
        out_shape.insert(
            3, jax.ShapeDtypeStruct((mb_rows, 2, C, S, P_pad), dtype)
        )
        scratch.append(pltpu.VMEM((4, C, S, tile), dtype))
        scratch.append(pltpu.SemaphoreType.DMA((n_slots,)))
        scratch.append(pltpu.SemaphoreType.DMA((n_slots,)))
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
    else:
        scratch.append(pltpu.SemaphoreType.DMA((n_slots,)))
        scratch.append(pltpu.SemaphoreType.DMA((n_slots,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P_pad // tile,),
        in_specs=[
            pl.BlockSpec((n_taxa, S, tile), lambda i, steps: (i * 0, i * 0, i)),
            pl.BlockSpec(trans.shape,
                         lambda i, steps: (i * 0, i * 0, i * 0, i * 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(_kernel_store, n_steps=n_steps, n_taxa=n_taxa,
                          tile=tile, want_mb=want_mailbox),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(steps, tipsP, trans)
    if want_mailbox:
        _, up, usc, mb = outs
        return up, usc[:, 0, :], mb
    _, up, usc = outs
    return up, usc[:, 0, :]


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


def fused_compute_loglik(tree_arrays, model, site, steps, n_slots, tile=None):
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
