"""Jittable L-BFGS minimization over pytrees (hand-rolled, compact).

Replaces the reference's BFGS `minimizeMultiDimen`
(/root/reference/optimization.cpp:560) and the vendored L-BFGS-B
(/root/reference/lbfgsb/): bounds are handled upstream by unconstrained
reparameterization (log/sigmoid/softmax), so plain L-BFGS with Armijo
backtracking suffices.

Hand-rolled rather than optax.lbfgs: the optimization runs *inside* jit
against an objective whose gradient is itself a two-sweep tree program;
optax's zoom linesearch multiplied that graph enough to blow up XLA
compile times (and crashed the axon TPU compiler at 1000 taxa).  This
implementation keeps the compiled graph to ONE value_and_grad + ONE
value-only evaluation per iteration: two-loop recursion on a flattened
parameter vector, Armijo backtracking folded into a lax.while_loop.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _ravel(pytree):
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    shapes = [jnp.shape(l) for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    vec = jnp.concatenate([jnp.reshape(l, (-1,)) for l in leaves]) if leaves else jnp.zeros((0,))

    def unravel(v):
        out = []
        ofs = 0
        for s, n in zip(shapes, sizes):
            out.append(jnp.reshape(v[ofs:ofs + n], s))
            ofs += n
        return jax.tree_util.tree_unflatten(treedef, out)

    return vec, unravel


def zero_lbfgs_state(x0, memory_size: int = 10):
    """Empty curvature history for `init_state` — identical behavior to
    a fresh start, but with a stable pytree structure so chunked jitted
    callers compile once."""
    vec, _ = _ravel(x0)
    n = vec.shape[0]
    dtype = vec.dtype if n else jnp.float32
    m = memory_size
    return (
        jnp.zeros((m, n), dtype),
        jnp.zeros((m, n), dtype),
        jnp.zeros((m,), dtype),
        jnp.asarray(0),
    )


def lbfgs_minimize(
    fun: Callable,
    x0,
    max_iters: int = 100,
    grad_tol: float = 1e-6,
    memory_size: int = 10,
    max_backtracks: int = 25,
    init_state=None,
    forward_grad: bool = False,
    ftol: float = 0.0,
    noise_tol: float = 0.0,
):
    """Minimize `fun(pytree) -> scalar`.  Returns (x, value, state); the
    state tuple (S, Y, rho, k) can be fed back via `init_state` to
    continue a chunked optimization with its curvature history intact
    (k doubles as the cumulative iteration count).

    forward_grad=True computes gradients by n forward-mode JVPs (one per
    parameter, sequential lax.map) instead of reverse mode — for
    objectives whose program is forward-only (e.g. the site-specific
    engine's fori_loop pruning, which has no custom VJP) with few
    parameters.

    ftol > 0 stops after TWO CONSECUTIVE accepted steps that each
    improve the objective by less than ftol: near the optimum the
    f32-scaled gradient never reaches grad_tol and every further
    iteration burns a full line search for nothing (measured: the final
    model chunk of the 1000-taxon bench spent 4.2s improving lnL by
    4e-4).  A single small step is NOT convergence — L-BFGS routinely
    takes one while (re)building curvature, and stopping there stalled
    the bench fit ~35 lnL short of the optimum.

    Designed to be called inside jit; the whole optimization is one
    lax.while_loop."""
    x0_vec, unravel = _ravel(x0)
    n = x0_vec.shape[0]
    if n == 0:
        return x0, fun(x0), init_state
    dtype = x0_vec.dtype
    m = memory_size

    if forward_grad:
        def vg(v):
            f = lambda p: fun(unravel(p))
            val = f(v)
            basis = jnp.eye(n, dtype=dtype)
            g = jax.lax.map(lambda e: jax.jvp(f, (v,), (e,))[1], basis)
            return val, g
    else:
        def vg(v):
            val, g = jax.value_and_grad(lambda p: fun(unravel(p)))(v)
            return val, g

    f0, g0 = vg(x0_vec)

    # history ring buffers (or the previous chunk's, warm-restarted)
    if init_state is None:
        S = jnp.zeros((m, n), dtype)
        Y = jnp.zeros((m, n), dtype)
        rho = jnp.zeros((m,), dtype)
        k0 = jnp.asarray(0)
    else:
        S, Y, rho, k0 = init_state

    def direction(g, S, Y, rho, k):
        """Two-loop recursion; entries with rho==0 are inactive."""
        q = g

        def bwd(i, carry):
            q, alphas = carry
            idx = (k - 1 - i) % m
            alpha = rho[idx] * jnp.dot(S[idx], q)
            alpha = jnp.where(rho[idx] > 0, alpha, 0.0)
            q = q - alpha * Y[idx]
            return q, alphas.at[idx].set(alpha)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros((m,), dtype)))
        # initial Hessian scaling gamma = s.y / y.y of most recent pair
        last = (k - 1) % m
        yy = jnp.dot(Y[last], Y[last])
        sy = jnp.dot(S[last], Y[last])
        gamma = jnp.where(yy > 0, sy / jnp.maximum(yy, 1e-30), 1.0)
        r = gamma * q

        def fwd(i, r):
            idx = (k - m + i) % m
            beta = rho[idx] * jnp.dot(Y[idx], r)
            beta = jnp.where(rho[idx] > 0, beta, 0.0)
            return r + S[idx] * (alphas[idx] - beta)

        r = jax.lax.fori_loop(0, m, fwd, r)
        return r

    def cond(st):
        x, f, g, S, Y, rho, k, small, done = st
        return jnp.logical_and(k < k0 + max_iters, jnp.logical_not(done))

    def step(st):
        x, f, g, S, Y, rho, k, small, done = st
        d = -direction(g, S, Y, rho, k)
        # ensure descent; fall back to steepest descent
        dg = jnp.dot(d, g)
        d = jnp.where(dg < 0, d, -g)
        dg = jnp.minimum(dg, -jnp.dot(g, g))

        # Armijo backtracking: f(x + t d) <= f + c1 t (d.g).
        # NaN objective values (wild trial points) must count as failures —
        # NaN comparisons are False and would otherwise exit the loop.
        c1 = 1e-4

        def fails(t, fn):
            return jnp.logical_or(jnp.isnan(fn), fn > f + c1 * t * dg)

        def bt_cond(s):
            t, fn, j = s
            return jnp.logical_and(j < max_backtracks, fails(t, fn))

        def bt_body(s):
            t, _, j = s
            t = t * 0.5
            fn = fun(unravel(x + t * d))
            return t, fn, j + 1

        # cap the very first trial step: before any curvature history the
        # raw gradient direction can be enormous
        dnorm = jnp.linalg.norm(d)
        t0 = jnp.where(
            k == 0, jnp.minimum(1.0, 1.0 / jnp.maximum(dnorm, 1e-12)), 1.0
        ).astype(dtype)
        f1 = fun(unravel(x + t0 * d))
        t, f_new, _ = jax.lax.while_loop(bt_cond, bt_body, (t0, f1, 0))
        accepted = jnp.logical_not(fails(t, f_new))

        # RESCUE: a failed line search along the quasi-Newton direction
        # does not mean convergence — stale curvature (the outer loop
        # moves branch lengths between chunks) plus the f32 forward's
        # ~3e-6 relative noise floor can kill it while the true gradient
        # is still large (measured stall 35 lnL short with |g|=0.37 and
        # +31 lnL available along -g).  Retry a short backtracking search
        # along RAW steepest descent from a curvature-free trial step.
        gnorm = jnp.linalg.norm(g)

        def rescue(_):
            dg2 = -gnorm * gnorm

            def fails2(t, fn):
                return jnp.logical_or(jnp.isnan(fn),
                                      fn > f + c1 * t * dg2)

            def bt2_cond(s):
                t, fn, j = s
                return jnp.logical_and(j < 8, fails2(t, fn))

            def bt2_body(s):
                t, _, j = s
                t = t * 0.5
                return t, fun(unravel(x - t * g)), j + 1

            tg0 = (0.5 / jnp.maximum(gnorm, 1e-12)).astype(dtype)
            fg = fun(unravel(x - tg0 * g))
            tg, fg, _ = jax.lax.while_loop(bt2_cond, bt2_body, (tg0, fg, 0))
            ok = jnp.logical_not(fails2(tg, fg))
            return ok, jnp.where(ok, -tg, 0.0), jnp.where(ok, fg, f)

        def no_rescue(_):
            return jnp.asarray(True), t, f_new

        accepted, t_eff, f_new = jax.lax.cond(
            accepted, no_rescue, rescue, None
        )
        d = jnp.where(t_eff < 0, -g, d)
        t = jnp.abs(t_eff)
        x_new = jnp.where(accepted, x + t * d, x)
        f_val, g_new = vg(x_new)
        s_vec = x_new - x
        y_vec = g_new - g
        sy = jnp.dot(s_vec, y_vec)
        idx = k % m
        good = sy > 1e-12
        S = S.at[idx].set(jnp.where(good, s_vec, S[idx]))
        Y = Y.at[idx].set(jnp.where(good, y_vec, Y[idx]))
        rho = rho.at[idx].set(jnp.where(good, 1.0 / jnp.maximum(sy, 1e-30), 0.0))
        gnorm = jnp.linalg.norm(g_new)
        done = jnp.logical_or(
            gnorm < grad_tol, jnp.logical_not(accepted)
        )
        if ftol > 0:
            small_now = jnp.logical_and(accepted, f - f_val < ftol)
            small_new = jnp.where(small_now, small + 1, 0)
            done = jnp.logical_or(done, small_new >= 2)
        else:
            small_new = small
        return x_new, f_val, g_new, S, Y, rho, k + 1, small_new, done

    x, f, g, S, Y, rho, k, _, done = jax.lax.while_loop(
        cond, step,
        (x0_vec, f0, g0, S, Y, rho, k0, jnp.asarray(0),
         jnp.asarray(False)),
    )
    return unravel(x), f, (S, Y, rho, k)
