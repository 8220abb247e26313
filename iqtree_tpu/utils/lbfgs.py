"""Jittable L-BFGS minimization over pytrees (optax-based).

Replaces the reference's BFGS `minimizeMultiDimen`
(/root/reference/optimization.cpp:560) and the vendored L-BFGS-B
(/root/reference/lbfgsb/): bounds are handled upstream by unconstrained
reparameterization (log/sigmoid/softmax) instead of box constraints, so a
plain L-BFGS with zoom linesearch suffices — and it runs entirely on
device inside one jit."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
import optax.tree_utils as otu


def lbfgs_minimize(
    fun: Callable,
    x0,
    max_iters: int = 100,
    grad_tol: float = 1e-6,
    memory_size: int = 12,
):
    """Minimize `fun(pytree) -> scalar`.  Returns (x, value, n_iters).

    Designed to be called inside jit; uses a while_loop with optax's
    lbfgs + zoom linesearch."""
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    def cond(carry):
        x, state, it = carry
        count = otu.tree_get(state, "count")
        grad = otu.tree_get(state, "grad")
        gnorm = otu.tree_norm(grad)
        return jnp.logical_and(
            it < max_iters, jnp.logical_or(it == 0, gnorm > grad_tol)
        )

    def step(carry):
        x, state, it = carry
        value, grad = value_and_grad(x, state=state)
        updates, state = opt.update(
            grad, state, x, value=value, grad=grad, value_fn=fun
        )
        x = optax.apply_updates(x, updates)
        return x, state, it + 1

    state0 = opt.init(x0)
    x, state, it = jax.lax.while_loop(cond, step, (x0, state0, jnp.asarray(0)))
    final_value = otu.tree_get(state, "value")
    return x, final_value, it
