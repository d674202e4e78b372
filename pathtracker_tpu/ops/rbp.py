"""Neumann-series recurrent backpropagation (RBP) as a jax.custom_vjp.

Replaces the reference's `dummyhgru` autograd.Function (reference
models/InT.py:10-55, convlstm.py:9-54). The reference pattern is: unroll
T-1 steps without gradient, take ONE differentiable step
last = f(params, prev), then route the incoming gradient through a truncated
Neumann series  g = sum_k (J^T)^k grad  (J = df/dprev at the fixed point)
before backpropagating into the step — params receive J_params^T g, the
detached prev receives nothing. Early exit with the reference's norm rules
(reference InT.py:43-47): stop and discard the last term when ||g|| > 1,
||v|| grows, or ||v|| < 1e-9. Memory is O(1) in sequence length.

`step_fn(aux, state) -> state` must be a pure function: everything traced
(parameters, hoisted inputs) goes through `aux`, never through a Python
closure — custom_vjp forbids closed-over tracers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _tree_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(v)) for v in jax.tree.leaves(tree)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def neumann_rbp(step_fn, aux, state_2nd_last, truncate_iter: int = 15):
    """last_state = step_fn(aux, state_2nd_last) with RBP backward."""
    return step_fn(aux, state_2nd_last)


def _rbp_fwd(step_fn, aux, state_2nd_last, truncate_iter):
    last = step_fn(aux, state_2nd_last)
    return last, (aux, state_2nd_last)


def neumann_series(vjp_state, grad, truncate_iter: int):
    """g = sum_k (J^T)^k grad with the reference's early-exit rules."""

    def body(carry):
        v, g, prev_normv, i, _ = carry
        (v_new,) = vjp_state(v)
        normv = _tree_norm(v_new)
        g_new = jax.tree.map(jnp.add, g, v_new)
        normg = _tree_norm(g_new)
        bad = (normg > 1.0) | (normv > prev_normv) | (normv < 1e-9)
        g_keep = jax.tree.map(lambda a, b: jnp.where(bad, a, b), g, g_new)
        v_keep = jax.tree.map(lambda a, b: jnp.where(bad, a, b), v, v_new)
        return v_keep, g_keep, normv, i + 1, bad

    def cond(carry):
        _, _, _, i, done = carry
        return (i < truncate_iter) & ~done

    init = (grad, grad, _tree_norm(grad), jnp.asarray(0), jnp.asarray(False))
    _, g, _, _, _ = jax.lax.while_loop(cond, body, init)
    return g


def _rbp_bwd(step_fn, truncate_iter, res, grad):
    aux, prev = res
    _, vjp_state = jax.vjp(lambda s: step_fn(aux, s), prev)
    g = neumann_series(vjp_state, grad, truncate_iter)
    # Route the amplified gradient through the single differentiable step:
    # params (aux) get J_aux^T g; prev gets J_state^T g (normally discarded —
    # the caller stop_gradients the unrolled prev, like the reference detach).
    _, vjp_both = jax.vjp(step_fn, aux, prev)
    d_aux, d_prev = vjp_both(g)
    return d_aux, d_prev


neumann_rbp.defvjp(_rbp_fwd, _rbp_bwd)
