"""Jacobian stability penalty (reference models/convlstm.py:154-163).

penalty = relu(J^T 1 - mu)^2 elementwise, where J = d(last_state)/d(prev
state) of one cell step and mu = 0.9 — pushes the recurrent Jacobian's
column sums below 0.9 so the dynamics contract. Computed with one jax.vjp
instead of torch double-backward; differentiable (create_graph equivalent)
because jax traces through the vjp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jacobian_penalty(step_fn, prev_state, mu: float = 0.9):
    """step_fn: prev_state -> last_state (pytree -> pytree).
    Returns the elementwise penalty pytree summed into a scalar mean."""
    last, vjp_fn = jax.vjp(step_fn, prev_state)
    ones = jax.tree.map(jnp.ones_like, last)
    (jv,) = vjp_fn(ones)
    pens = jax.tree.map(lambda v: jnp.square(jnp.maximum(v - mu, 0.0)), jv)
    total = sum(jnp.sum(p) for p in jax.tree.leaves(pens))
    count = sum(p.size for p in jax.tree.leaves(pens))
    return total / count
