"""Expert parallelism over a mesh axis (additive capability).

The reference has no mixture-of-experts anywhere (its only parallelism is
torch DataParallel, reference mainclean.py:132-134; SURVEY.md §2.4), so like
parallel/pipeline.py this is a framework capability, not a parity item: a
router + expert bank whose EXPERT dimension is sharded over a mesh axis, so
each device holds only its slice of the expert parameters — the sharding
pattern large conditional-compute models need, expressed TPU-natively.

Design (gather-free, psum-combine):
  * Router: dense logits `x @ router_w` -> softmax -> top-1 gate (a
    straight-through-free soft formulation: the chosen expert's probability
    scales its output, so the router trains through the gate value — the
    classic Shazeer-style top-1 estimator).
  * Experts: `expert_fn(params_e, x) -> y` vmapped over a stacked leading
    expert axis. Under `shard_map` that axis is SHARDED over the 'expert'
    mesh axis: each device computes only its local experts over its local
    batch rows, masks by the local gates, and one `psum` over the expert
    axis combines — no all_to_all needed at this scale (every expert sees
    the local batch; compute is masked, communication is one reduction).
  * Composes with data parallelism on a ('data', 'expert') mesh: batch rows
    shard over 'data', expert params over 'expert', and gradients reduce
    over both axes by GSPMD as usual.

`moe_apply(params, x)` is the single-device reference semantics;
`moe_apply_sharded(mesh, params, x)` is numerically identical (pinned by
tests/test_moe.py, forward and gradients, on the virtual 8-device mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(key, n_experts: int, d_in: int, d_hidden: int,
                    dtype=jnp.float32):
    """Expert bank of two-layer MLPs + router. Leading axis = expert."""
    k_r, k_1, k_2 = jax.random.split(key, 3)
    s1 = (2.0 / d_in) ** 0.5
    s2 = (2.0 / d_hidden) ** 0.5
    return {
        "router_w": (jax.random.normal(k_r, (d_in, n_experts)) / d_in**0.5
                     ).astype(dtype),
        "w1": (s1 * jax.random.normal(k_1, (n_experts, d_in, d_hidden))
               ).astype(dtype),
        "b1": jnp.zeros((n_experts, d_hidden), dtype),
        "w2": (s2 * jax.random.normal(k_2, (n_experts, d_hidden, d_in))
               ).astype(dtype),
        "b2": jnp.zeros((n_experts, d_in), dtype),
    }


def _expert_fn(w1, b1, w2, b2, x):
    """One expert: GELU MLP, shape-preserving over the feature axis."""
    return jax.nn.gelu(x @ w1 + b1) @ w2 + b2


def _gates(router_w, x):
    """Top-1 soft gates [N, E]: the argmax expert keeps its softmax
    probability, every other expert is zeroed (trains the router through
    the gate value)."""
    logits = x @ router_w
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.argmax(logits, axis=-1)
    onehot = jax.nn.one_hot(top, router_w.shape[-1], dtype=probs.dtype)
    return probs * onehot


def moe_apply(params, x):
    """Single-device reference semantics: y = sum_e gate_e(x) * expert_e(x).

    x: [N, d_in] token/feature rows. Returns [N, d_in]."""
    gates = _gates(params["router_w"], x)  # [N, E]
    ys = jax.vmap(_expert_fn, in_axes=(0, 0, 0, 0, None))(
        params["w1"], params["b1"], params["w2"], params["b2"], x)  # [E,N,d]
    return jnp.einsum("ne,end->nd", gates, ys)


def shard_moe_params(mesh: Mesh, params, expert_axis: str = "expert"):
    """Place the expert bank sharded over the expert mesh axis; the router
    stays replicated (every device routes its own rows)."""
    def put(name, v):
        spec = P() if name == "router_w" else P(expert_axis)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return {k: put(k, v) for k, v in params.items()}


def moe_apply_sharded(mesh: Mesh, params, x, *,
                      expert_axis: str = "expert",
                      batch_axis: str | None = None):
    """moe_apply with experts sharded over `expert_axis` (and rows over
    `batch_axis` when given): each device computes its LOCAL experts on its
    local rows, gate-masks, and one psum over the expert axis combines.
    Numerically identical to moe_apply (same contraction order)."""
    n_experts = params["router_w"].shape[-1]
    n_local = n_experts // mesh.shape[expert_axis]
    assert n_experts % mesh.shape[expert_axis] == 0, (
        "experts must divide the expert mesh axis")

    row_spec = P(batch_axis) if batch_axis else P()

    def local(router_w, w1, b1, w2, b2, xl):
        gates = _gates(router_w, xl)  # [n_local_rows, E] (full gate row)
        e0 = jax.lax.axis_index(expert_axis) * n_local
        local_gates = jax.lax.dynamic_slice_in_dim(
            gates, e0, n_local, axis=1)  # [rows, n_local]
        ys = jax.vmap(_expert_fn, in_axes=(0, 0, 0, 0, None))(
            w1, b1, w2, b2, xl)  # [n_local, rows, d]
        part = jnp.einsum("ne,end->nd", local_gates, ys)
        return jax.lax.psum(part, expert_axis)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(expert_axis), P(expert_axis), P(expert_axis),
                  P(expert_axis), row_spec),
        out_specs=row_spec,
    )(params["router_w"], params["w1"], params["b1"], params["w2"],
      params["b2"], x)
