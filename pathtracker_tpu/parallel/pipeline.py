"""Pipeline parallelism over a mesh axis (additive capability).

The reference has no pipeline parallelism (its only strategy is
torch DataParallel, reference mainclean.py:132-134; SURVEY.md §2.4), so this
module is a framework capability, not a parity item: a GPipe-style stage
pipeline expressed TPU-natively as a single SPMD program — `shard_map` over a
'stage' mesh axis, microbatches handed stage-to-stage with `lax.ppermute`
(neighbor hops over ICI), and the schedule driven by `lax.scan` so the whole
pipeline is one XLA computation, differentiable end-to-end (ppermute has a
ppermute transpose, so BPTT through the pipeline stays on ICI too).

Contract: `stage_fn(stage_params, x) -> y` must be shape/dtype-preserving
(homogeneous stages — the classic pipeline case: equal-width trunk blocks,
e.g. the constant-32-wide `nostride_video_cc_small` trunk, reference
nostridetv_cc_smallest.py). Heterogeneous stages belong on a tensor/data
mesh instead.

Schedule: with S stages and M microbatches the scan runs S+M-1 ticks; each
tick every device runs one stage on its in-flight microbatch (bubble fraction
(S-1)/(S+M-1), the GPipe bound). The microbatch array is replicated over the
stage axis (fine at this framework's clip sizes; at larger scale inject via
an all_gather-free rotating shard instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(params_list):
    """Stack per-stage param pytrees along a new leading 'stage' axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def pipeline_apply(mesh: Mesh, stage_fn, stage_params, x, *,
                   n_microbatches: int | None = None,
                   stage_axis: str = "stage",
                   batch_axis: str | None = None):
    """Run `x` through `n_stages` shape-preserving stages, pipelined.

    Args:
      mesh: mesh carrying `stage_axis` (and optionally `batch_axis` for
        composed data parallelism — the microbatch *content* then shards
        over 'data' while microbatches flow over 'stage').
      stage_fn: (stage_params_for_one_stage, x_micro) -> y_micro, shape- and
        dtype-preserving.
      stage_params: pytree with leading axis n_stages (stack_stage_params).
      x: [B, ...] batch; B % n_microbatches == 0.
      n_microbatches: defaults to n_stages (minimum-bubble choice M >= S).

    Returns [B, ...] with outputs in input order, replicated over the stage
    axis (each data shard holds its rows when batch_axis is set).
    """
    n_stages = mesh.shape[stage_axis]
    n_micro = n_microbatches or n_stages
    batch = x.shape[0]
    assert batch % n_micro == 0, (batch, n_micro)
    xm = x.reshape(n_micro, batch // n_micro, *x.shape[1:])

    data_spec = (batch_axis,) if batch_axis else (None,)
    x_spec = P(None, *data_spec, *([None] * (x.ndim - 1)))
    w_spec = jax.tree.map(lambda _: P(stage_axis), stage_params)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(w_spec, x_spec), out_specs=x_spec, check_vma=False)
    def run(weights, xm_local):
        # weights leaves arrive [1, ...] (this stage's slice); drop the axis.
        w = jax.tree.map(lambda p: jnp.squeeze(p, 0), weights)
        stage = lax.axis_index(stage_axis)
        buf0 = jnp.zeros(xm_local.shape[1:], xm_local.dtype)
        outs0 = jnp.zeros_like(xm_local)

        def tick(carry, k):
            buf, outs = carry
            # Stage 0 injects microbatch k (clamped past the fill phase);
            # later stages consume what ppermute delivered last tick.
            cur = jnp.where(stage == 0,
                            xm_local[jnp.minimum(k, n_micro - 1)], buf)
            y = stage_fn(w, cur)
            # The last stage emits microbatch k-(S-1) once the pipe is full.
            oidx = k - (n_stages - 1)
            emit = jnp.logical_and(stage == n_stages - 1, oidx >= 0)
            written = lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(oidx, 0, n_micro - 1), 0)
            outs = jnp.where(emit, written, outs)
            buf = lax.ppermute(
                y, stage_axis,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (buf, outs), None

        ticks = jnp.arange(n_micro + n_stages - 1)
        (_, outs), _ = lax.scan(tick, (buf0, outs0), ticks)
        # Only the last stage holds real outputs; psum replicates them.
        outs = lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            stage_axis)
        return outs

    out = run(stage_params, xm)
    return out.reshape(batch, *x.shape[1:])
