"""Device mesh + sharding helpers (the SPMD replacement for DataParallel).

The reference's only parallelism was single-process torch DataParallel
(reference mainclean.py:132-134): replicate module, scatter the batch,
gather to GPU-0. TPU-natively that is: a Mesh over all local devices with a
'data' axis, batch arrays sharded on axis 0, params replicated, and XLA
emitting the gradient all-reduce over ICI. The axis list stays open
(('data',) today) so model axes (tp/pp/sp) can be added without API change —
the reference has no parameter sharding to reproduce (SURVEY.md §2.4).

Multi-host: call jax.distributed.initialize() before make_mesh() and the
same code spans hosts over DCN (jax.devices() becomes the global list).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; all other axes replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Put a pytree of batch-major arrays onto the mesh, sharded on axis 0.

    Pads nothing: the caller guarantees batch % n_devices == 0 (the loaders
    use drop_remainder like the reference)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_global_batch(x, sharding: NamedSharding):
    """Device-put one process's slice of a globally batch-sharded array.

    Single-process this is jax.device_put. Multi-process, each host holds a
    DISJOINT per-process slice of the global batch (data/pipeline.py shards
    the TFRecord stream by process index), so plain device_put would be
    wrong — it treats its argument as the GLOBAL value, silently feeding a
    different "global" batch on every host. make_array_from_process_local_data
    assembles the true global array from the per-process slices instead
    (tests/test_multihost.py pins both the assembly order and the resulting
    loss against a single-process control)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


# ---------------------------------------------------------------------------
# Model (tensor) parallelism — additive capability beyond the reference.
# ---------------------------------------------------------------------------


def make_mesh_2d(n_data: int, n_model: int,
                 axis_names: tuple[str, str] = ("data", "model")) -> Mesh:
    """2-D Mesh: batch sharded over 'data', channels/params over 'model'.

    On real hardware lay 'model' on the inner (fastest ICI) axis; here the
    device list is reshaped in order, which matches a v5e ring slice."""
    devices = jax.devices()[: n_data * n_model]
    assert len(devices) == n_data * n_model, (
        f"need {n_data * n_model} devices, have {len(jax.devices())}")
    return Mesh(np.asarray(devices).reshape(n_data, n_model), axis_names)


def channel_shardings(mesh: Mesh, params, model_axis: str = "model"):
    """Tensor-parallel PartitionSpecs for channel-major param pytrees.

    Rule: shard the output-channel (last) dim over the model axis whenever it
    divides evenly — conv kernels [k,k,Cin,Cout] and matmul kernels
    [Cin,Cout] split output channels; per-channel vectors [C] split
    elementwise params and BN scales. Everything else (readout heads, odd
    sizes) replicates. XLA/GSPMD then propagates: activations shard on their
    channel dim, k x k convs all-gather their input channels over ICI, and
    gradient reduction composes with the data axis automatically."""
    model_size = mesh.shape[model_axis]

    def spec_for(v):
        shape = np.shape(v)
        if not shape or shape[-1] % model_size != 0 or shape[-1] < model_size:
            return NamedSharding(mesh, P())
        spec = [None] * (len(shape) - 1) + [model_axis]
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, params)


def shard_params_2d(mesh: Mesh, params, model_axis: str = "model"):
    """device_put params with channel_shardings (replicated over 'data')."""
    shardings = channel_shardings(mesh, params, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3 — fully-sharded params + optimizer state over the data axis.
# ---------------------------------------------------------------------------


def fsdp_shardings(mesh: Mesh, params, axis: str = "data",
                   min_elements: int = 2):
    """ZeRO-3-style PartitionSpecs: each param's LARGEST evenly-divisible
    dimension is sharded over the data axis, so every device holds 1/N of the
    parameters and optimizer state instead of a full replica.

    No reference counterpart (DataParallel replicates everything); this is
    the standard JAX formulation of FSDP: params live sharded in HBM, jit'd
    use sites all-gather them over ICI, the backward's gradient reduction
    becomes a reduce-scatter back to the owning shard, and the (elementwise)
    Adam update stays fully sharded — all inserted by GSPMD from these input
    shardings, no manual collectives. Tiny params (fewer than `min_elements`
    along every dim, e.g. per-channel scalars) replicate: sharding them costs
    more in collective latency than the bytes saved."""
    n = mesh.shape[axis]

    def spec_for(v):
        shape = np.shape(v)
        if not shape or max(shape) < max(n, min_elements):
            return NamedSharding(mesh, P())
        # Largest dim divisible by the axis size wins; ties -> first.
        best = -1
        for i, d in enumerate(shape):
            if d % n == 0 and (best < 0 or d > shape[best]):
                best = i
        if best < 0:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, params)


def fsdp_shard_params(mesh: Mesh, params, axis: str = "data"):
    """device_put a pytree with fsdp_shardings. The rule is shape-based, so
    this also shards the OPTIMIZER state (ZeRO: Adam moments are
    param-shaped, scalars like `count` replicate) — apply it to
    `optimizer.init(params)` explicitly; jit sharding propagation alone is
    not guaranteed to shard freshly-created zeros."""
    shardings = fsdp_shardings(mesh, params, axis)
    return jax.tree.map(jax.device_put, params, shardings)


def hybrid_shardings(mesh: Mesh, params, data_axis: str = "data",
                     model_axis: str = "model", min_elements: int = 2):
    """FSDP x TP on a 2-D mesh: output channels (last dim) shard over the
    model axis (tensor parallelism, as channel_shardings), and the LARGEST
    REMAINING divisible dim shards over the data axis (ZeRO) — each device
    holds 1/(n_data*n_model) of every large param. The standard layout for
    params too big for tp alone; here it exists so the mesh design is shown
    to compose (tests pin single-device numerics)."""
    n_data = mesh.shape[data_axis]
    n_model = mesh.shape[model_axis]

    def spec_for(v):
        shape = np.shape(v)
        spec = [None] * len(shape)
        tp_dim = None
        if shape and shape[-1] % n_model == 0 and shape[-1] >= n_model:
            tp_dim = len(shape) - 1
            spec[tp_dim] = model_axis
        if shape and max(shape) >= max(n_data, min_elements):
            best = -1
            for i, d in enumerate(shape):
                if i == tp_dim:
                    continue
                if d % n_data == 0 and (best < 0 or d > shape[best]):
                    best = i
            if best >= 0:
                spec[best] = data_axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, params)


def hybrid_shard_params(mesh: Mesh, params, data_axis: str = "data",
                        model_axis: str = "model"):
    """device_put a pytree with hybrid_shardings (also for optimizer state,
    same shape-based caveat as fsdp_shard_params)."""
    shardings = hybrid_shardings(mesh, params, data_axis, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
