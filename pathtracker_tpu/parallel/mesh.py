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
