"""Multi-host bring-up over DCN.

The reference is strictly single-process (torch DataParallel); this framework
is single-program SPMD, so spanning hosts only requires initializing the JAX
distributed runtime before any device use — every mesh helper in
parallel.mesh then sees the global device list and the same train step runs
unchanged, with XLA routing data-parallel all-reduces over ICI within a slice
and DCN across slices.

Usage (per host):
    from pathtracker_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU pods auto-detect)
    # or explicitly:
    distributed.initialize(coordinator_address="host0:1234",
                           num_processes=4, process_id=rank)
"""

from __future__ import annotations

import os

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); on TPU pods all
    arguments auto-detect from the metadata server."""
    global _initialized
    if _initialized:
        return
    import jax

    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    nproc = num_processes or os.environ.get("NUM_PROCESSES")
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    pid = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def barrier(name: str, timeout_s: int = 600) -> None:
    """Align all processes at a named coordination-service barrier.

    XLA's CPU Gloo collectives hard-code a 30 s rendezvous window: the first
    rank to reach a collective waits at most 30 s for every peer to join, and
    data loading / cache-miss compiles can legitimately take longer than that
    on a loaded host. The coordination service (already connected for
    jax.distributed) has a *configurable* timeout, so parking every rank here
    right before the first collective collapses the inter-rank skew to
    milliseconds and the Gloo window stops being a race. No-op when
    single-process.
    """
    import jax

    if jax.process_count() <= 1:
        return
    # The coordination-service client only has a private accessor today;
    # tolerate it moving (jax version drift) by falling back to the public
    # sync_global_devices, which rides the same service.
    client = None
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
    except (ImportError, AttributeError):
        pass
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
    else:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    import jax

    return jax.process_index() == 0
