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


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    import jax

    return jax.process_index() == 0
