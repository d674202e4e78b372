"""Machine-keyed persistent compile cache.

JAX's persistent compilation cache keys entries by computation + compile
options but NOT by host CPU microarchitecture, and XLA:CPU AOT-compiles to
the build machine's ISA. A cache directory that survives a VM migration onto
different silicon then serves executables the new host may not be able to
run (`cpu_aot_loader.cc` warns "could lead to execution errors such as
SIGILL") — and, subtler, gives some processes instant cache hits while
others compile fresh, which is exactly the compile-time skew that blows
Gloo's hard-coded 30 s first-collective rendezvous on multi-host CPU runs
(docs/SCALING.md). Keying the directory by a host-ISA fingerprint makes a
migrated cache cold instead of poisoned.

TPU entries don't have the ISA problem (they target the accelerator), but
keying is harmless there: the TPU generation is part of the fingerprint via
the hostname-independent CPU signature only, so a stable VM keeps its cache.
"""

from __future__ import annotations

import hashlib
import os
import platform

_KEY_PREFIX = "host-"


def machine_key() -> str:
    """Short fingerprint of the host ISA (arch + CPU model + feature flags)."""
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    sig += line.strip()
                    break  # one logical CPU is enough; they're homogeneous
    except OSError:
        pass
    digest = hashlib.sha256(sig.encode()).hexdigest()[:12]
    return f"{_KEY_PREFIX}{platform.machine()}-{digest}"


def machine_keyed_dir(base: str) -> str:
    """`base/host-<arch>-<hash>`; idempotent if base is already keyed."""
    if os.path.basename(base).startswith(_KEY_PREFIX):
        return base
    return os.path.join(base, machine_key())


def enable(base: str | None = None, min_compile_time_s: int = 2) -> str:
    """Point JAX's persistent compile cache at a machine-keyed directory.

    Resolution order for the base directory: explicit argument, the
    JAX_COMPILATION_CACHE_DIR environment variable (re-keyed, so an env
    value carried across a VM migration stops serving foreign-ISA
    executables), else `~/.cache/pathtracker_jax`. Safe to call at any
    point before the compile that should hit the cache; returns the path."""
    import jax

    base = (base or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "pathtracker_jax"))
    path = machine_keyed_dir(base)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_s)
    return path
