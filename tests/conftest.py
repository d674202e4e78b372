"""Test configuration: force a genuine 8-device CPU JAX backend.

Env vars alone are NOT enough in this image: the axon (TPU) sitecustomize
registers the TPU PJRT plugin at interpreter startup — before pytest imports
anything — and JAX_PLATFORMS=axon is baked into the environment. Backends
initialize lazily, so overriding jax's *config* before the first backend use
reliably selects CPU; XLA_FLAGS must also be set before that first use for
the virtual 8-device mesh (the JAX fake-backend idiom). Tests must stay off
the TPU: it is a single-client device behind a tunnel, and a test process
touching it serializes against (or deadlocks with) any concurrent TPU job.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402  (may already be loaded by sitecustomize)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall clock is dominated by the
# model-zoo compiles (~20 min cold); cached XLA executables make repeat runs
# minutes instead. The 2s threshold keeps thousands of trivial jits out.
# Machine-keyed (utils/cache.py): XLA:CPU AOT-compiles to the build host's
# ISA, and a .cache/jax that survived a VM migration onto different silicon
# loads with SIGILL warnings — keying makes a migrated cache cold, not
# poisoned (VERDICT r3 weak #5).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pathtracker_tpu.utils import cache as _cache_lib  # noqa: E402

CACHE_DIR = _cache_lib.enable(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
