"""Test configuration: force an 8-device CPU JAX backend (the JAX fake-backend
idiom) so sharding/collective tests run without TPU hardware."""

import os

# Force a genuine CPU backend: JAX_PLATFORMS alone is not enough in this
# image — an axon (TPU) sitecustomize registers the TPU plugin in every
# process when PALLAS_AXON_POOL_IPS is set, and the single TPU client then
# serializes concurrent test processes. Clearing it keeps tests off the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
