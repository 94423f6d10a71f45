"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's env-matrix strategy (same suite against multiple
backends, SURVEY.md §4): unit/integration tests run on CPU; the sharding
tests use the 8 virtual devices; TPU execution is covered by bench.py and
the driver's compile checks.
"""

import os

# Force CPU: the session environment pins the axon TPU plugin (one real TPU
# behind a single-client tunnel) and its sitecustomize overrides
# jax_platforms via jax.config — so reset BOTH the env var and the config
# before any backend initialisation. Tests must never grab the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def jax_devices():
    import jax

    return jax.devices()
