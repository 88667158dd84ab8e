"""Test harness configuration.

Runs all tests on a *virtual 8-device CPU mesh* so multi-chip sharding logic
is exercised without TPU hardware (the TPU answer to "test multi-node without
a cluster" — see SURVEY.md §4). Must set the env vars before jax imports.
"""

import os

# force CPU: the session env pins JAX_PLATFORMS=axon (the real TPU tunnel) and
# a sitecustomize.py preloads jax at interpreter startup, so env vars alone are
# too late — update jax.config before the backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _pallas_interpret_mode():
    """Pallas kernels run on the CPU interpreter in tests."""
    from diverse_channel_vit_tpu.ops import attention

    attention.INTERPRET = True
    yield
