"""Test harness: force CPU backend with 8 virtual devices so mesh/sharding
tests run without a TPU pod (SURVEY.md §4)."""

import os

# Force CPU even if the environment points JAX at a TPU (e.g. JAX_PLATFORMS=axon):
# unit tests must not grab the (single-client) TPU tunnel. Set TTS_TEST_TPU=1 to
# run tests against the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("TTS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The container's sitecustomize imports jax before conftest runs, so the
    # env var alone is too late — update the live config too.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
