"""Test config: force CPU with 8 virtual devices so sharding tests run
anywhere (the TPU analog of 'multi-node without a cluster', SURVEY.md §4)."""

import os

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS *env var*; setting the
# config flag (or JAX_PLATFORM_NAME) before first backend use does work.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from vkrt_tpu.scene import load_cornell

    return load_cornell()


@pytest.fixture(scope="session")
def procedural_cornell():
    from vkrt_tpu.scene import make_cornell_box

    return make_cornell_box()


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
