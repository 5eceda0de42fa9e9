"""Test harness setup: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
exercised on virtual CPU devices (SURVEY §4 implication).  Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The runtime image's sitecustomize registers a remote "axon" TPU backend and
# forces jax_platforms to it; pin tests back to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def small_scene():
    from lbdrn_msic_tpu.utils.synth import synth_scene

    return synth_scene(96, 80, channels=4, effective_bits=12, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
