"""Test harness setup: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
exercised on virtual CPU devices (SURVEY §4 implication).  Must run before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_scene():
    from lbdrn_msic_tpu.utils.synth import synth_scene

    return synth_scene(96, 80, channels=4, effective_bits=12, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
