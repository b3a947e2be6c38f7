"""Test configuration: force the CPU backend with 8 virtual devices.

The TPU (axon tunnel) permits only one client process and is slow for
eager work; tests must be host-only. NOTE: jax is pre-imported by a
sitecustomize hook with JAX_PLATFORMS=axon, so the env var alone is not
enough — jax.config.update is the reliable switch (see
.claude/skills/verify/SKILL.md).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.RandomState(0)
