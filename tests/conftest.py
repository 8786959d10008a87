"""Test harness: force an 8-virtual-device CPU backend BEFORE jax imports.

This is the JAX-native "fake backend" for multi-chip tests (SURVEY.md §4):
sharding/pjit tests run against a Mesh of 8 host devices so the full
multi-chip path is exercised without TPU hardware.
"""
import os

# NOTE: jax may already be imported at interpreter startup (site hooks), so
# platform selection must go through jax.config, not env vars.  XLA_FLAGS is
# still read at (lazy) backend-init time, so setting it here works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Numeric-parity tests compare matmul-based formulations against convs and
# fast-gen against teacher-forcing; run them at full f32 matmul precision
# (the backend default is a faster low-precision mode).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
