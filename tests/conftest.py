"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference package runs float64 end-to-end (its default dtype,
/root/reference/src/device/__init__.py:13); tests use x64 so numerical
oracles are sharp.  Production TPU runs use float32/bfloat16 -- dedicated
tests cover the reduced-precision paths explicitly.

Multi-chip code paths are tested without hardware via
``--xla_force_host_platform_device_count=8`` (the TPU-native analogue of a
multi-node test harness, which the reference lacks entirely -- SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is clobbered by the environment's site
# hooks, so force the platform through the config API (must run before the
# backend initializes -- conftest import time is safe).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture
def key():
    return jax.random.key(0)
