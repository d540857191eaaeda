"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip data parallelism is validated without TPU hardware via XLA's
host-platform device-count flag (SURVEY.md §4 item 4). Env vars alone are not
enough here: pytest plugins may import jax before this conftest runs, so the
jax.config API (which works post-import, pre-backend-init) is used as well.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # fp64 available for parity checks

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
