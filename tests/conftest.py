"""Test harness setup.

* Forces the CPU platform with 8 virtual XLA devices so sharding tests run
  without real multi-chip hardware (the axon TPU plugin ignores the
  JAX_PLATFORMS env var, hence the config.update call).
* Enables x64 so the XLA backend computes in float64 — the finite-difference
  oracle and cross-backend parity checks then hold to tight tolerances.
* ``backend`` fixture runs a test once per array backend (numpy oracle, xla).
"""

from __future__ import annotations

import os
import random

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

import minidiff_tpu as md


@pytest.fixture(params=["numpy", "xla"])
def backend(request):
    md.set_backend(request.param)
    yield request.param
    md.set_backend("xla")


@pytest.fixture(autouse=True)
def _seed():
    random.seed(0)
    np.random.seed(0)
    for name in md.available_backends():
        with md.use_backend(name):
            md.seed(0)
    yield
