"""Real-TPU kernel test tier (VERDICT r2 item 2).

The main suite (tests/) pins ``jax_platforms=cpu`` so its 1,100+ tests run
Pallas kernels in interpret mode only — which is exactly how two kernels
that could never lower through the real Mosaic compiler shipped in round 2.
This tier is the complement:

* NO platform pin: runs on whatever accelerator is attached (the axon TPU
  tunnel in this environment).  Every test SKIPS unless the default
  backend is a real TPU.
* ``MINIDIFF_TPU_STRICT_KERNELS=1``: any Pallas compile failure inside an
  autotune race raises instead of silently reporting "kernel lost".
* ``MINIDIFF_TPU_AUTOTUNE=0``: dispatch decisions force the fused kernels
  (no races), so every ``pallas_call`` family compiles through Mosaic and
  executes on hardware; outputs are asserted against the jnp fallbacks
  computed on the same device.
* Shapes are chosen with grid > 1, batch > 1, kv heads > 1, in both f32
  and bf16 — the exact regimes whose lowering rules interpret mode does
  not check (block second-to-last dim divisibility, sublane padding).

Run: ``python -m pytest tests_tpu/ -x -q`` on a machine with a TPU.
This tier is the pre-commit gate for any change under minidiff_tpu/kernels/.
"""

from __future__ import annotations

import os

os.environ["MINIDIFF_TPU_STRICT_KERNELS"] = "1"
os.environ.setdefault("MINIDIFF_TPU_AUTOTUNE", "0")

import jax
import numpy as np
import pytest


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


collect_ignore_glob: list = []


@pytest.fixture(scope="session", autouse=True)
def _require_tpu():
    if not _on_tpu():
        pytest.skip("tests_tpu/ requires a real TPU device", allow_module_level=False)
    yield


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
    yield
