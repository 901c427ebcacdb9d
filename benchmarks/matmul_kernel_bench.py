"""Standalone Pallas matmul kernel tuning: tile sweep vs jnp.matmul.

Run on real TPU:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/matmul_kernel_bench.py
Uses the dependent-chain + scalar-pull protocol (see bench.py) because the
device sits behind an async tunnel where block_until_ready doesn't block.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from minidiff_tpu.kernels import matmul as mm

N = 4096
DTYPE = jnp.bfloat16
CHAIN = 10
FLOPS = 2 * N**3


def _pull(x):
    return float(jnp.sum(x).astype(jnp.float32))


def time_matmul(fn, x):
    y = fn(x, x)
    _pull(y)
    start = time.perf_counter()
    _pull(x)
    latency = time.perf_counter() - start

    best = float("inf")
    for _ in range(3):
        r = x
        start = time.perf_counter()
        for _ in range(CHAIN):
            r = fn(r, x)
        _pull(r)
        total = time.perf_counter() - start
        best = min(best, (total - latency) / CHAIN)
    return best


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, N) / np.sqrt(N), dtype=DTYPE)

    t = time_matmul(jax.jit(jnp.matmul), x)
    print(f"jnp.matmul        : {t*1e3:7.3f} ms  {FLOPS/t/1e12:7.1f} TFLOP/s")

    for bm, bn, bk in [
        (256, 256, 512),
        (512, 512, 512),
        (512, 1024, 512),
        (1024, 512, 512),
        (512, 512, 1024),
        (256, 512, 512),
        (512, 256, 1024),
        (1024, 1024, 512),
    ]:
        try:
            fn = jax.jit(
                lambda a, b, bm=bm, bn=bn, bk=bk: mm._pallas_matmul_2d(
                    a, b, bm=bm, bn=bn, bk=bk
                )
            )
            t = time_matmul(fn, x)
            print(
                f"pallas {bm:4d}x{bn:4d}x{bk:4d}: {t*1e3:7.3f} ms  "
                f"{FLOPS/t/1e12:7.1f} TFLOP/s"
            )
        except Exception as e:  # noqa: BLE001
            print(f"pallas {bm}x{bn}x{bk}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
