"""Headline benchmark: 4096x4096 bf16 matmul fwd+bwd vs jax.grad roofline.

BASELINE config 4: the framework's tape — compiled through md.jit — against
jax's own AD of the identical computation, on real hardware.  Prints ONE JSON
line: value = framework TFLOP/s, vs_baseline = framework / jax.grad (1.0 =
parity with the roofline; >1.0 = faster).

Timing protocol: the device may sit behind an async tunnel where
``block_until_ready`` returns before execution finishes, so we time a chain
of K *data-dependent* steps closed by a scalar host pull (which does
synchronize), subtract the separately-measured pull latency, and divide by K.
The tanh keeps XLA from algebraically deleting the matmuls (a bare
``sum(x@w)`` simplifies to two rank-1 reductions and measures nothing).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
DTYPE = jnp.bfloat16
CHAIN = 20
REPEATS = 3
# fwd matmul + two bwd matmuls (dx, dw), 2*N^3 FLOPs each
FLOPS_PER_STEP = 3 * 2 * N**3


def _scalar_pull(arr) -> float:
    return float(jnp.sum(arr).astype(jnp.float32))


def _sync_latency(probe) -> float:
    times = []
    for _ in range(5):
        start = time.perf_counter()
        _scalar_pull(probe)
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def _time_chain(step, x0, w0) -> float:
    """Median seconds per step over REPEATS chains of CHAIN dependent steps."""
    # warm up (compile) and flush
    x, w = step(x0, w0)
    _scalar_pull(x)
    latency = _sync_latency(x0)

    per_step = []
    for _ in range(REPEATS):
        x, w = x0, w0
        start = time.perf_counter()
        for _ in range(CHAIN):
            x, w = step(x, w)
        _scalar_pull(x)
        total = time.perf_counter() - start
        per_step.append(max(total - latency, 1e-9) / CHAIN)
    return float(np.median(per_step))


def main() -> None:
    import minidiff_tpu as md

    md.set_backend("xla")

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(N, N), dtype=DTYPE)
    w0 = jnp.asarray(rng.randn(N, N) / np.sqrt(N), dtype=DTYPE)
    lr = jnp.asarray(1e-6, dtype=DTYPE)

    # --- framework: tape fwd+bwd AND the SGD update in ONE md.jit program,
    # exactly mirroring the single-jit jax baseline below ---
    def md_loss(x, w):
        return md.sum(md.tanh(x @ w))

    md_vag = md.value_and_grad(md_loss, argnums=(0, 1))
    lr_t = md.Tensor(lr)

    @md.jit
    def md_step_compiled(x, w):
        out, (gx, gw) = md_vag(x, w)
        # grad feedback creates the data dependency between steps
        return x.detach() - lr_t * gx, w.detach() - lr_t * gw

    def md_step(x, w):
        a, b = md_step_compiled(md.Tensor(x), md.Tensor(w))
        return a._data, b._data

    # --- baseline: jax.grad of the identical computation ---
    @jax.jit
    def jax_step(x, w):
        def loss(x, w):
            return jnp.sum(jnp.tanh(jnp.matmul(x, w)))

        out, (gx, gw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
        return x - lr * gx, w - lr * gw

    t_md = _time_chain(md_step, x0, w0)
    t_jax = _time_chain(jax_step, x0, w0)

    tflops_md = FLOPS_PER_STEP / t_md / 1e12
    tflops_jax = FLOPS_PER_STEP / t_jax / 1e12

    print(
        json.dumps(
            {
                "metric": "matmul4096_bf16_fwdbwd_tflops",
                "value": round(tflops_md, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(tflops_md / tflops_jax, 4),
                "detail": {
                    "framework_ms_per_step": round(t_md * 1e3, 3),
                    "jax_grad_ms_per_step": round(t_jax * 1e3, 3),
                    "jax_grad_tflops": round(tflops_jax, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
