"""Flash attention vs XLA composed softmax-attention, fwd and fwd+bwd.

Run on real TPU hardware: `python benchmarks/attention_bench.py`.
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from minidiff_tpu.kernels import attention as A


def _timeit(f, *args) -> float:
    from minidiff_tpu.kernels.matmul import _measure_pull_latency, time_device_thunk

    out = f(*args)  # compile
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    lat = _measure_pull_latency(jax.tree.leaves(out)[0])
    return time_device_thunk(lambda: f(*args), lat)


def main() -> None:
    rng = np.random.RandomState(0)
    for (b, h, s, d, causal) in [
        (4, 8, 2048, 128, True),
        (4, 8, 2048, 128, False),
        (2, 8, 4096, 128, True),
    ]:
        dt = jnp.bfloat16
        q = jnp.asarray(rng.randn(b * h, s, d), dt)
        k = jnp.asarray(rng.randn(b * h, s, d), dt)
        v = jnp.asarray(rng.randn(b * h, s, d), dt)
        do = jnp.asarray(rng.randn(b * h, s, d), dt)
        scale = float(1.0 / np.sqrt(d))
        flops = 4 * b * h * s * s * d // (2 if causal else 1)

        fl = jax.jit(lambda q, k, v: A._flash(q, k, v, scale, causal))
        co = jax.jit(lambda q, k, v: A._composed_sdpa(q, k, v, scale, causal))
        t_fl, t_co = _timeit(fl, q, k, v), _timeit(co, q, k, v)

        def mk_loss(fn):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32)
                               * do.astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        g_fl = mk_loss(lambda q, k, v: A._flash(q, k, v, scale, causal))
        g_co = mk_loss(lambda q, k, v: A._composed_sdpa(q, k, v, scale, causal))
        tb_fl, tb_co = _timeit(g_fl, q, k, v), _timeit(g_co, q, k, v)

        print(json.dumps({
            "metric": f"flash_attn_b{b}h{h}s{s}d{d}_causal{int(causal)}",
            "fwd_flash_ms": round(t_fl * 1e3, 3),
            "fwd_xla_ms": round(t_co * 1e3, 3),
            "fwd_flash_tflops": round(flops / t_fl / 1e12, 2),
            "fwdbwd_flash_ms": round(tb_fl * 1e3, 3),
            "fwdbwd_xla_ms": round(tb_co * 1e3, 3),
            "fwdbwd_speedup_vs_xla": round(tb_co / tb_fl, 3),
        }))


if __name__ == "__main__":
    main()
