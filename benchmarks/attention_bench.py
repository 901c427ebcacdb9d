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


def _time_q_chain(f, q0, k, v, chain: int = 40) -> float:
    """s/call with the output fed back into q (data-dependent chain): calls
    without a dependence overlap in the tunnel's pipeline and read fast."""
    from minidiff_tpu.kernels.matmul import _measure_pull_latency

    out = f(q0, k, v)
    first = jax.tree.leaves(out)[0]
    float(jnp.sum(first.astype(jnp.float32)))
    lat = _measure_pull_latency(first)
    ts = []
    for _ in range(3):
        q = q0
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f(q, k, v)
            q = q0 - 1e-6 * jax.tree.leaves(out)[0].astype(q0.dtype)
        float(jnp.sum(q.astype(jnp.float32)))
        ts.append(max(time.perf_counter() - t0 - lat, 1e-9) / chain)
    return min(ts)


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

        fl = jax.jit(lambda q, k, v: A._flash(q, k, v, None, scale, causal, 1))
        co = jax.jit(lambda q, k, v: A._composed_sdpa(q, k, v, scale, causal))
        t_fl, t_co = _time_q_chain(fl, q, k, v), _time_q_chain(co, q, k, v)

        def mk_loss(fn):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32)
                               * do.astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        g_fl = mk_loss(lambda q, k, v: A._flash(q, k, v, None, scale, causal, 1))
        g_co = mk_loss(lambda q, k, v: A._composed_sdpa(q, k, v, scale, causal))
        tb_fl = _time_q_chain(g_fl, q, k, v)
        tb_co = _time_q_chain(g_co, q, k, v)

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
