"""int8 weight-only serving microbench: fused Pallas dequant-matmul vs
bf16 matmul vs XLA convert-then-dot, at decode activation shapes.

Decode is HBM-bound on the weight stream, so the expected ordering at
small M is: pallas int8 (reads K*N bytes) < bf16 matmul (2*K*N) <= XLA
convert-dot (reads K*N int8, materializes + re-reads 2*K*N bf16).  This
bench verifies that ordering on the real chip and prices the Pallas
kernel's win; bench.py's decode_int8 detail measures the end-to-end
effect.

Timing via the paired-chain protocol (see op_bench._time_pair notes):
data-dependent chains, in-trace unrolls, pull-latency subtraction.

Run from the repo root: `python -m benchmarks.quant_bench`.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from minidiff_tpu.kernels import quant as Q
from minidiff_tpu.kernels.matmul import _measure_pull_latency

# (M, K, N): decode GEMV-ish shapes from the bench TransformerLM (d=1024)
SHAPES = [(8, 1024, 3072), (8, 1024, 4096), (8, 4096, 1024), (16, 2048, 2048)]
UNROLL = 256


def _chain(fn, m, k):
    def step(x):
        tot = None
        for _ in range(UNROLL):
            o = fn(x)
            t = jnp.sum(o.astype(jnp.float32))
            tot = t if tot is None else tot + t
            x = x * (1.0 + 1e-8 * t).astype(x.dtype)
        return x, tot
    return jax.jit(step)


def _time(step, x0, lat):
    x = x0
    t0 = time.perf_counter()
    for _ in range(32):
        x, tot = step(x)
    float(tot)
    return max(time.perf_counter() - t0 - lat, 1e-9) / 32 / UNROLL


def main() -> None:
    import minidiff_tpu as md

    md.set_backend("xla")
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 128))))
    print(json.dumps({"warmup_pull_s": round(time.time() - t0, 1)}), flush=True)

    rows = []
    for m, k, n in SHAPES:
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(m, k) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), jnp.bfloat16)
        q, s = Q.quantize_int8(w)
        q, s = jax.device_put(q), jax.device_put(s)
        # output feeds back into x: route N -> K with a cheap slice/pad
        def back(o, k=k):
            if o.shape[-1] >= k:
                return o[:, :k]
            reps = -(-k // o.shape[-1])
            return jnp.tile(o, (1, reps))[:, :k]

        variants = {
            "pallas_int8": lambda x: back(Q.dequant_matmul(x, q, s)),
            "bf16_matmul": lambda x: back(jnp.matmul(x, w)),
            "xla_convert_dot": lambda x: back(
                Q._jnp_dequant_matmul(x, q, s)),
        }
        lat = _measure_pull_latency(x0)
        times = {}
        for name, fn in variants.items():
            step = _chain(fn, m, k)
            xw, tot = step(x0)
            float(tot)  # compile + warm
            times[name] = _time(step, x0, lat)
        row = {
            "shape": f"{m}x{k}x{n}",
            **{f"{nm}_us": round(t * 1e6, 2) for nm, t in times.items()},
            "pallas_speedup_vs_bf16": round(
                times["bf16_matmul"] / times["pallas_int8"], 3),
            "pallas_speedup_vs_convert_dot": round(
                times["xla_convert_dot"] / times["pallas_int8"], 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    geo = float(np.exp(np.mean(
        [np.log(r["pallas_speedup_vs_bf16"]) for r in rows])))
    print(json.dumps({
        "metric": "int8_dequant_matmul_speedup_vs_bf16",
        "value": round(geo, 4),
        "unit": "x",
        "vs_baseline": round(geo, 4),
    }))


if __name__ == "__main__":
    main()
