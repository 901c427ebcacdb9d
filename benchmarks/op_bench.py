"""Per-op fwd+bwd microbenchmarks: tape-compiled (md.jit) vs jax.grad.

BASELINE.md primary metric ("per-op fwd+bwd µs vs jax.grad roofline").  For
each op we compile loss = sum(op(...)) twice — once through the framework's
tape engine under md.jit, once through jax's own AD — and time both on the
real device.  ratio = jax_time / md_time (1.0 = parity, >1 = md faster).

Run: `PYTHONPATH=$PYTHONPATH:. python benchmarks/op_bench.py`
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import minidiff_tpu as md

SHAPE = (4096, 4096)
DTYPE = jnp.float32
UNROLL = 8  # repeat the op in-trace so device time dominates tunnel dispatch


def _chain(fn, unary_like):
    """loss(x, ...) applying fn UNROLL times on a shifting input."""
    if unary_like == 1:
        def loss(a):
            tot = None
            for i in range(UNROLL):
                term = fn(a * (1.0 + 0.01 * i))
                tot = term if tot is None else tot + term
            return tot
        return loss

    def loss(a, b):
        tot = None
        for i in range(UNROLL):
            term = fn(a * (1.0 + 0.01 * i), b)
            tot = term if tot is None else tot + term
        return tot
    return loss


def _time_chain(step, args0, chain: int = 40) -> float:
    """s/step over data-dependent chains (grad feeds back into the input).

    Independent calls overlap in the tunnel's execution pipeline and read
    absurdly fast; only chained, data-dependent steps measure real device
    time.  Chain long enough that the ~27 ms scalar-pull latency is a small
    fraction of the window.
    """
    from minidiff_tpu.kernels.matmul import _measure_pull_latency

    args = step(args0)
    float(jnp.sum(args[0].astype(jnp.float32)))
    lat = _measure_pull_latency(args[0])
    ts = []
    for _ in range(3):
        args = args0
        t0 = time.perf_counter()
        for _ in range(chain):
            args = step(args)
        float(jnp.sum(args[0].astype(jnp.float32)))
        ts.append(max(time.perf_counter() - t0 - lat, 1e-9) / chain)
    return min(ts)


CASES = [
    # (name, md loss fn, jnp loss fn, n_args)
    ("add", lambda a, b: md.sum(a + b), lambda a, b: jnp.sum(a + b), 2),
    ("mul", lambda a, b: md.sum(a * b), lambda a, b: jnp.sum(a * b), 2),
    ("tanh", lambda a: md.sum(md.tanh(a)), lambda a: jnp.sum(jnp.tanh(a)), 1),
    ("exp", lambda a: md.sum(md.exp(a)), lambda a: jnp.sum(jnp.exp(a)), 1),
    ("elementwise_chain",
     lambda a, b: md.sum(md.sin(a) * md.exp(b) + a * b),
     lambda a, b: jnp.sum(jnp.sin(a) * jnp.exp(b) + a * b), 2),
    ("sum_axis0", lambda a: md.sum(md.sum(a, axis=0) ** 2),
     lambda a: jnp.sum(jnp.sum(a, axis=0) ** 2), 1),
    ("mean", lambda a: md.mean(a ** 2), lambda a: jnp.mean(a ** 2), 1),
    ("max_axis", lambda a: md.sum(md.max(a, axis=1)),
     lambda a: jnp.sum(jnp.max(a, axis=1)), 1),
    ("matmul", lambda a, b: md.sum(md.tanh(a @ b)),
     lambda a, b: jnp.sum(jnp.tanh(a @ b)), 2),
    ("broadcast", lambda a, b: md.sum(a + b[0:1, :] * 2.0),
     lambda a, b: jnp.sum(a + b[0:1, :] * 2.0), 2),
]


def main() -> None:
    md.set_backend("xla")
    rng = np.random.RandomState(0)
    args = tuple(jnp.asarray(rng.randn(*SHAPE) * 0.1, DTYPE) for _ in range(2))

    rows = []
    for name, md_fn, jnp_fn, n in CASES:
        a = args[:n]
        argnums = tuple(range(n))
        md_step = md.jit(md.value_and_grad(_chain(md_fn, n), argnums=argnums))

        def md_call(xs, n=n, md_step=md_step):
            out, g = md_step(*(md.Tensor(x, allow_grad=True) for x in xs))
            gl = [t._data for t in jax.tree.leaves(g)]
            # grad feedback = the data dependence between chain steps
            return tuple(x - 1e-6 * gx for x, gx in zip(xs, gl[:n]))

        jax_step = jax.jit(jax.value_and_grad(_chain(jnp_fn, n), argnums=argnums))

        def jax_call(xs, n=n, jax_step=jax_step):
            out, g = jax_step(*xs)
            return tuple(x - 1e-6 * gx for x, gx in zip(xs, g))

        t_md = _time_chain(md_call, a)
        t_jax = _time_chain(jax_call, a)
        row = {
            "op": name,
            "md_us": round(t_md * 1e6, 1),
            "jax_grad_us": round(t_jax * 1e6, 1),
            "ratio_jax_over_md": round(t_jax / t_md, 3),
        }
        rows.append(row)
        print(json.dumps(row))

    geo = float(np.exp(np.mean([np.log(r["ratio_jax_over_md"]) for r in rows])))
    print(json.dumps({
        "metric": "op_suite_fwdbwd_geomean_ratio",
        "value": round(geo, 4),
        "unit": "jax_time/md_time",
        "vs_baseline": round(geo, 4),
    }))


if __name__ == "__main__":
    main()
