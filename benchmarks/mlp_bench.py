"""MLP train steps/sec (BASELINE config 2) — tape engine vs handwritten jax.

The framework side is the real product path: models.MLP + make_train_step
(tape forward, engine backward, SGD update) compiled by md.jit.  The baseline
is the same network/loss/update written directly in jax with jax.grad.

Run: `PYTHONPATH=$PYTHONPATH:. python benchmarks/mlp_bench.py`
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import MLP, SGD, make_train_step
from minidiff_tpu.models.data import synthetic_classification

# two configs: the small one is host-dispatch-bound on both sides (the md.jit
# wrapper's Python costs ~0.1-0.3 ms/call vs jax.jit's ~10 us — visible only
# when the device step is sub-millisecond); the large one is device-bound and
# shows compute parity.
CONFIGS = [
    ("mlp_784x1024x10_b512", 512, 784, 1024, 10, 300),
    ("mlp_784x4096x10_b8192", 8192, 784, 4096, 10, 60),
]
LR = 0.1


def _steps_per_sec(step, params, state, x, y, reps: int = 300) -> float:
    """Steps/s over param-chained runs; subtracts the ~27 ms pull latency."""
    import jax.numpy as jnp

    from minidiff_tpu.kernels.matmul import _measure_pull_latency

    # warm BOTH executable-cache entries: the first step's outputs carry
    # different allow_grad flags than the initial params, which keys a second
    # compile — it must not land inside a timed window
    params2, state2, loss = step(params, state, x, y)
    params3, state3, loss = step(params2, state2, x, y)
    float(loss.item() if hasattr(loss, "item") else loss)
    lat = _measure_pull_latency(jnp.ones((8, 128), jnp.float32))
    ts = []
    for _ in range(3):
        p, s = params, state
        t0 = time.perf_counter()
        for _ in range(reps):
            p, s, loss = step(p, s, x, y)
        float(loss.item() if hasattr(loss, "item") else loss)
        ts.append(reps / max(time.perf_counter() - t0 - lat, 1e-9))
    return max(ts)


def main() -> None:
    md.set_backend("xla")
    for name, BATCH, IN, HIDDEN, OUT, reps in CONFIGS:
        _run_config(name, BATCH, IN, HIDDEN, OUT, reps)


def _run_config(name, BATCH, IN, HIDDEN, OUT, reps) -> None:
    xs, ys = synthetic_classification(BATCH, IN, OUT)
    x, y = md.Tensor(xs), md.Tensor(ys)

    model = MLP(IN, (HIDDEN,), OUT)
    params = model.init()
    opt = SGD(LR)
    state = opt.init(params)
    step = make_train_step(model, opt)
    sps_md = _steps_per_sec(step, params, state, x, y, reps=reps)

    # identical network in raw jax
    raw = jax.tree.map(lambda t: jnp.asarray(t._data), params,
                       is_leaf=lambda t: isinstance(t, md.Tensor))
    xj = jnp.asarray(xs)
    yj = jnp.asarray(ys.astype(np.int32))

    def jloss(p, x, y):
        h = jnp.maximum(x @ p[0]["w"] + p[0]["b"], 0.0)
        logits = h @ p[2]["w"] + p[2]["b"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(x.shape[0]), y])

    @jax.jit
    def jstep(p, _, x, y):
        loss, g = jax.value_and_grad(jloss)(p, x, y)
        p = jax.tree.map(lambda w, gw: w - LR * gw, p, g)
        return p, None, loss

    class _S:  # adapt the jax step to the timing harness's loss.item() use
        def __init__(self, v):
            self.v = v

        def item(self):
            return float(self.v)

    def jstep_adapted(p, s, x, y):
        p, s, loss = jstep(p, s, xj, yj)
        return p, s, _S(loss)

    sps_jax = _steps_per_sec(jstep_adapted, raw, None, None, None, reps=reps)

    print(json.dumps({
        "metric": f"{name}_train_steps_per_sec",
        "value": round(sps_md, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps_md / sps_jax, 4),
        "detail": {"jax_grad_steps_per_sec": round(sps_jax, 1),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
