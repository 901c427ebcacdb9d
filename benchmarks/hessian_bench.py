"""Batched (vmapped) md.hessian vs the per-direction hvp loop.

VERDICT round-1 item 7: the Hessian of a scalar fn used to be a Python loop
of n separate double-backwards; on xla it is now ONE vmapped hvp program.
This measures both at n >= 64 on the Rosenbrock function.

Run: `python -m benchmarks.hessian_bench` from the repo root.
"""

from __future__ import annotations

import json
import time

import numpy as np

import minidiff_tpu as md

N = 64
REPEATS = 3


def _rosen(t):
    return md.sum(100.0 * (t[1:] - t[:-1] ** 2) ** 2 + (1.0 - t[:-1]) ** 2)


def _loop_hessian(fn, x):
    n = int(x.size)
    hv = md.hvp(fn)
    rows = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        rows.append(hv(x, md.Tensor(e.reshape(x.shape))))
    return md.stack(rows)


def _time(f, *a):
    out = f(*a)  # warm (compile)
    np.asarray(out.detach())
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(out.detach())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main() -> None:
    md.set_backend("xla")
    x = md.Tensor(np.linspace(-1.2, 1.2, N))
    t_batched, h_b = _time(md.hessian(_rosen), x)
    t_loop, h_l = _time(_loop_hessian, _rosen, x)
    err = float(np.max(np.abs(np.asarray(h_b.detach(), np.float64)
                              - np.asarray(h_l.detach(), np.float64))))
    print(json.dumps({
        "n": N,
        "batched_ms": round(t_batched * 1e3, 2),
        "loop_ms": round(t_loop * 1e3, 2),
        "speedup": round(t_loop / t_batched, 2),
        "max_abs_diff": err,
    }))


if __name__ == "__main__":
    main()
