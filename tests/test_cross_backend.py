"""Cross-backend equivalence: XLA results must match the NumPy oracle.

The reference never checks its backends against each other (SURVEY.md §4);
here every sampled program must produce identical forwards and tape gradients
on both backends from identical inputs (float64 on CPU ⇒ tight tolerance).
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md

RTOL = 1e-10


def run_on(backend_name, program, arrays):
    md.set_backend(backend_name)
    tensors = [md.Tensor(a, allow_grad=True) for a in arrays]
    out = program(*tensors)
    out.backward()
    return np.asarray(out.detach()), [np.asarray(t.grad) for t in tensors]


PROGRAMS = [
    ("mlp-ish", lambda w, x: md.sum(md.tanh(x @ w) ** 2), [(4, 3), (5, 4)]),
    (
        "elementwise-chain",
        lambda a, b: md.sum(2 * b * md.sin(a) - a**2 + md.exp(b) / (1 + b**2)),
        [(3, 3), (3, 3)],
    ),
    (
        "reductions",
        lambda a, b: md.sum(md.std(a, axis=0) * md.mean(b, axis=0))
        + md.max(a) + md.min(b) + md.prod(md.tanh(a), axis=1).sum(),
        [(4, 5), (4, 5)],
    ),
    (
        "broadcast+where",
        lambda a, b: md.sum(md.where(a > 0, a * b, b - a)),
        [(4, 1), (4, 5)],
    ),
    (
        "indexing",
        lambda a, b: md.sum(a[1:] * b[:-1] + a[0] ** 2),
        [(6,), (6,)],
    ),
    (
        "tensordot",
        lambda a, b: md.sum(md.tensordot(a, b, axes=((1, 2), (0, 1)))),
        [(2, 3, 4), (3, 4, 5)],
    ),
    (
        "linear-scan",
        lambda a, b: md.sum(md.linear_scan(md.tanh(a), b, axis=1) ** 2),
        [(2, 6, 3), (2, 6, 3)],
    ),
]


@pytest.mark.parametrize("name,program,shapes", PROGRAMS, ids=[p[0] for p in PROGRAMS])
def test_xla_matches_numpy_oracle(name, program, shapes):
    arrays = [np.random.randn(*s) for s in shapes]
    try:
        out_np, grads_np = run_on("numpy", program, arrays)
        out_xla, grads_xla = run_on("xla", program, arrays)
    finally:
        md.set_backend("xla")
    np.testing.assert_allclose(out_xla, out_np, rtol=RTOL, atol=1e-12)
    for g_np, g_xla in zip(grads_np, grads_xla):
        np.testing.assert_allclose(g_xla, g_np, rtol=RTOL, atol=1e-12)
