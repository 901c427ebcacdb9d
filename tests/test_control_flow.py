"""md.cond / md.while_loop — data-dependent control flow (func.py).

md.scan already covers differentiable loops (tests/test_scan.py); these
two complete the lax control-flow triple: a differentiable branch whose
predicate stays a traced value (no host sync inside md.jit) and a
non-differentiable dynamic-trip-count loop.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.utils.gradcheck import compute_grads


def _t(a, grad=True):
    return md.Tensor(np.asarray(a, dtype=np.float64), allow_grad=grad)


def _branches():
    t = lambda x, y: x * y + md.sin(x)
    f = lambda x, y: x - y**2
    return t, f


def test_cond_forward_both_branches(backend):
    t, f = _branches()
    x, y = _t([1.0, 2.0]), _t([3.0, 0.5])
    br = md.cond(t, f)
    hi = br(md.Tensor(np.asarray(True)), x, y)
    lo = br(md.Tensor(np.asarray(False)), x, y)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(t(x, y)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(f(x, y)), rtol=1e-12)


def test_cond_python_bool_resolves_immediately(backend):
    t, f = _branches()
    x, y = _t([1.0, 2.0]), _t([3.0, 0.5])
    out = md.cond(t, f)(True, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t(x, y)), rtol=1e-12)


@pytest.mark.parametrize("pred", [True, False])
def test_cond_gradcheck_taken_branch(backend, pred):
    """Autodiff through the staged cond matches finite differences of the
    TAKEN branch for every operand."""
    t, f = _branches()

    def fn(x, y):
        return md.sum(md.cond(t, f)(md.Tensor(np.asarray(pred)), x, y))

    x, y = _t(np.random.randn(2, 3)), _t(np.random.randn(2, 3) + 2.0)
    manuals, autos = compute_grads(x, y, func=fn)
    for manual, auto in zip(manuals, autos):
        np.testing.assert_allclose(np.asarray(auto), np.asarray(manual),
                                   rtol=1e-4, atol=1e-6)


def test_cond_under_jit_flips_without_retrace(backend):
    """ONE compiled program serves both predicate values — the branch is
    data inside the executable, not a trace constant."""
    if backend != "xla":
        pytest.skip("md.jit compiles on the xla backend")
    t, f = _branches()

    calls = {"n": 0}

    def fn(p, x, y):
        calls["n"] += 1
        return md.sum(md.cond(t, f)(p, x, y))

    jf = md.jit(fn)
    x, y = _t([1.0, 2.0], grad=False), _t([3.0, 0.5], grad=False)
    hi = float(jf(md.Tensor(np.asarray(True)), x, y).item())
    lo = float(jf(md.Tensor(np.asarray(False)), x, y).item())
    assert calls["n"] == 1  # second call replayed the same trace
    np.testing.assert_allclose(hi, float(md.sum(t(x, y)).item()), rtol=1e-12)
    np.testing.assert_allclose(lo, float(md.sum(f(x, y)).item()), rtol=1e-12)


def test_cond_grad_matches_eager_select(backend):
    """d/dx cond(p, t, f) == d/dx of the taken branch — including when the
    untaken branch would have a LARGER gradient."""
    t, f = _branches()

    def g_of(pred):
        x, y = _t([0.3, -1.2]), _t([2.0, 0.1])
        out = md.sum(md.cond(t, f)(md.Tensor(np.asarray(pred)), x, y))
        out.backward()
        return np.asarray(x.grad), np.asarray(y.grad)

    gx_t, gy_t = g_of(True)
    x = np.array([0.3, -1.2])
    np.testing.assert_allclose(gx_t, np.array([2.0, 0.1]) + np.cos(x),
                               rtol=1e-12)
    np.testing.assert_allclose(gy_t, x, rtol=1e-12)
    gx_f, gy_f = g_of(False)
    np.testing.assert_allclose(gx_f, np.ones(2), rtol=1e-12)
    np.testing.assert_allclose(gy_f, -2.0 * np.array([2.0, 0.1]), rtol=1e-12)


def test_cond_higher_order_contract(backend):
    t, f = _branches()

    def fn(x):
        return md.sum(md.cond(t, f)(md.Tensor(np.asarray(True)), x, x))

    x = _t([0.7, 1.1])
    out = fn(x)
    if backend == "numpy":
        out.backward(allow_higher_order=True)
        g = md.sum(x.grad)
        g.backward()  # second order through the eager branch
        assert x.grad is not None
    else:
        with pytest.raises(NotImplementedError):
            out.backward(allow_higher_order=True)


def test_while_loop_collatz_style(backend):
    """Dynamic trip count: double until the carry exceeds a traced bound."""
    loop = md.while_loop(
        lambda c, bound: md.sum(c) < bound,
        lambda c, bound: c * 2.0,
    )
    init = _t([1.0, 1.0], grad=False)
    out = loop(init, md.Tensor(np.asarray(100.0)))
    # 2 -> 4 -> ... sum doubles from 2: stops at sum 128
    np.testing.assert_allclose(np.asarray(out), np.array([64.0, 64.0]))


def test_while_loop_zero_iterations(backend):
    loop = md.while_loop(lambda c: md.sum(c) < 0.0, lambda c: c + 1.0)
    out = loop(_t([5.0], grad=False))
    np.testing.assert_allclose(np.asarray(out), np.array([5.0]))


def test_while_loop_not_differentiable(backend):
    """The loop joins the graph as a non-diff op: backprop through a
    consumer skips it silently (reference semantics for is_differentiable=
    False), leaving the loop INPUT without a gradient."""
    x = _t([1.0, 2.0])
    loop = md.while_loop(lambda c: md.sum(c) < 10.0, lambda c: c * 2.0)
    y = loop(x)
    z = md.sum(y * 3.0)
    if z.allow_grad:
        z.backward()
    assert x.grad is None


def test_while_loop_under_jit(backend):
    if backend != "xla":
        pytest.skip("md.jit compiles on the xla backend")
    loop = md.while_loop(lambda c, b: md.sum(c) < b, lambda c, b: c * 2.0)

    def fn(x, b):
        return md.sum(loop(x, b))

    jf = md.jit(fn)
    x = _t([1.0, 1.0], grad=False)
    assert float(jf(x, md.Tensor(np.asarray(100.0))).item()) == 128.0
    # same program, different bound -> different trip count, no retrace
    assert float(jf(x, md.Tensor(np.asarray(20.0))).item()) == 32.0
