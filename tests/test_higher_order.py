"""Higher-order differentiation: backward-of-backward via tape re-tracing.

Covers the README demo's second-order flow and BASELINE config 3 (Rosenbrock
Hessian-vector products / full Hessian via repeated backward).
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as backend_mod


def test_readme_second_order(backend):
    x = md.Tensor([[0.0, 2.0, -2.0, 1.0], [-1.0, -1.0, -2.0, -2.0]], allow_grad=True)
    y = md.Tensor([[2.0, 3.0, 4.0, 5.0], [0.0, -1.0, -3.0, 2.0]], allow_grad=True)
    f = 2 * y * md.sin(x) - x**2
    f.backward(allow_higher_order=True)
    xn, yn = np.asarray(x.detach()), np.asarray(y.detach())
    np.testing.assert_allclose(np.asarray(x.grad), 2 * yn * np.cos(xn) - 2 * xn, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y.grad), 2 * np.sin(xn), rtol=1e-6)

    x.grad.backward()
    np.testing.assert_allclose(np.asarray(x.grad), -2 * yn * np.sin(xn) - 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y.grad), 2 * np.cos(xn), rtol=1e-6)


def test_third_order(backend):
    x = md.Tensor(np.array([0.3, 0.7]), allow_grad=True)
    f = md.sum(md.sin(x))
    f.backward(allow_higher_order=True)
    x.grad.backward(allow_higher_order=True)  # -sin
    x.grad.backward()  # -cos
    np.testing.assert_allclose(
        np.asarray(x.grad), -np.cos(np.asarray(x.detach())), rtol=1e-6
    )


def _rosen(v):
    return md.sum(100.0 * (v[1:] - v[:-1] ** 2) ** 2 + (1 - v[:-1]) ** 2)


def _rosen_hessian(v: np.ndarray) -> np.ndarray:
    n = v.size
    h = np.zeros((n, n))
    for i in range(n - 1):
        h[i, i] += -400 * (v[i + 1] - v[i] ** 2) + 800 * v[i] ** 2 + 2
        h[i, i + 1] += -400 * v[i]
        h[i + 1, i] += -400 * v[i]
        h[i + 1, i + 1] += 200
    return h


def test_rosenbrock_hvp(backend):
    v0 = np.array([1.1, 0.9, 1.2, 0.8])
    hess = _rosen_hessian(v0)
    for col in range(4):
        e = np.zeros(4)
        e[col] = 1.0
        hv = md.hvp(_rosen)(md.Tensor(v0), md.Tensor(e))
        np.testing.assert_allclose(np.asarray(hv), hess[:, col], rtol=1e-5, atol=1e-6)


def test_rosenbrock_full_hessian_repeated_backward(backend):
    v0 = np.array([0.5, 1.5, -0.7])
    hess = _rosen_hessian(v0)
    v = md.Tensor(v0, allow_grad=True)
    out = _rosen(v)
    out.backward(allow_higher_order=True)
    g = v.grad
    rows = []
    for i in range(3):
        s = g[i]
        s.backward(cleanup_mode="keep")
        rows.append(np.asarray(v.grad).copy())
    np.testing.assert_allclose(np.stack(rows), hess, rtol=1e-5, atol=1e-6)


def test_higher_order_through_reductions(backend):
    # d²/dx² of (sum x)² = 2 everywhere (including cross terms via matvec)
    x = md.Tensor(np.array([1.0, 2.0, 3.0]), allow_grad=True)
    f = md.sum(x) ** 2
    f.backward(allow_higher_order=True)
    x.grad.backward()
    np.testing.assert_allclose(np.asarray(x.grad), 6 * np.ones(3))


def test_higher_order_through_matmul(backend):
    a = md.Tensor(np.array([[1.0, 2.0], [3.0, 4.0]]), allow_grad=True)
    f = md.sum(a @ a)
    f.backward(allow_higher_order=True)
    s = md.sum(a.grad * a.grad)
    s.backward()
    assert a.grad is not None and a.grad.shape == (2, 2)


def test_jvp_matches_finite_differences(backend):
    def f(z):
        return md.sum(md.sin(z) * z**2)

    rng = np.random.RandomState(0)
    xn = rng.randn(5)
    vn = rng.randn(5)
    y, jv = md.jvp(f)(md.Tensor(xn), md.Tensor(vn))
    eps = 1e-6

    def f_np(z):
        return float(np.sum(np.sin(z) * z**2))

    want = (f_np(xn + eps * vn) - f_np(xn - eps * vn)) / (2 * eps)
    np.testing.assert_allclose(float(jv.item()), want, rtol=1e-4)
    np.testing.assert_allclose(float(y.item()), f_np(xn), rtol=1e-6)


def test_jvp_vector_output(backend):
    def f(z):
        return md.tanh(z) * 2.0

    rng = np.random.RandomState(1)
    xn = rng.randn(4)
    vn = rng.randn(4)
    y, jv = md.jvp(f)(md.Tensor(xn), md.Tensor(vn))
    want = 2.0 * (1.0 - np.tanh(xn) ** 2) * vn  # diagonal Jacobian
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(jv._data)), want, rtol=1e-5, atol=1e-7
    )


# ---------------------------------------------------------------------------
# higher-order x compiled paths (VERDICT r1 item 4)
# ---------------------------------------------------------------------------


def test_jit_hvp_matches_eager():
    md.set_backend("xla")
    x = md.Tensor(np.array([1.1, 0.9, 1.2]))
    v = md.Tensor(np.array([1.0, 0.0, 0.0]))
    eager = md.hvp(_rosen)(x, v)
    jitted = md.jit(md.hvp(_rosen))(x, v)
    np.testing.assert_allclose(
        np.asarray(jitted.detach()), np.asarray(eager.detach()), rtol=1e-12
    )


def test_jit_hessian_matches_eager():
    md.set_backend("xla")
    x = md.Tensor(np.array([1.1, 0.9, 1.2]))
    H_eager = md.hessian(_rosen)(x)
    H_jit = md.jit(md.hessian(_rosen))(x)
    np.testing.assert_allclose(
        np.asarray(H_jit.detach()), np.asarray(H_eager.detach()), rtol=1e-12
    )


def test_jit_second_order_backward_matches_analytic():
    """A full allow_higher_order double-backward INSIDE one compiled
    program: f = sum(sin(x) * x); f' = sin + x cos; f'' = 2cos - x sin."""
    md.set_backend("xla")

    def second(xr):
        xr = xr.detach(allow_grad=True)
        with md.enable_grad(True):
            f = md.sum(md.sin(xr) * xr)
            f.backward(allow_higher_order=True)
            g = xr.grad
            xr.grad = None
            md.sum(g).backward()
        return g.detach(), xr.grad

    xv = np.array([0.3, 0.7])
    jf = md.jit(second)
    g, gg = jf(md.Tensor(xv))
    np.testing.assert_allclose(
        np.asarray(g.detach()), np.sin(xv) + xv * np.cos(xv), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(gg.detach()), 2 * np.cos(xv) - xv * np.sin(xv), rtol=1e-12)
    # the whole double-backward is ONE executable
    g2, _ = jf(md.Tensor(xv))
    assert len(jf._cache) == 1


def test_reuse_graph_higher_order_falls_back_correctly():
    """Inside reuse_graph, an allow_higher_order backward must fall back to
    the eager sweep (correct second derivatives), and a subsequent
    first-order backward still gets the compiled replay."""
    from minidiff_tpu import compiled_backward

    md.set_backend("xla")
    if not compiled_backward.enabled():
        pytest.skip("compiled backward disabled")
    with md.reuse_graph():
        t = md.Tensor(np.array([1.0, 2.0]), allow_grad=True)
        out = md.sum(t * t * t)
        out.backward(allow_higher_order=True)
        g = t.grad
        np.testing.assert_allclose(np.asarray(g.detach()), [3.0, 12.0])
        t.grad = None
        md.sum(g).backward()
        np.testing.assert_allclose(np.asarray(t.grad.detach()), [6.0, 12.0])
        # first-order path afterwards: still works (compiled or eager)
        t2 = md.Tensor(np.array([3.0, 4.0]), allow_grad=True)
        md.sum(t2 * t2 * t2).backward()
        np.testing.assert_allclose(np.asarray(t2.grad.detach()), [27.0, 48.0])


def test_remat_higher_order_raises():
    md.set_backend("xla")
    seg = md.remat(lambda t: t * t * t)
    x = md.Tensor(np.array([2.0]), allow_grad=True)
    out = md.sum(seg(x))
    with pytest.raises(NotImplementedError, match="remat"):
        out.backward(allow_higher_order=True)


def test_scan_higher_order_raises_on_xla_works_on_numpy():
    def step(c, xi, w):
        return c * w, c

    # xla: loud refusal
    md.set_backend("xla")
    init = md.Tensor(np.asarray(1.0), allow_grad=True)
    xs = md.Tensor(np.zeros(3))
    w = md.Tensor(np.asarray(2.0), allow_grad=True)
    carry, _ = md.scan(step)(init, xs, w)
    with pytest.raises(NotImplementedError, match="scan"):
        carry.backward(allow_higher_order=True)

    # numpy oracle: eager scan re-tapes; d2(w^3)/dw2 = 6w = 12
    md.set_backend("numpy")
    init = md.Tensor(np.asarray(1.0), allow_grad=True)
    xs = md.Tensor(np.zeros(3))
    w = md.Tensor(np.asarray(2.0), allow_grad=True)
    carry, _ = md.scan(step)(init, xs, w)
    carry.backward(allow_higher_order=True)
    gw = w.grad
    np.testing.assert_allclose(float(gw.item()), 12.0)
    w.grad = None
    md.sum(gw).backward()
    np.testing.assert_allclose(float(w.grad.item()), 12.0)
    md.set_backend("xla")


def test_hessian_batched_matches_loop_at_n64():
    """The xla hessian (ONE vmapped hvp program) must equal the explicit
    per-direction loop at production-ish n (VERDICT item 7)."""
    md.set_backend("xla")
    n = 64
    x = md.Tensor(np.linspace(-1.2, 1.2, n))
    H = md.hessian(_rosen)(x)
    assert tuple(int(d) for d in H.shape) == (n, n)
    want = _rosen_hessian(np.linspace(-1.2, 1.2, n))
    np.testing.assert_allclose(np.asarray(H.detach()), want, rtol=1e-8)


def test_hessian_helper_rosenbrock(backend):
    v0 = np.array([1.2, 1.0, 0.8])
    H = md.hessian(_rosen)(md.Tensor(v0))
    want = _rosen_hessian(v0)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(H._data)), want, rtol=1e-5, atol=1e-6
    )


def test_hvp_affine_is_zero(backend):
    x = md.Tensor(np.array([1.0, 2.0]))
    v = md.Tensor(np.array([1.0, -1.0]))
    hv = md.hvp(lambda z: md.sum(2.0 * z))(x, v)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(hv._data)), 0.0, atol=1e-12)
    hv2 = md.hvp(lambda z: md.sum(z * z))(x, v)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(hv2._data)),
        2.0 * np.array([1.0, -1.0]))


def test_jvp_degenerate_functions(backend):
    x = md.Tensor(np.array([1.0, 2.0]))
    v = md.Tensor(np.array([3.0, 4.0]))
    # output independent of x -> zero tangent, no crash
    y, t = md.jvp(lambda z: md.sum(z.detach() * 0.0 + 3.0))(x, v)
    np.testing.assert_allclose(np.asarray(backend_mod.as_numpy(t._data)), 0.0)
    # linear fn -> tangent = J v exactly
    y2, t2 = md.jvp(lambda z: 2.0 * z)(x, v)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(t2._data)), 2.0 * np.array([3.0, 4.0]))


# -- compiled higher-order cycle (VERDICT r4 item 5) ------------------------
#
# Under reuse_graph, the README cycle f.backward(allow_higher_order=True)
# followed by x.grad.backward() compiles into ONE executable (forward
# rebuild + re-taped sweep 1 + second-order sweep); from iteration 2 the
# first sweep replays compiled too.  Values must match the eager sweep
# exactly, and every divergence (tape-free replayed grads used as op
# inputs) must be LOUD, never silent.


def _cycle_build(xv, yv):
    x = md.Tensor(xv, allow_grad=True)
    y = md.Tensor(yv, allow_grad=True)
    s = md.exp(md.sin(x) * y)          # needs_output VJP (exp) + sharing
    f = md.sum(s * s + 2.0 * x)
    return x, y, f


def test_cycle_compiles_once_and_matches_eager():
    import minidiff_tpu.compiled_backward as mcb

    md.set_backend("xla")
    # eager reference, outside reuse_graph
    x0, y0, f0 = _cycle_build(0.7, -1.3)
    f0.backward(allow_higher_order=True)
    g1x = float(np.asarray(x0.grad.detach()))
    g1y = float(np.asarray(y0.grad.detach()))
    x0.grad.backward()
    g2x = float(np.asarray(x0.grad.detach()))
    g2y = float(np.asarray(y0.grad.detach()))

    mcb._HO_CYCLES.clear()
    with md.reuse_graph():
        for i in range(3):
            x, y, f = _cycle_build(0.7, -1.3)
            f.backward(allow_higher_order=True)
            np.testing.assert_allclose(float(np.asarray(x.grad.detach())),
                                       g1x, rtol=1e-10)
            np.testing.assert_allclose(float(np.asarray(y.grad.detach())),
                                       g1y, rtol=1e-10)
            if i >= 1:
                # warm: sweep 1 replayed compiled -> grads are tape-free
                assert x.grad.op_node is None
            x.grad.backward()
            np.testing.assert_allclose(float(np.asarray(x.grad.detach())),
                                       g2x, rtol=1e-10)
            np.testing.assert_allclose(float(np.asarray(y.grad.detach())),
                                       g2y, rtol=1e-10)
    # ONE cycle executable serves every iteration
    assert sum(len(e["cycles"]) for e in mcb._HO_CYCLES.values()) == 1


def test_cycle_replayed_grad_op_use_is_loud():
    import minidiff_tpu.compiled_backward as mcb

    md.set_backend("xla")
    mcb._HO_CYCLES.clear()
    with md.reuse_graph():
        for i in range(2):
            x, y, f = _cycle_build(0.4, 0.9)
            f.backward(allow_higher_order=True)
            if i == 0:
                x.grad.backward()   # confirm the cycle -> warm next iter
            else:
                # warm iteration: x.grad is a tape-free replay; using it as
                # an op input would silently stop higher-order backprop
                with pytest.raises(RuntimeError,
                                   match="compiled-replay gradient"):
                    md.sum(x.grad * 3.0)
                # detach() is the documented escape hatch
                v = md.sum(x.grad.detach() * 3.0)
                assert np.isfinite(float(np.asarray(v.detach())))


def test_cycle_state_cleared_on_context_exit():
    import minidiff_tpu.compiled_backward as mcb

    md.set_backend("xla")
    mcb._HO_CYCLES.clear()
    with md.reuse_graph():
        x, y, f = _cycle_build(0.2, 0.5)
        f.backward(allow_higher_order=True)
        assert any(e["live"] is not None for e in mcb._HO_CYCLES.values())
    # live tensor refs dropped when the context exits
    assert all(e["live"] is None for e in mcb._HO_CYCLES.values())


def test_cycle_numpy_backend_stays_eager():
    import minidiff_tpu.compiled_backward as mcb

    md.set_backend("numpy")
    try:
        x0, y0, f0 = _cycle_build(0.7, -1.3)
        f0.backward(allow_higher_order=True)
        x0.grad.backward()
        g2x = float(np.asarray(x0.grad.detach()))
        mcb._HO_CYCLES.clear()
        with md.reuse_graph():
            for _ in range(2):
                x, y, f = _cycle_build(0.7, -1.3)
                f.backward(allow_higher_order=True)
                x.grad.backward()
                np.testing.assert_allclose(
                    float(np.asarray(x.grad.detach())), g2x, rtol=1e-10)
        assert not mcb._HO_CYCLES  # no stash off-xla
    finally:
        md.set_backend("xla")


def test_cycle_second_root_variants_get_separate_executables():
    import minidiff_tpu.compiled_backward as mcb

    md.set_backend("xla")
    # eager reference for y.grad.backward()
    x0, y0, f0 = _cycle_build(0.7, -1.3)
    f0.backward(allow_higher_order=True)
    y0.grad.backward()
    g2y = float(np.asarray(y0.grad.detach()))

    mcb._HO_CYCLES.clear()
    with md.reuse_graph():
        for i in range(2):
            x, y, f = _cycle_build(0.7, -1.3)
            f.backward(allow_higher_order=True)
            y.grad.backward()
            np.testing.assert_allclose(float(np.asarray(y.grad.detach())),
                                       g2y, rtol=1e-10)
    assert sum(len(e["cycles"]) for e in mcb._HO_CYCLES.values()) == 1


def test_cycle_post_replay_backward_is_silent_noop():
    """Eager semantics: after the second-order sweep, x.grad is a
    tape-free leaf whose backward() silently no-ops.  A warm compiled
    replay must behave identically — a second x.grad.backward() (or
    y.grad.backward() after the cycle ran) keeps the post-cycle values
    untouched instead of refusing (r5 self-review finding)."""
    import minidiff_tpu.compiled_backward as mcb

    md.set_backend("xla")
    # eager reference: the second backward call changes nothing
    x0, y0, f0 = _cycle_build(0.4, 0.9)
    f0.backward(allow_higher_order=True)
    x0.grad.backward()
    g2x = float(np.asarray(x0.grad.detach()))
    g2y = float(np.asarray(y0.grad.detach()))
    x0.grad.backward()   # no-op on the tape-free grad
    y0.grad.backward()   # ditto
    np.testing.assert_allclose(float(np.asarray(x0.grad.detach())), g2x)
    np.testing.assert_allclose(float(np.asarray(y0.grad.detach())), g2y)

    mcb._HO_CYCLES.clear()
    with md.reuse_graph():
        for i in range(3):
            x, y, f = _cycle_build(0.4, 0.9)
            f.backward(allow_higher_order=True)
            x.grad.backward()
            # post-cycle: both grads now carry replay markers (warm
            # iterations); their backward() must no-op like eager
            x.grad.backward()
            y.grad.backward()
            np.testing.assert_allclose(
                float(np.asarray(x.grad.detach())), g2x, rtol=1e-10)
            np.testing.assert_allclose(
                float(np.asarray(y.grad.detach())), g2y, rtol=1e-10)
