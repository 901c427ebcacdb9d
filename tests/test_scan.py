"""md.scan: sequential loops compiled as one lax.scan, tape-integrated.

Parity contract: the xla scan path produces the same values AND gradients
as the eager per-step loop (which itself is the fully-taped reference).
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md


def _step(c, x, w):
    c2 = md.tanh(c @ w + x)
    return c2, md.sum(c2 * c2)


def _run(backend_name, init_np, xs_np, w_np):
    md.set_backend(backend_name)
    init = md.Tensor(init_np, allow_grad=True)
    xs = md.Tensor(xs_np, allow_grad=True)
    w = md.Tensor(w_np, allow_grad=True)
    c, ys = md.scan(_step)(init, xs, w)
    loss = md.sum(ys) + md.sum(c * c)
    loss.backward(retain_grads=True)
    return (
        np.asarray(c.detach()), np.asarray(ys.detach()),
        np.asarray(init.grad), np.asarray(xs.grad), np.asarray(w.grad),
    )


def test_scan_xla_matches_eager_loop():
    np.random.seed(0)
    init = np.random.randn(4, 8)
    xs = np.random.randn(6, 4, 8)
    w = np.random.randn(8, 8) * 0.3
    ref = _run("numpy", init, xs, w)   # eager loop fallback = reference
    got = _run("xla", init, xs, w)     # single lax.scan + vjp transpose
    for r, g, name in zip(ref, got, ["carry", "ys", "g_init", "g_xs", "g_w"]):
        np.testing.assert_allclose(g, r, rtol=1e-9, atol=1e-12, err_msg=name)
    md.set_backend("xla")


def test_scan_under_jit():
    md.set_backend("xla")
    np.random.seed(1)
    init = np.random.randn(2, 4)
    xs = np.random.randn(5, 2, 4)
    w = np.random.randn(4, 4) * 0.3

    def obj(p):
        c, ys = md.scan(_step)(p["init"], p["xs"], p["w"])
        return md.sum(ys) + md.sum(c * c)

    tree = {"init": md.Tensor(init), "xs": md.Tensor(xs), "w": md.Tensor(w)}
    l1, g1 = md.value_and_grad(obj)(tree)
    l2, g2 = md.jit(md.value_and_grad(obj))(tree)
    np.testing.assert_allclose(float(l2.item()), float(l1.item()), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g2["w"]), np.asarray(g1["w"]),
                               rtol=1e-10)


def test_scan_carry_only_and_ys_only_grads():
    """Using only one of the two outputs still yields correct grads."""
    md.set_backend("xla")
    np.random.seed(2)
    w_np = np.eye(3) * 0.5
    xs_np = np.zeros((4, 2, 3))
    init_np = np.ones((2, 3))

    init = md.Tensor(init_np, allow_grad=True)
    c, ys = md.scan(_step)(init, md.Tensor(xs_np), md.Tensor(w_np))
    md.sum(c).backward()
    g_carry_only = np.asarray(init.grad)

    md.set_backend("numpy")
    init2 = md.Tensor(init_np, allow_grad=True)
    c2, ys2 = md.scan(_step)(init2, md.Tensor(xs_np), md.Tensor(w_np))
    md.sum(c2).backward()
    np.testing.assert_allclose(g_carry_only, np.asarray(init2.grad),
                               rtol=1e-9)
    md.set_backend("xla")


def test_gru_scan_matches_unrolled():
    from minidiff_tpu.models import GRUClassifier, SGD, make_train_step
    from minidiff_tpu.models.rnn import synthetic_sequence_classification

    md.set_backend("xla")
    np.random.seed(3)
    unrolled = GRUClassifier(8, 16, 4, use_scan=False)
    scanned = GRUClassifier(8, 16, 4, use_scan=True)
    scanned.cell = unrolled.cell  # share configs
    params = unrolled.init()
    x, y = synthetic_sequence_classification(16, 12, 8, 4)

    out_u = unrolled.apply(params, x)
    out_s = scanned.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_s.detach()),
                               np.asarray(out_u.detach()), rtol=1e-10)

    # one SGD step from identical params: same loss, same updated weights
    pu, _, lu = make_train_step(unrolled, SGD(0.1))(params, None, x, y)
    ps, _, ls = make_train_step(scanned, SGD(0.1))(params, None, x, y)
    np.testing.assert_allclose(float(ls.item()), float(lu.item()), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ps["cell"]["whh"]),
                               np.asarray(pu["cell"]["whh"]), rtol=1e-9)


def test_gru_scan_trains():
    from minidiff_tpu.models import GRUClassifier, SGD, make_train_step
    from minidiff_tpu.models.rnn import synthetic_sequence_classification

    md.set_backend("xla")
    np.random.seed(4)
    model = GRUClassifier(8, 24, 4, use_scan=True)
    params = model.init()
    x, y = synthetic_sequence_classification(32, 20, 8, 4)
    step = make_train_step(model, SGD(0.3))
    state, losses = None, []
    for _ in range(15):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
