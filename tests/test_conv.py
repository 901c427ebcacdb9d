"""conv2d op family (fwd parity, oracle gradchecks, higher order) + CNN."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as B
from minidiff_tpu.utils import compute_grads


def _np_conv2d(xn, wn, stride=1, padding=0):
    from numpy.lib.stride_tricks import sliding_window_view

    if padding:
        xn = np.pad(xn, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    kh, kw = wn.shape[0], wn.shape[1]
    win = sliding_window_view(xn, (kh, kw), axis=(1, 2))[:, ::stride, ::stride]
    return np.einsum("bhwckl,klco->bhwo", win, wn)


@pytest.mark.parametrize("stride,padding", [(1, 0), (1, 1), (2, 1), (2, 0)])
def test_conv2d_forward(backend, stride, padding):
    x = md.randn(2, 6, 6, 3)
    w = md.randn(3, 3, 3, 4)
    out = md.conv2d(x, w, stride=stride, padding=padding)
    xn = np.asarray(B.as_numpy(x._data), np.float64)
    wn = np.asarray(B.as_numpy(w._data), np.float64)
    want = _np_conv2d(xn, wn, stride, padding)
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out._data), np.float64), want, rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("stride,padding", [(1, 0), (1, 1), (2, 1)])
def test_conv2d_gradcheck(backend, stride, padding):
    x = md.randn(2, 6, 6, 2)
    w = md.randn(3, 3, 2, 3)
    manual, auto = compute_grads(
        x, w,
        func=lambda a, b: md.sum(md.conv2d(a, b, stride=stride, padding=padding) ** 2) / 2,
    )
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(B.as_numpy(m._data), np.float64),
            np.asarray(B.as_numpy(a._data), np.float64),
            rtol=1e-3,
            atol=1e-4,
        )


def test_conv2d_second_order_exact(backend):
    """Directional second derivative matches finite differences of the grad."""
    rng = np.random.RandomState(0)
    xn = rng.randn(1, 4, 4, 2)
    wn = rng.randn(3, 3, 2, 2)
    x = md.Tensor(xn, allow_grad=True)
    out = md.sum(md.conv2d(x, md.Tensor(wn), padding=1) ** 2) / 2
    out.backward(allow_higher_order=True)
    md.sum(x.grad * x.grad).backward()
    hv = np.asarray(B.as_numpy(x.grad._data), np.float64)

    eps = 1e-6

    def grad_at(xv):
        xt = md.Tensor(xv, allow_grad=True)
        o = md.sum(md.conv2d(xt, md.Tensor(wn), padding=1) ** 2) / 2
        o.backward()
        return np.asarray(B.as_numpy(xt.grad._data), np.float64)

    d = rng.randn(*xn.shape)
    lhs = float((hv * d).sum())
    g0 = grad_at(xn)
    num = (grad_at(xn + eps * d) - grad_at(xn - eps * d)) / (2 * eps)
    rhs = float((2 * g0 * num).sum())
    assert abs(lhs - rhs) / max(abs(rhs), 1e-9) < 1e-3, (lhs, rhs)


def test_pooling(backend):
    from minidiff_tpu.models.functional import avg_pool2d, max_pool2d

    x = md.randn(2, 4, 4, 3)
    mp = max_pool2d(x, 2)
    ap = avg_pool2d(x, 2)
    assert mp.shape == (2, 2, 2, 3) and ap.shape == (2, 2, 2, 3)
    xn = np.asarray(B.as_numpy(x._data), np.float64).reshape(2, 2, 2, 2, 2, 3)
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(mp._data), np.float64), xn.max(axis=(2, 4)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(ap._data), np.float64), xn.mean(axis=(2, 4)),
        rtol=1e-6,
    )
    # pooling is differentiable (composed from reshape + max)
    x2 = md.randn(1, 4, 4, 1).detach(allow_grad=True)
    md.sum(max_pool2d(x2, 2) ** 2).backward()
    assert x2.grad is not None and x2.grad.shape == x2.shape


def test_cnn_trains():
    from minidiff_tpu.models import CNN, SGD, make_train_step

    md.set_backend("xla")
    np.random.seed(0)
    model = CNN(in_channels=1, channels=(8, 16), num_classes=10, image_size=28)
    params = model.init()
    x = md.Tensor(np.random.randn(16, 28, 28, 1).astype(np.float32))
    y = md.Tensor(np.random.randint(0, 10, 16))
    assert model.apply(params, x).shape == (16, 10)
    opt = SGD(0.05)
    state = opt.init(params)
    step = make_train_step(model, opt)
    losses = []
    for _ in range(10):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses
