"""Models layer: MLP end-to-end training driven by the engine (BASELINE cfg 2)."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import MLP, Adam, SGD, make_train_step, mnist_like_batches
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.data import synthetic_classification
from minidiff_tpu.models.mlp import train


def setup_function(_):
    md.set_backend("xla")


def test_functional_ops_match_numpy():
    z = np.random.randn(4, 7)
    t = md.Tensor(z)
    sm = np.asarray(F.softmax(t))
    expected = np.exp(z - z.max(-1, keepdims=True))
    expected /= expected.sum(-1, keepdims=True)
    np.testing.assert_allclose(sm, expected, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(F.log_softmax(t)), np.log(expected), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(F.relu(t)), np.maximum(z, 0), rtol=1e-12
    )
    oh = np.asarray(F.one_hot(md.Tensor(np.array([0, 2])), 3))
    np.testing.assert_array_equal(oh, [[1, 0, 0], [0, 0, 1]])


def test_cross_entropy_int_vs_onehot():
    logits = md.Tensor(np.random.randn(6, 4), allow_grad=True)
    labels = md.Tensor(np.array([0, 1, 2, 3, 0, 1]))
    ce_int = F.cross_entropy(logits, labels)
    ce_oh = F.cross_entropy(logits.detach(True), F.one_hot(labels, 4))
    np.testing.assert_allclose(
        float(ce_int.item()), float(ce_oh.item()), rtol=1e-10
    )
    ce_int.backward()
    # analytic grad: (softmax - onehot)/N
    sm = np.asarray(F.softmax(logits.detach()))
    expected = (sm - np.asarray(F.one_hot(labels, 4))) / 6
    np.testing.assert_allclose(np.asarray(logits.grad), expected, rtol=1e-8)


@pytest.mark.parametrize("opt_name", ["sgd", "momentum", "adam"])
def test_mlp_trains(opt_name):
    opt = {"sgd": SGD(0.2), "momentum": SGD(0.05, momentum=0.9), "adam": Adam(2e-3)}[
        opt_name
    ]
    model = MLP(784, (64,), 10)
    params, losses = train(
        model, mnist_like_batches(batch_size=128, epochs=1, n=2048), opt
    )
    assert losses[-1] < losses[0] * 0.7, losses


def test_mlp_reaches_high_accuracy():
    model = MLP(784, (128,), 10)
    params, losses = train(
        model, mnist_like_batches(batch_size=128, epochs=2), SGD(0.2)
    )
    xv, yv = synthetic_classification(512, 784, 10, seed=123)
    acc = F.accuracy(model.apply(params, md.Tensor(xv)), md.Tensor(yv))
    assert acc > 0.95, acc


def test_train_step_jit_matches_eager():
    model = MLP(16, (8,), 4)
    params = model.init()
    opt = SGD(0.1)
    x = md.Tensor(np.random.randn(8, 16))
    y = md.Tensor(np.random.randint(0, 4, 8))

    eager_step = make_train_step(model, opt, jit=False)
    jit_step = make_train_step(model, opt, jit=True)

    p_e, _, loss_e = eager_step(params, opt.init(params), x, y)
    p_j, _, loss_j = jit_step(params, opt.init(params), x, y)
    np.testing.assert_allclose(float(loss_e.item()), float(loss_j.item()), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(p_e[0]["w"]), np.asarray(p_j[0]["w"]), rtol=1e-10
    )


def test_mlp_trains_on_numpy_backend():
    md.set_backend("numpy")
    try:
        model = MLP(32, (16,), 4)
        xs, ys = synthetic_classification(256, 32, 4)
        batches = [
            (md.Tensor(xs[i : i + 64]), md.Tensor(ys[i : i + 64]))
            for i in range(0, 256, 64)
        ]
        params, losses = train(model, batches * 3, SGD(0.2), jit=False)
        assert losses[-1] < losses[0]
    finally:
        md.set_backend("xla")
