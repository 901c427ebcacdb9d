"""Models layer: MLP end-to-end training driven by the engine (BASELINE cfg 2)."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as backend_mod
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


def test_adamw_decay_and_clipping():
    from minidiff_tpu.models import AdamW, clip_by_global_norm

    md.set_backend("xla")
    params = {"w": md.Tensor(np.ones((4, 4)) * 10.0, allow_grad=True)}
    grads = {"w": md.Tensor(np.zeros((4, 4)))}
    opt = AdamW(lr=0.1, weight_decay=0.5)
    state = opt.init(params)
    new_params, _ = opt.update(params, grads, state)
    # zero grads: only the decoupled decay moves the weights
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(new_params["w"]._data)),
        10.0 * (1 - 0.1 * 0.5),
        rtol=1e-6,
    )

    big = {"a": md.Tensor(np.full((3,), 4.0)), "b": md.Tensor(np.full((4,), 3.0))}
    clipped = clip_by_global_norm(big, 1.0)
    total = sum(
        float(md.sum(g * g).item()) for g in (clipped["a"], clipped["b"])
    )
    np.testing.assert_allclose(np.sqrt(total), 1.0, rtol=1e-5)
    small = clip_by_global_norm({"a": md.Tensor(np.full((2,), 0.01))}, 1.0)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(small["a"]._data)), 0.01, rtol=1e-5
    )


def test_lr_schedules():
    from minidiff_tpu.models import cosine_schedule, warmup_linear_schedule

    cos = cosine_schedule(1.0, total_steps=100, warmup_steps=10, final_lr=0.1)
    assert cos(0) == pytest.approx(0.1, abs=1e-6)  # warmup ramp start
    assert cos(9) == pytest.approx(1.0, abs=1e-6)  # warmup ramp end
    assert cos(100) == pytest.approx(0.1, abs=1e-6)  # floor
    assert cos(55) == pytest.approx((1.0 + 0.1) / 2, rel=0.1)  # midpoint
    lin = warmup_linear_schedule(2.0, total_steps=20, warmup_steps=0)
    assert lin(0) == pytest.approx(2.0)
    assert lin(20) == pytest.approx(0.0)


def test_adamw_trains_mlp():
    from minidiff_tpu.models import MLP, AdamW, make_train_step
    from minidiff_tpu.models.data import synthetic_classification

    md.set_backend("xla")
    np.random.seed(0)
    model = MLP(16, (16,), 4)
    params = model.init()
    opt = AdamW(1e-2, weight_decay=0.01)
    state = opt.init(params)
    step = make_train_step(model, opt)
    xs, ys = synthetic_classification(32, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)
    losses = []
    for _ in range(10):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses


def test_gru_classifier_trains():
    from minidiff_tpu.models import (
        Adam,
        GRUClassifier,
        GRUCell,
        make_train_step,
        synthetic_sequence_classification,
    )

    md.set_backend("xla")
    np.random.seed(0)
    model = GRUClassifier(8, 16, 4)
    params = model.init()
    x, y = synthetic_sequence_classification(32, 6, 8, 4)
    logits = model.apply(params, x)
    assert logits.shape == (32, 4)
    opt = Adam(1e-2)
    state = opt.init(params)
    step = make_train_step(model, opt)
    losses = []
    for _ in range(15):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.6, losses

    # gradients flow through every gate parameter
    _, grads = md.value_and_grad(
        lambda p: F.cross_entropy(model.apply(p, x), y)
    )(params)
    for name in ("wxz", "whz", "wxr", "whr", "wxh", "whh", "bz", "br", "bh"):
        g = grads["cell"][name]
        assert g is not None
        assert float(md.sum(g * g).item()) > 0, name


def test_gru_gradcheck_small(backend):
    from minidiff_tpu.models import GRUCell
    from minidiff_tpu.utils import compute_grads

    np.random.seed(0)
    cell = GRUCell(3, 4)
    params = cell.init()

    x = md.randn(2, 3, 3)
    manual, auto = compute_grads(
        x, func=lambda t: md.sum(cell.apply(params, t) ** 2)
    )
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(manual[0]._data)),
        np.asarray(backend_mod.as_numpy(auto[0]._data)),
        rtol=1e-3, atol=1e-4,
    )


def test_sigmoid_stable_at_extremes(backend):
    x = md.Tensor(np.array([-100.0, 0.0, 100.0]), allow_grad=True)
    y = F.sigmoid(x)
    vals = np.asarray(backend_mod.as_numpy(y._data))
    np.testing.assert_allclose(vals, [0.0, 0.5, 1.0], atol=1e-6)
    md.sum(y).backward()
    g = np.asarray(backend_mod.as_numpy(x.grad._data))
    assert np.all(np.isfinite(g)), g  # no 0 * inf NaNs in the VJP
    np.testing.assert_allclose(g[1], 0.25, rtol=1e-6)


def test_cross_entropy_3d_logits(backend):
    logits = md.randn(2, 3, 5)
    labels = md.Tensor(np.random.randint(0, 5, (2, 3)))
    loss = F.cross_entropy(logits, labels)
    # reference: flatten manually
    flat = F.cross_entropy(
        logits.reshape((6, 5)), labels.reshape((6,))
    )
    np.testing.assert_allclose(
        float(loss.item()), float(flat.item()), rtol=1e-6)


def test_dropout_rate_edge_cases(backend):
    from minidiff_tpu.models.functional import dropout

    x = md.Tensor(np.ones((4, 4)))
    out = dropout(x, 1.0)
    np.testing.assert_allclose(np.asarray(backend_mod.as_numpy(out._data)), 0.0)
    # explicit mask input (the jit-correct form)
    mask = md.Tensor(np.array([[True, False], [True, True]]))
    x2 = md.Tensor(np.ones((2, 2)))
    out2 = dropout(x2, 0.5, mask=mask)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(out2._data)),
        [[2.0, 0.0], [2.0, 2.0]])


def test_matmul_nt_tn_reject_vectors(backend):
    a = md.randn(3, 4)
    v = md.randn(4)
    with pytest.raises(ValueError, match="ndim >= 2"):
        md.matmul_nt(a, v)
    with pytest.raises(ValueError, match="ndim >= 2"):
        md.matmul_tn(v, a)


def test_cnn_rejects_unpoolable_image_size():
    from minidiff_tpu.models import CNN

    with pytest.raises(ValueError, match="divisible"):
        CNN(channels=(16, 32, 64), image_size=28)  # 7x7 can't pool again
    with pytest.raises(ValueError, match="divisible"):
        CNN(channels=(8,), image_size=27)


def test_batches_include_trailing_partial():
    md.set_backend("xla")
    batches = list(mnist_like_batches(batch_size=128, epochs=1, n=100))
    assert len(batches) == 1 and batches[0][0].shape[0] == 100
    batches = list(mnist_like_batches(batch_size=64, epochs=1, n=100))
    assert [b[0].shape[0] for b in batches] == [64, 36]


def test_gru_respects_configured_dtype():
    from minidiff_tpu.models import GRUCell

    md.set_backend("xla")
    cell = GRUCell(4, 8, dtype=md.float32)
    params = cell.init()
    x = md.Tensor(np.random.randn(2, 3, 4))  # float64 input under x64
    h = cell.apply(params, x)
    assert "32" in str(params["wxz"].dtype)


# ---------------------------------------------------------------------------
# Lion / Adafactor / weight tying / perplexity
# ---------------------------------------------------------------------------


def test_lion_trains():
    from minidiff_tpu.models import MLP, Lion, make_train_step
    from minidiff_tpu.models.data import synthetic_classification

    md.set_backend("xla")
    np.random.seed(10)
    model = MLP(16, (32,), 4)
    opt = Lion(3e-3, weight_decay=0.01)
    params = model.init()
    state = opt.init(params)
    step = make_train_step(model, opt)
    xs, ys = synthetic_classification(128, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)
    losses = []
    for _ in range(25):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_adafactor_trains_with_factored_memory():
    from minidiff_tpu.models import MLP, Adafactor, make_train_step
    from minidiff_tpu.models.data import synthetic_classification

    md.set_backend("xla")
    np.random.seed(11)
    model = MLP(32, (64,), 4)
    opt = Adafactor(5e-2)
    params = model.init()
    state = opt.init(params)
    # factored stats: a (32,64) weight stores (32,) + (64,) not (32,64)
    assert state[0]["w"]["r"].shape == (32,)
    assert state[0]["w"]["c"].shape == (64,)
    assert "v" in state[0]["b"]  # 1-D bias stays unfactored
    step = make_train_step(model, opt)
    xs, ys = synthetic_classification(128, 32, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)
    losses = []
    for _ in range(30):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_tied_embeddings_lm():
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, make_train_step
    from minidiff_tpu.models.transformer import synthetic_lm_batches

    md.set_backend("xla")
    np.random.seed(12)
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=8, tie_embeddings=True)
    params = model.init()
    assert "head" not in params  # no separate head weight
    x, y = next(synthetic_lm_batches(4, 8, 17, 1))
    logits = model.apply(params, x)
    assert logits.shape == (4, 8, 17)
    step = make_train_step(model, SGD(0.5), loss_fn=lm_loss)
    state, losses = None, []
    for _ in range(8):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses
    # decode paths work without a head param
    from minidiff_tpu.models import generate_compiled
    out = generate_compiled(model, params, x[:, :4], 3)
    assert out.shape == (4, 7)


def test_perplexity_decreases_with_training():
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, make_train_step, perplexity

    md.set_backend("xla")
    np.random.seed(13)
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=8)
    params = model.init()
    # a deterministic cyclic pattern: next token is perfectly predictable
    base = np.arange(8) % 5 + 1
    x = md.Tensor(np.stack([np.roll(base, r) for r in range(8)]))
    ppl0 = perplexity(model, params, x, batch_size=4)
    assert ppl0 > 1.0

    def next_token_loss(logits, t):
        return lm_loss(logits[:, :-1], t[:, 1:])

    step = make_train_step(model, SGD(0.5), loss_fn=next_token_loss)
    state = None
    for _ in range(25):
        params, state, _ = step(params, state, x, x)
    ppl1 = perplexity(model, params, x, batch_size=4)
    assert ppl1 < ppl0 * 0.5, (ppl0, ppl1)
