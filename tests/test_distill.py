"""Knowledge distillation (models/distill.py).

No reference counterpart; extends SURVEY §8's training-toolkit row.
Covers: log_softmax/kd_loss semantics and gradcheck, pure-soft vs blended
limits, the one-program distill step (MLP and sequence-shaped logits),
teacher frozen, LoRA-distillation composition.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import MLP, TransformerLM, lora_init, lora_predicate, trainable_params
from minidiff_tpu.models.distill import kd_loss, log_softmax, make_distill_step
from minidiff_tpu.models.optim import Adam
from minidiff_tpu.utils import compute_grads


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def test_log_softmax_matches_numpy(backend):
    x = np.random.default_rng(0).standard_normal((5, 7)) * 10
    got = _np(log_softmax(md.Tensor(x)))
    ref = x - x.max(-1, keepdims=True)
    ref = ref - np.log(np.exp(ref).sum(-1, keepdims=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def test_kd_loss_limits(backend):
    rng = np.random.default_rng(1)
    s = md.Tensor(rng.standard_normal((6, 5)))
    t = md.Tensor(rng.standard_normal((6, 5)))
    y = md.Tensor(rng.integers(0, 5, (6,)))
    # identical logits -> zero soft loss at any temperature
    for temp in (1.0, 3.0):
        z = float(_np(kd_loss(s, s, temperature=temp, alpha=0.0)))
        assert abs(z) < 1e-8, z
    # alpha=1 reduces to plain cross-entropy
    from minidiff_tpu.models.functional import cross_entropy

    full = float(_np(kd_loss(s, t, labels=y, alpha=1.0)))
    ce = float(_np(cross_entropy(s, y)))
    np.testing.assert_allclose(full, ce, rtol=1e-6)
    # soft KL is nonnegative
    assert float(_np(kd_loss(s, t, alpha=0.0))) > 0


def test_kd_loss_gradcheck(backend):
    rng = np.random.default_rng(2)
    s = md.Tensor(rng.standard_normal((4, 5)), allow_grad=True)
    t = md.Tensor(rng.standard_normal((4, 5)))
    y = md.Tensor(rng.integers(0, 5, (4,)))

    def f(ss):
        return kd_loss(ss, t, labels=y, temperature=2.0, alpha=0.3)

    manual, auto = compute_grads(s, func=f)
    np.testing.assert_allclose(_np(auto[0]), _np(manual[0]), rtol=1e-3,
                               atol=1e-7)


def test_distill_step_trains_and_freezes_teacher(backend):
    rng = np.random.default_rng(3)
    teacher = MLP(in_features=6, hidden=(32,), num_classes=4)
    tp = teacher.init()
    student = MLP(in_features=6, hidden=(8,), num_classes=4)
    sp = student.init()
    x = md.Tensor(rng.standard_normal((16, 6)))
    y = md.Tensor(rng.integers(0, 4, (16,)))
    opt = Adam(5e-3)
    state = opt.init(sp)
    step = make_distill_step(student, teacher, tp, opt, temperature=2.0,
                             alpha=0.5)
    t_before = {k: _np(v).copy() for k, v in tp.items()} if isinstance(tp, dict) else None
    tp_flat_before = [(_np(l).copy()) for l in
                      [tp[i][k] for i in range(len(tp)) for k in tp[i]]] \
        if isinstance(tp, list) else None
    losses = []
    for _ in range(15):
        sp, state, loss = step(sp, state, x, y)
        losses.append(float(_np(loss)))
    assert losses[-1] < losses[0] - 0.05, losses
    # teacher untouched
    if tp_flat_before is not None:
        after = [_np(tp[i][k]) for i in range(len(tp)) for k in tp[i]]
        for b, a in zip(tp_flat_before, after):
            np.testing.assert_array_equal(b, a)


def test_distill_sequence_model_and_lora(backend):
    rng = np.random.default_rng(4)
    teacher = TransformerLM(vocab_size=13, dim=24, num_heads=2, num_layers=2,
                            max_seq_len=12)
    tp = teacher.init()
    student = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                            max_seq_len=12)
    sp = lora_init(student.init(), rank=4)
    x = md.Tensor(rng.integers(0, 13, (4, 8)))
    y = md.Tensor(rng.integers(0, 13, (4, 8)))
    opt = Adam(1e-2)
    state = opt.init(trainable_params(sp))
    step = make_distill_step(student, teacher, tp, opt, alpha=0.25,
                             trainable=lora_predicate)
    losses = []
    for _ in range(10):
        sp, state, loss = step(sp, state, x, y)
        losses.append(float(_np(loss)))
    assert losses[-1] < losses[0] - 0.02, losses
