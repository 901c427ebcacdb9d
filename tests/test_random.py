"""Functional RNG: explicit keys that stay random per step under md.jit.

The reference's randomness is stateful (minidiff/backend/__init__.py random
fns) — correct eagerly but frozen into constants by tracing.  These tests pin
the TPU-native answer: keys are data, so a compiled program taking the key as
an input produces fresh randomness per call from ONE executable (the
round-1 dropout footgun, VERDICT item 2).
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import functional as F


def _np(t):
    return np.asarray(t.detach())


# ---------------------------------------------------------------------------
# key algebra + draw determinism (both backends)
# ---------------------------------------------------------------------------


def test_key_determinism_and_independence(backend):
    key = md.random_key(7)
    assert tuple(key.shape) == (2,)
    # same key -> identical draws; distinct folds -> distinct draws
    u1 = _np(md.random_uniform(key, (16,)))
    u2 = _np(md.random_uniform(key, (16,)))
    np.testing.assert_array_equal(u1, u2)
    a = _np(md.random_uniform(md.fold_in(key, 0), (16,)))
    b = _np(md.random_uniform(md.fold_in(key, 1), (16,)))
    assert not np.array_equal(a, b)
    # fold_in is a pure function of (key, data)
    np.testing.assert_array_equal(
        _np(md.fold_in(key, 3)), _np(md.fold_in(md.random_key(7), 3))
    )
    # seeds differ -> keys differ
    assert not np.array_equal(_np(md.random_key(1)), _np(md.random_key(2)))


def test_split_key_yields_independent_streams(backend):
    keys = md.split_key(md.random_key(0), 4)
    assert tuple(keys.shape) == (4, 2)
    draws = [_np(md.random_normal(keys[i], (8,))) for i in range(4)]
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.array_equal(draws[i], draws[j])


def test_draw_ranges_and_moments(backend):
    key = md.random_key(42)
    u = _np(md.random_uniform(key, (4096,), minval=-2.0, maxval=3.0))
    assert u.min() >= -2.0 and u.max() < 3.0
    assert abs(u.mean() - 0.5) < 0.2
    n = _np(md.random_normal(md.fold_in(key, 1), (4096,)))
    assert abs(n.mean()) < 0.1 and abs(n.std() - 1.0) < 0.1
    b = _np(md.random_bernoulli(md.fold_in(key, 2), 0.25, (4096,)))
    assert b.dtype == np.bool_ or str(b.dtype) == "bool"
    assert abs(b.mean() - 0.25) < 0.05


def test_fold_in_accepts_tensor_step(backend):
    key = md.random_key(5)
    a = _np(md.fold_in(key, 9))
    b = _np(md.fold_in(key, md.Tensor(np.asarray(9))))
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# dropout through a key (both backends, eager)
# ---------------------------------------------------------------------------


def test_dropout_with_key_tensor(backend):
    x = md.Tensor(np.ones((64, 64)), allow_grad=True)
    key = md.random_key(3)
    y = F.dropout(x, 0.5, key=key)
    vals = _np(y)
    kept = vals != 0.0
    # inverted dropout: survivors scaled by 1/(1-rate)
    np.testing.assert_allclose(vals[kept], 2.0)
    assert 0.3 < kept.mean() < 0.7
    # pure function of the key
    np.testing.assert_array_equal(vals, _np(F.dropout(x, 0.5, key=key)))
    assert not np.array_equal(
        vals, _np(F.dropout(x, 0.5, key=md.fold_in(key, 1)))
    )
    # gradients flow through the mask
    out = md.sum(F.dropout(x, 0.5, key=key))
    out.backward()
    np.testing.assert_array_equal(_np(x.grad) != 0.0, kept)


# ---------------------------------------------------------------------------
# the round-1 falsifier: fresh masks per step under ONE compiled program
# ---------------------------------------------------------------------------


def test_dropout_random_per_step_under_jit():
    md.set_backend("xla")
    key = md.random_key(0)

    jf = md.jit(lambda x, k: F.dropout(x, 0.5, key=k))
    x = md.Tensor(np.ones((32, 32)))
    m1 = _np(jf(x, md.fold_in(key, 0)))
    m2 = _np(jf(x, md.fold_in(key, 1)))
    m1r = _np(jf(x, md.fold_in(key, 0)))
    assert len(jf._cache) == 1  # one executable...
    assert not np.array_equal(m1, m2)  # ...two different masks
    np.testing.assert_array_equal(m1, m1r)  # deterministic per key


def test_transformer_dropout_trains_under_one_jit_program():
    """VERDICT #2 'done' bar: two steps under one compiled program must use
    different dropout masks (same params+batch, different keys -> different
    losses; same key -> identical loss)."""
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, make_train_step

    md.set_backend("xla")
    model = TransformerLM(vocab_size=31, dim=32, num_heads=2, num_layers=2,
                          max_seq_len=16, dropout=0.3)
    np.random.seed(0)
    params = model.init()
    toks = md.Tensor(np.random.RandomState(1).randint(1, 31, size=(4, 16)))
    step = make_train_step(model, SGD(0.0), loss_fn=lm_loss)  # lr 0: params fixed
    key = md.random_key(0)

    _, _, l0 = step(params, None, toks, toks, rng=md.fold_in(key, 0))
    _, _, l1 = step(params, None, toks, toks, rng=md.fold_in(key, 1))
    _, _, l0r = step(params, None, toks, toks, rng=md.fold_in(key, 0))
    assert len(step._cache) == 1, "steps must share ONE compiled program"
    assert float(l0.item()) != float(l1.item()), "masks did not differ"
    assert float(l0.item()) == float(l0r.item()), "per-key determinism broken"
    # eval mode (no rng) is deterministic and differs from train mode
    _, _, le = step(params, None, toks, toks)
    _, _, le2 = step(params, None, toks, toks)
    assert float(le.item()) == float(le2.item())
    assert float(le.item()) != float(l0.item())


def test_transformer_dropout_with_remat_blocks():
    """remat recompute must redraw the SAME mask (key is a segment input)."""
    from minidiff_tpu.models import SGD, TransformerLM, lm_loss, make_train_step

    md.set_backend("xla")
    np.random.seed(0)
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=8, dropout=0.25, remat_blocks=True)
    params = model.init()
    model_plain = TransformerLM(vocab_size=17, dim=16, num_heads=2,
                                num_layers=1, max_seq_len=8, dropout=0.25)
    toks = md.Tensor(np.random.RandomState(2).randint(1, 17, size=(2, 8)))
    key = md.random_key(9)

    step_r = make_train_step(model, SGD(0.1), loss_fn=lm_loss, jit=False)
    step_p = make_train_step(model_plain, SGD(0.1), loss_fn=lm_loss, jit=False)
    pr, _, lr = step_r(params, None, toks, toks, rng=key)
    pp, _, lp = step_p(params, None, toks, toks, rng=key)
    # same key -> same masks -> identical loss AND identical updated params
    assert float(lr.item()) == pytest.approx(float(lp.item()), rel=1e-12)
    np.testing.assert_allclose(
        _np(pr["tok_emb"]), _np(pp["tok_emb"]), rtol=1e-10
    )


def test_grad_accum_folds_distinct_microbatch_keys():
    from minidiff_tpu.models import MLP, SGD, make_train_step

    md.set_backend("xla")

    # a model whose apply uses dropout via rng
    class DropMLP(MLP):
        def apply(self, params, x, rng=None):
            h = super().apply(params, x)
            if rng is not None:
                h = F.dropout(h, 0.5, key=rng)
            return h

    np.random.seed(0)
    model = DropMLP(8, (16,), 4)
    params = model.init()
    x = md.Tensor(np.random.randn(8, 8))
    y = md.Tensor(np.random.randint(0, 4, 8))
    step = make_train_step(model, SGD(0.1), grad_accum=2, jit=False)
    key = md.random_key(0)
    # microbatch keys are folded, so the two microbatches see different masks;
    # determinism: same call twice gives the same loss
    _, _, a = step(params, None, x, y, rng=key)
    _, _, b = step(params, None, x, y, rng=key)
    assert float(a.item()) == pytest.approx(float(b.item()), rel=1e-12)
