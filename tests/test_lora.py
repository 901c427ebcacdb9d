"""LoRA parameter-efficient fine-tuning (models/lora.py).

No reference counterpart (/root/reference has no models/fine-tuning layer);
extends SURVEY §8's training-toolkit row.  Covers:
* fresh adapters are an exact no-op (zero-init lora_b)
* partition/combine round-trips and the lora_predicate split
* gradients flow to adapters and ONLY adapters under trainable=
* make_train_step(trainable=lora_predicate): loss falls, base params are
  bit-identical, opt state covers the adapter subtree only
* merge_lora: merged-weight model == adapter model, adapters stripped
* composition with int8 serving (adapters over a quantized base; merge
  rejects a quantized base loudly)
* targets= path filtering, works under md.jit on xla
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (
    MLP,
    TransformerLM,
    combine_params,
    lora_init,
    lora_predicate,
    make_train_step,
    merge_lora,
    partition_params,
    quantize_for_serving,
    trainable_params,
)
from minidiff_tpu.models.optim import Adam
from minidiff_tpu.models.functional import cross_entropy


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def _leaf_paths(tree, path=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, f"{path}/{k}" if path else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaf_paths(v, f"{path}/{i}")
    elif tree is not None:
        yield path, tree


def _tiny_lm(**kw):
    return TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=2,
                         max_seq_len=12, **kw)


# ---------------------------------------------------------------------------
# init semantics
# ---------------------------------------------------------------------------


def test_fresh_adapter_is_identity(backend):
    model = _tiny_lm()
    params = model.init()
    adapted = lora_init(params, rank=4, seed=1)
    x = md.Tensor(np.random.randint(0, 17, (2, 8)))
    base = _np(model.apply(params, x))
    with_lora = _np(model.apply(adapted, x))
    np.testing.assert_array_equal(base, with_lora)


def test_adapter_shapes_and_targets(backend):
    model = _tiny_lm()
    adapted = lora_init(model.init(), rank=4, targets=("qkv",))
    paths = dict(_leaf_paths(adapted))
    a_paths = [p for p in paths if p.endswith("lora_a")]
    assert a_paths and all("qkv" in p for p in a_paths)
    for p in a_paths:
        node = paths[p]
        assert node.shape == (16, 4)
        b = paths[p.replace("lora_a", "lora_b")]
        assert b.shape[0] == 4 and not _np(b).any()


def test_alpha_scales_output(backend):
    model = MLP(in_features=6, hidden=(8,), num_classes=3)
    params = model.init()
    # final layer only: an adapter before the ReLU would compound
    # nonlinearly and break the pure alpha scaling this test checks
    a1 = lora_init(params, rank=2, alpha=2.0, seed=3, targets=("2",))
    a2 = lora_init(params, rank=2, alpha=8.0, seed=3, targets=("2",))
    # push lora_b off zero identically in both trees so scale matters
    for tree in (a1, a2):
        for p, leaf in _leaf_paths(tree):
            if p.endswith("lora_b"):
                leaf._data = leaf._data * 0 + md.Tensor(
                    np.ones(leaf.shape) * 0.1)._data
    x = md.Tensor(np.random.randn(4, 6))
    base = _np(model.apply(params, x))
    d1 = _np(model.apply(a1, x)) - base
    d2 = _np(model.apply(a2, x)) - base
    np.testing.assert_allclose(d2, 4.0 * d1, rtol=1e-5)


def test_lora_preserves_model_dtype(backend):
    # review regression: an f32 lora_s would silently promote every
    # adapted projection of a bf16 model to f32
    model = _tiny_lm(dtype=md.bfloat16)
    base = model.init()
    params = lora_init(base, rank=4, seed=2)
    x = md.Tensor(np.random.randint(0, 17, (2, 6)))
    want = model.apply(base, x).dtype
    got = model.apply(params, x).dtype
    assert str(got) == str(want), (got, want)


def test_lora_init_zero_adapters_raises(backend):
    model = _tiny_lm()
    params = model.init()
    with pytest.raises(ValueError, match="zero adapters"):
        lora_init(params, rank=4, targets=("no-such-layer",))
    with pytest.raises(ValueError, match="zero adapters"):
        lora_init(params, rank=4096)  # rank > every min(K, N)


# ---------------------------------------------------------------------------
# partition / combine
# ---------------------------------------------------------------------------


def test_partition_roundtrip(backend):
    params = lora_init(_tiny_lm().init(), rank=2)
    train, frozen = partition_params(params, lora_predicate)
    train_paths = [p for p, _ in _leaf_paths(train)]
    assert train_paths
    assert all(p.rsplit("/", 1)[-1] in ("lora_a", "lora_b")
               for p in train_paths)
    frozen_paths = [p for p, _ in _leaf_paths(frozen)]
    assert not any(lora_predicate(p) for p in frozen_paths)
    assert any(p.endswith("lora_s") for p in frozen_paths)
    merged = combine_params(train, frozen)
    orig = dict(_leaf_paths(params))
    back = dict(_leaf_paths(merged))
    assert orig.keys() == back.keys()
    for k in orig:
        assert orig[k] is back[k]


def test_trainable_params_counts(backend):
    params = lora_init(_tiny_lm().init(), rank=2)
    train = trainable_params(params)
    n = sum(1 for _ in _leaf_paths(train))
    total = sum(1 for _ in _leaf_paths(params))
    assert 0 < n < total and n % 2 == 0


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def test_lora_train_step_freezes_base(backend):
    model = _tiny_lm()
    params = lora_init(model.init(), rank=4, seed=5)

    def loss_fn(logits, y):
        b, s, v = logits.shape
        return cross_entropy(logits.reshape((b * s, v)), y.reshape((b * s,)))

    opt = Adam(1e-2)
    opt_state = opt.init(trainable_params(params))
    step = make_train_step(model, opt, loss_fn=loss_fn,
                           trainable=lora_predicate)
    x = md.Tensor(np.random.randint(0, 17, (4, 8)))
    y = md.Tensor(np.random.randint(0, 17, (4, 8)))

    before = {p: _np(t).copy() for p, t in _leaf_paths(params)}
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(_np(loss)))
    assert losses[-1] < losses[0], losses

    after = dict(_leaf_paths(params))
    moved = neither = 0
    for p, t in after.items():
        name = p.rsplit("/", 1)[-1]
        if name in ("lora_a", "lora_b"):
            moved += int(not np.array_equal(before[p], _np(t)))
        else:
            np.testing.assert_array_equal(before[p], _np(t), err_msg=p)
            neither += 1
    assert moved > 0 and neither > 0


def test_lora_train_matches_manual_partition(backend):
    # trainable= must equal hand-splitting: grads over adapters only
    model = MLP(in_features=5, hidden=(7,), num_classes=3)
    params = lora_init(model.init(), rank=2, seed=7)
    x = md.Tensor(np.random.randn(6, 5))
    y = md.Tensor(np.random.randint(0, 3, (6,)))

    train, frozen = partition_params(params, lora_predicate)

    def objective(t):
        return cross_entropy(model.apply(combine_params(t, frozen), x), y)

    loss, grads = md.value_and_grad(objective)(train)
    g = dict(_leaf_paths(grads))
    assert g and all(lora_predicate(p) for p in g)
    # finite-difference spot check on one adapter leaf
    p0, g0 = next(iter(g.items()))
    leaf = dict(_leaf_paths(train))[p0]
    eps = 1e-5
    base = _np(leaf).copy()
    idx = (0,) * base.ndim
    bumped = base.copy()
    bumped[idx] += eps
    leaf._data = md.Tensor(bumped, dtype=leaf.dtype)._data
    lp = float(_np(objective(train)))
    bumped[idx] -= 2 * eps
    leaf._data = md.Tensor(bumped, dtype=leaf.dtype)._data
    lm = float(_np(objective(train)))
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(_np(g0)[idx], fd, rtol=1e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# merge
# ---------------------------------------------------------------------------


def test_merge_lora_matches_adapter_model(backend):
    model = _tiny_lm()
    params = lora_init(model.init(), rank=4, seed=9)
    # train a few steps so adapters are non-trivial
    def loss_fn(logits, y):
        b, s, v = logits.shape
        return cross_entropy(logits.reshape((b * s, v)), y.reshape((b * s,)))

    opt = Adam(5e-2)
    opt_state = opt.init(trainable_params(params))
    step = make_train_step(model, opt, loss_fn=loss_fn,
                           trainable=lora_predicate)
    x = md.Tensor(np.random.randint(0, 17, (2, 8)))
    y = md.Tensor(np.random.randint(0, 17, (2, 8)))
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, x, y)

    merged = merge_lora(params)
    for p, _ in _leaf_paths(merged):
        assert "lora" not in p, p
    out_adapter = _np(model.apply(params, x))
    out_merged = _np(model.apply(merged, x))
    np.testing.assert_allclose(out_merged, out_adapter, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# int8 composition
# ---------------------------------------------------------------------------


def test_lora_over_quantized_base(backend):
    model = _tiny_lm()
    qparams = quantize_for_serving(model.init(), min_elements=16)
    assert any(p.endswith("w_q") for p, _ in _leaf_paths(qparams))
    adapted = lora_init(qparams, rank=4, seed=11)
    a_paths = [p for p, _ in _leaf_paths(adapted) if p.endswith("lora_a")]
    assert a_paths  # adapters attach to quantized weights too
    x = md.Tensor(np.random.randint(0, 17, (2, 6)))
    base = _np(model.apply(qparams, x))
    fresh = _np(model.apply(adapted, x))
    np.testing.assert_array_equal(base, fresh)  # zero-init no-op holds
    with pytest.raises(ValueError, match="quantized"):
        merge_lora(adapted)


def test_merge_then_quantize(backend):
    model = _tiny_lm()
    params = lora_init(model.init(), rank=4, seed=13)
    merged = merge_lora(params)
    q = quantize_for_serving(merged, min_elements=16)
    x = md.Tensor(np.random.randint(0, 17, (2, 6)))
    full = _np(model.apply(merged, x))
    quant = _np(model.apply(q, x))
    np.testing.assert_allclose(full, quant, rtol=0.2, atol=0.2)


# ---------------------------------------------------------------------------
# jit
# ---------------------------------------------------------------------------


def test_lora_step_under_jit_xla():
    md.set_backend("xla")
    model = MLP(in_features=6, hidden=(8,), num_classes=3)
    params = lora_init(model.init(), rank=2, seed=15)
    opt = Adam(1e-2)
    opt_state = opt.init(trainable_params(params))
    step = make_train_step(model, opt, trainable=lora_predicate, jit=True)
    x = md.Tensor(np.random.randn(8, 6))
    y = md.Tensor(np.random.randint(0, 3, (8,)))
    before = {p: _np(t).copy() for p, t in _leaf_paths(params)
              if not lora_predicate(p)}
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(_np(loss)))
    assert losses[-1] < losses[0], losses
    for p, t in _leaf_paths(params):
        if p in before:
            np.testing.assert_array_equal(before[p], _np(t), err_msg=p)
