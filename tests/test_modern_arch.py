"""RMSNorm + SwiGLU transformer variants through every serving path.

``TransformerLM(norm="rms", mlp="swiglu")`` is the LLaMA-family recipe;
these options must compose with everything the GELU/LayerNorm model
supports: training, KV-cached decode, compiled decode, speculative
decoding, TP sharding rules, and quantized serving.  No reference
counterpart (/root/reference has no models layer); extends SURVEY §8's
"modern LM features" row.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (SGD, TransformerLM, generate,
                                 generate_cached, lm_loss, make_train_step)
from minidiff_tpu.models.decode import generate_compiled


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def _model(dtype=None, **kw):
    np.random.seed(0)
    kw.setdefault("norm", "rms")
    kw.setdefault("mlp", "swiglu")
    m = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                      max_seq_len=16, dtype=dtype, **kw)
    return m, m.init()


def test_param_tree_shapes(backend):
    m, p = _model()
    blk = p["blocks"][0]
    assert set(blk["ln1"]) == {"g"}  # RMSNorm: no bias
    assert blk["fc1"]["w"].shape == (32, 2 * 4 * 32)  # gate+value fused
    assert blk["fc2"]["w"].shape == (4 * 32, 32)
    assert set(p["ln_f"]) == {"g"}


def test_swiglu_rms_trains(backend):
    m, p = _model()
    step = make_train_step(m, SGD(0.1), loss_fn=lm_loss)
    toks = md.Tensor(np.random.RandomState(0).randint(0, 32, (4, 16)))
    st = None
    losses = []
    for _ in range(8):
        p, st, loss = step(p, st, toks, toks)
        losses.append(float(_np(loss)))
    assert losses[-1] < losses[0]


def test_decode_paths_token_identical(backend):
    m, p = _model(dtype=md.float64)
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 32, (2, 4)))
    want = _np(generate(m, p, prompt, 8, greedy=True))
    got_cached = _np(generate_cached(m, p, prompt, 8))
    assert (want == got_cached).all()


def test_compiled_decode_token_identical():
    md.set_backend("xla")
    m, p = _model(dtype=md.float64)
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 32, (2, 4)))
    want = _np(generate(m, p, prompt, 8, greedy=True))
    got = _np(generate_compiled(m, p, prompt, 8))
    assert (want == got).all()


def test_compiled_decode_rope_gqa_variant():
    md.set_backend("xla")
    m, p = _model(dtype=md.float64, rope=True, num_kv_heads=1)
    prompt = md.Tensor(np.random.RandomState(2).randint(1, 32, (2, 5)))
    want = _np(generate(m, p, prompt, 6, greedy=True))
    got = _np(generate_compiled(m, p, prompt, 6))
    assert (want == got).all()


def test_speculative_swiglu_rms():
    md.set_backend("xla")
    target, tp = _model(dtype=md.float64)
    np.random.seed(7)
    draft = TransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=16, dtype=md.float64, norm="rms",
                          mlp="swiglu")
    dp = draft.init()
    from minidiff_tpu.models import generate_speculative_compiled

    prompt = md.Tensor(np.random.RandomState(3).randint(1, 32, (2, 4)))
    want = _np(generate(target, tp, prompt, 6, greedy=True))
    got, _rounds = generate_speculative_compiled(
        target, tp, draft, dp, prompt, 6, k=2)
    assert (_np(got) == want).all()


def test_sharding_rules_match_rms_tree():
    md.set_backend("xla")
    import jax

    from minidiff_tpu.parallel import transformer_sharding_rules

    m, p = _model()
    rules = transformer_sharding_rules(p)
    # tree structures must match leaf-for-leaf (RMSNorm has no "b")
    jax.tree.map(lambda a, b: None, p, rules,
                 is_leaf=lambda x: isinstance(x, md.Tensor))


def test_quantized_swiglu_serving():
    md.set_backend("xla")
    from minidiff_tpu.models.quant import quantize_for_serving

    m, p = _model(dtype=md.float32)
    prompt = md.Tensor(np.random.RandomState(4).randint(1, 32, (2, 4)))
    full = _np(generate(m, p, prompt, 4, greedy=True))
    qp = quantize_for_serving(p, min_elements=32 * 32)
    quant = _np(generate(m, qp, prompt, 4, greedy=True))
    assert full.shape == quant.shape  # tokens may differ near ties
    blk = qp["blocks"][0]
    assert "w_q" in blk["fc1"] and "w_q" in blk["fc2"]


def test_invalid_kinds_raise(backend):
    with pytest.raises(ValueError):
        TransformerLM(dim=16, num_heads=2, norm="bogus")
    with pytest.raises(ValueError):
        TransformerLM(dim=16, num_heads=2, mlp="bogus")
