"""Speculative decoding: exactness, acceptance accounting, model variants.

Greedy speculative decoding must emit EXACTLY the target model's own greedy
sequence — the draft can only change how fast tokens are accepted, never
which tokens.  No reference counterpart (/root/reference has no serving
layer); extends the SURVEY §8 serving row.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (TransformerLM, generate,
                                 generate_speculative,
                                 generate_speculative_compiled)


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def _models(dtype=None, rope=False, kv_heads=None):
    dtype = dtype or md.float64
    np.random.seed(0)
    target = TransformerLM(vocab_size=48, dim=64, num_heads=4, num_layers=2,
                           max_seq_len=64, dtype=dtype, rope=rope,
                           num_kv_heads=kv_heads)
    tp = target.init()
    np.random.seed(7)
    draft = TransformerLM(vocab_size=48, dim=32, num_heads=2, num_layers=1,
                          max_seq_len=64, dtype=dtype, rope=rope)
    dp = draft.init()
    return target, tp, draft, dp


def test_eager_speculative_equals_greedy(backend):
    target, tp, draft, dp = _models()
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 48, (2, 5)))
    want = _np(generate(target, tp, prompt, 9, greedy=True))
    got = _np(generate_speculative(target, tp, draft, dp, prompt, 9, k=3))
    assert (want == got).all()


def test_eager_speculative_full_budget_non_rope(backend):
    # regression: the k-token draft overhang used to run past max_seq_len
    # for non-RoPE models (pos_emb indexing error) on requests that plain
    # generate accepts; the draft must shrink near the budget and degrade
    # to plain greedy at the edge — output still exactly greedy
    target, tp, draft, dp = _models()
    prompt = md.Tensor(np.random.RandomState(3).randint(1, 48, (1, 5)))
    max_new = target.max_seq_len - 5  # fills the pos_emb table exactly
    want = _np(generate(target, tp, prompt, max_new, greedy=True))
    got = _np(generate_speculative(target, tp, draft, dp, prompt,
                                   max_new, k=3))
    assert (want == got).all()


def test_compiled_speculative_equals_greedy():
    md.set_backend("xla")
    target, tp, draft, dp = _models()
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 48, (3, 6)))
    want = _np(generate(target, tp, prompt, 10, greedy=True))
    got, rounds = generate_speculative_compiled(
        target, tp, draft, dp, prompt, 10, k=3)
    assert (_np(got) == want).all()
    r = _np(rounds)
    # each round emits between 1 and k+1 tokens
    assert (r >= -(-10 // 4)).all() and (r <= 10).all()


def test_self_draft_accepts_everything():
    # draft == target -> every proposal agrees -> ceil(max_new/(k+1)) rounds
    md.set_backend("xla")
    target, tp, _, _ = _models()
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 48, (3, 6)))
    want = _np(generate(target, tp, prompt, 10, greedy=True))
    got, rounds = generate_speculative_compiled(
        target, tp, target, tp, prompt, 10, k=3)
    assert (_np(got) == want).all()
    assert (_np(rounds) == -(-10 // 4)).all()


def test_compiled_speculative_rope_gqa():
    md.set_backend("xla")
    target, tp, draft, dp = _models(rope=True, kv_heads=2)
    prompt = md.Tensor(np.random.RandomState(2).randint(1, 48, (2, 4)))
    want = _np(generate(target, tp, prompt, 8, greedy=True))
    got, _ = generate_speculative_compiled(
        target, tp, draft, dp, prompt, 8, k=2)
    assert (_np(got) == want).all()


def test_compiled_speculative_quantized_target():
    md.set_backend("xla")
    from minidiff_tpu.models import quantize_for_serving

    np.random.seed(0)
    target = TransformerLM(vocab_size=48, dim=128, num_heads=4, num_layers=2,
                           max_seq_len=64, dtype=md.float32)
    tp = quantize_for_serving(target.init(), min_elements=128 * 128)
    np.random.seed(7)
    draft = TransformerLM(vocab_size=48, dim=32, num_heads=2, num_layers=1,
                          max_seq_len=64, dtype=md.float32)
    dp = draft.init()
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 48, (2, 5)))
    want = _np(generate(target, tp, prompt, 8, greedy=True))
    got, _ = generate_speculative_compiled(
        target, tp, draft, dp, prompt, 8, k=3)
    assert (_np(got) == want).all()


def test_compiled_speculative_edges():
    md.set_backend("xla")
    target, tp, draft, dp = _models()
    prompt = md.Tensor(np.random.RandomState(3).randint(1, 48, (2, 5)))
    # max_new == 1: the prefill token alone finishes the job
    want = _np(generate(target, tp, prompt, 1, greedy=True))
    got, rounds = generate_speculative_compiled(
        target, tp, draft, dp, prompt, 1, k=3)
    assert (_np(got) == want).all()
    assert (_np(rounds) == 0).all()
    # k == 1: smallest speculative step
    want = _np(generate(target, tp, prompt, 6, greedy=True))
    got, _ = generate_speculative_compiled(
        target, tp, draft, dp, prompt, 6, k=1)
    assert (_np(got) == want).all()


def test_compiled_program_cache_reused():
    md.set_backend("xla")
    from minidiff_tpu.models import speculative as S

    target, tp, draft, dp = _models()
    prompt = md.Tensor(np.random.RandomState(4).randint(1, 48, (2, 5)))
    S._spec_cache.clear()
    generate_speculative_compiled(target, tp, draft, dp, prompt, 6, k=2)
    assert len(S._spec_cache) == 1
    generate_speculative_compiled(target, tp, draft, dp, prompt, 6, k=2)
    assert len(S._spec_cache) == 1  # same key -> no new program
