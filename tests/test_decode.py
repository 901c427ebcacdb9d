"""Compiled decoding (models/decode.py): one lax.scan program == the eager
decode paths, token for token."""

from __future__ import annotations

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import (
    TransformerLM,
    generate,
    generate_cached,
    generate_compiled,
)


def setup_function(_):
    md.set_backend("xla")


def test_compiled_matches_eager_paths():
    np.random.seed(0)
    m = TransformerLM(vocab_size=29, dim=16, num_heads=2, num_layers=2,
                      max_seq_len=32)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 29, size=(3, 5)))

    t_full = generate(m, p, prompt, 10, greedy=True)
    t_cached = generate_cached(m, p, prompt, 10)
    t_comp = generate_compiled(m, p, prompt, 10)

    np.testing.assert_array_equal(np.asarray(t_comp.detach()),
                                  np.asarray(t_full.detach()))
    np.testing.assert_array_equal(np.asarray(t_comp.detach()),
                                  np.asarray(t_cached.detach()))
    assert t_comp.shape == (3, 15)


def test_compiled_single_token_prompt():
    np.random.seed(1)
    m = TransformerLM(vocab_size=11, dim=8, num_heads=2, num_layers=1,
                      max_seq_len=16)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 11, size=(2, 1)))
    t_comp = generate_compiled(m, p, prompt, 6)
    t_full = generate(m, p, prompt, 6, greedy=True)
    np.testing.assert_array_equal(np.asarray(t_comp.detach()),
                                  np.asarray(t_full.detach()))


def test_compiled_fills_cache_to_limit():
    """Decode right up to max_seq_len."""
    np.random.seed(2)
    m = TransformerLM(vocab_size=13, dim=8, num_heads=2, num_layers=1,
                      max_seq_len=8)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 13, size=(1, 3)))
    out = generate_compiled(m, p, prompt, 5)  # 3 + 5 - 1 = 7 < 8 positions
    ref = generate(m, p, prompt, 5, greedy=True)
    np.testing.assert_array_equal(np.asarray(out.detach()),
                                  np.asarray(ref.detach()))


def test_compiled_bf16_runs():
    np.random.seed(3)
    m = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=16, dtype=md.bfloat16)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 17, size=(2, 4)))
    out = generate_compiled(m, p, prompt, 8)
    arr = np.asarray(out.detach())
    assert arr.shape == (2, 12)
    assert ((arr >= 0) & (arr < 17)).all()


def test_compiled_sampling_deterministic_per_seed():
    np.random.seed(4)
    m = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=24)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 4)))
    a = generate_compiled(m, p, prompt, 8, greedy=False, temperature=1.0,
                          seed=7)
    b = generate_compiled(m, p, prompt, 8, greedy=False, temperature=1.0,
                          seed=7)
    c = generate_compiled(m, p, prompt, 8, greedy=False, temperature=1.0,
                          seed=8)
    np.testing.assert_array_equal(np.asarray(a.detach()), np.asarray(b.detach()))
    assert not np.array_equal(np.asarray(a.detach()), np.asarray(c.detach()))
    arr = np.asarray(a.detach())
    assert ((arr >= 0) & (arr < 23)).all()


def test_compiled_sampling_zero_temperature_is_greedy():
    np.random.seed(5)
    m = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=24)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 19, size=(2, 4)))
    cold = generate_compiled(m, p, prompt, 8, greedy=False,
                             temperature=1e-6, seed=3)
    ref = generate_compiled(m, p, prompt, 8, greedy=True)
    np.testing.assert_array_equal(np.asarray(cold.detach()),
                                  np.asarray(ref.detach()))


def test_compiled_sampling_top_k_runs():
    np.random.seed(6)
    m = TransformerLM(vocab_size=29, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=24)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 29, size=(2, 4)))
    out = generate_compiled(m, p, prompt, 8, greedy=False, temperature=0.9,
                            top_k=4, seed=1)
    arr = np.asarray(out.detach())
    assert arr.shape == (2, 12)
    assert ((arr >= 0) & (arr < 29)).all()


def test_compiled_rejects_zero_new_tokens():
    m = TransformerLM(vocab_size=11, dim=8, num_heads=2, num_layers=1,
                      max_seq_len=8)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 11, size=(1, 3)))
    with np.testing.assert_raises(AssertionError):
        generate_compiled(m, p, prompt, 0)


def test_sampled_seed_reuses_compiled_program():
    """Different seeds must NOT recompile: seed is a runtime argument."""
    import minidiff_tpu.models.decode as dec

    np.random.seed(21)
    m = TransformerLM(vocab_size=13, dim=8, num_heads=2, num_layers=1,
                      max_seq_len=16)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 13, size=(2, 3)))
    before = len(dec._decode_cache)
    a = generate_compiled(m, p, prompt, 5, greedy=False, seed=1)
    after_first = len(dec._decode_cache)
    b = generate_compiled(m, p, prompt, 5, greedy=False, seed=2)
    c = generate_compiled(m, p, prompt, 5, greedy=False, seed=1)
    assert len(dec._decode_cache) == after_first == before + 1
    assert not np.array_equal(np.asarray(a.detach()), np.asarray(b.detach()))
    np.testing.assert_array_equal(np.asarray(a.detach()),
                                  np.asarray(c.detach()))


def test_seed_accepts_negative_and_64bit():
    np.random.seed(23)
    m = TransformerLM(vocab_size=11, dim=8, num_heads=2, num_layers=1,
                      max_seq_len=12)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 11, size=(1, 3)))
    for seed in (-1, 2**63 + 17, 0):
        out = generate_compiled(m, p, prompt, 4, greedy=False, seed=seed)
        assert out.shape == (1, 7)
