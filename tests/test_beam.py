"""Beam-search decoding (models/beam.py)."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import TransformerLM, beam_search, generate_cached


def setup_function(_):
    md.set_backend("xla")


def _model(vocab=23, layers=2, seed=0):
    np.random.seed(seed)
    m = TransformerLM(vocab_size=vocab, dim=16, num_heads=2,
                      num_layers=layers, max_seq_len=32)
    return m, m.init()


def test_beam_width_1_equals_greedy():
    m, p = _model()
    prompt = md.Tensor(np.random.randint(1, 23, size=(3, 5)))
    seqs, scores = beam_search(m, p, prompt, 8, beam_width=1)
    ref = generate_cached(m, p, prompt, 8)
    np.testing.assert_array_equal(np.asarray(seqs.detach()),
                                  np.asarray(ref.detach()))
    assert np.all(scores <= 0)  # sums of log-probs


def _seq_logprob(model, params, seq, s0):
    """Sum of next-token log-probs of seq[s0:] under the model."""
    with md.no_grad():
        logits = model.apply(params, md.Tensor(seq[None, :-1]))
    lp = np.asarray(logits.detach(), dtype=np.float64)
    m = lp.max(axis=-1, keepdims=True)
    z = lp - m
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    total = 0.0
    for t in range(s0 - 1, seq.shape[0] - 1):
        total += logp[0, t, seq[t + 1]]
    return total


def test_wider_beam_scores_at_least_greedy():
    m, p = _model(seed=1)
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 4)))
    s1, sc1 = beam_search(m, p, prompt, 6, beam_width=1)
    s4, sc4 = beam_search(m, p, prompt, 6, beam_width=4)
    assert np.all(sc4 >= sc1 - 1e-9), (sc1, sc4)
    # reported scores are the true model log-probs of the returned sequences
    for i in range(2):
        true = _seq_logprob(m, p, np.asarray(s4.detach())[i], 4)
        np.testing.assert_allclose(sc4[i], true, rtol=1e-5, atol=1e-6)


def test_eos_terminates_beams():
    m, p = _model(seed=2)
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 3)))
    eos = 7
    seqs, _ = beam_search(m, p, prompt, 12, beam_width=3, eos_id=eos)
    arr = np.asarray(seqs.detach())
    for row in arr:
        gen = row[3:]
        hits = np.where(gen == eos)[0]
        if hits.size:  # everything after the first EOS is EOS padding
            assert np.all(gen[hits[0]:] == eos)


def test_length_penalty_changes_selection_shape():
    m, p = _model(seed=3)
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 4)))
    s_a, sc_a = beam_search(m, p, prompt, 6, beam_width=4, length_penalty=0.0)
    s_b, sc_b = beam_search(m, p, prompt, 6, beam_width=4, length_penalty=1.0)
    # same search, different normalization: scores differ by the length factor
    np.testing.assert_allclose(sc_b * 6.0, sc_a, rtol=1e-9)


def test_length_penalty_uses_per_beam_lengths():
    """With EOS, finished beams keep their own length, so a positive
    penalty can prefer a shorter-but-denser hypothesis."""
    m, p = _model(seed=7)
    prompt = md.Tensor(np.random.randint(1, 23, size=(1, 3)))
    eos = 5
    _, sc0 = beam_search(m, p, prompt, 10, beam_width=4, eos_id=eos,
                         length_penalty=0.0)
    seqs1, sc1 = beam_search(m, p, prompt, 10, beam_width=4, eos_id=eos,
                             length_penalty=1.0)
    # normalized score of the winning beam is score / its OWN length: verify
    # by recomputing from the returned sequence
    arr = np.asarray(seqs1.detach())[0]
    gen = arr[3:]
    hits = np.where(gen == eos)[0]
    own_len = (hits[0] + 1) if hits.size else gen.shape[0]
    raw = _seq_logprob(m, p, arr[:3 + own_len], 3)
    np.testing.assert_allclose(sc1[0], raw / own_len, rtol=1e-5, atol=1e-6)
