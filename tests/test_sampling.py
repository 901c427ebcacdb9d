"""Sampling truncation (functional.truncate_logits): top-k / nucleus top-p /
min-p masks, shared by the eager sampler, the compiled decode scan, and the
continuous-batching server.

The reference has no sampling layer at all (its op surface is NumPy-level,
SURVEY.md §2.2); this is serving-stack surface.  The numpy oracle here is an
independent reimplementation of the HuggingFace processor semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models import (
    DecodeServer,
    TransformerLM,
    generate,
    generate_compiled,
)


def _np_softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _np_keep_mask(logits, top_k=None, top_p=None, min_p=None):
    """Independent numpy oracle: boolean keep-mask per row, HF semantics
    applied in processor order (top_k, then top_p, then min_p)."""
    keep = np.ones(logits.shape, bool)
    x = logits.astype(np.float64).copy()
    if top_k is not None and top_k < x.shape[-1]:
        kth = np.sort(x, axis=-1)[..., -top_k][..., None]
        keep &= x >= kth
        x = np.where(keep, x, -1e30)
    if top_p is not None and top_p < 1.0:
        p = _np_softmax(x)
        order = np.argsort(-p, axis=-1, kind="stable")
        keep_p = np.zeros(x.shape, bool)
        for idx in np.ndindex(*x.shape[:-1]):
            cum = 0.0
            for j in order[idx]:
                if cum < top_p:  # mass strictly before this token
                    keep_p[idx + (j,)] = True
                cum += p[idx + (j,)]
        # value ties at the threshold: the framework keeps by probability
        # >= smallest kept prob, so extend keep_p to equal-prob entries
        for idx in np.ndindex(*x.shape[:-1]):
            thr = p[idx][keep_p[idx]].min()
            keep_p[idx] |= p[idx] >= thr - 1e-12
        keep &= keep_p
        x = np.where(keep, x, -1e30)
    if min_p is not None and min_p > 0.0:
        p = _np_softmax(x)
        keep &= p >= min_p * p.max(axis=-1, keepdims=True)
    return keep


def _framework_keep_mask(logits_np, **kw):
    out = F.truncate_logits(md.Tensor(logits_np), **kw)
    return np.asarray(out.detach()) > -1e29


@pytest.mark.parametrize("kw", [
    dict(top_k=3),
    dict(top_p=0.5),
    dict(top_p=0.9),
    dict(min_p=0.1),
    dict(top_k=5, top_p=0.7),
    dict(top_k=4, top_p=0.8, min_p=0.05),
])
def test_truncation_matches_numpy_oracle(backend, kw):
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 11) * 2.0
    got = _framework_keep_mask(logits, **kw)
    want = _np_keep_mask(logits, **kw)
    np.testing.assert_array_equal(got, want)


def test_truncation_noop_cases(backend):
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 7)
    for kw in (dict(), dict(top_k=7), dict(top_k=100), dict(top_p=1.0),
               dict(min_p=0.0)):
        out = F.truncate_logits(md.Tensor(logits), **kw)
        np.testing.assert_allclose(np.asarray(out.detach()), logits,
                                   rtol=1e-6)


def test_truncation_always_keeps_argmax(backend):
    """Even absurdly tight settings must keep the top token."""
    rng = np.random.RandomState(2)
    logits = rng.randn(5, 13)
    out = _framework_keep_mask(logits, top_k=1, top_p=1e-9, min_p=0.999)
    assert (out.sum(axis=-1) == 1).all()
    np.testing.assert_array_equal(out.argmax(axis=-1),
                                  logits.argmax(axis=-1))


def test_top_p_tiny_equals_greedy_compiled():
    md.set_backend("xla")
    np.random.seed(3)
    m = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=24)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 4)))
    nuc = generate_compiled(m, p, prompt, 8, greedy=False, top_p=1e-9,
                            seed=5)
    ref = generate_compiled(m, p, prompt, 8, greedy=True)
    np.testing.assert_array_equal(np.asarray(nuc.detach()),
                                  np.asarray(ref.detach()))


def test_top_p_compiled_deterministic_per_seed():
    md.set_backend("xla")
    np.random.seed(4)
    m = TransformerLM(vocab_size=31, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=24)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 31, size=(2, 4)))
    a = generate_compiled(m, p, prompt, 8, greedy=False, top_p=0.8, seed=7)
    b = generate_compiled(m, p, prompt, 8, greedy=False, top_p=0.8, seed=7)
    np.testing.assert_array_equal(np.asarray(a.detach()),
                                  np.asarray(b.detach()))
    arr = np.asarray(a.detach())
    assert ((arr >= 0) & (arr < 31)).all()


def test_min_p_eager_generate_runs():
    md.set_backend("xla")
    np.random.seed(5)
    m = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=24)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 19, size=(2, 3)))
    out = generate(m, p, prompt, 5, greedy=False, temperature=0.8,
                   top_p=0.9, min_p=0.02)
    arr = np.asarray(out.detach())
    assert arr.shape == (2, 8)
    assert ((arr >= 0) & (arr < 19)).all()


def test_server_top_p_tiny_matches_greedy_solo():
    md.set_backend("xla")
    np.random.seed(6)
    m = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=128)
    p = m.init()
    srv = DecodeServer(m, p, max_batch=2, greedy=False, temperature=1.0,
                       top_p=1e-9, window=128)
    prompt = [3, 5, 7, 2]
    slot = srv.submit(prompt, 6, seed=1)
    while not srv.done(slot):
        srv.step()
    got = srv.collect(slot)  # generated tokens only (prompt excluded)
    ref = generate_compiled(m, p, md.Tensor(np.asarray([prompt])), 6,
                            greedy=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(ref.detach())[0, len(prompt):])
