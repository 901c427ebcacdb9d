"""Byte-level BPE tokenizer: native C++ core == Python fallback, bit for bit.

Covers training determinism, encode/decode round-trips (including unicode),
persistence, and the full text -> tokens -> TransformerLM training loop.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

import minidiff_tpu as md
from minidiff_tpu import native
from minidiff_tpu.tokenizer import BPETokenizer, _encode_py, _train_py


def setup_function(_):
    md.set_backend("numpy")


CORPUS = ("the quick brown fox jumps over the lazy dog. " * 40 +
          "pack my box with five dozen liquor jugs. " * 25)


def test_native_tokenizer_builds():
    assert native.available()
    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    assert tok.native


def test_roundtrip_ascii_and_unicode():
    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    for s in ["the quick brown fox", "completely unseen text!?",
              "héllo wörld — 日本語テスト ✓", ""]:
        assert tok.decode(tok.encode(s)) == s


def test_compression_on_in_domain_text():
    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    text = "the quick brown fox jumps over the lazy dog."
    ids = tok.encode(text)
    assert len(ids) < len(text) / 2  # learned merges actually compress
    assert int(np.max(ids)) < tok.vocab_size


def test_native_matches_python_reference():
    """C++ training and encoding reproduce the canonical algorithm exactly."""
    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    assert tok.merges == _train_py(CORPUS.encode(), 300)
    for s in ["the quick", "lazy dogs pack boxes", "zzz"]:
        assert tok.encode(s).tolist() == _encode_py(s.encode(), tok.merges)


def test_fallback_path_matches_native():
    tok = BPETokenizer.train(CORPUS, vocab_size=280)
    ids_native = tok.encode("five dozen liquor jugs")
    # force the Python path on the same merges
    tok2 = BPETokenizer.__new__(BPETokenizer)
    tok2.merges = tok.merges
    tok2._lib = None
    tok2._handle = None
    ids_py = tok2.encode("five dozen liquor jugs")
    np.testing.assert_array_equal(ids_native, ids_py)
    assert tok2.decode(ids_py) == "five dozen liquor jugs"


def test_save_load_roundtrip():
    tok = BPETokenizer.train(CORPUS, vocab_size=300)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tok.json")
        tok.save(path)
        tok2 = BPETokenizer.load(path)
        assert tok2.merges == tok.merges
        np.testing.assert_array_equal(tok2.encode("lazy dog"),
                                      tok.encode("lazy dog"))


def test_text_to_lm_training_end_to_end():
    """Tokenize a corpus, train the LM on next-token prediction, loss drops."""
    from minidiff_tpu.models import SGD, TransformerLM, make_train_step
    from minidiff_tpu.models.transformer import lm_loss

    md.set_backend("xla")
    tok = BPETokenizer.train(CORPUS, vocab_size=280)
    ids = tok.encode(CORPUS)
    seq = 16
    n = (len(ids) - 1) // seq
    x = np.asarray(ids[: n * seq]).reshape(n, seq)
    y = np.asarray(ids[1: n * seq + 1]).reshape(n, seq)

    model = TransformerLM(vocab_size=tok.vocab_size, dim=16, num_heads=2,
                          num_layers=1, max_seq_len=seq)
    params = model.init()
    step = make_train_step(model, SGD(0.5), loss_fn=lm_loss)
    state, losses = None, []
    xb = md.Tensor(x[:16])
    yb = md.Tensor(y[:16])
    for _ in range(10):
        params, state, loss = step(params, state, xb, yb)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses


def test_decode_rejects_out_of_vocab_ids():
    tok = BPETokenizer.train(CORPUS, vocab_size=280)
    import pytest as _pytest

    for bad in [[tok.vocab_size], [123456789], [-1]]:
        with _pytest.raises(ValueError):
            tok.decode(np.asarray(bad))
    # fallback path rejects identically
    tok2 = BPETokenizer.__new__(BPETokenizer)
    tok2.merges = tok.merges
    tok2._lib = None
    tok2._handle = None
    with _pytest.raises(ValueError):
        tok2.decode(np.asarray([tok.vocab_size]))


def test_cyclic_merge_tables_rejected():
    """Corrupt vocab files must raise, not recurse forever / segfault."""
    import pytest as _pytest

    with _pytest.raises(ValueError):
        BPETokenizer(merges=[(256, 65)])  # self-reference
    with _pytest.raises(ValueError):
        BPETokenizer(merges=[(65, 257), (66, 67)])  # forward reference
