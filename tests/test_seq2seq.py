"""Encoder-decoder transformer (models/seq2seq.py): the cross-attention
family.  The canonical correctness check: learn to REVERSE the source
sequence — impossible without working cross-attention (the causal decoder
alone cannot see the source)."""

from __future__ import annotations

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import (
    SGD,
    Adam,
    Seq2SeqTransformer,
    greedy_decode,
    make_train_step,
    seq2seq_loss,
)


def setup_function(_):
    md.set_backend("xla")


def _reverse_batches(batch, s, vocab, seed=0):
    """src random, tgt = BOS + reversed(src); teacher forcing pairs."""
    rng = np.random.RandomState(seed)
    src = rng.randint(2, vocab, size=(batch, s))
    rev = src[:, ::-1]
    tgt_in = np.concatenate([np.ones((batch, 1), dtype=np.int64), rev[:, :-1]],
                            axis=1)
    return md.Tensor(src), md.Tensor(tgt_in), md.Tensor(np.ascontiguousarray(rev))


def test_shapes_and_grad_flow():
    np.random.seed(0)
    model = Seq2SeqTransformer(src_vocab=11, tgt_vocab=13, dim=16, num_heads=2,
                               enc_layers=1, dec_layers=1, max_src_len=8,
                               max_tgt_len=8)
    params = model.init()
    src, tgt_in, tgt_out = _reverse_batches(3, 6, 11)
    logits = model.apply(params, (src, tgt_in))
    assert logits.shape == (3, 6, 13)

    def obj(p):
        return seq2seq_loss(model.apply(p, (src, tgt_in)), tgt_out)

    _, grads = md.value_and_grad(obj)(params)
    # cross-attention weights receive gradient (the decoder uses the memory)
    g = np.asarray(grads["dec"][0]["cross"]["wkv"]["w"])
    assert np.any(g != 0)
    g_enc = np.asarray(grads["enc"][0]["attn"]["qkv"]["w"])
    assert np.any(g_enc != 0)  # gradient reaches the encoder THROUGH cross


def test_learns_to_reverse():
    np.random.seed(1)
    vocab, s = 12, 6
    model = Seq2SeqTransformer(src_vocab=vocab, tgt_vocab=vocab, dim=32,
                               num_heads=4, enc_layers=1, dec_layers=1,
                               max_src_len=8, max_tgt_len=8)
    params = model.init()
    opt = Adam(3e-3)
    state = opt.init(params)
    step = make_train_step(model, opt, loss_fn=seq2seq_loss)
    losses = []
    for i in range(60):
        src, tgt_in, tgt_out = _reverse_batches(32, s, vocab, seed=i)
        params, state, loss = step(params, state, (src, tgt_in), tgt_out)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    # inference: greedy decode actually reverses unseen sequences
    src, _, _ = _reverse_batches(4, s, vocab, seed=999)
    out = greedy_decode(model, params, src, max_len=s, bos_id=1)
    got = np.asarray(out.detach())[:, 1:]
    expect = np.asarray(src.detach())[:, ::-1]
    acc = float((got == expect).mean())
    assert acc > 0.9, (acc, got[0], expect[0])
