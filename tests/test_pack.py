"""Sequence packing (models/pack.py + segment_ids through the model).

The contract: a packed row must behave EXACTLY like each document run
alone — logits at every document position, gradients, and the loss.  No
reference counterpart (/root/reference has no models layer).
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as B
from minidiff_tpu.models import (
    SGD,
    TransformerLM,
    lm_loss,
    make_packed_train_step,
    pack_documents,
    segment_positions,
)


def _np(t):
    return np.asarray(B.as_numpy(t._data))


def setup_function(_):
    md.set_backend("xla")


def test_segment_positions_restart():
    seg = np.asarray([[0, 0, 0, 1, 1, 2, -1, -1],
                      [0, 1, 1, 1, 1, -1, -1, -1]])
    pos = segment_positions(seg)
    np.testing.assert_array_equal(
        pos, [[0, 1, 2, 0, 1, 0, 0, 1], [0, 0, 1, 2, 3, 0, 1, 2]])
    # 1-D input keeps its shape
    np.testing.assert_array_equal(
        segment_positions(np.asarray([3, 3, 7, 7, 7])), [0, 1, 0, 1, 2])


def test_pack_documents_roundtrip_and_masks():
    docs = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11, 12, 13, 14]]
    out = pack_documents(docs, seq_len=8, pad_id=0)
    assert out["tokens"].shape == out["segment_ids"].shape \
        == out["positions"].shape == out["targets"].shape \
        == out["loss_mask"].shape
    # every document is recoverable intact from (tokens, segment_ids)
    got = []
    for r in range(out["tokens"].shape[0]):
        seg = out["segment_ids"][r]
        for d in sorted(set(seg[seg >= 0])):
            got.append(list(out["tokens"][r][seg == d]))
    assert sorted(map(tuple, got)) == sorted(map(tuple, docs))
    # loss mask scores exactly len(doc)-1 positions per document
    assert out["loss_mask"].sum() == sum(len(d) - 1 for d in docs)
    # targets under the mask are the next token of the same document
    r, c = np.nonzero(out["loss_mask"])
    np.testing.assert_array_equal(out["targets"][r, c],
                                  out["tokens"][r, c + 1])
    np.testing.assert_array_equal(out["segment_ids"][r, c],
                                  out["segment_ids"][r, c + 1])
    # padding has segment -1 and is never scored
    pad = out["segment_ids"] < 0
    assert not out["loss_mask"][pad].any()


def test_pack_documents_splits_long_docs():
    out = pack_documents([list(range(1, 12))], seq_len=4, pad_id=0)
    # 11 tokens -> pieces of 4, 4, 3; each piece is its own segment
    lens = []
    for r in range(out["tokens"].shape[0]):
        seg = out["segment_ids"][r]
        for d in set(seg[seg >= 0]):
            lens.append(int((seg == d).sum()))
    assert sorted(lens) == [3, 4, 4]


@pytest.mark.parametrize("rope", [False, True])
def test_packed_forward_matches_per_document(rope):
    """Logits of a packed row == logits of each document run alone."""
    model = TransformerLM(vocab_size=31, dim=32, num_heads=4, num_layers=2,
                          max_seq_len=32, rope=rope)
    params = model.init()
    rng = np.random.default_rng(0)
    docs = [list(rng.integers(1, 31, n)) for n in (5, 9, 3, 7)]
    out = pack_documents(docs, seq_len=16)
    logits = model.apply(params, md.Tensor(out["tokens"]),
                         segment_ids=md.Tensor(out["segment_ids"]),
                         positions=md.Tensor(out["positions"]))
    ln = _np(logits)
    for r in range(out["tokens"].shape[0]):
        seg = out["segment_ids"][r]
        for d in sorted(set(seg[seg >= 0])):
            idx = np.nonzero(seg == d)[0]
            doc = out["tokens"][r][idx]
            solo = _np(model.apply(params, md.Tensor(doc[None, :])))
            np.testing.assert_allclose(ln[r][idx], solo[0],
                                       rtol=2e-4, atol=2e-5)


def test_packed_loss_matches_per_document():
    """Masked packed loss == token-weighted mean of per-document losses."""
    model = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=32, rope=True)
    params = model.init()
    rng = np.random.default_rng(1)
    docs = [list(rng.integers(1, 23, n)) for n in (6, 4, 8)]
    out = pack_documents(docs, seq_len=16)
    logits = model.apply(params, md.Tensor(out["tokens"]),
                         segment_ids=md.Tensor(out["segment_ids"]),
                         positions=md.Tensor(out["positions"]))
    packed = float(lm_loss(logits, md.Tensor(out["targets"]),
                           mask=md.Tensor(out["loss_mask"])).item())
    tot, cnt = 0.0, 0
    for doc in docs:
        t = md.Tensor(np.asarray(doc)[None, :])
        lg = model.apply(params, t)
        n = len(doc) - 1
        tot += float(lm_loss(lg[:, :-1], t[:, 1:]).item()) * n
        cnt += n
    np.testing.assert_allclose(packed, tot / cnt, rtol=1e-5)


def test_packed_gradients_match_per_document():
    """Parameter gradients of the packed masked loss == gradients of the
    token-weighted per-document loss (same objective, two layouts)."""
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=32, rope=True)
    params = model.init()
    rng = np.random.default_rng(2)
    docs = [list(rng.integers(1, 19, n)) for n in (5, 7)]
    out = pack_documents(docs, seq_len=12)

    def packed_obj(p):
        logits = model.apply(p, md.Tensor(out["tokens"]),
                             segment_ids=md.Tensor(out["segment_ids"]),
                             positions=md.Tensor(out["positions"]))
        return lm_loss(logits, md.Tensor(out["targets"]),
                       mask=md.Tensor(out["loss_mask"]))

    _, g_packed = md.value_and_grad(packed_obj)(params)

    ntok = sum(len(d) - 1 for d in docs)

    def solo_obj(p):
        tot = None
        for doc in docs:
            t = md.Tensor(np.asarray(doc)[None, :])
            lg = model.apply(p, t)
            term = lm_loss(lg[:, :-1], t[:, 1:]) * float(len(doc) - 1)
            tot = term if tot is None else tot + term
        return tot / float(ntok)

    _, g_solo = md.value_and_grad(solo_obj)(params)

    import jax

    flat_p, _ = jax.tree.flatten(
        g_packed, is_leaf=lambda t: isinstance(t, md.Tensor))
    flat_s, _ = jax.tree.flatten(
        g_solo, is_leaf=lambda t: isinstance(t, md.Tensor))
    assert len(flat_p) == len(flat_s) > 0
    for gp, gs in zip(flat_p, flat_s):
        np.testing.assert_allclose(_np(gp), _np(gs), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("remat", [False, True])
def test_packed_train_step_compiles_and_learns(remat):
    """One md.jit program; loss descends on a repetitive packed corpus;
    fresh batches do not recompile (same structure)."""
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=32, rope=True, remat_blocks=remat)
    params = model.init()
    opt = SGD(0.5)
    state = opt.init(params)
    step = make_packed_train_step(model, opt)
    rng = np.random.default_rng(3)
    # learnable structure: every doc is a repeated token pair
    def batch():
        docs = []
        for _ in range(6):
            a, b = rng.integers(1, 17, 2)
            docs.append([a, b] * rng.integers(2, 5))
        return pack_documents(docs, seq_len=16)

    first = None
    for i in range(30):
        params, state, loss = step(params, state, batch())
        if first is None:
            first = float(loss.item())
    assert float(loss.item()) < first * 0.7, (first, float(loss.item()))


def test_packed_learned_positions_gather():
    """Non-rope packing gathers pos_emb by per-document positions: two
    identical documents at different row offsets produce identical
    logits."""
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=32, rope=False)
    params = model.init()
    doc = [3, 7, 5, 11]
    # row 0: doc at offset 0; row 1: a filler doc, then the same doc
    out = pack_documents([doc, [1, 2, 9], doc], seq_len=8)
    logits = model.apply(params, md.Tensor(out["tokens"]),
                         segment_ids=md.Tensor(out["segment_ids"]),
                         positions=md.Tensor(out["positions"]))
    ln = _np(logits)
    locs = []
    for r in range(out["tokens"].shape[0]):
        seg = out["segment_ids"][r]
        for d in sorted(set(seg[seg >= 0])):
            idx = np.nonzero(seg == d)[0]
            if list(out["tokens"][r][idx]) == doc:
                locs.append(ln[r][idx])
    assert len(locs) == 2
    np.testing.assert_allclose(locs[0], locs[1], rtol=2e-5, atol=2e-6)
