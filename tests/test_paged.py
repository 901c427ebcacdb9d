"""Paged KV-cache decode server (models/paged.py).

Contract inherited from test_server.py: every request decoded through the
shared page pool is token-for-token identical to decoding it ALONE via
generate_compiled — plus the paging-specific surface: on-demand page
allocation across 128 boundaries, page reuse after collect, pool
oversubscription below dense capacity, and loud exhaustion.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import TransformerLM, generate_compiled
from minidiff_tpu.models.paged import PAGE, PagedDecodeServer


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def setup_function(_):
    md.set_backend("xla")


def _reference(model, params, prompt, n):
    out = _np(generate_compiled(model, params,
                                md.Tensor(np.asarray([prompt])), n))
    return list(out[0, len(prompt):])


def _drain(srv):
    while srv.active():
        srv.step()


@pytest.mark.parametrize("rope", [False, True])
def test_paged_matches_solo_decode(rope):
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=256, rope=rope)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=4, window=256)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 19, n)) for n in (3, 7, 5)]
    slots = [srv.submit(p, max_new_tokens=6) for p in prompts]
    _drain(srv)
    for p, s in zip(prompts, slots):
        assert srv.collect(s) == _reference(model, params, p, 6), p


def test_paged_page_boundary_crossing():
    # prompt of 126 tokens decodes across the 128 boundary: a second page
    # is allocated mid-flight and attention stays correct over both
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(1)
    p = list(rng.integers(0, 17, 126))
    s = srv.submit(p, max_new_tokens=6)
    assert srv.pages_in_use() == 1
    _drain(srv)
    assert srv.pages_in_use() == 2  # crossed into a second page
    assert srv.collect(s) == _reference(model, params, p, 6)
    assert srv.pages_in_use() == 0  # collect released both


def test_paged_oversubscribed_pool_staggered():
    # pool HALF the dense capacity still serves staggered traffic: pages
    # freed by collected requests are immediately reused by new ones
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    # dense capacity would be 4 slots * 512/128 = 16 pages; give it 8
    srv = PagedDecodeServer(model, params, max_batch=4, window=512,
                            num_pages=8)
    rng = np.random.default_rng(2)
    outs = {}
    refs = {}
    for wave in range(3):
        prompts = [list(rng.integers(0, 13, n)) for n in (4, 9)]
        slots = [srv.submit(p, max_new_tokens=5) for p in prompts]
        _drain(srv)
        for p, s in zip(prompts, slots):
            outs[(wave, tuple(p))] = srv.collect(s)
            refs[(wave, tuple(p))] = _reference(model, params, p, 5)
    assert outs == refs
    assert srv.pages_in_use() == 0


def test_paged_pool_exhaustion_is_loud():
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=4, window=512,
                            num_pages=2)
    rng = np.random.default_rng(3)
    srv.submit(list(rng.integers(0, 13, 130)), max_new_tokens=4)  # 2 pages
    with pytest.raises(RuntimeError, match="page pool exhausted"):
        srv.submit(list(rng.integers(0, 13, 4)), max_new_tokens=4)


def test_paged_exhaustion_mid_decode_is_loud():
    # decode crossing a page boundary with an empty pool raises at step()
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512,
                            num_pages=1)
    rng = np.random.default_rng(4)
    srv.submit(list(rng.integers(0, 13, 126)), max_new_tokens=8)
    with pytest.raises(RuntimeError, match="page pool exhausted"):
        _drain(srv)  # crosses 128 at the third step


def test_paged_slot_reuse_does_not_perturb_neighbor():
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=256)
    rng = np.random.default_rng(5)
    p1 = list(rng.integers(0, 13, 4))
    p2 = list(rng.integers(0, 13, 6))
    p3 = list(rng.integers(0, 13, 9))
    s1 = srv.submit(p1, max_new_tokens=3)
    s2 = srv.submit(p2, max_new_tokens=10)
    while not srv.done(s1):
        srv.step()
    out1 = srv.collect(s1)
    s3 = srv.submit(p3, max_new_tokens=5)  # reuses s1's slot AND pool pages
    assert s3 == s1
    _drain(srv)
    assert out1 == _reference(model, params, p1, 3)
    assert srv.collect(s2) == _reference(model, params, p2, 10)
    assert srv.collect(s3) == _reference(model, params, p3, 5)


def test_paged_gqa_window_sinks():
    model = TransformerLM(vocab_size=19, dim=32, num_heads=4, num_kv_heads=2,
                          num_layers=2, max_seq_len=512, rope=True,
                          window=64, sinks=2)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(6)
    p = list(rng.integers(0, 19, 70))  # longer than the model window
    s = srv.submit(p, max_new_tokens=6)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, p, 6)


def test_paged_sampling_deterministic_per_seed():
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    rng = np.random.default_rng(7)
    p = list(rng.integers(0, 19, 4))
    outs = []
    for _ in range(2):
        srv = PagedDecodeServer(model, params, max_batch=2, greedy=False,
                                temperature=0.8, top_k=5, window=256)
        s = srv.submit(p, max_new_tokens=8, seed=42)
        _drain(srv)
        outs.append(srv.collect(s))
    assert outs[0] == outs[1]


def test_paged_matches_dense_server_memory_accounting():
    # a 30-token request on a 1024 window holds 1 page (128 tokens) of
    # pool, not the dense server's full 1024-token row
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=1024)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=8, window=1024,
                            num_pages=16)
    rng = np.random.default_rng(8)
    s = srv.submit(list(rng.integers(0, 13, 25)), max_new_tokens=5)
    assert srv.pages_in_use() == 1
    assert PAGE * srv.pages_in_use() == 128  # vs 1024 dense
    _drain(srv)
    srv.collect(s)
    assert srv.pages_in_use() == 0


def test_paged_prefix_unsupported_is_loud():
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=256)
    with pytest.raises(NotImplementedError):
        srv.submit([1, 2], max_new_tokens=2, prefix=0)
