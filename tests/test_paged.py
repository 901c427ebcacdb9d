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


def test_paged_prefix_caching_matches_concatenated_prompt():
    # a registered prefix + suffix submit must equal submitting the full
    # concatenation, and must hold only the pages covering prefix+suffix
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=512, rope=True)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(9)
    sys_prompt = list(rng.integers(0, 19, 10))
    pid = srv.register_prefix(sys_prompt)
    for n_suffix in (3, 7):
        suffix = list(rng.integers(0, 19, n_suffix))
        s = srv.submit(suffix, max_new_tokens=5, prefix=pid)
        assert srv.pages_in_use() == 1  # 10 + 7 tokens -> one page
        _drain(srv)
        got = srv.collect(s)
        assert got == _reference(model, params, sys_prompt + suffix, 5)
    assert srv.pages_in_use() == 0


def test_paged_chunked_prefill_matches_one_shot():
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512,
                            prefill_chunk=128)
    rng = np.random.default_rng(10)
    p = list(rng.integers(0, 17, 300))  # 3 chunks: 128 + 128 + 44
    s = srv.submit(p, max_new_tokens=6)
    assert srv.pages_in_use() == -(-300 // PAGE)  # pages cover the prompt
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, p, 6)
    assert srv.pages_in_use() == 0


def test_paged_prefix_and_chunked_compose():
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=1024, rope=True)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=1024,
                            prefill_chunk=128)
    rng = np.random.default_rng(11)
    sys_prompt = list(rng.integers(0, 17, 40))
    pid = srv.register_prefix(sys_prompt)
    suffix = list(rng.integers(0, 17, 200))  # > prefill_chunk -> chunked
    s = srv.submit(suffix, max_new_tokens=5, prefix=pid)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, sys_prompt + suffix, 5)


def test_paged_prefix_pages_released_and_reused():
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=256,
                            num_pages=3)
    rng = np.random.default_rng(12)
    sys_prompt = list(rng.integers(0, 13, 6))
    pid = srv.register_prefix(sys_prompt)
    for _ in range(3):  # page churn across reuse must stay exact
        suffix = list(rng.integers(0, 13, 4))
        s = srv.submit(suffix, max_new_tokens=4, prefix=pid)
        _drain(srv)
        got = srv.collect(s)
        assert got == _reference(model, params, sys_prompt + suffix, 4)
        assert srv.pages_in_use() == 0


# -- fused page-walk kernel (kernels/paged.py): interpret-mode parity -------


def _paged_kernel_case(b, kv, g, maxp, used, dtype, window=None, sinks=0,
                       seed=0, hd=128):
    import jax.numpy as jnp

    from minidiff_tpu.kernels import paged as PK

    rng = np.random.default_rng(seed)
    P = b * maxp + 1
    q = jnp.asarray(rng.standard_normal((b, kv, g, hd)), dtype)
    pk = jnp.asarray(rng.standard_normal((P, kv, PAGE, hd)), dtype)
    pv = jnp.asarray(rng.standard_normal((P, kv, PAGE, hd)), dtype)
    # each row owns `used[i]` distinct pages; the rest of the table is 0
    table = np.zeros((b, maxp), np.int32)
    nxt = 1
    for i in range(b):
        for j in range(used[i]):
            table[i, j] = nxt
            nxt += 1
    pos = np.asarray([u * PAGE - rng.integers(1, PAGE) for u in used],
                     np.int32)
    table_j = jnp.asarray(table)
    pos_j = jnp.asarray(pos)
    scale = 1.0 / hd ** 0.5
    want = PK.paged_attention_reference(q, pk, pv, table_j, pos_j, scale,
                                        window, sinks)
    got = PK._pallas_paged_attention(q, pk, pv, table_j, pos_j, scale,
                                     window, sinks, interpret=True)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_paged_kernel_interpret_matches_reference_f32():
    import jax.numpy as jnp

    _paged_kernel_case(b=2, kv=2, g=1, maxp=4, used=[2, 4], dtype=jnp.float32)


def test_paged_kernel_interpret_matches_reference_bf16_gqa():
    import jax.numpy as jnp

    _paged_kernel_case(b=3, kv=2, g=4, maxp=3, used=[1, 3, 2],
                       dtype=jnp.bfloat16, seed=1)


def test_paged_kernel_interpret_window_sinks():
    import jax.numpy as jnp

    _paged_kernel_case(b=2, kv=1, g=2, maxp=4, used=[4, 3],
                       dtype=jnp.float32, window=192, sinks=2, seed=2)


def test_paged_kernel_interpret_head_dim_64():
    import jax.numpy as jnp

    # GPT-2-class head_dim: lane dim 64 is fused-kernel eligible (ADVICE
    # r4 widened the gate from hd % 128 to hd % 64)
    _paged_kernel_case(b=2, kv=2, g=2, maxp=3, used=[2, 3],
                       dtype=jnp.float32, seed=5, hd=64)


def test_paged_dispatch_warns_once_on_ineligible_head_dim(monkeypatch):
    import warnings

    import jax.numpy as jnp

    from minidiff_tpu.kernels import paged as PK

    monkeypatch.setattr(PK, "_pallas_enabled", lambda: True)
    PK._FALLBACK_WARNED.clear()
    rng = np.random.default_rng(0)
    hd = 80  # Phi-class: off the 64 grid -> gathered fallback, loudly
    q = jnp.asarray(rng.standard_normal((1, 1, 2, hd)), jnp.float32)
    pk = jnp.asarray(rng.standard_normal((3, 1, PAGE, hd)), jnp.float32)
    pv = jnp.asarray(rng.standard_normal((3, 1, PAGE, hd)), jnp.float32)
    table = jnp.asarray([[1, 2]], jnp.int32)
    pos = jnp.asarray([150], jnp.int32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        PK.paged_attention(q, pk, pv, table, pos)
        PK.paged_attention(q, pk, pv, table, pos)  # second call: silent
    msgs = [x for x in w if "not fused-kernel eligible" in str(x.message)]
    assert len(msgs) == 1


def test_paged_kernel_single_page_slot():
    import jax.numpy as jnp

    # pos inside the first page: only page 0 of the table is live
    _paged_kernel_case(b=2, kv=2, g=2, maxp=4, used=[1, 1],
                       dtype=jnp.float32, seed=3)


# -- adversarial page-boundary edges for the rows (prefix/chunked) path ----


def test_paged_prefix_on_exact_page_boundary():
    # prefix of exactly PAGE tokens: suffix KV starts in page 1; decode
    # from position p0+s0 must allocate and read across the boundary
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512, rope=True)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(20)
    sys_prompt = list(rng.integers(0, 17, PAGE))  # exactly one page
    pid = srv.register_prefix(sys_prompt)
    suffix = list(rng.integers(0, 17, 5))
    s = srv.submit(suffix, max_new_tokens=6, prefix=pid)
    assert srv.pages_in_use() == 2  # ceil((128 + 5) / 128)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params,
                                        sys_prompt + suffix, 6)


def test_paged_prefix_combined_lands_on_boundary():
    # p0 + s0 == 2*PAGE exactly: the FIRST decode step crosses into a
    # fresh page (step() must allocate before the program runs)
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(21)
    sys_prompt = list(rng.integers(0, 17, 100))
    pid = srv.register_prefix(sys_prompt)
    suffix = list(rng.integers(0, 17, 2 * PAGE - 100))  # combined = 256
    s = srv.submit(suffix, max_new_tokens=4, prefix=pid)
    assert srv.pages_in_use() == 2
    _drain(srv)
    assert srv.pages_in_use() == 3  # decode crossed into page 3
    assert srv.collect(s) == _reference(model, params,
                                        sys_prompt + suffix, 4)


def test_paged_chunked_prompt_on_exact_boundary():
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=512,
                            prefill_chunk=128)
    rng = np.random.default_rng(22)
    p = list(rng.integers(0, 17, 256))  # exactly 2 chunks, 2 pages
    s = srv.submit(p, max_new_tokens=4)
    assert srv.pages_in_use() == 2
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, p, 4)


def test_paged_prefix_neighbor_isolation():
    # a direct-path slot and a prefix-path slot decode together; the
    # prefix slot's row scatter must not touch the neighbor's pages
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = PagedDecodeServer(model, params, max_batch=2, window=256)
    rng = np.random.default_rng(23)
    p_direct = list(rng.integers(0, 17, 7))
    s1 = srv.submit(p_direct, max_new_tokens=8)
    sys_prompt = list(rng.integers(0, 17, 6))
    pid = srv.register_prefix(sys_prompt)
    suffix = list(rng.integers(0, 17, 4))
    s2 = srv.submit(suffix, max_new_tokens=8, prefix=pid)
    _drain(srv)
    assert srv.collect(s1) == _reference(model, params, p_direct, 8)
    assert srv.collect(s2) == _reference(model, params,
                                         sys_prompt + suffix, 8)
