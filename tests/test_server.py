"""Continuous-batching decode server (models/server.py).

No reference counterpart (/root/reference has no serving layer).  The
contract: every request decoded through the shared slot pool is
token-for-token identical to decoding it ALONE via generate_compiled —
staggered arrivals, different prompt lengths, slot reuse, and neighbors
must not perturb each other.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import DecodeServer, TransformerLM, generate_compiled


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
def test_server_matches_solo_decode(rope):
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=256, rope=rope)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=4, window=256)
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 19, n)) for n in (3, 7, 5)]
    slots = [srv.submit(p, max_new_tokens=6) for p in prompts]
    _drain(srv)
    for p, s in zip(prompts, slots):
        assert srv.collect(s) == _reference(model, params, p, 6), p


def test_server_staggered_arrivals_and_slot_reuse():
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=2, window=256)
    rng = np.random.default_rng(1)
    p1 = list(rng.integers(0, 13, 4))
    p2 = list(rng.integers(0, 13, 6))
    p3 = list(rng.integers(0, 13, 9))  # arrives mid-flight, reuses a slot

    s1 = srv.submit(p1, max_new_tokens=3)   # finishes first
    s2 = srv.submit(p2, max_new_tokens=10)
    while not srv.done(s1):
        srv.step()
    out1 = srv.collect(s1)
    s3 = srv.submit(p3, max_new_tokens=5)   # takes s1's slot mid-decode of s2
    assert s3 == s1  # the pool really is reusing the freed slot
    _drain(srv)
    assert out1 == _reference(model, params, p1, 3)
    assert srv.collect(s2) == _reference(model, params, p2, 10)
    assert srv.collect(s3) == _reference(model, params, p3, 5)


def test_server_slot_not_recycled_until_collected():
    # review regression: a finished-but-uncollected request's slot must
    # not be handed to a new submit (stale handles would read the wrong
    # request's tokens)
    model = TransformerLM(vocab_size=7, dim=8, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=1, window=256)
    s1 = srv.submit([1, 2], max_new_tokens=1)  # finishes immediately
    assert srv.done(s1) and not srv.active()
    with pytest.raises(RuntimeError, match="collect"):
        srv.submit([3], max_new_tokens=1)
    out1 = srv.collect(s1)  # releases
    s2 = srv.submit([3], max_new_tokens=1)
    assert s2 == s1
    assert srv.collect(s1) != out1 or True  # s1's handle now maps to s2's
    # window guard: beyond max_seq_len is refused up front
    with pytest.raises(AssertionError, match="max_seq_len"):
        DecodeServer(model, params, max_batch=1, window=384)


def test_server_neighbors_do_not_perturb():
    # the same request decodes identically whether its neighbor slots are
    # empty, mid-flight, or churning
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    rng = np.random.default_rng(2)
    p = list(rng.integers(0, 17, 5))

    srv_alone = DecodeServer(model, params, max_batch=4, window=256)
    s = srv_alone.submit(p, max_new_tokens=8)
    _drain(srv_alone)
    alone = srv_alone.collect(s)

    srv_busy = DecodeServer(model, params, max_batch=4, window=256)
    for other in range(3):
        srv_busy.submit(list(rng.integers(0, 17, 3 + other)),
                        max_new_tokens=12)
    s = srv_busy.submit(p, max_new_tokens=8)
    _drain(srv_busy)
    assert srv_busy.collect(s) == alone


def test_server_eos_and_pool_exhaustion():
    model = TransformerLM(vocab_size=7, dim=8, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=1, window=256)
    s1 = srv.submit([1, 2], max_new_tokens=50)
    with pytest.raises(RuntimeError, match="free slots"):
        srv.submit([3], max_new_tokens=1)
    # figure out what the model emits, then use it as the EOS to stop early
    _drain(srv)
    toks = srv.collect(s1)
    eos = toks[2]
    srv2 = DecodeServer(model, params, max_batch=1, window=256, eos_id=eos)
    s2 = srv2.submit([1, 2], max_new_tokens=50)
    _drain(srv2)
    out = srv2.collect(s2)
    assert out == toks[:len(out)] and out[-1] == eos and len(out) <= 3


def test_server_sampling_deterministic_per_seed():
    model = TransformerLM(vocab_size=11, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()

    def run(seed):
        srv = DecodeServer(model, params, max_batch=2, window=256,
                           greedy=False, temperature=1.0, top_k=5)
        s = srv.submit([1, 2, 3], max_new_tokens=6, seed=seed)
        _drain(srv)
        return srv.collect(s)

    a, b, c = run(7), run(7), run(8)
    assert a == b
    assert a != c
    assert all(0 <= t < 11 for t in a)


def test_ssm_server_matches_solo_decode():
    from minidiff_tpu.models import MambaLM, SSMDecodeServer, generate_compiled_ssm

    model = MambaLM(vocab_size=13, dim=8, num_layers=2, d_state=4, d_conv=3)
    params = model.init()
    srv = SSMDecodeServer(model, params, max_batch=3)
    rng = np.random.default_rng(4)
    prompts = [list(rng.integers(0, 13, n)) for n in (3, 6, 9)]
    slots = [srv.submit(p, max_new_tokens=5) for p in prompts]
    _drain(srv)
    for p, s in zip(prompts, slots):
        ref = _np(generate_compiled_ssm(model, params,
                                        md.Tensor(np.asarray([p])), 5))
        assert srv.collect(s) == list(ref[0, len(p):]), p


def test_ssm_server_staggered_and_reuse():
    from minidiff_tpu.models import MambaLM, SSMDecodeServer, generate_compiled_ssm

    model = MambaLM(vocab_size=11, dim=8, num_layers=1, d_state=4)
    params = model.init()
    srv = SSMDecodeServer(model, params, max_batch=2)
    rng = np.random.default_rng(5)
    p1 = list(rng.integers(0, 11, 4))
    p2 = list(rng.integers(0, 11, 7))
    p3 = list(rng.integers(0, 11, 5))
    s1 = srv.submit(p1, max_new_tokens=2)
    s2 = srv.submit(p2, max_new_tokens=9)
    while not srv.done(s1):
        srv.step()
    out1 = srv.collect(s1)  # collect releases the slot for reuse
    s3 = srv.submit(p3, max_new_tokens=4)
    assert s3 == s1
    _drain(srv)
    ref1 = _np(generate_compiled_ssm(model, params,
                                     md.Tensor(np.asarray([p1])), 2))
    assert out1 == list(ref1[0, len(p1):])
    for p, s, n in ((p2, s2, 9), (p3, s3, 4)):
        ref = _np(generate_compiled_ssm(model, params,
                                        md.Tensor(np.asarray([p])), n))
        assert srv.collect(s) == list(ref[0, len(p):]), p


def test_server_long_prompt_buckets():
    # a prompt crossing the 128 bucket boundary gets its own prefill
    # program and still matches solo decode
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=384)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=2, window=384)
    rng = np.random.default_rng(3)
    p_short = list(rng.integers(0, 13, 4))
    p_long = list(rng.integers(0, 13, 140))
    s1 = srv.submit(p_short, max_new_tokens=4)
    s2 = srv.submit(p_long, max_new_tokens=4)
    assert len(srv._prefill_cache) == 2  # two buckets -> two programs
    _drain(srv)
    assert srv.collect(s1) == _reference(model, params, p_short, 4)
    assert srv.collect(s2) == _reference(model, params, p_long, 4)


# ---------------------------------------------------------------------------
# prefix caching (shared system prompts)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rope", [False, True])
def test_prefix_cache_matches_concatenated_prompt(rope):
    # the contract: submit(suffix, prefix=pid) is token-identical to
    # submitting the concatenated prefix+suffix without prefix caching
    model = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=512, rope=rope)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=4, window=512)
    rng = np.random.default_rng(7)
    sys_prompt = list(rng.integers(0, 23, 11))   # p0 < bucket: pad garbage
    pid = srv.register_prefix(sys_prompt)
    suffixes = [list(rng.integers(0, 23, n)) for n in (3, 9, 5)]
    slots = [srv.submit(sfx, max_new_tokens=6, prefix=pid)
             for sfx in suffixes]
    _drain(srv)
    for sfx, s in zip(suffixes, slots):
        assert srv.collect(s) == _reference(model, params,
                                            sys_prompt + sfx, 6), sfx


def test_prefix_cache_rows_are_immutable_across_requests():
    # per-request suffix writes must never leak into the shared rows:
    # a SECOND request over the same prefix still matches its reference
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=2, window=256)
    rng = np.random.default_rng(3)
    pre = list(rng.integers(0, 17, 6))
    pid = srv.register_prefix(pre)
    a = list(rng.integers(0, 17, 4))
    b = list(rng.integers(0, 17, 4))
    sa = srv.submit(a, max_new_tokens=5, prefix=pid)
    _drain(srv)
    out_a = srv.collect(sa)
    sb_ = srv.submit(b, max_new_tokens=5, prefix=pid)
    _drain(srv)
    assert out_a == _reference(model, params, pre + a, 5)
    assert srv.collect(sb_) == _reference(model, params, pre + b, 5)


def test_prefix_cache_mixed_with_plain_and_staggered():
    # prefix-cached and plain requests share the pool mid-flight
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=256, rope=True)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=3, window=256)
    rng = np.random.default_rng(11)
    pre = list(rng.integers(0, 19, 5))
    pid = srv.register_prefix(pre)
    plain = list(rng.integers(0, 19, 8))
    sfx1 = list(rng.integers(0, 19, 3))
    sfx2 = list(rng.integers(0, 19, 7))
    s_plain = srv.submit(plain, max_new_tokens=9)
    s1 = srv.submit(sfx1, max_new_tokens=4, prefix=pid)
    while not srv.done(s1):
        srv.step()
    out1 = srv.collect(s1)
    s2 = srv.submit(sfx2, max_new_tokens=5, prefix=pid)  # reuses s1's slot
    _drain(srv)
    assert out1 == _reference(model, params, pre + sfx1, 4)
    assert srv.collect(s_plain) == _reference(model, params, plain, 9)
    assert srv.collect(s2) == _reference(model, params, pre + sfx2, 5)


def test_prefix_cache_gqa_window_sinks():
    # composes with GQA and sliding-window+sinks attention (the chunk
    # step's band predicate must see global positions past the prefix)
    model = TransformerLM(vocab_size=19, dim=32, num_heads=4, num_kv_heads=2,
                          num_layers=2, max_seq_len=512, rope=True,
                          window=64, sinks=2)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(13)
    pre = list(rng.integers(0, 19, 70))   # longer than the model window
    pid = srv.register_prefix(pre)
    sfx = list(rng.integers(0, 19, 6))
    s = srv.submit(sfx, max_new_tokens=6, prefix=pid)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, pre + sfx, 6)


def test_prefix_cache_long_prefix_multibucket():
    # prefix longer than one bucket; suffix in a different bucket
    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=2, window=512)
    rng = np.random.default_rng(17)
    pre = list(rng.integers(0, 13, 140))   # 2-bucket prefix
    pid = srv.register_prefix(pre)
    sfx = list(rng.integers(0, 13, 131))   # 2-bucket suffix
    s = srv.submit(sfx, max_new_tokens=4, prefix=pid)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, pre + sfx, 4)


def test_prefix_cache_sampling_deterministic_per_seed():
    model = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    rng = np.random.default_rng(19)
    pre = list(rng.integers(0, 19, 4))
    sfx = list(rng.integers(0, 19, 3))
    outs = []
    for _ in range(2):
        srv = DecodeServer(model, params, max_batch=2, greedy=False,
                           temperature=0.8, top_k=5, window=256)
        pid = srv.register_prefix(pre)
        s = srv.submit(sfx, max_new_tokens=8, seed=42, prefix=pid)
        _drain(srv)
        outs.append(srv.collect(s))
    assert outs[0] == outs[1]


def test_prefix_cache_release_and_ssm_unsupported():
    from minidiff_tpu.models import MambaLM
    from minidiff_tpu.models.server import SSMDecodeServer

    model = TransformerLM(vocab_size=13, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    srv = DecodeServer(model, params, max_batch=2, window=256)
    pid = srv.register_prefix([1, 2, 3])
    srv.release_prefix(pid)
    with pytest.raises(KeyError):
        srv.submit([4], max_new_tokens=2, prefix=pid)

    ssm = MambaLM(vocab_size=13, dim=16, num_layers=1)
    ssrv = SSMDecodeServer(ssm, ssm.init(), max_batch=2)
    with pytest.raises(NotImplementedError):
        ssrv.register_prefix([1, 2, 3])


# -- chunked prefill ---------------------------------------------------------


@pytest.mark.parametrize("rope", [False, True])
def test_chunked_prefill_matches_dense(rope):
    # a long prompt prefilled in 128-token chunks is token-identical to
    # the one-shot dense prefill (and hence to solo generate_compiled)
    model = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=512, rope=rope)
    params = model.init()
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(0, 23, n)) for n in (300, 129, 256, 40)]
    srv = DecodeServer(model, params, max_batch=4, window=512,
                       prefill_chunk=128)
    slots = [srv.submit(p, max_new_tokens=5) for p in prompts]
    _drain(srv)
    for p, s in zip(prompts, slots):
        assert srv.collect(s) == _reference(model, params, p, 5), len(p)


def test_chunked_prefill_exact_multiple_and_busy_neighbors():
    # prompt length an exact chunk multiple (tail == full chunk), with a
    # neighbor mid-decode: chunk fills must not perturb other slots
    model = TransformerLM(vocab_size=17, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=512)
    params = model.init()
    rng = np.random.default_rng(8)
    p1 = list(rng.integers(0, 17, 5))
    p2 = list(rng.integers(0, 17, 256))   # exactly 2 chunks
    srv = DecodeServer(model, params, max_batch=2, window=512,
                       prefill_chunk=128)
    s1 = srv.submit(p1, max_new_tokens=8)
    srv.step(); srv.step()
    s2 = srv.submit(p2, max_new_tokens=4)  # chunked prefill mid-decode of s1
    _drain(srv)
    assert srv.collect(s1) == _reference(model, params, p1, 8)
    assert srv.collect(s2) == _reference(model, params, p2, 4)


def test_chunked_prefill_composes_with_prefix_cache():
    # registered prefix + long suffix: the suffix itself chunks, starting
    # from the prefix rows at p0 = len(prefix)
    model = TransformerLM(vocab_size=29, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=1024)
    params = model.init()
    rng = np.random.default_rng(9)
    sys_prompt = list(rng.integers(0, 29, 70))
    suffix = list(rng.integers(0, 29, 200))   # > one 128 chunk
    srv = DecodeServer(model, params, max_batch=2, window=1024,
                       prefill_chunk=128)
    pid = srv.register_prefix(sys_prompt)
    s = srv.submit(suffix, max_new_tokens=6, prefix=pid)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, sys_prompt + suffix, 6)
    # prefix rows stay valid for a second chunked request
    s2 = srv.submit(suffix[:150], max_new_tokens=4, prefix=pid)
    _drain(srv)
    assert srv.collect(s2) == _reference(model, params,
                                         sys_prompt + suffix[:150], 4)


def test_chunked_prefill_window_sinks_gqa():
    # sliding-window + sinks + GQA all ride through the chunked path
    model = TransformerLM(vocab_size=19, dim=32, num_heads=4, num_kv_heads=2,
                          max_seq_len=512, rope=True, window=128, sinks=4)
    params = model.init()
    rng = np.random.default_rng(10)
    p = list(rng.integers(0, 19, 260))
    srv = DecodeServer(model, params, max_batch=2, window=512,
                       prefill_chunk=128)
    s = srv.submit(p, max_new_tokens=6)
    _drain(srv)
    assert srv.collect(s) == _reference(model, params, p, 6)


def test_chunked_prefill_validation():
    model = TransformerLM(vocab_size=11, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256)
    params = model.init()
    with pytest.raises(AssertionError):
        DecodeServer(model, params, window=256, prefill_chunk=100)
    # SSM family refuses chunked prefill loudly
    from minidiff_tpu.models import MambaLM, SSMDecodeServer

    ssm = MambaLM(vocab_size=11, dim=16, num_layers=1, d_state=4)
    srv = SSMDecodeServer(ssm, ssm.init(), max_batch=2,
                          prefill_chunk=128)
    with pytest.raises(NotImplementedError):
        srv.submit(list(range(1, 7)) * 25, max_new_tokens=2)  # 150 tokens


# -- speculative decoding x continuous batching (r5) ------------------------


def _spec_models(rope=False, window=None, sinks=0, kv=None):
    np.random.seed(0)
    target = TransformerLM(vocab_size=64, dim=32, num_heads=2, num_layers=2,
                           max_seq_len=256, rope=rope, window=window,
                           sinks=sinks, num_kv_heads=kv)
    tparams = target.init()
    np.random.seed(1)
    draft = TransformerLM(vocab_size=64, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=256, rope=rope)
    dparams = draft.init()
    return target, tparams, draft, dparams


def _solo_spec(target, tparams, draft, dparams, prompt, n, k):
    from minidiff_tpu.models.speculative import generate_speculative_compiled

    toks, _ = generate_speculative_compiled(
        target, tparams, draft, dparams,
        md.Tensor(np.asarray([prompt])), n, k=k)
    return [int(t) for t in _np(toks)[0][len(prompt):]]


@pytest.mark.parametrize("rope", [False, True])
def test_speculative_server_matches_solo_speculative(rope):
    from minidiff_tpu.models import SpeculativeDecodeServer

    target, tparams, draft, dparams = _spec_models(rope=rope)
    srv = SpeculativeDecodeServer(target, tparams, draft, dparams, k=3,
                                  max_batch=4, window=256)
    rng = np.random.RandomState(2)
    prompts = [list(rng.randint(1, 64, size=n)) for n in (5, 9, 3, 7)]
    maxnew = [12, 7, 15, 4]
    slots = [srv.submit(p, m, seed=i)
             for i, (p, m) in enumerate(zip(prompts, maxnew))]
    _drain(srv)
    for i, (p, m) in enumerate(zip(prompts, maxnew)):
        got = srv.collect(slots[i])
        want = _solo_spec(target, tparams, draft, dparams, p, m, 3)
        assert got == want, i


def test_speculative_server_staggered_arrivals_and_reuse():
    from minidiff_tpu.models import SpeculativeDecodeServer

    target, tparams, draft, dparams = _spec_models()
    srv = SpeculativeDecodeServer(target, tparams, draft, dparams, k=2,
                                  max_batch=2, window=256)
    rng = np.random.RandomState(3)
    p1 = list(rng.randint(1, 64, size=6))
    p2 = list(rng.randint(1, 64, size=4))
    p3 = list(rng.randint(1, 64, size=11))
    s1 = srv.submit(p1, 10, seed=0)
    srv.step()  # rounds advance before the second arrival
    s2 = srv.submit(p2, 18, seed=1)
    while srv._budget[s1] > 0:
        srv.step()
    out1 = srv.collect(s1)          # releases slot 1
    s3 = srv.submit(p3, 5, seed=2)  # reuses it while s2 still decodes
    _drain(srv)
    assert out1 == _solo_spec(target, tparams, draft, dparams, p1, 10, 2)
    assert srv.collect(s2) == _solo_spec(target, tparams, draft, dparams,
                                         p2, 18, 2)
    assert srv.collect(s3) == _solo_spec(target, tparams, draft, dparams,
                                         p3, 5, 2)


def test_speculative_server_step_emits_upto_k_plus_one():
    from minidiff_tpu.models import SpeculativeDecodeServer

    target, tparams, draft, dparams = _spec_models()
    # self-draft: the draft IS the target, so every round accepts k+1
    srv = SpeculativeDecodeServer(target, tparams, target, tparams, k=3,
                                  max_batch=2, window=256)
    p = [5, 9, 2]
    slot = srv.submit(p, 9, seed=0)   # 1 token from prefill, 8 to go
    out = srv.step()
    assert len(out[slot]) == 4        # k+1 accepted every round
    _drain(srv)
    got = srv.collect(slot)
    assert got == _reference(target, tparams, p, 9)


def test_speculative_server_eos_and_window_models():
    from minidiff_tpu.models import SpeculativeDecodeServer

    target, tparams, draft, dparams = _spec_models(window=64, sinks=1, kv=1)
    srv = SpeculativeDecodeServer(target, tparams, draft, dparams, k=2,
                                  max_batch=2, window=256)
    p = [3, 1, 4]
    want = _solo_spec(target, tparams, draft, dparams, p, 12, 2)
    eos = want[4]  # pretend token; server must cut at its first occurrence
    srv2 = SpeculativeDecodeServer(target, tparams, draft, dparams, k=2,
                                   max_batch=2, window=256, eos_id=eos)
    slot = srv2.submit(p, 12, seed=0)
    _drain(srv2)
    got = srv2.collect(slot)
    cut = want[:want.index(eos) + 1] if eos in want else want
    assert got == cut


def test_speculative_server_refuses_sampling_and_prefix():
    from minidiff_tpu.models import SpeculativeDecodeServer

    target, tparams, draft, dparams = _spec_models()
    with pytest.raises(AssertionError):
        SpeculativeDecodeServer(target, tparams, draft, dparams,
                                greedy=False, max_batch=2, window=256)
    srv = SpeculativeDecodeServer(target, tparams, draft, dparams, k=2,
                                  max_batch=2, window=256)
    with pytest.raises(AssertionError):
        srv.submit([1, 2], 4, prefix=0)
