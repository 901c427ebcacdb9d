"""Sliding-window attention + attention sinks (md.sdpa window=/sinks=).

Mistral-style banded causal attention with StreamingLLM sink tokens, as a
first-class argument of the sdpa op: composed VJPs in framework ops
(oracle-gradcheckable, higher-order capable), flash Pallas kernels with dead
blocks skipped (the O(S*W) FLOP story), and the model/decode paths threading
one (window, sinks) config.  No reference counterpart: /root/reference has
no attention op at all (SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import types

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (
    TransformerLM,
    generate,
    generate_cached,
    generate_compiled,
    lm_loss,
    make_train_step,
)
from minidiff_tpu.models.optim import SGD
from minidiff_tpu.utils import compute_grads


def _np_window_sdpa(q, k, v, scale=None, window=None, sinks=0):
    """Independent numpy oracle for causal banded attention."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    s = np.einsum("...qd,...kd->...qk", q, k).astype(np.float64) * scale
    sq, sk = s.shape[-2], s.shape[-1]
    rows = np.arange(sq)[:, None]
    cols = np.arange(sk)[None, :]
    keep = rows >= cols
    if window is not None:
        live = rows - cols < window
        if sinks:
            live = live | (cols < sinks)
        keep = keep & live
    s = np.where(keep, s, -1e30)
    s -= s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("...qk,...kd->...qd", p, v.astype(np.float64))


@pytest.mark.parametrize("window,sinks", [(3, 0), (3, 1), (5, 2), (1, 0)])
def test_windowed_sdpa_matches_numpy_oracle(backend, window, sinks):
    rng = np.random.RandomState(0)
    q = rng.randn(2, 2, 9, 4)
    k = rng.randn(2, 2, 9, 4)
    v = rng.randn(2, 2, 9, 4)
    out = md.sdpa(md.Tensor(q), md.Tensor(k), md.Tensor(v), causal=True,
                  window=window, sinks=sinks)
    ref = _np_window_sdpa(q, k, v, window=window, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out.detach()), ref,
                               rtol=1e-6, atol=1e-9)


def test_window_covering_everything_equals_plain_causal(backend):
    rng = np.random.RandomState(1)
    q, k, v = (md.Tensor(rng.randn(1, 2, 7, 4)) for _ in range(3))
    a = md.sdpa(q, k, v, causal=True, window=100, sinks=3)
    b = md.sdpa(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(a.detach()),
                               np.asarray(b.detach()), rtol=1e-12)


def test_window_requires_causal(backend):
    rng = np.random.RandomState(2)
    q, k, v = (md.Tensor(rng.randn(1, 2, 8, 4)) for _ in range(3))
    with pytest.raises(ValueError):
        md.sdpa(q, k, v, causal=False, window=3)


def test_windowed_sdpa_gradcheck(backend):
    rng = np.random.RandomState(3)
    q = md.Tensor(rng.randn(1, 2, 6, 4))
    k = md.Tensor(rng.randn(1, 2, 6, 4))
    v = md.Tensor(rng.randn(1, 2, 6, 4))
    fd, tape = compute_grads(
        q, k, v,
        func=lambda a, b, c: md.sum(
            md.sdpa(a, b, c, causal=True, window=3, sinks=1) ** 2))
    for man, auto in zip(fd, tape):
        np.testing.assert_allclose(np.asarray(man.detach()),
                                   np.asarray(auto.detach()),
                                   rtol=2e-3, atol=2e-4)


def test_windowed_sdpa_second_order(backend):
    """The banded mask is built from non-differentiable comparisons, so
    higher-order re-taping must flow through the composed VJPs."""
    rng = np.random.RandomState(4)
    q = md.Tensor(rng.randn(1, 1, 5, 4), allow_grad=True)
    k = md.Tensor(rng.randn(1, 1, 5, 4))
    v = md.Tensor(rng.randn(1, 1, 5, 4))
    out = md.sum(md.sdpa(q, k, v, causal=True, window=2) ** 2)
    out.backward(allow_higher_order=True)
    g = md.sum(q.grad ** 2)
    g.backward()
    assert q.grad is not None and np.isfinite(
        np.asarray(q.grad.detach())).all()


# ---------------------------------------------------------------------------
# flash kernels (interpret mode on CPU): band masking + dead-block skipping
# ---------------------------------------------------------------------------


@pytest.fixture
def _interpret(monkeypatch):
    import jax.experimental.pallas as realpl

    import minidiff_tpu.kernels.attention as A

    patched = types.SimpleNamespace(
        **{n: getattr(realpl, n) for n in dir(realpl) if not n.startswith("_")}
    )
    patched.pallas_call = functools.partial(realpl.pallas_call, interpret=True)
    monkeypatch.setattr(A, "pl", patched)
    md.set_backend("xla")
    yield A


@pytest.mark.parametrize("window,sinks", [(64, 0), (64, 8), (100, 3), (1, 0)])
def test_flash_band_kernels_match_composed(_interpret, window, sinks):
    import jax
    import jax.numpy as jnp

    A = _interpret
    rng = np.random.RandomState(0)
    B, S, D = 2, 256, 128
    q = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    scale = 1.0 / D ** 0.5

    o, lse = A._flash_fwd(q, k, v, scale, True, bq=128, bk=128,
                          window=window, sinks=sinks)
    ref = A._composed_sdpa(q, k, v, scale, True, window=window, sinks=sinks)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    dq, dk, dv = A._flash_bwd(q, k, v, o, lse, do, scale, True,
                              bq=128, bk=128, window=window, sinks=sinks)
    gq, gk, gv = jax.grad(
        lambda a, b, c: jnp.sum(
            A._composed_sdpa(a, b, c, scale, True, window=window,
                             sinks=sinks) * do),
        argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv),
                               rtol=2e-4, atol=2e-4)


def test_flash_dispatch_uses_band_kernel(_interpret, monkeypatch):
    """With the platform gate forced open and autotune off, a windowed
    256x128 shape must ride the flash path and still match composed."""
    import jax.numpy as jnp

    A = _interpret
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    monkeypatch.setenv("MINIDIFF_TPU_AUTOTUNE", "0")
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 256, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 256, 128)), jnp.float32)
    out = A.sdpa(q, k, v, causal=True, window=32, sinks=4)
    ref = A._composed_sdpa(q, k, v, 1.0 / np.sqrt(128), True,
                           window=32, sinks=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# model + decode paths
# ---------------------------------------------------------------------------


def _xla():
    md.set_backend("xla")


def test_windowed_lm_decode_parity():
    """eager == cached == compiled decode for a windowed+sinked model."""
    _xla()
    np.random.seed(0)
    m = TransformerLM(vocab_size=29, dim=16, num_heads=2, num_layers=2,
                      max_seq_len=64, window=6, sinks=2)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 29, size=(3, 12)))
    t_full = generate(m, p, prompt, 10, greedy=True)
    t_cached = generate_cached(m, p, prompt, 10)
    t_comp = generate_compiled(m, p, prompt, 10)
    np.testing.assert_array_equal(np.asarray(t_comp.detach()),
                                  np.asarray(t_full.detach()))
    np.testing.assert_array_equal(np.asarray(t_comp.detach()),
                                  np.asarray(t_cached.detach()))


def test_windowed_lm_differs_from_full_attention():
    _xla()
    np.random.seed(1)
    m_w = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                        max_seq_len=64, window=4)
    m_f = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=1,
                        max_seq_len=64)
    p = m_w.init()
    toks = md.Tensor(np.random.randint(1, 19, size=(2, 16)))
    lw = m_w.apply(p, toks)
    lf = m_f.apply(p, toks)
    assert not np.allclose(np.asarray(lw.detach()), np.asarray(lf.detach()))
    # ...but the first `window` positions see identical context
    np.testing.assert_allclose(np.asarray(lw.detach())[:, :4],
                               np.asarray(lf.detach())[:, :4], rtol=1e-10)


def test_windowed_lm_trains():
    _xla()
    np.random.seed(2)
    m = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=64, window=8, sinks=1)
    p = m.init()
    step = make_train_step(m, SGD(0.1), loss_fn=lm_loss)
    toks = md.Tensor(np.random.randint(1, 23, size=(4, 32)))
    st, losses = None, []
    for _ in range(10):
        p, st, loss = step(p, st, toks, toks)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


def test_windowed_lm_rope_gqa_decode_parity():
    """window composes with RoPE + grouped-query attention on every path."""
    _xla()
    np.random.seed(3)
    m = TransformerLM(vocab_size=17, dim=32, num_heads=4, num_kv_heads=2,
                      rope=True, num_layers=2, max_seq_len=64, window=5,
                      sinks=1)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 17, size=(2, 9)))
    t_full = generate(m, p, prompt, 8, greedy=True)
    t_comp = generate_compiled(m, p, prompt, 8)
    np.testing.assert_array_equal(np.asarray(t_comp.detach()),
                                  np.asarray(t_full.detach()))


def test_window_unsupported_paths_raise():
    _xla()
    np.random.seed(4)
    m = TransformerLM(vocab_size=11, dim=16, num_heads=2, num_layers=1,
                      max_seq_len=128, window=4)
    p = m.init()
    prompt = md.Tensor(np.random.randint(1, 11, size=(1, 4)))
    with pytest.raises(NotImplementedError):
        generate_compiled(m, p, prompt, 4, kv_quant=True)


def test_windowed_speculative_matches_target_greedy():
    """Speculative decoding (eager AND compiled) over a sliding-window +
    sinks target stays bit-identical to the target's own greedy decode —
    the verification chunk mask now carries the causal band."""
    _xla()
    np.random.seed(6)
    tgt = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=2,
                        max_seq_len=96, window=5, sinks=1)
    tp = tgt.init()
    drf = TransformerLM(vocab_size=23, dim=16, num_heads=2, num_layers=1,
                        max_seq_len=96, window=3)
    dp = drf.init()
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 7)))
    ref = generate(tgt, tp, prompt, 10, greedy=True)
    from minidiff_tpu.models.speculative import (
        generate_speculative, generate_speculative_compiled)

    eager = generate_speculative(tgt, tp, drf, dp, prompt, 10, k=3)
    np.testing.assert_array_equal(np.asarray(eager.detach()),
                                  np.asarray(ref.detach()))
    comp, _rounds = generate_speculative_compiled(tgt, tp, drf, dp,
                                                  prompt, 10, k=3)
    np.testing.assert_array_equal(np.asarray(comp.detach()),
                                  np.asarray(ref.detach()))


def test_windowed_server_matches_solo_decode():
    """Continuous batching serves sliding-window models: staggered
    requests through DecodeServer decode token-identical to running each
    alone through generate_compiled."""
    _xla()
    np.random.seed(7)
    m = TransformerLM(vocab_size=19, dim=16, num_heads=2, num_layers=2,
                      max_seq_len=256, window=6, sinks=2)
    p = m.init()
    from minidiff_tpu.models import DecodeServer

    srv = DecodeServer(m, p, max_batch=3, window=128)
    prompts = [list(np.random.randint(1, 19, size=n)) for n in (5, 9, 3)]
    budgets = [8, 6, 10]
    solo = []
    for pr, nb in zip(prompts, budgets):
        t = generate_compiled(m, p, md.Tensor(np.asarray([pr])), nb)
        solo.append(list(np.asarray(t.detach())[0, len(pr):]))
    slots = [srv.submit(prompts[0], budgets[0])]
    srv.step()
    slots.append(srv.submit(prompts[1], budgets[1]))  # staggered arrival
    srv.step()
    slots.append(srv.submit(prompts[2], budgets[2]))
    while srv.active():
        srv.step()
    got = [srv.collect(s) for s in slots]
    for g, ref in zip(got, solo):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))


def test_cross_backend_windowed_forward_parity():
    np.random.seed(5)
    toks_np = np.random.randint(1, 29, size=(2, 12))
    md.set_backend("numpy")
    m = TransformerLM(vocab_size=29, dim=16, num_heads=2, num_layers=2,
                      max_seq_len=64, window=6, sinks=2)
    p = m.init()
    out_np = m.apply(p, md.Tensor(toks_np))
    md.set_backend("xla")
    import jax

    p_x = jax.tree.map(lambda t: md.Tensor(np.asarray(t.detach())), p,
                       is_leaf=lambda t: isinstance(t, md.Tensor))
    out_x = m.apply(p_x, md.Tensor(toks_np))
    np.testing.assert_allclose(np.asarray(out_np.detach()),
                               np.asarray(out_x.detach()),
                               rtol=1e-8, atol=1e-10)
