"""sdpa op, flash-attention kernels, and the transformer model family."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as B
from minidiff_tpu.utils import compute_grads


def _np_sdpa(qn, kn, vn, causal=False, scale=None):
    if scale is None:
        scale = 1.0 / np.sqrt(qn.shape[-1])
    s = np.matmul(qn, np.swapaxes(kn, -1, -2)).astype(np.float64) * scale
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        mask = np.arange(sq)[:, None] >= np.arange(sk)[None, :]
        s = np.where(mask, s, -1e30)
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.matmul(p, vn.astype(np.float64))


@pytest.mark.parametrize("causal", [False, True])
def test_sdpa_forward_matches_reference(backend, causal):
    q, k, v = md.randn(2, 2, 4, 8), md.randn(2, 2, 4, 8), md.randn(2, 2, 4, 8)
    out = md.sdpa(q, k, v, causal=causal)
    qn, kn, vn = (np.asarray(B.as_numpy(t._data), np.float64) for t in (q, k, v))
    want = _np_sdpa(qn, kn, vn, causal)
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out._data), np.float64), want, rtol=1e-5, atol=1e-6
    )


def test_sdpa_3d_single_head(backend):
    q, k, v = md.randn(2, 4, 8), md.randn(2, 4, 8), md.randn(2, 4, 8)
    out = md.sdpa(q, k, v)
    assert out.shape == (2, 4, 8)
    qn, kn, vn = (np.asarray(B.as_numpy(t._data), np.float64) for t in (q, k, v))
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out._data), np.float64),
        _np_sdpa(qn, kn, vn),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_sdpa_gradcheck(backend, causal):
    q, k, v = md.randn(2, 2, 4, 8), md.randn(2, 2, 4, 8), md.randn(2, 2, 4, 8)
    manual, auto = compute_grads(
        q, k, v,
        func=lambda a, b, c: md.sum(md.sdpa(a, b, c, causal=causal) ** 2) / 2,
    )
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(B.as_numpy(m._data), np.float64),
            np.asarray(B.as_numpy(a._data), np.float64),
            rtol=1e-3,
            atol=1e-4,
        )


def test_sdpa_explicit_scale_gradcheck(backend):
    q, k, v = md.randn(1, 3, 4), md.randn(1, 3, 4), md.randn(1, 3, 4)
    manual, auto = compute_grads(
        q, k, v, func=lambda a, b, c: md.sum(md.sdpa(a, b, c, scale=0.25))
    )
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(B.as_numpy(m._data), np.float64),
            np.asarray(B.as_numpy(a._data), np.float64),
            rtol=1e-3,
            atol=1e-4,
        )


def test_sdpa_second_order(backend):
    q = md.randn(1, 3, 4).detach(allow_grad=True)
    k = md.randn(1, 3, 4).detach(allow_grad=True)
    v = md.randn(1, 3, 4).detach(allow_grad=True)
    out = md.sum(md.sdpa(q, k, v) ** 2)
    out.backward(allow_higher_order=True)
    g = q.grad
    md.sum(g * g).backward()
    assert q.grad.shape == q.shape
    assert np.all(np.isfinite(np.asarray(B.as_numpy(q.grad._data))))


# ---------------------------------------------------------------------------
# flash kernels (interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.fixture()
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    yield


@pytest.mark.parametrize("causal", [False, True])
def test_flash_fwd_bwd_match_composed(_interpret, causal):
    from minidiff_tpu.kernels import attention as A

    rng = np.random.RandomState(0)
    bh, s, d = 3, 256, 128
    q = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    do = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    o, lse = A._flash_fwd(q, k, v, scale, causal, bq=128, bk=128)
    ref = A._composed_sdpa(q, k, v, scale, causal)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def loss(q, k, v):
        return jnp.sum(A._composed_sdpa(q, k, v, scale, causal) * do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = A._flash_bwd(q, k, v, o, lse, do, scale, causal, bq=128, bk=128)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), rtol=1e-3, atol=5e-3)


def test_tape_backward_uses_fused_flash_grads(_interpret, monkeypatch):
    """The TAPE's first-order sdpa backward must dispatch to the fused flash
    backward (kernels/attention.flash_grads) and match the composed grads —
    this is the path the flagship train step takes on TPU."""
    from minidiff_tpu.kernels import attention as A
    from minidiff_tpu.ops import definitions as D

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    s, d = 256, 128
    # pin the autotuner decision so no device race runs on CPU
    monkeypatch.setitem(
        A._attn_cache,
        A._attn_key(4, s, s, d, jnp.dtype(jnp.float32), True),
        ((128, 128), (128, 128)),
    )

    rng = np.random.RandomState(0)
    q = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    k = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    v = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)

    calls = {"n": 0}
    real = A.flash_grads

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(A, "flash_grads", counting)

    out = md.sdpa(q, k, v, causal=True)
    md.sum(out).backward()
    assert calls["n"] == 1, "fused path must run exactly once for all 3 grads"
    fused = [np.asarray(t.grad.detach()) for t in (q, k, v)]

    # composed reference: same tape backward with the fused path disabled
    monkeypatch.setattr(D, "_sdpa_fused", lambda *a, **kw: None)
    q2 = q.detach(allow_grad=True)
    k2 = k.detach(allow_grad=True)
    v2 = v.detach(allow_grad=True)
    md.sum(md.sdpa(q2, k2, v2, causal=True)).backward()
    for g_fused, t in zip(fused, (q2, k2, v2)):
        np.testing.assert_allclose(
            g_fused, np.asarray(t.grad.detach()), rtol=1e-3, atol=5e-3
        )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_masked_fwd_bwd_match_composed(_interpret, causal):
    """Key-padding masks ride INTO the flash kernels: fwd/bwd with a (B, Sk)
    mask folded across h heads must match the composed dense-mask path."""
    from minidiff_tpu.kernels import attention as A

    rng = np.random.RandomState(7)
    b, h, s, d = 2, 2, 256, 128
    bh = b * h
    q = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    do = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    # batch 0 attends to the first 160 keys, batch 1 to the first 250
    kvm = np.zeros((b, s), np.int32)
    kvm[0, :160] = 1
    kvm[1, :250] = 1
    kvm = jnp.asarray(kvm)
    # equivalent dense mask on the flattened (bh, s, s) score shape
    dense = jnp.repeat(kvm.astype(bool), h, axis=0)[:, None, :]

    o, lse = A._flash_fwd(q, k, v, scale, causal, bq=128, bk=128,
                          mask=kvm, h=h)
    ref = A._composed_sdpa(q, k, v, scale, causal, mask=dense)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def loss(q, k, v):
        return jnp.sum(A._composed_sdpa(q, k, v, scale, causal,
                                        mask=dense) * do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = A._flash_bwd(q, k, v, o, lse, do, scale, causal,
                              bq=128, bk=128, mask=kvm, h=h)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), rtol=1e-3, atol=5e-3)


def test_kv_mask_normalization():
    from minidiff_tpu.kernels import attention as A

    b, sk = 3, 256
    # qualifying shapes normalize to (B, Sk)
    for shape in [(sk,), (1, sk), (1, 1, sk), (b, 1, sk), (1, 1, 1, sk),
                  (b, 1, 1, sk)]:
        m = np.ones(shape, bool)
        out = A._as_kv_mask(m, b, sk)
        assert out is not None and out.shape == (b, sk), shape
        assert A._kv_mask_shape_ok(shape, b, sk)
    # non-key-padding shapes are rejected
    for shape in [(2, sk), (b, sk, sk), (b, 2, 1, sk), (1, 1, sk, sk),
                  (sk - 1,), ()]:
        m = np.ones(shape, bool)
        assert A._as_kv_mask(m, b, sk) is None, shape
        assert not A._kv_mask_shape_ok(shape, b, sk)


def test_tape_backward_fused_with_padding_mask(_interpret, monkeypatch):
    """A key-padding mask must keep the tape's sdpa on the FUSED flash path
    (forward + fused backward), matching the composed masked grads."""
    from minidiff_tpu.kernels import attention as A
    from minidiff_tpu.ops import definitions as D

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    s, d = 256, 128
    monkeypatch.setitem(
        A._attn_cache,
        A._attn_key(4, s, s, d, jnp.dtype(jnp.float32), False),
        ((128, 128), (128, 128)),
    )

    rng = np.random.RandomState(3)
    q = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    k = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    v = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    maskn = np.zeros((2, 1, 1, s), bool)
    maskn[0, ..., :128] = True
    maskn[1, ..., :200] = True
    mask = jnp.asarray(maskn)

    calls = {"n": 0}
    real = A.flash_grads

    def counting(*a, **kw):
        calls["n"] += 1
        assert kw.get("mask") is mask, "raw mask must reach flash_grads"
        return real(*a, **kw)

    monkeypatch.setattr(A, "flash_grads", counting)

    out = md.sdpa(q, k, v, mask=mask)
    md.sum(out).backward()
    assert calls["n"] == 1, "fused path must serve the masked backward"
    fused = [np.asarray(t.grad.detach()) for t in (q, k, v)]

    # composed reference: fused path disabled, flash fwd disabled
    monkeypatch.setattr(D, "_sdpa_fused", lambda *a, **kw: None)
    monkeypatch.setattr(A, "_pallas_enabled", lambda: False)
    q2 = q.detach(allow_grad=True)
    k2 = k.detach(allow_grad=True)
    v2 = v.detach(allow_grad=True)
    md.sum(md.sdpa(q2, k2, v2, mask=mask)).backward()
    for g_fused, t in zip(fused, (q2, k2, v2)):
        np.testing.assert_allclose(
            g_fused, np.asarray(t.grad.detach()), rtol=1e-3, atol=5e-3
        )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_ragged_lengths_pad_and_match(_interpret, monkeypatch, causal):
    """Ragged (non-128-multiple) sequence lengths ride the flash path via
    zero-padding + key masking; fwd AND tape bwd must match composed."""
    from minidiff_tpu.kernels import attention as A
    from minidiff_tpu.ops import definitions as D

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    b, h, s, sk, d = 2, 2, 300, 200, 128
    monkeypatch.setitem(
        A._attn_cache,
        A._attn_key(b * h, s, sk, d, jnp.dtype(jnp.float32), causal),
        ((128, 128), (128, 128)),
    )

    rng = np.random.RandomState(5)
    q = md.Tensor(rng.randn(b, h, s, d).astype(np.float32), allow_grad=True)
    k = md.Tensor(rng.randn(b, h, sk, d).astype(np.float32), allow_grad=True)
    v = md.Tensor(rng.randn(b, h, sk, d).astype(np.float32), allow_grad=True)

    calls = {"n": 0}
    real = A.flash_grads

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(A, "flash_grads", counting)
    out = md.sdpa(q, k, v, causal=causal)
    md.sum(out).backward()
    assert out.shape == (b, h, s, d)
    assert calls["n"] == 1, "ragged shape must take the fused backward"
    fused_out = np.asarray(out.detach())
    fused = [np.asarray(t.grad.detach()) for t in (q, k, v)]

    # composed reference with flash disabled
    monkeypatch.setattr(D, "_sdpa_fused", lambda *a, **kw: None)
    monkeypatch.setattr(A, "_pallas_enabled", lambda: False)
    q2 = q.detach(allow_grad=True)
    k2 = k.detach(allow_grad=True)
    v2 = v.detach(allow_grad=True)
    out2 = md.sdpa(q2, k2, v2, causal=causal)
    md.sum(out2).backward()
    np.testing.assert_allclose(
        fused_out, np.asarray(out2.detach()), rtol=1e-4, atol=1e-5)
    for g_fused, t in zip(fused, (q2, k2, v2)):
        np.testing.assert_allclose(
            g_fused, np.asarray(t.grad.detach()), rtol=1e-3, atol=5e-3)


def test_flash_ragged_with_user_mask(_interpret, monkeypatch):
    """Ragged lengths AND a user key-padding mask compose: both ride the
    kernels' single (B, Sk_pad) mask row."""
    from minidiff_tpu.kernels import attention as A

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    b, h, s, sk, d = 2, 1, 130, 250, 128
    monkeypatch.setitem(
        A._attn_cache,
        A._attn_key(b * h, s, sk, d, jnp.dtype(jnp.float32), False),
        ((128, 128), (128, 128)),
    )
    rng = np.random.RandomState(9)
    q = md.Tensor(rng.randn(b, h, s, d).astype(np.float32), allow_grad=True)
    k = md.Tensor(rng.randn(b, h, sk, d).astype(np.float32), allow_grad=True)
    v = md.Tensor(rng.randn(b, h, sk, d).astype(np.float32), allow_grad=True)
    maskn = np.zeros((b, 1, 1, sk), bool)
    maskn[0, ..., :100] = True
    maskn[1, ..., :250] = True
    mask = jnp.asarray(maskn)

    out = md.sdpa(q, k, v, mask=mask)
    md.sum(out).backward()
    gk = np.asarray(k.grad.detach())
    assert abs(gk[0, :, 100:, :]).max() == 0.0, "masked keys must get 0 grad"

    monkeypatch.setattr(A, "_pallas_enabled", lambda: False)
    q2 = q.detach(allow_grad=True)
    k2 = k.detach(allow_grad=True)
    v2 = v.detach(allow_grad=True)
    out2 = md.sdpa(q2, k2, v2, mask=mask)
    np.testing.assert_allclose(
        np.asarray(out.detach()), np.asarray(out2.detach()),
        rtol=1e-4, atol=1e-5)
    md.sum(out2).backward()
    np.testing.assert_allclose(
        np.asarray(q.grad.detach()), np.asarray(q2.grad.detach()),
        rtol=1e-3, atol=5e-3)


def test_flash_grads_masked_stash_miss_recompute(_interpret):
    """On a residual-stash miss the masked fused backward recomputes via
    jax.vjp through the masked flash forward — cover the custom_vjp path."""
    from minidiff_tpu.kernels import attention as A

    rng = np.random.RandomState(11)
    b, h, s, d = 1, 2, 256, 128
    q = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    do = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    maskn = np.zeros((b, 1, 1, s), bool)
    maskn[..., :192] = True
    mask = jnp.asarray(maskn)
    A._residual_stash.clear()
    scale = 1.0 / np.sqrt(d)
    dq, dk, dv = A.flash_grads(q, k, v, do, scale, False, mask=mask)

    dense = jnp.broadcast_to(mask, (b, 1, s, s)).reshape(b, 1, s, s)

    def loss(q, k, v):
        return jnp.sum(A._composed_sdpa(q, k, v, scale, False,
                                        mask=dense) * do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv), rtol=1e-3, atol=5e-3)


def test_sdpa_higher_order_stays_composed(_interpret, monkeypatch):
    """allow_higher_order backward must NOT take the fused kernel path (it
    has no tape); the composed grads re-tape so second order works."""
    from minidiff_tpu.kernels import attention as A

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)

    def boom(*a, **kw):  # pragma: no cover - must not run
        raise AssertionError("fused flash grads used under higher-order")

    monkeypatch.setattr(A, "flash_grads", boom)
    rng = np.random.RandomState(1)
    q = md.Tensor(rng.randn(1, 1, 256, 128).astype(np.float32),
                  allow_grad=True)
    k = md.Tensor(rng.randn(1, 1, 256, 128).astype(np.float32),
                  allow_grad=True)
    v = md.Tensor(rng.randn(1, 1, 256, 128).astype(np.float32),
                  allow_grad=True)
    out = md.sum(md.sdpa(q, k, v, causal=True))
    out.backward(allow_higher_order=True)
    g = md.sum(q.grad)
    g.backward()
    assert q.grad is not None


def test_flash_eligibility_rules():
    from minidiff_tpu.kernels import attention as A

    good = jnp.zeros((2, 4, 256, 128), jnp.bfloat16)
    # platform gate: on CPU nothing is eligible
    import minidiff_tpu.kernels.matmul as mmod

    if jax.default_backend() != "tpu":
        assert not A._flash_eligible(good, good, good)
    # shape gates (checked with the platform gate forced open)
    orig = A._pallas_enabled
    try:
        A._pallas_enabled = lambda: True
        assert A._flash_eligible(good, good, good)
        # ragged lengths are eligible (they pad to 128-multiples)
        assert A._flash_eligible(*(jnp.zeros((2, 4, 250, 128), jnp.bfloat16),) * 3)
        assert not A._flash_eligible(*(jnp.zeros((2, 4, 256, 64), jnp.bfloat16),) * 3)
        assert not A._flash_eligible(*(jnp.zeros((2, 4, 256, 128), jnp.float64),) * 3)
    finally:
        A._pallas_enabled = orig


# ---------------------------------------------------------------------------
# transformer model family
# ---------------------------------------------------------------------------


def test_layernorm_matches_numpy(backend):
    from minidiff_tpu.models import LayerNorm

    ln = LayerNorm(8)
    params = ln.init()
    x = md.randn(3, 5, 8)
    out = ln.apply(params, x)
    xn = np.asarray(B.as_numpy(x._data), np.float64)
    mu = xn.mean(-1, keepdims=True)
    var = xn.var(-1, keepdims=True)
    want = (xn - mu) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out._data), np.float64), want, rtol=1e-4, atol=1e-5
    )


def test_mha_shapes_and_grads(backend):
    from minidiff_tpu.models import MultiHeadAttention

    mha = MultiHeadAttention(16, 4, causal=True)
    params = mha.init()
    x = md.randn(2, 6, 16).detach(allow_grad=True)
    out = mha.apply(params, x)
    assert out.shape == (2, 6, 16)
    md.sum(out**2).backward()
    assert x.grad is not None and x.grad.shape == x.shape
    assert params["qkv"]["w"].grad is not None


def test_transformer_lm_trains():
    from minidiff_tpu.models import (
        Adam,
        TransformerLM,
        lm_loss,
        make_train_step,
        synthetic_lm_batches,
    )

    md.set_backend("xla")
    model = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                          max_seq_len=16)
    params = model.init()
    opt = Adam(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, loss_fn=lm_loss)
    losses = []
    for x, y in synthetic_lm_batches(4, 8, 32, 12):
        params, opt_state, loss = step(params, opt_state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses


def test_transformer_causality():
    """Changing a future token must not change past logits."""
    from minidiff_tpu.models import TransformerLM

    md.set_backend("xla")
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=8)
    params = model.init()
    toks = np.array([[1, 2, 3, 4]])
    toks2 = toks.copy()
    toks2[0, -1] = 9  # mutate only the last position
    l1 = np.asarray(B.as_numpy(model.apply(params, md.Tensor(toks))._data))
    l2 = np.asarray(B.as_numpy(model.apply(params, md.Tensor(toks2))._data))
    np.testing.assert_allclose(l1[0, :-1], l2[0, :-1], rtol=1e-5, atol=1e-6)
    assert np.abs(l1[0, -1] - l2[0, -1]).max() > 1e-3


def test_generate_greedy_extends_prompt():
    from minidiff_tpu.models import TransformerLM, generate

    md.set_backend("xla")
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=8)
    params = model.init()
    prompt = md.Tensor(np.array([[1, 2, 3]]))
    out = generate(model, params, prompt, max_new_tokens=4)
    assert out.shape == (1, 7)
    arr = np.asarray(B.as_numpy(out._data))
    np.testing.assert_array_equal(arr[0, :3], [1, 2, 3])
    assert ((arr >= 0) & (arr < 16)).all()
    # greedy decode is deterministic
    out2 = generate(model, params, prompt, max_new_tokens=4)
    np.testing.assert_array_equal(arr, np.asarray(B.as_numpy(out2._data)))
    # window clipping at max_seq_len doesn't crash
    long_prompt = md.Tensor(np.ones((1, 8), dtype=np.int64))
    out3 = generate(model, params, long_prompt, max_new_tokens=3)
    assert out3.shape == (1, 11)


def test_kv_cached_generate_matches_full_recompute():
    from minidiff_tpu.models import TransformerLM, generate, generate_cached

    md.set_backend("xla")
    np.random.seed(0)
    model = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                          max_seq_len=16)
    params = model.init()
    prompt = md.Tensor(np.array([[1, 5, 9], [3, 3, 2]]))
    full = np.asarray(B.as_numpy(
        generate(model, params, prompt, max_new_tokens=6)._data))
    cached = np.asarray(B.as_numpy(
        generate_cached(model, params, prompt, max_new_tokens=6)._data))
    np.testing.assert_array_equal(full, cached)


def test_dropout_semantics(backend):
    from minidiff_tpu.models.functional import dropout

    x = md.Tensor(np.ones((64, 64)), allow_grad=True)
    y = dropout(x, 0.5, key=0)
    md.sum(y).backward()
    kept = float(md.sum((y != 0).astype(md.float32)).item()) / y.size
    assert 0.35 < kept < 0.65, kept
    # inverted scaling: surviving entries are 1/(1-rate)
    vals = set(np.round(np.unique(np.asarray(B.as_numpy(y._data))), 6))
    assert vals <= {0.0, 2.0}, vals
    # grads masked identically
    g = np.asarray(B.as_numpy(x.grad._data))
    assert set(np.round(np.unique(g), 6)) <= {0.0, 2.0}
    # deterministic key -> same mask; deterministic flag -> identity
    y2 = dropout(md.Tensor(np.ones((64, 64))), 0.5, key=0)
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(y._data)), np.asarray(B.as_numpy(y2._data))
    )
    x3 = md.Tensor(np.ones((4, 4)))
    assert dropout(x3, 0.5, deterministic=True) is x3


def test_generate_sampling_temperature_topk():
    from minidiff_tpu.models import TransformerLM, generate

    md.set_backend("xla")
    md.seed(0)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=8)
    params = model.init()
    prompt = md.Tensor(np.array([[1, 2]]))
    out = generate(model, params, prompt, 4, greedy=False,
                   temperature=0.8, top_k=3)
    arr = np.asarray(B.as_numpy(out._data))
    assert arr.shape == (1, 6) and ((arr >= 0) & (arr < 16)).all()
    # top_k=1 sampling degenerates to greedy
    g = generate(model, params, prompt, 4)
    s = generate(model, params, prompt, 4, greedy=False, top_k=1)
    np.testing.assert_array_equal(
        np.asarray(B.as_numpy(g._data)), np.asarray(B.as_numpy(s._data))
    )


def test_sdpa_cross_attention_and_mask(backend):
    # cross attention: Sq != Sk
    q = md.randn(2, 2, 3, 8)
    k = md.randn(2, 2, 5, 8)
    v = md.randn(2, 2, 5, 8)
    out = md.sdpa(q, k, v)
    assert out.shape == (2, 2, 3, 8)
    qn, kn, vn = (np.asarray(B.as_numpy(t._data), np.float64) for t in (q, k, v))
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out._data), np.float64),
        _np_sdpa(qn, kn, vn), rtol=1e-5, atol=1e-6)

    # padding mask: keys 3,4 masked out == attending over keys 0..2 only
    maskn = np.zeros((1, 1, 1, 5), bool)
    maskn[..., :3] = True
    out_m = md.sdpa(q, k, v, mask=md.Tensor(maskn))
    want = _np_sdpa(qn, kn[:, :, :3], vn[:, :, :3])
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out_m._data), np.float64), want,
        rtol=1e-5, atol=1e-6)

    # gradcheck through the masked path
    manual, auto = compute_grads(
        q, k, v,
        func=lambda a, b, c: md.sum(
            md.sdpa(a, b, c, mask=md.Tensor(maskn)) ** 2) / 2,
    )
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(B.as_numpy(m._data), np.float64),
            np.asarray(B.as_numpy(a._data), np.float64),
            rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# sequence packing: segment_ids (cited semantics: queries attend keys only
# within the same document id; no reference counterpart — /root/reference
# has no attention op at all)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [False, True])
def test_sdpa_segment_ids_matches_manual_mask(backend, causal):
    # packed row == dense same-document mask, on every backend
    q, k, v = md.randn(2, 2, 6, 8), md.randn(2, 2, 6, 8), md.randn(2, 2, 6, 8)
    seg = np.asarray([[0, 0, 1, 1, 1, 2], [0, 1, 1, 1, 2, 2]])
    out = md.sdpa(q, k, v, causal=causal, segment_ids=seg)
    dense = (seg[:, None, :, None] == seg[:, None, None, :])
    want = md.sdpa(q, k, v, causal=causal, mask=dense)
    np.testing.assert_allclose(
        np.asarray(B.as_numpy(out._data), np.float64),
        np.asarray(B.as_numpy(want._data), np.float64),
        rtol=1e-6, atol=1e-7)


def test_sdpa_segment_packing_equals_separate_docs(backend):
    # THE packing contract: two documents packed into one row produce the
    # same attention outputs as running each document alone
    rng = np.random.RandomState(3)
    d1, d2, hd = 3, 4, 8
    qa = rng.randn(1, 2, d1, hd)
    qb = rng.randn(1, 2, d2, hd)
    ka, kb = rng.randn(1, 2, d1, hd), rng.randn(1, 2, d2, hd)
    va, vb = rng.randn(1, 2, d1, hd), rng.randn(1, 2, d2, hd)
    scale = 1.0 / np.sqrt(hd)
    packed = md.sdpa(
        md.Tensor(np.concatenate([qa, qb], axis=2)),
        md.Tensor(np.concatenate([ka, kb], axis=2)),
        md.Tensor(np.concatenate([va, vb], axis=2)),
        causal=True, scale=scale,
        segment_ids=np.asarray([0] * d1 + [1] * d2))
    oa = md.sdpa(md.Tensor(qa), md.Tensor(ka), md.Tensor(va), causal=True,
                 scale=scale)
    ob = md.sdpa(md.Tensor(qb), md.Tensor(kb), md.Tensor(vb), causal=True,
                 scale=scale)
    got = np.asarray(B.as_numpy(packed._data), np.float64)
    np.testing.assert_allclose(
        got[:, :, :d1], np.asarray(B.as_numpy(oa._data), np.float64),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        got[:, :, d1:], np.asarray(B.as_numpy(ob._data), np.float64),
        rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("causal", [False, True])
def test_sdpa_segment_gradcheck(backend, causal):
    q, k, v = md.randn(2, 2, 5, 8), md.randn(2, 2, 5, 8), md.randn(2, 2, 5, 8)
    seg = np.asarray([[0, 0, 0, 1, 1], [0, 1, 1, 2, 2]])
    manual, auto = compute_grads(
        q, k, v,
        func=lambda a, b, c: md.sum(
            md.sdpa(a, b, c, causal=causal, segment_ids=seg) ** 2) / 2,
    )
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(B.as_numpy(m._data), np.float64),
            np.asarray(B.as_numpy(a._data), np.float64),
            rtol=1e-3, atol=1e-4)


def test_sdpa_segment_requires_equal_lengths(backend):
    q, k, v = md.randn(1, 2, 4, 8), md.randn(1, 2, 6, 8), md.randn(1, 2, 6, 8)
    with pytest.raises(ValueError, match="segment_ids"):
        md.sdpa(q, k, v, segment_ids=np.zeros(4, np.int32))


@pytest.mark.parametrize("causal", [False, True])
def test_flash_segment_fwd_bwd_match_composed(_interpret, causal):
    """Segment-id rows ride INTO the flash kernels (never a dense (S, S)
    mask in HBM): fwd/bwd must match the composed dense-seg-mask path."""
    from minidiff_tpu.kernels import attention as A

    rng = np.random.RandomState(0)
    b, h, s, d = 2, 2, 256, 128
    bh = b * h
    q = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    do = jnp.asarray(rng.randn(bh, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    # uneven documents, different per batch row, crossing block boundaries
    segn = np.stack([
        np.concatenate([np.zeros(100), np.ones(60), np.full(96, 2)]),
        np.concatenate([np.zeros(17), np.ones(239)]),
    ]).astype(np.int32)
    seg = jnp.asarray(segn)                       # (B, S)
    dense = jnp.asarray(
        np.repeat(segn[:, :, None] == segn[:, None, :], h, axis=0))

    o, lse = A._flash_fwd(q, k, v, scale, causal, bq=128, bk=128,
                          seg=seg, h=h)
    ref = A._composed_sdpa(q, k, v, scale, causal, mask=dense)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def loss(q, k, v):
        return jnp.sum(A._composed_sdpa(q, k, v, scale, causal,
                                        mask=dense) * do)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = A._flash_bwd(q, k, v, o, lse, do, scale, causal,
                              bq=128, bk=128, seg=seg, h=h)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(gq),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(gk),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(gv),
                               rtol=1e-3, atol=5e-3)


def test_tape_backward_fused_with_segment_ids(_interpret, monkeypatch):
    """The tape's first-order sdpa backward dispatches to the fused flash
    backward WITH segment ids, and matches the composed grads."""
    from minidiff_tpu.kernels import attention as A
    from minidiff_tpu.ops import definitions as D

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    s, d = 256, 128
    monkeypatch.setitem(
        A._attn_cache,
        A._attn_key(4, s, s, d, jnp.dtype(jnp.float32), True, packed=True),
        ((128, 128), (128, 128)),
    )
    rng = np.random.RandomState(1)
    segn = np.stack([
        np.concatenate([np.zeros(128), np.ones(128)]),
        np.concatenate([np.zeros(50), np.ones(206)]),
    ]).astype(np.int32)
    q = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    k = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)
    v = md.Tensor(rng.randn(2, 2, s, d).astype(np.float32), allow_grad=True)

    calls = {"n": 0}
    real = A.flash_grads

    def counting(*a, **kw):
        calls["n"] += 1
        assert kw.get("segment_ids") is not None
        return real(*a, **kw)

    monkeypatch.setattr(A, "flash_grads", counting)
    out = md.sdpa(q, k, v, causal=True, segment_ids=segn)
    md.sum(out).backward()
    assert calls["n"] == 1, "fused path must run exactly once for all 3 grads"
    fused = [np.asarray(t.grad.detach()) for t in (q, k, v)]

    monkeypatch.setattr(D, "_sdpa_fused", lambda *a, **kw: None)
    q2 = q.detach(allow_grad=True)
    k2 = k.detach(allow_grad=True)
    v2 = v.detach(allow_grad=True)
    md.sum(md.sdpa(q2, k2, v2, causal=True, segment_ids=segn)).backward()
    for g_fused, t in zip(fused, (q2, k2, v2)):
        np.testing.assert_allclose(
            g_fused, np.asarray(t.grad.detach()), rtol=1e-3, atol=5e-3)


def test_flash_segment_ragged_padding(_interpret, monkeypatch):
    """Ragged packed rows: S=200 pads to 256 with seg id -1 — padded keys
    must be invisible to real queries and the sliced outputs must match the
    composed real-shape path."""
    from minidiff_tpu.kernels import attention as A

    md.set_backend("xla")
    monkeypatch.setattr(A, "_pallas_enabled", lambda: True)
    s, d = 200, 128
    monkeypatch.setitem(
        A._attn_cache,
        A._attn_key(2, s, s, d, jnp.dtype(jnp.float32), True, packed=True),
        ((128, 128), (128, 128)),
    )
    rng = np.random.RandomState(2)
    segn = np.concatenate([np.zeros(77), np.ones(123)]).astype(np.int32)
    q = md.Tensor(rng.randn(1, 2, s, d).astype(np.float32), allow_grad=True)
    k = md.Tensor(rng.randn(1, 2, s, d).astype(np.float32), allow_grad=True)
    v = md.Tensor(rng.randn(1, 2, s, d).astype(np.float32), allow_grad=True)
    out = md.sdpa(q, k, v, causal=True, segment_ids=segn)
    md.sum(out).backward()

    from minidiff_tpu.ops import definitions as D

    monkeypatch.setattr(D, "_sdpa_fused", lambda *a, **kw: None)
    monkeypatch.setattr(A, "_flash_eligible", lambda *a: False)
    q2 = q.detach(allow_grad=True)
    k2 = k.detach(allow_grad=True)
    v2 = v.detach(allow_grad=True)
    want = md.sdpa(q2, k2, v2, causal=True, segment_ids=segn)
    md.sum(want).backward()
    np.testing.assert_allclose(np.asarray(out.detach()),
                               np.asarray(want.detach()),
                               rtol=1e-4, atol=1e-5)
    for a, b_ in ((q, q2), (k, k2), (v, v2)):
        np.testing.assert_allclose(np.asarray(a.grad.detach()),
                                   np.asarray(b_.grad.detach()),
                                   rtol=1e-3, atol=5e-3)
