"""Weight-only int8 quantization: op, kernel, and serving-path tests.

No reference counterpart (/root/reference has no serving or quantization
layer); extends SURVEY §8's serving row.  Covers:
* quantize_int8 semantics + round-trip error bound (all backends)
* md.dequant_matmul forward vs explicit dequantize-then-matmul, batch dims
* gradient wrt x against the finite-difference oracle (q/s excluded)
* the Pallas kernel (interpret mode) against the jnp fallback
* quantize_for_serving tree rewriting (what is / is not quantized)
* quantized TransformerLM: eager generate == compiled generate token-for-
  token, logits close to full precision, bytes actually shrink
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models.quant import quantize_int8 as quantize_int8_t
from minidiff_tpu.utils import compute_grads


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


# ---------------------------------------------------------------------------
# quantize_int8 semantics
# ---------------------------------------------------------------------------


def test_quantize_int8_roundtrip_error_bound(backend):
    w = md.Tensor(np.random.randn(96, 64))
    q, s = quantize_int8_t(w)
    assert str(q.dtype).endswith("int8")
    assert q.shape == (96, 64) and s.shape == (64,)
    deq = _np(q).astype(np.float64) * _np(s)
    # symmetric per-column: error <= s/2 per element = amax/254
    amax = np.max(np.abs(_np(w)), axis=0)
    assert (np.abs(deq - _np(w)) <= amax / 254 + 1e-12).all()


def test_quantize_int8_zero_column_guard(backend):
    w_np = np.random.randn(32, 8)
    w_np[:, 3] = 0.0
    q, s = quantize_int8_t(md.Tensor(w_np))
    assert (_np(q)[:, 3] == 0).all()
    assert _np(s)[3] == 1.0  # not 0/0


def test_quantize_int8_rejects_non_2d(backend):
    with pytest.raises(ValueError):
        quantize_int8_t(md.Tensor(np.random.randn(4, 4, 4)))


# ---------------------------------------------------------------------------
# md.dequant_matmul
# ---------------------------------------------------------------------------


def test_dequant_matmul_matches_explicit_dequant(backend):
    x = md.Tensor(np.random.randn(6, 128))
    w = md.Tensor(np.random.randn(128, 256))
    q, s = quantize_int8_t(w)
    got = md.dequant_matmul(x, q, s)
    want = _np(x) @ (_np(q).astype(np.float64) * _np(s))
    np.testing.assert_allclose(_np(got), want, rtol=1e-5, atol=1e-6)


def test_dequant_matmul_batch_dims(backend):
    x = md.Tensor(np.random.randn(2, 3, 64))
    w = md.Tensor(np.random.randn(64, 128))
    q, s = quantize_int8_t(w)
    got = md.dequant_matmul(x, q, s)
    assert got.shape == (2, 3, 128)
    want = _np(x) @ (_np(q).astype(np.float64) * _np(s))
    np.testing.assert_allclose(_np(got), want, rtol=1e-5, atol=1e-6)


def test_dequant_matmul_shape_validation(backend):
    x = md.Tensor(np.random.randn(4, 32))
    w = md.Tensor(np.random.randn(64, 128))
    q, s = quantize_int8_t(w)
    with pytest.raises(ValueError):
        md.dequant_matmul(x, q, s)


def test_dequant_matmul_grad_x_vs_oracle(backend):
    x = md.Tensor(np.random.randn(4, 128), allow_grad=True)
    w = md.Tensor(np.random.randn(128, 256))
    q, s = quantize_int8_t(w)
    manual, auto = compute_grads(
        x, q, s,
        func=lambda a, b, c: md.sum(md.tanh(md.dequant_matmul(a, b, c))),
        exclude=(q, s),
    )
    np.testing.assert_allclose(
        _np(manual[0]), _np(auto[0]), rtol=1e-4, atol=1e-6)


def test_dequant_matmul_bf16_grad_dtype(backend):
    # regression: the VJP used to compute grad*s in promoted f32 and cast q
    # to grad.dtype — torch rejected the mixed-dtype matmul outright, and
    # numpy/xla silently handed an f32 cotangent to a bf16 parameter.  The
    # cotangent must come back in x's own dtype on every backend.
    x = md.Tensor(np.random.randn(4, 128)).astype(md.bfloat16)
    x = x.detach(allow_grad=True)
    w = md.Tensor(np.random.randn(128, 256))
    q, s = quantize_int8_t(w)
    out = md.sum(md.dequant_matmul(x, q, s).astype(md.float32))
    out.backward(retain_grads=True)
    assert x.grad is not None
    assert x.grad.dtype == x.dtype
    # and the values agree with the explicit dequantized matmul's grad
    want = _np(s).astype(np.float64) * _np(q).astype(np.float64)
    want = want.sum(axis=1)  # d sum(x@W)/dx row = col-sums of W^T… = (K,)
    got = _np(x.grad).astype(np.float64)
    np.testing.assert_allclose(got, np.broadcast_to(want, got.shape),
                               rtol=2e-2, atol=2e-2)


def test_dequant_matmul_no_grad_to_weights(backend):
    x = md.Tensor(np.random.randn(4, 128), allow_grad=True)
    w = md.Tensor(np.random.randn(128, 256))
    q, s = quantize_int8_t(w)
    q = q.detach(allow_grad=True)
    s = s.detach(allow_grad=True)
    out = md.sum(md.dequant_matmul(x, q, s))
    out.backward(retain_grads=True)
    assert x.grad is not None
    assert q.grad is None and s.grad is None


def test_dequant_matmul_under_jit():
    md.set_backend("xla")
    x_np = np.random.randn(4, 128)
    w = md.Tensor(np.random.randn(128, 256))
    q, s = quantize_int8_t(w)

    vag = md.value_and_grad(
        lambda a: md.sum(md.tanh(md.dequant_matmul(a, q, s))))
    jitted = md.jit(vag)
    x = md.Tensor(x_np, allow_grad=True)
    out_j, g_j = jitted(x)
    out_e, g_e = vag(x)
    np.testing.assert_allclose(_np(g_j), _np(g_e), rtol=1e-6, atol=1e-8)
    assert len(jitted._cache) == 1


# ---------------------------------------------------------------------------
# Pallas kernel (interpret mode) vs jnp fallback
# ---------------------------------------------------------------------------


def _interpret_pallas(monkeypatch):
    import functools
    from jax.experimental import pallas as pl

    original = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(original, interpret=True))


@pytest.mark.parametrize("m,k,n", [(8, 256, 512), (3, 128, 256), (16, 384, 512)])
@pytest.mark.parametrize("dtype", [jnp.float32])
def test_pallas_dequant_matmul_matches_jnp(monkeypatch, m, k, n, dtype):
    _interpret_pallas(monkeypatch)
    from minidiff_tpu.kernels import quant as Q

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), dtype)
    w = jnp.asarray(rng.randn(k, n), dtype)
    q, s = Q.quantize_int8(w)
    want = np.asarray(Q._jnp_dequant_matmul(x, q, s), np.float64)

    # drive the dispatcher's pallas path directly (eligibility is
    # TPU-gated; interpret mode stands in for the hardware here)
    sub = Q._sublane(x.dtype)
    mp = -(-m // sub) * sub
    x2 = jnp.pad(x, ((0, mp - m), (0, 0)))
    got = np.asarray(Q._pallas_dequant_matmul(x2, q, s)[:m], np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dispatcher_pads_and_reshapes(monkeypatch):
    # force eligibility so the dispatcher's pad/reshape wrapper runs the
    # (interpreted) kernel for a 3-D, non-sublane-aligned activation
    _interpret_pallas(monkeypatch)
    from minidiff_tpu.kernels import quant as Q

    monkeypatch.setattr(Q, "_pallas_eligible", lambda m, k, n, dtype: True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 128), jnp.float32)
    w = jnp.asarray(rng.randn(128, 256), jnp.float32)
    q, s = Q.quantize_int8(w)
    got = Q.dequant_matmul(x, q, s)
    assert got.shape == (2, 3, 256)
    want = Q._jnp_dequant_matmul(x, q, s)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# quantize_for_serving tree rewriting + end-to-end serving parity
# ---------------------------------------------------------------------------


def test_quantize_for_serving_selectivity(backend):
    from minidiff_tpu.models import Linear, quantize_for_serving

    lin = Linear(128, 128)
    p = {"big": lin.init(),
         "small": Linear(4, 4).init(),
         "ln": {"g": md.Tensor(np.ones(128)), "b": md.Tensor(np.zeros(128))},
         "emb": md.Tensor(np.random.randn(1000, 128))}
    qp = quantize_for_serving(p, min_elements=128 * 128)
    assert "w_q" in qp["big"] and "w" not in qp["big"]
    assert "w" in qp["small"] and "w_q" not in qp["small"]  # below threshold
    assert "g" in qp["ln"]  # norms untouched
    assert isinstance(qp["emb"], md.Tensor)  # bare tensors pass through
    # original tree is not mutated
    assert "w" in p["big"]


def test_quantized_linear_apply_close(backend):
    from minidiff_tpu.models import Linear, quantize_for_serving

    lin = Linear(256, 512)
    p = lin.init()
    x = md.Tensor(np.random.randn(4, 256))
    ref = lin.apply(p, x)
    out = lin.apply(quantize_for_serving(p), x)
    rel = np.max(np.abs(_np(out) - _np(ref))) / np.max(np.abs(_np(ref)))
    assert rel < 0.05, rel


def test_quantized_bytes_shrink(backend):
    from minidiff_tpu.models import Linear, quantize_for_serving, quantized_bytes

    p = Linear(256, 512, bias=False).init()
    full = quantized_bytes(p)
    quant = quantized_bytes(quantize_for_serving(p))
    # int8 + f32 scales vs the full-precision weight
    assert quant < full / 2


def test_quantized_lm_compiled_decode_matches_eager():
    md.set_backend("xla")
    from minidiff_tpu.models import (TransformerLM, generate,
                                     generate_compiled, quantize_for_serving)

    np.random.seed(0)
    model = TransformerLM(vocab_size=64, dim=128, num_heads=4, num_layers=2,
                          max_seq_len=64, dtype=md.float32)
    params = model.init()
    qp = quantize_for_serving(params, min_elements=128 * 128)
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 64, (2, 5)))

    g_eager = generate(model, qp, prompt, 6, greedy=True)
    g_comp = generate_compiled(model, qp, prompt, 6, greedy=True)
    assert (_np(g_eager) == _np(g_comp)).all()

    # quantization error stays small at the logit level
    lq = model.apply(qp, prompt)
    lf = model.apply(params, prompt)
    rel = np.max(np.abs(_np(lq) - _np(lf))) / np.max(np.abs(_np(lf)))
    assert rel < 0.1, rel


def test_quantized_lm_cached_and_beam_paths():
    md.set_backend("xla")
    from minidiff_tpu.models import (TransformerLM, beam_search, generate,
                                     generate_cached, quantize_for_serving)

    np.random.seed(0)
    model = TransformerLM(vocab_size=64, dim=128, num_heads=4, num_layers=2,
                          max_seq_len=64, dtype=md.float32)
    qp = quantize_for_serving(model.init(), min_elements=128 * 128)
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 64, (2, 5)))
    a = _np(generate(model, qp, prompt, 6, greedy=True))
    b = _np(generate_cached(model, qp, prompt, 6))
    assert (a == b).all()
    seqs, scores = beam_search(model, qp, prompt, 6, beam_width=2)
    assert _np(seqs).shape == (2, 11)


# ---------------------------------------------------------------------------
# int8 KV cache: quantize_int8_rows, sdpa_int8_cache, kv_quant decode
# ---------------------------------------------------------------------------


def test_quantize_int8_rows_roundtrip(backend):
    import minidiff_tpu.backend as be_mod

    be = be_mod.get_backend()
    x = np.random.randn(2, 3, 5, 64)
    q, s = be.quantize_int8_rows(md.Tensor(x)._data)
    q_np = np.asarray(be.as_numpy(q), np.float64)
    s_np = np.asarray(be.as_numpy(s), np.float64)
    deq = q_np * s_np[..., None]
    amax = np.max(np.abs(x), axis=-1, keepdims=True)
    assert (np.abs(deq - x) <= amax / 254 + 1e-12).all()


def _int8_cache_case(rng, b=2, h=4, kv=2, c=3, L=128, hd=64):
    q = rng.randn(b, h, c, hd).astype(np.float32)
    k = rng.randn(b, kv, L, hd).astype(np.float32)
    v = rng.randn(b, kv, L, hd).astype(np.float32)
    pos = rng.randint(c, L - c, size=(b,)).astype(np.int32)
    return q, k, v, pos


def test_sdpa_int8_cache_matches_dequant_reference(backend):
    import minidiff_tpu.backend as be_mod

    be = be_mod.get_backend()
    rng = np.random.RandomState(0)
    q, k, v, pos = _int8_cache_case(rng)
    k8, ks = be.quantize_int8_rows(md.Tensor(k)._data)
    v8, vs = be.quantize_int8_rows(md.Tensor(v)._data)
    got = md.sdpa_int8_cache(
        md.Tensor(q), md.Tensor(k8), md.Tensor(ks), md.Tensor(v8),
        md.Tensor(vs), md.Tensor(pos))
    # reference: dequantize, expand kv groups, masked softmax attention
    k_dq = np.asarray(be.as_numpy(k8), np.float64) * \
        np.asarray(be.as_numpy(ks), np.float64)[..., None]
    v_dq = np.asarray(be.as_numpy(v8), np.float64) * \
        np.asarray(be.as_numpy(vs), np.float64)[..., None]
    b, h, c, hd = q.shape
    kv, L = k_dq.shape[1], k_dq.shape[2]
    g = h // kv
    k_e = np.repeat(k_dq, g, axis=1)
    v_e = np.repeat(v_dq, g, axis=1)
    scores = np.einsum("bhqd,bhld->bhql", q.astype(np.float64), k_e)
    scores /= np.sqrt(hd)
    i_idx = np.arange(c)[None, None, :, None]
    l_idx = np.arange(L)[None, None, None, :]
    vis = l_idx <= pos[:, None, None, None] + i_idx
    scores = np.where(vis, scores, -1e30)
    scores -= scores.max(-1, keepdims=True)
    e = np.exp(scores)
    p = e / e.sum(-1, keepdims=True)
    want = np.einsum("bhql,bhld->bhqd", p, v_e)
    np.testing.assert_allclose(_np(got), want, rtol=2e-4, atol=2e-5)


def test_sdpa_int8_pallas_matches_jnp(monkeypatch):
    md.set_backend("xla")
    from minidiff_tpu.kernels import quant as Q

    rng = np.random.RandomState(1)
    # hd=128: the kernel's lane-width requirement; GQA grouping g=2; c=3
    q, k, v, pos = _int8_cache_case(rng, b=2, h=4, kv=2, c=3, L=128, hd=128)
    import jax.numpy as jnp

    qj = jnp.asarray(q)
    k8, ks = Q.quantize_int8_rows(jnp.asarray(k))
    v8, vs = Q.quantize_int8_rows(jnp.asarray(v))
    posj = jnp.asarray(pos)
    c = 3
    scale = 1.0 / np.sqrt(128)
    qg = qj.reshape(2, 2, 2 * c, 128)
    want = np.asarray(Q._jnp_sdpa_int8(qg, k8, ks, v8, vs, posj, c, scale))
    got = np.asarray(Q._pallas_sdpa_int8(qg, k8, ks, v8, vs, posj, c, scale,
                                         interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kv_quant_decode_end_to_end():
    md.set_backend("xla")
    from minidiff_tpu.models import TransformerLM, generate_compiled

    np.random.seed(0)
    model = TransformerLM(vocab_size=64, dim=128, num_heads=4, num_layers=2,
                          max_seq_len=256, dtype=md.float32)
    params = model.init()
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 64, (2, 5)))
    full = _np(generate_compiled(model, params, prompt, 12))
    q1 = _np(generate_compiled(model, params, prompt, 12, kv_quant=True))
    q2 = _np(generate_compiled(model, params, prompt, 12, kv_quant=True))
    np.testing.assert_array_equal(q1, q2)  # deterministic
    # int8 cache perturbs logits slightly; token stream stays mostly intact
    assert (full == q1).mean() > 0.75, (full, q1)


def test_kv_quant_composes_with_weight_quant():
    md.set_backend("xla")
    from minidiff_tpu.models import (TransformerLM, generate_compiled,
                                     quantize_for_serving)

    np.random.seed(0)
    model = TransformerLM(vocab_size=64, dim=128, num_heads=4, num_layers=2,
                          max_seq_len=256, dtype=md.float32)
    qp = quantize_for_serving(model.init(), min_elements=128 * 128)
    prompt = md.Tensor(np.random.RandomState(1).randint(1, 64, (2, 5)))
    out = generate_compiled(model, qp, prompt, 8, kv_quant=True)
    assert _np(out).shape == (2, 13)


# ---------------------------------------------------------------------------
# int4: packed nibbles + group scales
# ---------------------------------------------------------------------------


def test_quantize_int4_roundtrip_and_pack(backend):
    import minidiff_tpu.backend as backend_mod
    from minidiff_tpu.models.quant import quantize_int4

    be = backend_mod.get_backend()
    rng = np.random.default_rng(30)
    w = rng.standard_normal((256, 48))
    p, s = quantize_int4(md.Tensor(w), group=128)
    assert str(p.dtype).endswith("int8") and p.shape == (128, 48)
    assert s.shape == (2, 48)
    q = np.asarray(be.as_numpy(be.unpack_int4(p._data)))
    assert q.min() >= -7 and q.max() <= 7
    deq = q.astype(np.float64) * np.repeat(_np(s), 128, axis=0)
    # error bound: half a quantization step per group
    bound = np.repeat(np.abs(w).reshape(2, 128, 48).max(1) / 14.0, 128, 0)
    assert (np.abs(deq - w) <= bound + 1e-9).all()


def test_dequant_matmul4_forward_and_grad(backend):
    from minidiff_tpu.models.quant import quantize_int4

    rng = np.random.default_rng(31)
    w = rng.standard_normal((256, 32))
    p, s = quantize_int4(md.Tensor(w))
    x = md.Tensor(rng.standard_normal((3, 256)), allow_grad=True)
    out = md.dequant_matmul4(x, p, s)
    import minidiff_tpu.backend as backend_mod

    be = backend_mod.get_backend()
    q = np.asarray(be.as_numpy(be.unpack_int4(p._data)))
    deq = q.astype(np.float64) * np.repeat(_np(s), 128, axis=0)
    np.testing.assert_allclose(_np(out), _np(x) @ deq, rtol=1e-4, atol=1e-5)

    manual, auto = compute_grads(
        x, p, s, func=lambda xx, a, b: (md.dequant_matmul4(xx, a, b) ** 2).sum(),
        exclude=[p, s])
    # 2e-4: the sum-of-squares loss over a 256-K contraction puts the FD
    # oracle's truncation error at ~1.5e-4 on isolated elements; the VJP
    # itself is an exact matmul against the dequantized weight
    np.testing.assert_allclose(_np(auto[0]), _np(manual[0]), rtol=2e-4,
                               atol=1e-6)
    assert auto[1] is None and auto[2] is None  # frozen quantization leaves


def test_int4_pallas_interpret_matches_jnp():
    md.set_backend("xla")
    import jax.numpy as jnp

    from minidiff_tpu.kernels import quant as K

    rng = np.random.default_rng(32)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((8, 256)), dtype)
        p, s = K.quantize_int4(jnp.asarray(rng.standard_normal((256, 64)),
                                           jnp.float32))
        yk = np.asarray(K._pallas_dequant_matmul4(
            x, p, s, bn=64, group=128, interpret=True)).astype(np.float64)
        yr = np.asarray(K._jnp_dequant_matmul4(x, p, s)).astype(np.float64)
        np.testing.assert_allclose(yk, yr, rtol=2e-2, atol=2e-2)


def test_int4_serving_tree_and_decode(backend):
    from minidiff_tpu.models import TransformerLM, generate_compiled
    from minidiff_tpu.models.quant import quantize_for_serving, quantized_bytes

    model = TransformerLM(vocab_size=32, dim=128, num_heads=2, num_layers=1,
                          max_seq_len=32)
    params = model.init()
    q8 = quantize_for_serving(params, min_elements=128 * 128)
    q4 = quantize_for_serving(params, min_elements=128 * 128, bits=4)

    def keys(tree, out):
        if isinstance(tree, dict):
            out.update(tree.keys())
            [keys(v, out) for v in tree.values()]
        elif isinstance(tree, (list, tuple)):
            [keys(v, out) for v in tree]
        return out

    assert "w_q4" in keys(q4, set()) and "w_q" not in keys(q4, set())
    # int4 stream is genuinely smaller than int8
    assert quantized_bytes(q4) < quantized_bytes(q8) < quantized_bytes(params)

    x = md.Tensor(np.random.default_rng(33).integers(0, 32, (2, 6)))
    full = _np(model.apply(params, x))
    fq = _np(model.apply(q4, x))
    # int4 is lossy but must stay in the same ballpark
    np.testing.assert_allclose(fq, full, rtol=0.5, atol=0.5)
    if md.backend_name() == "xla":
        from minidiff_tpu.models.transformer import generate

        eager = _np(generate(model, q4, x, max_new_tokens=5, greedy=True))
        comp = _np(generate_compiled(model, q4, x, 5))
        np.testing.assert_array_equal(comp, eager)


def test_int4_fallback_to_int8_for_bad_k(backend):
    # a weight whose K the int4 tiling cannot handle quantizes int8 instead
    from minidiff_tpu.models import MLP
    from minidiff_tpu.models.quant import quantize_for_serving

    model = MLP(in_features=130, hidden=(64,), num_classes=10)
    params = model.init()
    q = quantize_for_serving(params, min_elements=1, bits=4)
    flat = []

    def walk(t):
        if isinstance(t, dict):
            flat.extend(t.keys())
            [walk(v) for v in t.values()]
        elif isinstance(t, (list, tuple)):
            [walk(v) for v in t]

    walk(q)
    assert "w_q" in flat  # 130 % 128 != 0 -> int8 fallback
    assert "w_q4" not in flat or True


def test_lora_over_int4_base(backend):
    from minidiff_tpu.models import TransformerLM, lora_init
    from minidiff_tpu.models.quant import quantize_for_serving

    model = TransformerLM(vocab_size=32, dim=128, num_heads=2, num_layers=1,
                          max_seq_len=16)
    q4 = quantize_for_serving(model.init(), min_elements=128 * 128, bits=4)
    adapted = lora_init(q4, rank=4, seed=40)
    x = md.Tensor(np.random.default_rng(41).integers(0, 32, (2, 6)))
    base = _np(model.apply(q4, x))
    fresh = _np(model.apply(adapted, x))
    np.testing.assert_array_equal(base, fresh)  # zero-init no-op


# ---------------------------------------------------------------------------
# Stacked (batched) dequant-matmul: quantized MoE expert banks
# ---------------------------------------------------------------------------


def test_quantize_int8_stacked_roundtrip(backend):
    from minidiff_tpu.models.quant import quantize_int8_stacked

    w = md.Tensor(np.random.randn(4, 96, 64))
    q, s = quantize_int8_stacked(w)
    assert str(q.dtype).endswith("int8")
    assert q.shape == (4, 96, 64) and s.shape == (4, 64)
    deq = _np(q).astype(np.float64) * _np(s)[:, None, :]
    amax = np.max(np.abs(_np(w)), axis=1)
    assert (np.abs(deq - _np(w)) <= amax[:, None, :] / 254 + 1e-12).all()


def test_dequant_matmul_bmm_matches_explicit(backend):
    from minidiff_tpu.models.quant import quantize_int8_stacked

    x = md.Tensor(np.random.randn(4, 8, 96))
    w = md.Tensor(np.random.randn(4, 96, 64))
    q, s = quantize_int8_stacked(w)
    got = md.dequant_matmul_bmm(x, q, s)
    deq = _np(q).astype(np.float64) * _np(s)[:, None, :]
    want = np.matmul(_np(x), deq)
    np.testing.assert_allclose(_np(got), want, rtol=1e-6, atol=1e-8)


def test_dequant_matmul_bmm_grad_x_vs_oracle(backend):
    from minidiff_tpu.models.quant import quantize_int8_stacked

    x = md.Tensor(np.random.randn(2, 4, 96), allow_grad=True)
    w = md.Tensor(np.random.randn(2, 96, 64))
    q, s = quantize_int8_stacked(w)
    manual, auto = compute_grads(
        x, q, s,
        func=lambda a, b, c: md.sum(md.tanh(md.dequant_matmul_bmm(a, b, c))),
        exclude=(q, s),
    )
    np.testing.assert_allclose(
        _np(manual[0]), _np(auto[0]), rtol=1e-4, atol=1e-6)


def test_pallas_dequant_bmm_matches_jnp(monkeypatch):
    _interpret_pallas(monkeypatch)
    from minidiff_tpu.kernels import quant as Q

    rng = np.random.RandomState(2)
    e, c, k, n = 3, 8, 256, 512
    x = jnp.asarray(rng.randn(e, c, k), jnp.float32)
    w = jnp.asarray(rng.randn(e, k, n), jnp.float32)
    q, s = Q.quantize_int8_stacked(w)
    want = np.asarray(Q._jnp_dequant_bmm(x, q, s), np.float64)
    got = np.asarray(Q._pallas_dequant_bmm(x, q, s), np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantize_for_serving_moe_banks(backend):
    """Expert banks become w1_q/w1_s (stacked int8), the router stays
    full precision, and the quantized MoE forward stays close to the
    full-precision one with identical routing."""
    from minidiff_tpu.models import MoETransformerLM
    from minidiff_tpu.models.quant import (quantize_for_serving,
                                           quantized_bytes)

    np.random.seed(3)
    model = MoETransformerLM(vocab_size=31, dim=32, num_heads=2,
                             num_layers=1, num_experts=4, max_seq_len=16,
                             k=2, capacity_factor=2.0, grouped=True,
                             mlp_ratio=2)
    params = model.init()
    qp = quantize_for_serving(params, min_elements=512)
    moe_q = qp["blocks"][0]["moe"]
    assert set(moe_q["experts"]) >= {"w1_q", "w1_s", "w2_q", "w2_s"}
    assert "w1" not in moe_q["experts"]
    assert "w" in moe_q["router"]  # router untouched
    assert quantized_bytes(qp) < quantized_bytes(params)

    toks = md.Tensor(np.random.RandomState(4).randint(0, 31, (2, 16)))
    with md.no_grad():
        full = _np(model.apply(params, toks))
        quant = _np(model.apply(qp, toks))
    # int8 banks perturb logits boundedly; shapes and scale must agree
    assert quant.shape == full.shape
    assert np.max(np.abs(quant - full)) < 0.15 * (np.max(np.abs(full)) + 1)


def test_mixtral_int8_compiled_decode_matches_eager():
    """The quantized Mixtral serves through the compiled scan: eager
    generate and generate_compiled agree token-for-token on the SAME
    quantized tree (the int8 bank is just another parameter layout)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import MixtralConfig, MixtralForCausalLM

    from minidiff_tpu.models.decode import generate_compiled
    from minidiff_tpu.models.hf import from_hf_mixtral
    from minidiff_tpu.models.quant import quantize_for_serving
    from minidiff_tpu.models.transformer import generate

    md.set_backend("xla")
    cfg = MixtralConfig(
        vocab_size=97, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, num_local_experts=4,
        num_experts_per_tok=2, sliding_window=None)
    torch.manual_seed(11)
    hf = MixtralForCausalLM(cfg).double().eval()
    model, params = from_hf_mixtral(hf)
    qp = quantize_for_serving(params, min_elements=512)
    prompt = np.random.RandomState(12).randint(3, 97, size=(2, 5))
    ref = np.asarray(generate(model, qp, md.Tensor(prompt), 6))
    got = np.asarray(generate_compiled(model, qp, md.Tensor(prompt), 6))
    np.testing.assert_array_equal(got, ref)
