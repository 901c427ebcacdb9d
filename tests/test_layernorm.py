"""md.layernorm: op semantics, oracle gradcheck, fused Pallas kernels.

The op is an extension (the reference has no models layer; SURVEY §7 step 8
names elementwise/reduction chains as kernel targets).  Contract under
test:
* forward == the composed framework-op chain (f32/f64 exactly, since the
  accumulation dtype rule keeps full-precision inputs in their own dtype)
* VJPs match the finite-difference oracle on every backend
* bf16 inputs get f32 statistics (better than a bf16 composed chain)
* the Pallas kernels (interpret mode) match the jnp fallback bit-for-bit
  in their f32 accumulators
* the first-order fused-backward dispatch produces the same grads as the
  composed VJPs, and higher-order backward re-tapes (never the kernel)
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.utils import compute_grads


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def _ref_ln(x, g, b, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    return xc / np.sqrt(var + eps) * g + b


# ---------------------------------------------------------------------------
# op semantics
# ---------------------------------------------------------------------------


def test_forward_matches_composition(backend):
    x = np.random.randn(4, 6, 32)
    g = np.random.randn(32)
    b = np.random.randn(32)
    got = _np(md.layernorm(md.Tensor(x), md.Tensor(g), md.Tensor(b)))
    np.testing.assert_allclose(got, _ref_ln(x, g, b), rtol=1e-12, atol=1e-12)


def test_forward_1d_row(backend):
    x = np.random.randn(32)
    g = np.random.randn(32)
    b = np.random.randn(32)
    got = _np(md.layernorm(md.Tensor(x), md.Tensor(g), md.Tensor(b)))
    np.testing.assert_allclose(got, _ref_ln(x, g, b), rtol=1e-12, atol=1e-12)


def test_custom_eps(backend):
    x = np.random.randn(3, 16)
    g = np.ones(16)
    b = np.zeros(16)
    got = _np(md.layernorm(md.Tensor(x), md.Tensor(g), md.Tensor(b), eps=0.5))
    np.testing.assert_allclose(got, _ref_ln(x, g, b, eps=0.5),
                               rtol=1e-12, atol=1e-12)


def test_bf16_gets_f32_statistics(backend):
    # a large common-mode offset destroys bf16-accumulated statistics; the
    # op must normalize in f32, staying close to the f64 reference
    x = np.random.randn(8, 64) + 100.0
    g = np.random.randn(64)
    b = np.random.randn(64)
    want = _ref_ln(x, g, b)
    xt = md.Tensor(x).astype(md.bfloat16)
    gt = md.Tensor(g).astype(md.bfloat16)
    bt = md.Tensor(b).astype(md.bfloat16)
    got = _np(md.layernorm(xt, gt, bt)).astype(np.float64)
    # bf16 inputs round to ~0.4% of |x|~100 -> xc error ~0.4 absolute; the
    # f32-stat path stays within a few bf16 ulps of the f64 reference
    assert np.max(np.abs(got - want)) < 1.0
    # and the normalized rows really are standardized (mean~0, var~1 pre-g)
    y = _np(md.layernorm(xt, md.Tensor(np.ones(64)).astype(md.bfloat16),
                         md.Tensor(np.zeros(64)).astype(md.bfloat16)))
    assert np.abs(y.astype(np.float64).mean(axis=-1)).max() < 0.05


# ---------------------------------------------------------------------------
# gradients
# ---------------------------------------------------------------------------


def test_gradcheck_vs_oracle(backend):
    x = md.Tensor(np.random.randn(5, 24), allow_grad=True)
    g = md.Tensor(np.random.randn(24), allow_grad=True)
    b = md.Tensor(np.random.randn(24), allow_grad=True)
    manual, auto = compute_grads(
        x, g, b,
        func=lambda a, c, d: md.sum(md.tanh(md.layernorm(a, c, d))))
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(_np(m), _np(a), rtol=1e-4, atol=1e-6)


def test_gradcheck_batched_leading_axes(backend):
    x = md.Tensor(np.random.randn(2, 3, 16), allow_grad=True)
    g = md.Tensor(np.random.randn(16), allow_grad=True)
    b = md.Tensor(np.random.randn(16), allow_grad=True)
    manual, auto = compute_grads(
        x, g, b,
        func=lambda a, c, d: md.sum(md.layernorm(a, c, d) ** 2))
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(_np(m), _np(a), rtol=1e-4, atol=1e-6)


def test_second_order_retapes(backend):
    # d2/dx2 of sum(layernorm(x)^2): the composed VJPs are framework ops,
    # so backward-of-backward must build a fresh tape and agree with the
    # numeric second derivative
    x_np = np.random.randn(3, 8)
    g_np = np.random.randn(8)
    b_np = np.random.randn(8)

    def second(x0):
        x = md.Tensor(x0, allow_grad=True)
        y = md.sum(md.layernorm(x, md.Tensor(g_np), md.Tensor(b_np)) ** 2)
        y.backward(allow_higher_order=True, retain_grads=True)
        g1 = x.grad
        s = md.sum(g1 * g1)
        x.grad = None
        s.backward(retain_grads=True)
        return _np(g1), _np(x.grad)

    g1, g2 = second(x_np)
    # numeric check of d(sum g1^2)/dx via central differences
    h = 1e-6
    num = np.zeros_like(x_np)
    for i in np.ndindex(*x_np.shape):
        xp = x_np.copy(); xp[i] += h
        xm = x_np.copy(); xm[i] -= h
        gp, _ = second(xp)
        gm, _ = second(xm)
        num[i] = (np.sum(gp * gp) - np.sum(gm * gm)) / (2 * h)
    np.testing.assert_allclose(g2, num, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas kernels (interpret mode) vs the jnp fallback
# ---------------------------------------------------------------------------


def _kernels():
    import jax.numpy as jnp

    from minidiff_tpu.kernels import layernorm as L

    return jnp, L


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("shape", [(8, 128), (64, 256), (24, 384)])
def test_pallas_fwd_matches_jnp(dtype, shape):
    md.set_backend("xla")
    jnp, L = _kernels()
    dt = jnp.dtype(dtype)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal(shape), dt)
    g = jnp.asarray(rng.standard_normal(shape[-1]), dt)
    b = jnp.asarray(rng.standard_normal(shape[-1]), dt)
    br = L._row_block(*shape)
    assert shape[0] % br == 0
    y_k = L._pallas_ln_fwd(x, g, b, 1e-5, br, interpret=True)
    y_j = L._jnp_layernorm(x, g, b, 1e-5)
    np.testing.assert_allclose(
        np.asarray(y_k, np.float32), np.asarray(y_j, np.float32),
        rtol=1e-6, atol=2e-6)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("shape", [(8, 128), (64, 256)])
def test_pallas_bwd_matches_jnp(dtype, shape):
    md.set_backend("xla")
    jnp, L = _kernels()
    dt = jnp.dtype(dtype)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.standard_normal(shape), dt)
    g = jnp.asarray(rng.standard_normal(shape[-1]), dt)
    dy = jnp.asarray(rng.standard_normal(shape), dt)
    br = L._row_block(*shape)
    dx_k, dg_k, db_k = L._pallas_ln_bwd(x, g, dy, 1e-5, br, interpret=True)
    dx_j, dg_j, db_j = L._jnp_ln_grads(x, g, dy, 1e-5)
    np.testing.assert_allclose(np.asarray(dx_k, np.float32),
                               np.asarray(dx_j, np.float32),
                               rtol=1e-6, atol=2e-6)
    # the kernel's dg/db partials are f32 (never rounded through g.dtype);
    # compare against a full-precision recomputation of sum(dy * xhat)
    x64 = np.asarray(x, np.float64)
    mu = x64.mean(axis=-1, keepdims=True)
    xc = x64 - mu
    xhat = xc / np.sqrt((xc * xc).mean(axis=-1, keepdims=True) + 1e-5)
    acc_dg = np.sum(np.asarray(dy, np.float64) * xhat, axis=0)
    np.testing.assert_allclose(np.asarray(dg_k), acc_dg, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db_k),
                               np.sum(np.asarray(dy, np.float32), axis=0),
                               rtol=1e-5, atol=1e-5)


def test_row_block_divides():
    _, L = _kernels()
    for r in (8, 24, 64, 8192, 1000):
        if r % 8:
            continue
        for d in (128, 1024, 4096):
            br = L._row_block(r, d)
            assert r % br == 0 and br >= 8


# ---------------------------------------------------------------------------
# rmsnorm (same kernel family)
# ---------------------------------------------------------------------------


def _ref_rms(x, g, eps=1e-6):
    return x / np.sqrt((x * x).mean(axis=-1, keepdims=True) + eps) * g


def test_rmsnorm_forward(backend):
    x = np.random.randn(4, 6, 32)
    g = np.random.randn(32)
    got = _np(md.rmsnorm(md.Tensor(x), md.Tensor(g)))
    np.testing.assert_allclose(got, _ref_rms(x, g), rtol=1e-10, atol=1e-12)


def test_rmsnorm_gradcheck(backend):
    x = md.Tensor(np.random.randn(5, 24), allow_grad=True)
    g = md.Tensor(np.random.randn(24), allow_grad=True)
    manual, auto = compute_grads(
        x, g, func=lambda a, c: md.sum(md.tanh(md.rmsnorm(a, c))))
    for m, a in zip(manual, auto):
        np.testing.assert_allclose(_np(m), _np(a), rtol=1e-4, atol=1e-6)


def test_rmsnorm_second_order(backend):
    # backward-of-backward must agree across backends with the oracle
    x_np = np.random.randn(2, 8)
    g_np = np.random.randn(8)
    x = md.Tensor(x_np, allow_grad=True)
    y = md.sum(md.rmsnorm(x, md.Tensor(g_np)) ** 2)
    y.backward(allow_higher_order=True, retain_grads=True)
    g1 = x.grad
    s = md.sum(g1 * g1)
    x.grad = None
    s.backward(retain_grads=True)
    got = _np(x.grad)
    h = 1e-6
    num = np.zeros_like(x_np)

    def grad_at(x0):
        xt = md.Tensor(x0, allow_grad=True)
        md.sum(md.rmsnorm(xt, md.Tensor(g_np)) ** 2).backward(
            retain_grads=True)
        return _np(xt.grad)

    for i in np.ndindex(*x_np.shape):
        xp = x_np.copy(); xp[i] += h
        xm = x_np.copy(); xm[i] -= h
        gp, gm = grad_at(xp), grad_at(xm)
        num[i] = (np.sum(gp * gp) - np.sum(gm * gm)) / (2 * h)
    np.testing.assert_allclose(got, num, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pallas_rms_matches_jnp(dtype):
    md.set_backend("xla")
    jnp, L = _kernels()
    dt = jnp.dtype(dtype)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.standard_normal((24, 256)), dt)
    g = jnp.asarray(rng.standard_normal(256), dt)
    dy = jnp.asarray(rng.standard_normal((24, 256)), dt)
    br = L._row_block(24, 256)
    y_k = L._pallas_rms_fwd(x, g, 1e-6, br, interpret=True)
    y_j = L._jnp_rmsnorm(x, g, 1e-6)
    np.testing.assert_allclose(np.asarray(y_k, np.float32),
                               np.asarray(y_j, np.float32),
                               rtol=1e-6, atol=2e-6)
    dx_k, dg_k = L._pallas_rms_bwd(x, g, dy, 1e-6, br, interpret=True)
    dx_j, _ = L._jnp_rms_grads(x, g, dy, 1e-6)
    np.testing.assert_allclose(np.asarray(dx_k, np.float32),
                               np.asarray(dx_j, np.float32),
                               rtol=1e-6, atol=2e-6)
    x64 = np.asarray(x, np.float64)
    xhat = x64 / np.sqrt((x64 * x64).mean(axis=-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(
        np.asarray(dg_k), np.sum(np.asarray(dy, np.float64) * xhat, axis=0),
        rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# fused first-order dispatch protocol
# ---------------------------------------------------------------------------


def test_fused_backward_dispatch_matches_composed(monkeypatch):
    md.set_backend("xla")
    _, L = _kernels()
    x_np = np.random.randn(16, 128)
    g_np = np.random.randn(128)
    b_np = np.random.randn(128)

    def run():
        x = md.Tensor(x_np, allow_grad=True).astype(md.float32)
        x = x.detach(allow_grad=True)
        g = md.Tensor(g_np, allow_grad=True).astype(md.float32)
        g = g.detach(allow_grad=True)
        b = md.Tensor(b_np, allow_grad=True).astype(md.float32)
        b = b.detach(allow_grad=True)
        out = md.sum(md.layernorm(x, g, b) ** 2)
        out.backward(retain_grads=True)
        return _np(x.grad), _np(g.grad), _np(b.grad)

    want = run()  # composed VJPs (no TPU -> decision is False)

    # force the fused path through the interpret-mode kernels
    orig_fwd, orig_bwd = L._pallas_ln_fwd, L._pallas_ln_bwd
    monkeypatch.setattr(L, "_ln_decision", lambda r, d, dt, eps: True)
    monkeypatch.setattr(
        L, "_pallas_ln_fwd",
        lambda x, g, b, eps, br: orig_fwd(x, g, b, eps, br, interpret=True))
    monkeypatch.setattr(
        L, "_pallas_ln_bwd",
        lambda x, g, dy, eps, br: orig_bwd(x, g, dy, eps, br, interpret=True))
    got = run()

    for w, o in zip(want, got):
        np.testing.assert_allclose(o, w, rtol=1e-5, atol=1e-5)


def test_fused_dispatch_skipped_for_higher_order(monkeypatch):
    # with allow_higher_order the backward runs under enable_grad; the
    # dispatch must refuse (grads need their own tape) and re-tape the
    # composed form — forcing the decision True must not change that
    md.set_backend("xla")
    _, L = _kernels()
    monkeypatch.setattr(L, "_ln_decision", lambda r, d, dt, eps: True)
    orig_fwd = L._pallas_ln_fwd
    monkeypatch.setattr(  # the FORWARD may legitimately fuse
        L, "_pallas_ln_fwd",
        lambda x, g, b, eps, br: orig_fwd(x, g, b, eps, br, interpret=True))
    # the BACKWARD kernel stays unpatched: it would crash on CPU if the
    # higher-order guard ever let the fused dispatch reach it — not
    # patching it IS the assertion
    x = md.Tensor(np.random.randn(16, 128), allow_grad=True)
    x = x.astype(md.float32).detach(allow_grad=True)
    g = md.Tensor(np.random.randn(128)).astype(md.float32)
    b = md.Tensor(np.random.randn(128)).astype(md.float32)
    out = md.sum(md.layernorm(x, g, b) ** 2)
    out.backward(allow_higher_order=True, retain_grads=True)
    assert x.grad is not None
    assert x.grad.op_node is not None  # the gradient has its own tape


# ---------------------------------------------------------------------------
# model integration
# ---------------------------------------------------------------------------


def test_transformer_layernorm_unchanged(backend):
    # LayerNorm.apply now routes through md.layernorm; f64 output must
    # match the old composed chain exactly on the oracle
    from minidiff_tpu.models.transformer import LayerNorm

    ln = LayerNorm(24)
    params = ln.init()
    x = md.Tensor(np.random.randn(4, 7, 24))
    got = _np(ln.apply(params, x))
    want = _ref_ln(_np(x), _np(params["g"]), _np(params["b"]), eps=ln.eps)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


# ---------------------------------------------------------------------------
# fused residual-add + norm (md.add_layernorm / md.add_rmsnorm, r5)
# ---------------------------------------------------------------------------


def test_add_layernorm_forward_matches_unfused(backend):
    rng = np.random.default_rng(0)
    x = md.Tensor(rng.normal(size=(3, 5, 8)))
    a = md.Tensor(rng.normal(size=(3, 5, 8)))
    g = md.Tensor(rng.normal(size=8))
    b = md.Tensor(rng.normal(size=8))
    pair = md.add_layernorm(x, a, g, b)
    assert pair.shape == (2, 3, 5, 8)
    t_ref = _np(x) + _np(a)
    np.testing.assert_allclose(_np(pair[0]), t_ref, rtol=1e-12)
    np.testing.assert_allclose(_np(pair[1]),
                               _ref_ln(t_ref, _np(g), _np(b)), rtol=1e-6)


def test_add_layernorm_gradcheck(backend):
    rng = np.random.default_rng(1)
    x = md.Tensor(rng.normal(size=(4, 8)), allow_grad=True)
    a = md.Tensor(rng.normal(size=(4, 8)), allow_grad=True)
    g = md.Tensor(rng.normal(size=8), allow_grad=True)
    b = md.Tensor(rng.normal(size=8), allow_grad=True)

    def f(x, a, g, b):
        pair = md.add_layernorm(x, a, g, b)
        # consume BOTH outputs with different weights so g0 and dy are
        # both nonzero through the VJPs
        return md.sum(pair[1] * pair[1]) + md.sum(pair[0] * 0.7)

    fds, ads = compute_grads(x, a, g, b, func=f)
    for fd, ad in zip(fds, ads):
        np.testing.assert_allclose(_np(fd), _np(ad), rtol=1e-3, atol=1e-4)


def test_add_rmsnorm_gradcheck(backend):
    rng = np.random.default_rng(2)
    x = md.Tensor(rng.normal(size=(4, 8)), allow_grad=True)
    a = md.Tensor(rng.normal(size=(4, 8)), allow_grad=True)
    g = md.Tensor(rng.normal(size=8), allow_grad=True)

    def f(x, a, g):
        pair = md.add_rmsnorm(x, a, g)
        return md.sum(pair[1] * pair[1]) + md.sum(pair[0] * 0.3)

    fds, ads = compute_grads(x, a, g, func=f)
    for fd, ad in zip(fds, ads):
        np.testing.assert_allclose(_np(fd), _np(ad), rtol=1e-3, atol=1e-4)


def test_add_layernorm_second_order(backend):
    rng = np.random.default_rng(3)
    xv = rng.normal(size=(2, 8))
    x = md.Tensor(xv, allow_grad=True)
    a = md.Tensor(rng.normal(size=(2, 8)), allow_grad=True)
    g = md.Tensor(np.ones(8), allow_grad=True)
    b = md.Tensor(np.zeros(8), allow_grad=True)
    out = md.sum(md.add_layernorm(x, a, g, b)[1] ** 3)
    out.backward(allow_higher_order=True)
    gx = _np(x.grad)
    x.grad.backward()
    hxx = _np(x.grad)  # d/dx of sum(dL/dx) — just assert finite + nonzero
    assert np.isfinite(hxx).all() and np.abs(hxx).sum() > 0
    assert np.isfinite(gx).all()


def test_add_norm_matches_separate_ops_in_block(backend):
    """TransformerBlock.apply's fused path must agree with the unfused
    t = x + a; z = norm(t) composition on forward AND grads."""
    rng = np.random.default_rng(4)
    x = md.Tensor(rng.normal(size=(2, 3, 8)), allow_grad=True)
    a = md.Tensor(rng.normal(size=(2, 3, 8)), allow_grad=True)
    g = md.Tensor(rng.normal(size=8), allow_grad=True)
    b = md.Tensor(rng.normal(size=8), allow_grad=True)

    pair = md.add_layernorm(x, a, g, b)
    loss_f = md.sum(pair[1] * 2.0 + pair[0])
    loss_f.backward(retain_grads=True)
    gx_f, ga_f, gg_f, gb_f = (_np(t.grad) for t in (x, a, g, b))

    for t in (x, a, g, b):
        t.grad = None
        t.wipe()
    t2 = x + a
    z2 = md.layernorm(t2, g, b)
    loss_u = md.sum(z2 * 2.0 + t2)
    loss_u.backward(retain_grads=True)
    np.testing.assert_allclose(gx_f, _np(x.grad), rtol=1e-10)
    np.testing.assert_allclose(ga_f, _np(a.grad), rtol=1e-10)
    np.testing.assert_allclose(gg_f, _np(g.grad), rtol=1e-10)
    np.testing.assert_allclose(gb_f, _np(b.grad), rtol=1e-10)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_pallas_addln_matches_unfused_kernels(dtype):
    """Interpret-mode kernel parity: the fused add+LN fwd/bwd kernels vs
    the unfused pipeline (t bitwise; y / dx at ulp tolerance — XLA keeps
    the in-kernel sum at f32 before the stats, which only INCREASES
    precision)."""
    import jax.numpy as jnp

    from minidiff_tpu.kernels import layernorm as L

    dt = getattr(jnp, dtype)
    tol = 1e-6 if dtype == "float32" else 3.2e-2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((64, 256)), dt)
    a = jnp.asarray(rng.standard_normal((64, 256)), dt)
    g = jnp.asarray(rng.standard_normal(256), dt)
    b = jnp.asarray(rng.standard_normal(256), dt)
    dy = jnp.asarray(rng.standard_normal((64, 256)), dt)
    g0 = jnp.asarray(rng.standard_normal((64, 256)), dt)
    t = x + a
    out = L._pallas_addln_fwd(x, a, g, b, 1e-5, 32, interpret=True)
    y_ref = L._pallas_ln_fwd(t, g, b, 1e-5, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0], np.float32),
                                  np.asarray(t, np.float32))
    np.testing.assert_allclose(np.asarray(out[1], np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)
    dx_f, dg_f, db_f = L._pallas_addln_bwd(t, g, dy, g0, 1e-5, 32,
                                           interpret=True)
    dx_r, dg_r, db_r = L._pallas_ln_bwd(t, g, dy, 1e-5, 32, interpret=True)
    np.testing.assert_allclose(np.asarray(dx_f, np.float32),
                               np.asarray(dx_r + g0, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(dg_f), np.asarray(dg_r),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r),
                               rtol=1e-6)
    # rms variants
    outr = L._pallas_addrms_fwd(x, a, g, 1e-6, 32, interpret=True)
    yr = L._pallas_rms_fwd(t, g, 1e-6, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(outr[0], np.float32),
                                  np.asarray(t, np.float32))
    np.testing.assert_allclose(np.asarray(outr[1], np.float32),
                               np.asarray(yr, np.float32),
                               rtol=tol, atol=tol)
    dxr_f, dgr_f = L._pallas_addrms_bwd(t, g, dy, g0, 1e-6, 32,
                                        interpret=True)
    dxr_r, dgr_r = L._pallas_rms_bwd(t, g, dy, 1e-6, 32, interpret=True)
    np.testing.assert_allclose(np.asarray(dxr_f, np.float32),
                               np.asarray(dxr_r + g0, np.float32),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(dgr_f), np.asarray(dgr_r),
                               rtol=1e-6)
