"""md.softmax_xent: op semantics, oracle gradcheck, fused Pallas kernels.

The fused loss block (kernels/xent.py) completes VERDICT r1 item 1's
named non-attention residual (LayerNorm chains + loss).  Contract:
* loss_r = logsumexp(z_r) - z_r[label_r], per row, in the accumulation
  dtype (f32 for bf16 logits, the input dtype for f32/f64)
* labels carry no cotangent; the logits VJP is (softmax - onehot) * g
* functional.cross_entropy's integer-label path routes through the op
  and keeps its historical value exactly
* the Pallas kernels (interpret mode) match the jnp fallback
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.utils import compute_grads


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.get_backend().as_numpy(t._data))


def _ref_xent(z, lab):
    m = z.max(axis=-1, keepdims=True)
    lse = np.log(np.exp(z - m).sum(axis=-1, keepdims=True)) + m
    flat = z.reshape(-1, z.shape[-1])
    picked = flat[np.arange(flat.shape[0]), lab.reshape(-1)]
    return lse[..., 0] - picked.reshape(lab.shape)


def test_forward_matches_reference(backend):
    z = np.random.randn(6, 16)
    lab = np.random.RandomState(0).randint(0, 16, 6)
    got = _np(md.softmax_xent(md.Tensor(z), md.Tensor(lab)))
    np.testing.assert_allclose(got, _ref_xent(z, lab), rtol=1e-12, atol=1e-12)


def test_forward_batched_leading_axes(backend):
    z = np.random.randn(2, 3, 16)
    lab = np.random.RandomState(1).randint(0, 16, (2, 3))
    got = _np(md.softmax_xent(md.Tensor(z), md.Tensor(lab)))
    assert got.shape == (2, 3)
    np.testing.assert_allclose(got, _ref_xent(z, lab), rtol=1e-12, atol=1e-12)


def test_gradcheck_vs_oracle(backend):
    z = md.Tensor(np.random.randn(6, 16), allow_grad=True)
    lab = md.Tensor(np.random.RandomState(0).randint(0, 16, 6))
    manual, auto = compute_grads(
        z, lab,
        func=lambda a, l: md.sum(md.tanh(md.softmax_xent(a, l))),
        exclude=(lab,))
    for m, a in zip(manual, auto):
        if m is None or a is None:
            continue
        np.testing.assert_allclose(_np(m), _np(a), rtol=1e-4, atol=1e-6)


def test_no_grad_to_labels(backend):
    z = md.Tensor(np.random.randn(4, 8), allow_grad=True)
    lab = md.Tensor(np.random.RandomState(0).randint(0, 8, 4))
    lab = lab.detach(allow_grad=True)
    md.sum(md.softmax_xent(z, lab)).backward(retain_grads=True)
    assert z.grad is not None
    assert lab.grad is None


def test_grad_is_softmax_minus_onehot(backend):
    z_np = np.random.randn(5, 12)
    lab_np = np.random.RandomState(2).randint(0, 12, 5)
    z = md.Tensor(z_np, allow_grad=True)
    md.sum(md.softmax_xent(z, md.Tensor(lab_np))).backward(retain_grads=True)
    e = np.exp(z_np - z_np.max(axis=-1, keepdims=True))
    p = e / e.sum(axis=-1, keepdims=True)
    p[np.arange(5), lab_np] -= 1.0
    np.testing.assert_allclose(_np(z.grad), p, rtol=1e-9, atol=1e-12)


def test_second_order_retapes(backend):
    # the VJP is framework ops, so hvp through the loss must work
    z_np = np.random.randn(3, 6)
    lab_np = np.random.RandomState(3).randint(0, 6, 3)
    lab = md.Tensor(lab_np)

    def loss(zt):
        return md.sum(md.softmax_xent(zt, lab) ** 2)

    v = md.Tensor(np.random.randn(3, 6))
    hv = md.hvp(loss)(md.Tensor(z_np), v)
    h = 1e-6

    def grad_at(x0):
        zt = md.Tensor(x0, allow_grad=True)
        loss(zt).backward(retain_grads=True)
        return _np(zt.grad)

    num = (grad_at(z_np + h * _np(v)) - grad_at(z_np - h * _np(v))) / (2 * h)
    np.testing.assert_allclose(_np(hv), num, rtol=1e-3, atol=1e-5)


def test_cross_entropy_int_path_value_unchanged(backend):
    # functional.cross_entropy now routes ints through the op; the mean
    # loss must equal the historical -mean(log_softmax picked)
    z = np.random.randn(4, 5, 12)
    lab = np.random.RandomState(4).randint(0, 12, (4, 5))
    got = float(_np(F.cross_entropy(
        md.Tensor(z.reshape(20, 12)), md.Tensor(lab.reshape(20)))))
    want = float(np.mean(_ref_xent(z, lab)))
    assert abs(got - want) < 1e-10


def test_cross_entropy_soft_labels_path(backend):
    z = np.random.randn(6, 8)
    soft = np.random.RandomState(5).dirichlet(np.ones(8), 6)
    got = float(_np(F.cross_entropy(md.Tensor(z), md.Tensor(soft))))
    lse = np.log(np.exp(z - z.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        + z.max(-1, keepdims=True)
    want = float(-np.mean(np.sum(soft * (z - lse), axis=-1)))
    assert abs(got - want) < 1e-10


# ---------------------------------------------------------------------------
# Pallas kernels (interpret mode)
# ---------------------------------------------------------------------------


def _kernels():
    import jax.numpy as jnp

    from minidiff_tpu.kernels import xent as X

    return jnp, X


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("shape", [(128, 128), (256, 384), (512, 512)])
def test_pallas_matches_jnp(dtype, shape):
    md.set_backend("xla")
    jnp, X = _kernels()
    dt = jnp.dtype(dtype)
    rng = np.random.RandomState(0)
    r, v = shape
    z = jnp.asarray(rng.standard_normal(shape), dt)
    lab = jnp.asarray(rng.randint(0, v, r), jnp.int32)
    g = jnp.asarray(rng.standard_normal(r), jnp.float32)
    br = X._row_block(r, v)
    assert r % br == 0 and br % 128 == 0
    np.testing.assert_allclose(
        np.asarray(X._pallas_xent_fwd(z, lab, br, interpret=True)),
        np.asarray(X._jnp_xent(z, lab), np.float32),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(X._pallas_xent_bwd(z, lab, g, br, interpret=True),
                   np.float32),
        np.asarray(X._jnp_xent_grad(z, lab, g), np.float32),
        rtol=1e-6, atol=1e-6)


def test_fused_backward_dispatch_matches_composed(monkeypatch):
    md.set_backend("xla")
    _, X = _kernels()
    z_np = np.random.randn(128, 128)
    lab_np = np.random.RandomState(6).randint(0, 128, 128)

    def run():
        z = md.Tensor(z_np).astype(md.float32).detach(allow_grad=True)
        out = md.sum(md.softmax_xent(z, md.Tensor(lab_np)) ** 2)
        out.backward(retain_grads=True)
        return _np(z.grad)

    want = run()  # composed (no TPU -> decision False)

    orig_fwd, orig_bwd = X._pallas_xent_fwd, X._pallas_xent_bwd
    monkeypatch.setattr(X, "_xent_decision", lambda r, v, dt: True)
    monkeypatch.setattr(
        X, "_pallas_xent_fwd",
        lambda z, l, br: orig_fwd(z, l, br, interpret=True))
    monkeypatch.setattr(
        X, "_pallas_xent_bwd",
        lambda z, l, g, br: orig_bwd(z, l, g, br, interpret=True))
    got = run()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_dispatch_skipped_for_higher_order(monkeypatch):
    md.set_backend("xla")
    _, X = _kernels()
    monkeypatch.setattr(X, "_xent_decision", lambda r, v, dt: True)
    orig_fwd = X._pallas_xent_fwd
    monkeypatch.setattr(
        X, "_pallas_xent_fwd",
        lambda z, l, br: orig_fwd(z, l, br, interpret=True))
    # the unpatched backward kernel would crash on CPU if the higher-order
    # guard ever let the fused dispatch reach it
    z = md.Tensor(np.random.randn(128, 128)).astype(md.float32)
    z = z.detach(allow_grad=True)
    lab = md.Tensor(np.random.RandomState(7).randint(0, 128, 128))
    out = md.sum(md.softmax_xent(z, lab) ** 2)
    out.backward(allow_higher_order=True, retain_grads=True)
    assert z.grad is not None and z.grad.op_node is not None
