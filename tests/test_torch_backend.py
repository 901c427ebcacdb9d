"""Third concrete backend: PyTorch (CPU) behind the same ~85-fn interface.

The reference ships three array libraries behind its backend abstraction
(numpy/cupy/mlx); round 1 shipped two (numpy oracle, xla).  This module
proves the interface's generality with a genuinely different third library —
including the engine (tape, higher-order), the factories, the oracle, and a
real training loop, all running unmodified on torch tensors.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import minidiff_tpu as md
import minidiff_tpu.backend as backend
from minidiff_tpu.backend.interface import REQUIRED_ATTRS
from minidiff_tpu.utils import compute_grads


@pytest.fixture(autouse=True)
def _torch_backend():
    md.set_backend("torch")
    md.seed(0)
    yield
    md.set_backend("xla")


def test_registered_and_complete():
    assert "torch" in md.available_backends()
    b = backend.get_backend()
    missing = [a for a in REQUIRED_ATTRS if not hasattr(b, a)]
    assert not missing, missing
    assert md.Tensor(np.ones(2))._data.__class__ is torch.Tensor


def test_readme_demo_second_order():
    x = md.Tensor(np.float64(1.3), allow_grad=True)
    y = md.Tensor(np.float64(0.7), allow_grad=True)
    f = 2 * y * md.sin(x) - x ** 2
    f.backward(allow_higher_order=True)
    assert abs(float(x.grad.item())
               - (2 * 0.7 * np.cos(1.3) - 2 * 1.3)) < 1e-12
    g = x.grad
    g.backward()
    assert abs(float(x.grad.item())
               - (-2 * 0.7 * np.sin(1.3) - 2)) < 1e-12


_OP_TABLE = [
    (lambda t: md.sum(md.tanh(t) * t), "tanh*x"),
    (lambda t: md.sum(md.exp(t) / (1.0 + md.exp(t))), "sigmoidish"),
    (lambda t: md.sum(md.matmul(t, md.swapaxes(t, -1, -2))), "matmul_nt"),
    (lambda t: md.sum(md.max(t, axis=-1, keepdims=True) * 2.0), "max"),
    (lambda t: md.sum(md.mean(t, axis=(0, 1))), "mean"),
    (lambda t: md.sum(md.std(t, axis=-1)), "std"),
    (lambda t: md.sum(md.flatten(t, order="F")
                      * md.Tensor(np.arange(24.0))), "flatten_F"),
    (lambda t: md.sum(md.einsum("ijk,ijl->kl", t, t)), "einsum"),
    (lambda t: md.sum(md.sort(t, axis=-1)
                      * md.Tensor(np.arange(4.0))), "sort"),
    (lambda t: md.sum(t[(slice(1, 3), slice(None))] ** 2), "getitem"),
    (lambda t: md.sum(md.tensordot(t, t, axes=([2], [2]))), "tensordot"),
    (lambda t: md.sum(md.clip(t, -0.5, 0.5)), "clip"),
    (lambda t: md.sum(md.where(t > 0, t * 2.0, t * 3.0)), "where"),
    (lambda t: md.sum(md.cumsum(t, axis=1)), "cumsum"),
    (lambda t: md.sum(md.prod(t + 2.0, axis=-1)), "prod"),
]


@pytest.mark.parametrize("fn,name", _OP_TABLE, ids=[n for _, n in _OP_TABLE])
def test_gradcheck_against_finite_differences(fn, name):
    x = md.Tensor(np.random.RandomState(0).randn(2, 3, 4), allow_grad=True)
    manual, auto = compute_grads(x, func=fn, h=1e-5)
    np.testing.assert_allclose(
        np.asarray(manual[0].detach()), np.asarray(auto[0].detach()),
        rtol=1e-3, atol=1e-6, err_msg=name,
    )


_FWD_OPS = [
    ("sdpa", lambda m, a: m.sdpa(a[:, None], a[:, None], a[:, None],
                                 causal=True)),
    ("conv", lambda m, a: m.conv2d(
        md.Tensor(np.random.RandomState(1).randn(2, 6, 6, 3)) if m is md
        else np.random.RandomState(1).randn(2, 6, 6, 3),
        md.Tensor(np.random.RandomState(2).randn(3, 3, 3, 4)) if m is md
        else np.random.RandomState(2).randn(3, 3, 3, 4), stride=2,
        padding=1)),
]


def test_forward_equivalence_with_numpy_oracle():
    """Identical forwards on the numpy oracle and torch for a cross-section
    of the op surface (the cross-backend test the reference lacks)."""
    rng = np.random.RandomState(3)
    a_np = rng.randn(3, 4, 5)

    cases = [
        lambda: md.tanh(md.Tensor(a_np)),
        lambda: md.sum(md.Tensor(a_np), axis=(0, 2), keepdims=True),
        lambda: md.sort(md.Tensor(a_np), axis=-1),
        lambda: md.argsort(md.Tensor(a_np), axis=1),
        lambda: md.topk(md.Tensor(a_np), 2, axis=-1)[0],
        lambda: md.einsum("...ij->...ji", md.Tensor(a_np)),
        lambda: md.einsum("iji->j", md.Tensor(rng.randn(3, 4, 3))),
        lambda: md.cumsum(md.Tensor(a_np)),
        lambda: md.tensordot(md.Tensor(a_np),
                             md.transpose(md.Tensor(a_np), axes=(1, 2, 0)),
                             axes=2),
        lambda: md.sdpa(md.Tensor(a_np[None]), md.Tensor(a_np[None]),
                        md.Tensor(a_np[None]), causal=True),
        lambda: md.conv2d(md.Tensor(rng.randn(2, 6, 6, 3)),
                          md.Tensor(rng.randn(3, 3, 3, 4)),
                          stride=2, padding=1),
    ]
    for i, case in enumerate(cases):
        md.set_backend("numpy")
        np.random.seed(7)
        rng = np.random.RandomState(3)  # rebuild for the rng-using cases
        a_np = rng.randn(3, 4, 5)
        want = np.asarray(backend.as_numpy(case()._data), np.float64)
        md.set_backend("torch")
        rng = np.random.RandomState(3)
        a_np = rng.randn(3, 4, 5)
        got = np.asarray(backend.as_numpy(case()._data), np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12,
                                   err_msg=f"case {i}")


def test_sdpa_causal_mask_matrix_matches_numpy_oracle():
    """Regression for the r3 ship: the causal band must apply with AND
    without segment_ids, and segment_ids alone must NOT imply causality.
    Runs the raw backend sdpa for every (causal, segment_ids) combination
    against the numpy oracle."""
    rng = np.random.RandomState(11)
    q = rng.randn(2, 2, 6, 4)
    k = rng.randn(2, 2, 6, 4)
    v = rng.randn(2, 2, 6, 4)
    seg = np.array([[0, 0, 0, 1, 1, 1], [0, 0, 1, 1, 2, 2]])
    from minidiff_tpu.backend.numpy_backend import NumpyBackend
    tb = backend.get_backend()
    for causal in (False, True):
        for sg in (None, seg):
            want = NumpyBackend.sdpa(q, k, v, causal=causal, segment_ids=sg)
            got = backend.as_numpy(tb.sdpa(q, k, v, causal=causal,
                                           segment_ids=sg))
            np.testing.assert_allclose(
                got, want, rtol=1e-12, atol=1e-12,
                err_msg=f"causal={causal} segment_ids={sg is not None}")
    # causal must differ from non-causal (the r3 bug made them equal)
    c = backend.as_numpy(tb.sdpa(q, k, v, causal=True))
    nc = backend.as_numpy(tb.sdpa(q, k, v, causal=False))
    assert np.abs(c - nc).max() > 1e-3
    # windowed causal with sinks, no segment_ids
    want = NumpyBackend.sdpa(q, k, v, causal=True, window=3, sinks=1)
    got = backend.as_numpy(tb.sdpa(q, k, v, causal=True, window=3, sinks=1))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_factories_and_indexing():
    assert tuple(md.ones((2, 3)).shape) == (2, 3)
    assert md.zeros((2,)).dtype == torch.float64
    t = md.arange(6).reshape((2, 3))
    np.testing.assert_array_equal(np.asarray(t.detach()),
                                  np.arange(6).reshape(2, 3))
    st = md.stack([md.ones((2,)), md.zeros((2,))])
    assert tuple(st.shape) == (2, 2)
    cat = md.concatenate([md.ones((2,)), md.zeros((3,))])
    assert tuple(cat.shape) == (5,)
    parts = md.split(md.arange(6), 3)
    assert len(parts) == 3 and tuple(parts[0].shape) == (2,)
    ui = md.unravel_index(md.Tensor(np.array([5])), (2, 3))
    assert int(np.asarray(ui[0].detach())[0]) == 1
    # index_add mutates its target in place (reference parity factory)
    base = md.zeros((4,))
    md.index_add(base, md.Tensor(np.array([1, 1, 3])),
                 md.Tensor(np.array([1.0, 2.0, 5.0])))
    np.testing.assert_allclose(np.asarray(base.detach()), [0, 3, 0, 5])
    taken = md.take_along_axis(
        md.Tensor(np.array([[3.0, 1.0], [2.0, 4.0]])),
        md.Tensor(np.array([[1], [0]])), 1)
    np.testing.assert_allclose(np.asarray(taken.detach()), [[1.0], [2.0]])


def test_random_surface_and_keyed_stream_matches_numpy():
    md.seed(3)
    r = md.randn(4, 4)
    assert r._data.dtype == torch.float64
    ri = md.randint(low=0, high=5, size=(8,))
    assert int(np.asarray(ri.detach()).max()) < 5
    ch = md.choice(10, size=(4,), p=np.full(10, 0.1))
    assert tuple(ch.shape) == (4,)
    pm = md.permutation(6)
    assert sorted(np.asarray(pm.detach()).tolist()) == list(range(6))
    bn = md.binomial(10, 0.5, size=(6,))
    assert 0 <= int(np.asarray(bn.detach()).min())
    # keyed functional RNG: torch deliberately reuses the numpy oracle's
    # Philox stream — identical draws per key across the two CPU backends
    k_t = md.random_key(9)
    u_t = np.asarray(md.random_uniform(md.fold_in(k_t, 2), (5,)).detach())
    md.set_backend("numpy")
    u_n = np.asarray(
        md.random_uniform(md.fold_in(md.random_key(9), 2), (5,)).detach())
    np.testing.assert_allclose(u_t, u_n)


def test_engine_semantics_on_torch():
    # mutation guard + cleanup modes + reuse_graph all hold on torch values
    p = md.Tensor(np.ones(3), allow_grad=True)
    q = p * 2
    with pytest.raises(ValueError):
        p += 1
    with pytest.raises(ValueError):
        q.allow_grad = False
    with md.reuse_graph():
        for v in (1.0, 2.0):
            t = md.Tensor(np.full(3, v), allow_grad=True)
            md.sum(t * t).backward()
            np.testing.assert_allclose(np.asarray(t.grad.detach()), 2 * v)


def test_mlp_trains_on_torch():
    from minidiff_tpu.models import MLP, Adam, make_train_step
    from minidiff_tpu.models.data import synthetic_classification

    np.random.seed(0)
    model = MLP(8, (16,), 3)
    opt = Adam(1e-2)
    params = model.init()
    state = opt.init(params)
    step = make_train_step(model, opt, jit=False)
    xs, ys = synthetic_classification(64, 8, 3)
    x, y = md.Tensor(xs), md.Tensor(ys)
    losses = []
    for _ in range(25):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    assert params[0]["w"]._data.__class__ is torch.Tensor


def test_dropout_with_key_on_torch():
    from minidiff_tpu.models import functional as F

    x = md.Tensor(np.ones((32, 32)), allow_grad=True)
    key = md.random_key(1)
    y = F.dropout(x, 0.5, key=key)
    v = np.asarray(y.detach())
    assert set(np.unique(v)).issubset({0.0, 2.0})
    np.testing.assert_array_equal(v, np.asarray(F.dropout(x, 0.5,
                                                          key=key).detach()))
