"""Backward-engine semantics: cleanup modes, refcounts, retain/reset grads.

Mirrors the behaviors documented in the reference engine
(minidiff/topology.py:132-200) that its own suite never tests directly.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md


def build_chain():
    x = md.Tensor(np.array([1.0, 2.0, 3.0]), allow_grad=True)
    a = x * 2
    b = md.sin(a)
    out = md.sum(b)
    return x, a, b, out


def test_backward_on_leaf_is_noop(backend):
    x = md.Tensor(np.ones(3), allow_grad=True)
    x.backward()
    assert x.grad is None


def test_backward_without_allow_grad_is_noop(backend):
    x = md.Tensor(np.ones(3))
    y = x * 2  # no grad tracking anywhere
    y.backward()
    assert y.grad is None


def test_default_prune_retains_referenced_chain(backend):
    # Verified against the reference: prune only wipes tensors whose
    # consumer_refs hit 0, and the root's node holds a ref on its inputs, so a
    # single-consumer chain survives backward() and can re-run.
    x, a, b, out = build_chain()
    out.backward()
    assert x.grad is not None
    assert a.op_node is not None and b.op_node is not None
    g = np.asarray(x.grad)
    out.backward()
    np.testing.assert_allclose(np.asarray(x.grad), g)


def test_keep_allows_repeated_backward(backend):
    x, a, b, out = build_chain()
    out.backward(cleanup_mode="keep")
    first = np.asarray(x.grad)
    assert out.op_node is not None
    out.backward(cleanup_mode="keep")
    np.testing.assert_allclose(np.asarray(x.grad), first)


def test_keep_without_reset_accumulates(backend):
    x, a, b, out = build_chain()
    out.backward(cleanup_mode="keep")
    first = np.asarray(x.grad)
    out.backward(cleanup_mode="keep", reset_grads=False)
    np.testing.assert_allclose(np.asarray(x.grad), 2 * first, rtol=1e-6)


def test_destroy_wipes_even_shared_graph(backend):
    x = md.Tensor(np.ones(3), allow_grad=True)
    shared = x * 3
    out1 = md.sum(shared * 2)
    out2 = md.sum(shared * 4)  # second consumer keeps shared's refcount > 0
    out1.backward(cleanup_mode="destroy")
    assert shared.op_node is None  # destroy ignores refcounts
    # prune would have kept it:
    x2 = md.Tensor(np.ones(3), allow_grad=True)
    shared2 = x2 * 3
    keep_alive = md.sum(shared2 * 4)
    out3 = md.sum(shared2 * 2)
    out3.backward(cleanup_mode="prune")
    assert shared2.op_node is not None  # still referenced by keep_alive's graph
    assert keep_alive.op_node is not None


def test_retain_grads_keeps_intermediates(backend):
    x, a, b, out = build_chain()
    out.backward(retain_grads=True, cleanup_mode="keep")
    assert a.grad is not None and b.grad is not None
    x2, a2, b2, out2 = build_chain()
    out2.backward(retain_grads=False, cleanup_mode="keep")
    assert a2.grad is None and b2.grad is None
    assert x2.grad is not None  # leaves always keep their grads


def test_grad_accumulates_across_uses(backend):
    x = md.Tensor(np.array([2.0]), allow_grad=True)
    out = md.sum(x * 3 + x * 5)
    out.backward()
    np.testing.assert_allclose(np.asarray(x.grad), [8.0])


def test_broadcast_grad_unbroadcasts(backend):
    x = md.Tensor(np.ones((1, 4)), allow_grad=True)
    y = md.Tensor(np.ones((3, 4)), allow_grad=True)
    out = md.sum(x + y)
    out.backward()
    assert x.grad.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(x.grad), 3 * np.ones((1, 4)))
    np.testing.assert_allclose(np.asarray(y.grad), np.ones((3, 4)))


def test_scalar_times_tensor_tracks_scalar(backend):
    s = md.Tensor(np.array(2.0), allow_grad=True)
    v = md.Tensor(np.arange(3.0), allow_grad=True)
    out = md.sum(s * v)
    out.backward()
    np.testing.assert_allclose(np.asarray(s.grad), 3.0)


def test_no_grad_blocks_graph(backend):
    x = md.Tensor(np.ones(3), allow_grad=True)
    with md.no_grad():
        y = x * 2
    assert y.is_leaf and not y.allow_grad


def test_partial_no_grad_segment(backend):
    x = md.Tensor(np.ones(3), allow_grad=True)
    y = x * 2
    with md.no_grad():
        z = y * 10  # constant segment
    w = md.sum(y * 3)
    w.backward()
    np.testing.assert_allclose(np.asarray(x.grad), 6 * np.ones(3))
    assert z.is_leaf


def test_detached_input_gets_no_grad(backend):
    x = md.Tensor(np.ones(3), allow_grad=True)
    d = x.detach()
    out = md.sum(x * 2 + d * 5)
    out.backward()
    np.testing.assert_allclose(np.asarray(x.grad), 2 * np.ones(3))
    assert d.grad is None


def test_nondiff_op_breaks_flow_silently(backend):
    x = md.Tensor(np.array([1.0, -2.0]), allow_grad=True)
    s = md.sign(x)  # non-differentiable but still graphed
    out = md.sum(s * x)
    out.backward()
    # only the direct multiply path contributes
    np.testing.assert_allclose(np.asarray(x.grad), np.sign(np.asarray(x.detach())))


def test_none_vjp_slot_through_nonleaf_is_silent(backend):
    """A differentiable tensor feeding only a None-VJP slot (where's
    condition) must not crash the sweep; grads simply stop there."""
    w = md.Tensor(np.array([0.5, -0.5]), allow_grad=True)
    a = md.Tensor(np.array([1.0, 2.0]), allow_grad=True)
    cond = md.tanh(w)  # non-leaf feeding where's condition slot
    out = md.sum(md.where(cond > 0, a, 0.0))
    out.backward()
    assert a.grad is not None
    assert w.grad is None  # nothing flows through the condition
