"""reuse_graph: structural-hash toposort cache (minidiff_tpu/caching.py)."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.caching as mdc
from minidiff_tpu.tape import OpNode


def step(x, w):
    return md.sum(md.tanh(x @ w) ** 2)


def test_cached_backward_matches_uncached(backend):
    xn = np.random.randn(4, 4)
    wn = np.random.randn(4, 4)

    x = md.Tensor(xn)
    w = md.Tensor(wn, allow_grad=True)
    out = step(x, w)
    out.backward()
    expected = np.asarray(w.grad)

    with md.reuse_graph():
        for _ in range(3):
            x2 = md.Tensor(xn)
            w2 = md.Tensor(wn, allow_grad=True)
            out2 = step(x2, w2)
            out2.backward(cleanup_mode="keep")
            np.testing.assert_allclose(np.asarray(w2.grad), expected, rtol=1e-6)


def test_cache_hit_skips_toposort(backend, monkeypatch):
    calls = {"n": 0}
    original = OpNode.toposort

    def counting(self):
        calls["n"] += 1
        return original(self)

    monkeypatch.setattr(OpNode, "toposort", counting)

    with md.reuse_graph():
        for i in range(4):
            w = md.Tensor(np.random.randn(3, 3), allow_grad=True)
            out = md.sum(md.sin(w) * w)
            out.backward(cleanup_mode="keep")
    # only the first backward of the (structurally identical) graph toposorts
    assert calls["n"] == 1


def test_different_structures_get_different_cache_entries(backend):
    with md.reuse_graph():
        w = md.Tensor(np.random.randn(3,), allow_grad=True)
        out1 = md.sum(md.sin(w))
        out1.backward(cleanup_mode="keep")
        g1 = np.asarray(w.grad)

        w2 = md.Tensor(np.random.randn(3,), allow_grad=True)
        out2 = md.sum(md.cos(w2))  # different op → different hash
        out2.backward(cleanup_mode="keep")
        np.testing.assert_allclose(
            np.asarray(w2.grad), -np.sin(np.asarray(w2.detach())), rtol=1e-6
        )
        np.testing.assert_allclose(g1, np.cos(np.asarray(w.detach())), rtol=1e-6)


def test_indices_require_active_context(backend):
    w = md.Tensor(np.random.randn(3,), allow_grad=True)
    out = md.sum(md.sin(w))
    with pytest.raises(ValueError):
        mdc.backward_indices_for_root(out.op_node)


def test_cache_cleared_on_exit(backend):
    with md.reuse_graph():
        w = md.Tensor(np.random.randn(3,), allow_grad=True)
        out = md.sum(md.sin(w))
        out.backward(cleanup_mode="keep")
    assert not mdc.currently_caching()
