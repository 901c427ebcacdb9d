"""reuse_graph: structural-hash toposort cache (minidiff_tpu/caching.py)."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as backend_mod
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
    import minidiff_tpu.caching as mdc

    topo_calls = {"n": 0}
    original = OpNode.toposort

    def counting(self):
        topo_calls["n"] += 1
        return original(self)

    monkeypatch.setattr(OpNode, "toposort", counting)

    with md.reuse_graph():
        for i in range(4):
            w = md.Tensor(np.random.randn(3, 3), allow_grad=True)
            out = md.sum(md.sin(w) * w)
            out.backward(cleanup_mode="keep")
        # one memo entry serves all four structurally identical graphs ...
        assert len(mdc._replay_paths.get()) == 1
    # ... and the path-building DFS is fused into the cache-miss handler:
    # OpNode.toposort (the uncached traversal) never runs inside the context
    assert topo_calls["n"] == 0


def test_fused_path_builder_matches_toposort_order(backend):
    """The fused DFS (paths assigned while descending) must emit exactly
    OpNode.toposort's postorder, so replayed and fresh traversals are
    interchangeable — exercised on a diamond with a repeated input."""
    import minidiff_tpu.caching as mdc

    with md.reuse_graph():
        a = md.Tensor(np.random.randn(3), allow_grad=True)
        b = md.Tensor(np.random.randn(3), allow_grad=True)
        s = md.sin(a) * b          # shared intermediate
        out = md.sum(s * s + md.cos(s) + a)   # diamond + repeated s + leaf reuse
        replayed = mdc.replay_traversal(out.op_node)
        fresh = out.op_node.toposort()
        assert [id(t) for t in replayed] == [id(t) for t in fresh]
        out.backward(cleanup_mode="keep")
    # grads stay correct through the replayed order
    sa = np.asarray(a.detach(), np.float64)
    sb = np.asarray(b.detach(), np.float64)
    sv = np.sin(sa) * sb
    want_a = (2 * sv - np.sin(sv)) * np.cos(sa) * sb + 1.0
    np.testing.assert_allclose(np.asarray(a.grad, np.float64), want_a,
                               rtol=1e-5)


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


# ---------------------------------------------------------------------------
# compiled backward replay (reuse_graph's executable cache, xla only)
# ---------------------------------------------------------------------------


def _grads(use_cache, an, bn, fn):
    a = md.Tensor(an, allow_grad=True)
    b = md.Tensor(bn, allow_grad=True)
    if use_cache:
        with md.reuse_graph():
            fn(a, b).backward()
    else:
        fn(a, b).backward()
    return (
        np.asarray(backend_mod.as_numpy(a.grad._data)),
        np.asarray(backend_mod.as_numpy(b.grad._data)),
    )


def test_compiled_replay_matches_eager_across_instances():
    md.set_backend("xla")
    import minidiff_tpu.compiled_backward as mcb

    n_before = len(mcb._cache)

    def fn(a, b):
        return md.sum(md.tanh(a @ b) ** 2 + md.mean(a, axis=0))

    rng = np.random.RandomState(0)
    for _ in range(3):  # fresh graph instances, same structure
        an, bn = rng.randn(8, 8), rng.randn(8, 8)
        ge = _grads(False, an, bn, fn)
        gc = _grads(True, an, bn, fn)
        for e, c in zip(ge, gc):
            np.testing.assert_allclose(e, c, rtol=1e-4, atol=1e-6)
    assert len(mcb._cache) == n_before + 1  # one executable, three replays


def test_compiled_replay_distinguishes_static_kwargs():
    """Same op structure, different axis kwarg -> different executables."""
    md.set_backend("xla")
    import minidiff_tpu.compiled_backward as mcb

    n_before = len(mcb._cache)
    rng = np.random.RandomState(0)
    an, bn = rng.randn(4, 6), rng.randn(4, 6)

    for axis in (0, 1):
        fn = lambda a, b, axis=axis: md.sum(md.sum(a * b, axis=axis) ** 2)
        ge = _grads(False, an, bn, fn)
        gc = _grads(True, an, bn, fn)
        for e, c in zip(ge, gc):
            np.testing.assert_allclose(e, c, rtol=1e-4, atol=1e-6)
    assert len(mcb._cache) == n_before + 2


def test_compiled_replay_respects_retain_grads_and_cleanup():
    md.set_backend("xla")
    a = md.Tensor(np.ones((3, 3)), allow_grad=True)
    with md.reuse_graph():
        mid = a * 2.0
        out = md.sum(mid**2)
        out.backward(retain_grads=True, cleanup_mode="keep")
    assert mid.grad is not None  # retained intermediate
    assert mid.op_node is not None  # keep: graph survives
    # prune default: end state identical to the eager sweep's
    def run(cached):
        a2 = md.Tensor(np.ones((3, 3)), allow_grad=True)
        if cached:
            with md.reuse_graph():
                mid2 = a2 * 2.0
                out2 = md.sum(mid2**2)
                out2.backward()
        else:
            mid2 = a2 * 2.0
            out2 = md.sum(mid2**2)
            out2.backward()
        return a2, mid2

    ae, me = run(False)
    ac, mc = run(True)
    assert (me.grad is None) == (mc.grad is None)
    assert (me.op_node is None) == (mc.op_node is None)
    assert me.consumer_refs == mc.consumer_refs
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(ac.grad._data)),
        np.asarray(backend_mod.as_numpy(ae.grad._data)),
    )


def test_compiled_replay_skips_numpy_backend():
    md.set_backend("numpy")
    import minidiff_tpu.compiled_backward as mcb

    n_before = len(mcb._cache)
    a = md.Tensor(np.ones(4), allow_grad=True)
    with md.reuse_graph():
        md.sum(a * a).backward()
    np.testing.assert_allclose(np.asarray(a.grad._data), 2.0 * np.ones(4))
    assert len(mcb._cache) == n_before  # nothing compiled
    md.set_backend("xla")


def test_compiled_replay_does_not_pin_graph_tensors():
    """The executable cache must not retain the traced graph instance."""
    import gc
    import weakref

    md.set_backend("xla")

    def run():
        a = md.Tensor(np.ones((16, 16)), allow_grad=True)
        with md.reuse_graph():
            mid = md.tanh(a @ a)
            out = md.sum(mid**2)
            out.backward()
        return weakref.ref(mid), weakref.ref(out)

    mid_ref, out_ref = run()
    gc.collect()
    assert mid_ref() is None, "compiled replay pinned an intermediate tensor"
    assert out_ref() is None, "compiled replay pinned the root tensor"


def test_reuse_graph_with_outside_built_inputs_falls_back(backend):
    """Graphs partially built OUTSIDE reuse_graph must not crash or collide
    in the replay cache — backward falls back to a real toposort."""
    x = md.Tensor(np.array([1.0, 2.0]), allow_grad=True)
    y = x * 2.0  # built outside the caching context
    with md.reuse_graph():
        z = md.sum(y * 3.0)
        z.backward(cleanup_mode="keep")
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(x.grad._data)), [6.0, 6.0]
    )


def test_alias_patterns_do_not_collide(backend):
    """(a*b) and (c*c) share op structure but not aliasing; both must work
    under one reuse_graph context."""
    with md.reuse_graph():
        a = md.Tensor(np.array([2.0]), allow_grad=True)
        b = md.Tensor(np.array([3.0]), allow_grad=True)
        md.sum(a * b).backward(cleanup_mode="keep")
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(a.grad._data)), [3.0])

        c = md.Tensor(np.array([4.0]), allow_grad=True)
        md.sum(c * c).backward(cleanup_mode="keep")
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(c.grad._data)), [8.0])

        d = md.Tensor(np.array([5.0]), allow_grad=True)
        md.sum(d + 1.0).backward(cleanup_mode="keep")
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(d.grad._data)), [1.0])


def test_cross_node_sharing_hashes_apart(backend):
    """Shared-interior (diamond) graphs must not collide with their
    unshared twins — a collision replays a traversal that silently drops
    gradient terms."""
    ref = float(
        (np.cos(np.tanh(0.3)) - np.sin(np.tanh(0.3))) * (1 - np.tanh(0.3) ** 2)
    )
    with md.reuse_graph():
        x = md.Tensor(np.array([0.3]), allow_grad=True)
        y = md.tanh(x)
        md.sum(md.sin(y) + md.cos(y)).backward(cleanup_mode="keep")
        np.testing.assert_allclose(
            float(np.asarray(backend_mod.as_numpy(x.grad._data))[0]), ref,
            rtol=1e-6)
        x2 = md.Tensor(np.array([0.3]), allow_grad=True)
        md.sum(md.sin(md.tanh(x2)) + md.cos(md.tanh(x2))).backward(
            cleanup_mode="keep")
        np.testing.assert_allclose(
            float(np.asarray(backend_mod.as_numpy(x2.grad._data))[0]), ref,
            rtol=1e-6)


def test_none_vjp_slot_under_reuse_graph(backend):
    """The compiled replay needs the same None-grad guard as the eager
    sweep (where's condition through a non-leaf)."""
    with md.reuse_graph():
        t = md.Tensor(np.array([0.2, -0.2]), allow_grad=True)
        a = md.Tensor(np.array([1.0, 2.0]), allow_grad=True)
        c = md.tanh(t)
        md.sum(md.where(c > 0, a * 2.0, a * 3.0)).backward()
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(a.grad._data)), [2.0, 3.0])
    assert t.grad is None
