"""Tensor API surface: factories, dunders, iteration, guards, IO."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as backend_mod


def test_construction_coercions(backend):
    assert md.Tensor([1, 2, 3]).shape == (3,)
    assert md.Tensor(5.0).size == 1
    assert md.Tensor(None).size == 0
    t = md.Tensor([1, 2], dtype=md.float32)
    assert t.dtype == md.float32
    # wrapping a Tensor unwraps first
    assert md.Tensor(t).shape == (2,)


def test_properties(backend):
    t = md.Tensor(np.arange(12.0).reshape(3, 4))
    assert t.shape == (3, 4)
    assert t.size == 12
    assert t.ndim == 2
    assert len(t) == 3
    assert t.T.shape == (4, 3)
    assert float(md.Tensor(7.0).item()) == 7.0
    with pytest.raises(ValueError):
        t.item()


def test_factories(backend):
    assert np.asarray(md.ones((2, 2))).tolist() == [[1, 1], [1, 1]]
    assert np.asarray(md.zeros(3)).tolist() == [0, 0, 0]
    assert np.asarray(md.full((2,), 7)).tolist() == [7, 7]
    base = md.Tensor(np.ones((2, 2)))
    assert np.asarray(md.full_like(base, 3)).tolist() == [[3, 3], [3, 3]]
    assert np.asarray(md.ones_like(base)).shape == (2, 2)
    assert np.asarray(md.zeros_like(base)).sum() == 0
    assert md.arange(5).shape == (5,)
    assert md.concatenate([md.ones(2), md.zeros(2)]).shape == (4,)
    assert md.stack([md.ones(2), md.zeros(2)]).shape == (2, 2)
    assert md.tile(md.ones(2), (3, 1)).shape == (3, 2)
    assert md.repeat(md.ones(2), 3).shape == (6,)


def test_random_factories(backend):
    assert md.rand(3, 2).shape == (3, 2)
    assert md.randn(4).shape == (4,)
    r = md.randint(0, 10, size=(5,))
    assert r.shape == (5,)
    assert np.asarray(r).max() < 10
    b = md.binomial(1, 0.5, (10,))
    assert set(np.asarray(b).tolist()) <= {0, 1}
    p = md.permutation(5)
    assert sorted(np.asarray(p).tolist()) == [0, 1, 2, 3, 4]
    c = md.choice(5, size=3)
    assert c.shape == (3,)
    s = md.Tensor(np.arange(6.0))
    md.shuffle(s)
    assert sorted(np.asarray(s).tolist()) == [0, 1, 2, 3, 4, 5]


def test_operator_surface(backend):
    a = md.Tensor(np.array([4.0, 9.0]))
    b = md.Tensor(np.array([2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(a + b), [6, 12])
    np.testing.assert_allclose(np.asarray(a - b), [2, 6])
    np.testing.assert_allclose(np.asarray(a * b), [8, 27])
    np.testing.assert_allclose(np.asarray(a / b), [2, 3])
    np.testing.assert_allclose(np.asarray(a // b), [2, 3])
    np.testing.assert_allclose(np.asarray(a % b), [0, 0])
    np.testing.assert_allclose(np.asarray(a**b), [16, 729])
    np.testing.assert_allclose(np.asarray(-a), [-4, -9])
    np.testing.assert_allclose(np.asarray(abs(md.Tensor([-1.0, 2.0]))), [1, 2])
    np.testing.assert_allclose(np.asarray(2.0 + a), [6, 11])
    np.testing.assert_allclose(np.asarray(2.0 * a), [8, 18])
    np.testing.assert_allclose(np.asarray(36.0 / a), [9, 4])
    np.testing.assert_allclose(np.asarray(2.0**b), [4, 8])
    assert bool(np.asarray(a > b).all())
    assert bool(np.asarray(a >= b).all())
    assert not bool(np.asarray(a < b).any())
    assert bool(np.asarray((a == a)).all())
    assert bool(np.asarray((a != b)).all())


def test_matmul_operator(backend):
    a = md.Tensor(np.eye(2))
    b = md.Tensor(np.array([[1.0, 2.0], [3.0, 4.0]]))
    np.testing.assert_allclose(np.asarray(a @ b), np.asarray(b))


def test_inplace_rebinds_untracked(backend):
    a = md.Tensor(np.array([1.0, 2.0]))
    a += 1
    np.testing.assert_allclose(np.asarray(a), [2, 3])
    a *= 2
    np.testing.assert_allclose(np.asarray(a), [4, 6])
    a -= 1
    a /= 2
    np.testing.assert_allclose(np.asarray(a), [1.5, 2.5])


def test_inplace_guard_on_tracked(backend):
    a = md.Tensor(np.ones(2), allow_grad=True)
    _ = a * 2  # a is now graphed
    with pytest.raises(ValueError):
        a += 1
    with pytest.raises(ValueError):
        a[0] = 5


def test_setitem_untracked(backend):
    a = md.Tensor(np.zeros(4))
    a[1] = 7
    a[2:] = 3
    np.testing.assert_allclose(np.asarray(a), [0, 7, 3, 3])


def test_iterator_is_fresh_each_time(backend):
    t = md.Tensor(np.arange(3.0))
    first = [float(v.item()) for v in t]
    second = [float(v.item()) for v in t]  # reference bug: second pass empty
    assert first == second == [0.0, 1.0, 2.0]


def test_detach_and_allow_grad(backend):
    a = md.Tensor(np.ones(2), allow_grad=True)
    d = a.detach()
    assert not d.allow_grad and d.is_leaf
    b = a * 2
    with pytest.raises(ValueError):
        b.allow_grad = False  # intermediate
    a.allow_grad = False  # leaf: allowed, clears grad
    assert not a.allow_grad


def test_numpy_protocol(backend):
    t = md.Tensor(np.arange(4.0))
    arr = np.asarray(t)
    assert isinstance(arr, np.ndarray)
    np.testing.assert_allclose(arr, [0, 1, 2, 3])
    assert np.sum(t) == 6.0


def test_save_load_roundtrip(backend, tmp_path):
    t = md.Tensor(np.random.randn(3, 3))
    path = str(tmp_path / "arr.npy")
    md.save(path, t)
    loaded = md.load(path)
    np.testing.assert_allclose(np.asarray(loaded), np.asarray(t))


def test_split_stack(backend):
    t = md.Tensor(np.arange(6.0))
    parts = md.split(t, 3)
    assert len(parts) == 3 and parts[0].shape == (2,)
    re = md.concatenate(parts)
    np.testing.assert_allclose(np.asarray(re), np.asarray(t))


def test_take_put_along_axis(backend):
    t = md.Tensor(np.array([[1.0, 5.0], [7.0, 3.0]]))
    idx = md.Tensor(np.array([[1], [0]]))
    taken = md.take_along_axis(t, idx, axis=1)
    np.testing.assert_allclose(np.asarray(taken), [[5.0], [7.0]])
    md.put_along_axis(t, idx, 0.0, axis=1)
    np.testing.assert_allclose(np.asarray(t), [[1.0, 0.0], [0.0, 3.0]])


def test_isin_unravel(backend):
    assert bool(np.asarray(md.isin(md.Tensor(2), [1, 2, 3])))
    ur = md.unravel_index(md.Tensor(np.array([5])), (2, 3))
    np.testing.assert_array_equal(np.asarray(ur).ravel(), [1, 2])


def test_index_add_accumulates_repeats(backend):
    t = md.Tensor(np.zeros(4))
    md.index_add(t, np.array([0, 0, 3]), np.array([1.0, 2.0, 5.0]))
    np.testing.assert_allclose(np.asarray(t), [3.0, 0.0, 0.0, 5.0])


def test_dtype_namespace(backend):
    assert md.float32 is not None
    assert md.bfloat16 is not None
    assert len(md.dtypes) == 13
    assert md.newaxis is None


def test_vmap(backend):
    f = md.vmap(lambda row: md.sum(row * row))
    out = f(md.Tensor(np.array([[1.0, 2.0], [3.0, 4.0]])))
    np.testing.assert_allclose(np.asarray(out), [5.0, 25.0])


def test_save_load_pytree_roundtrip(backend, tmp_path):
    from minidiff_tpu.utils import load_pytree, save_pytree

    tree = {
        "w": md.randn(3, 4).detach(allow_grad=True),
        "layers": [
            {"b": md.zeros((4,))},
            {"b": md.ones((4,))},
        ],
        "step": np.int64(7),
    }
    path = tmp_path / "ckpt.npz"
    save_pytree(path, tree)

    # restore into a like-structured tree: values match, allow_grad kept
    like = {
        "w": md.zeros((3, 4)).detach(allow_grad=True),
        "layers": [{"b": md.zeros((4,))}, {"b": md.zeros((4,))}],
        "step": np.int64(0),
    }
    out = load_pytree(path, like=like)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(out["w"]._data)),
        np.asarray(backend_mod.as_numpy(tree["w"]._data)),
    )
    assert out["w"].allow_grad
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(out["layers"][1]["b"]._data)), 1.0
    )
    assert int(out["step"]) == 7

    # pathwise reconstruction without `like`
    raw = load_pytree(path)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(raw["layers"][1]["b"]._data)), 1.0
    )
    assert isinstance(raw["layers"], list) and len(raw["layers"]) == 2


def test_load_pytree_missing_leaf_raises(tmp_path):
    from minidiff_tpu.utils import load_pytree, save_pytree

    path = tmp_path / "ckpt.npz"
    save_pytree(path, {"a": md.ones((2,))})
    with pytest.raises(KeyError):
        load_pytree(path, like={"a": md.zeros((2,)), "b": md.zeros((2,))})


def test_checkpoint_rejects_separator_keys(tmp_path):
    from minidiff_tpu.utils import save_pytree

    with pytest.raises(ValueError, match="separator"):
        save_pytree(tmp_path / "bad.npz", {"a/b": md.ones((2,))})


def test_checkpoint_single_leaf_roundtrip(tmp_path):
    from minidiff_tpu.utils import load_pytree, save_pytree

    path = tmp_path / "one.npz"
    save_pytree(path, md.ones((3,)))
    out = load_pytree(path)
    np.testing.assert_allclose(np.asarray(backend_mod.as_numpy(out._data)), 1.0)


def test_zero_dim_iter_raises_type_error(backend):
    with pytest.raises(TypeError, match="0-d"):
        iter(md.Tensor(np.array(1.0)))


def test_rebinding_factories_respect_mutation_guard(backend):
    x = md.Tensor(np.arange(4.0), allow_grad=True)
    mid = x * 2.0  # graph-tracked
    with pytest.raises(ValueError):
        md.index_add(mid, np.array([0]), 5.0)
    with pytest.raises(ValueError):
        md.shuffle(mid)
