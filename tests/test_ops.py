"""Per-op forward + gradient checks against the finite-difference oracle.

Covers the reference suite's 34 op tests (reference tests/test_ops.py) as a
parameterized table, plus the coverage the reference lacks: tensordot with
explicit/partial axes, batched matmul, astype, mod/floor_divide forwards,
comparison and logical ops, and 1-D/2-D/N-D dot.

Contract per op (mirrors the reference harness semantics,
tests/test_ops.py:25-62): the op's forward matches the raw backend function,
and the tape's gradients of an L2 loss around the op match central finite
differences.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as backend
import minidiff_tpu.backend as backend_mod
from minidiff_tpu.utils import compute_grads

RTOL = 1e-4
ATOL = 1e-6
H = 1e-3
# 5 randomized repetitions per op, matching the reference's breadth
# (reference tests/test_ops.py loops 5x with fresh inputs AND fresh kwargs)
TRIALS = 5


def _mask_nans(a: np.ndarray, b: np.ndarray):
    bad = np.isnan(a) | np.isnan(b)
    return np.where(bad, 0, a), np.where(bad, 0, b)


def check_op(
    op: Callable,
    backend_name: str,
    args: Sequence[Any],
    kwargs: Optional[Dict[str, Any]] = None,
    exclude: Optional[Sequence[md.Tensor]] = None,
    grad_check: bool = True,
):
    kwargs = kwargs or {}
    raw_fn = getattr(backend, backend_name)

    out = op(*args, **kwargs)
    expected = raw_fn(
        *[md.try_unwrap(a) for a in args],
        **{k: md.try_unwrap(v) for k, v in kwargs.items()},
    )
    got, want = _mask_nans(
        np.asarray(backend.as_numpy(out._data)), np.asarray(backend.as_numpy(expected))
    )
    assert np.allclose(got, want, rtol=RTOL, atol=ATOL), (
        f"forward mismatch for {backend_name}:\n{got}\nvs\n{want}"
    )

    if not grad_check:
        return

    def loss(*loss_args):
        value = op(*loss_args, **kwargs)
        return md.sum((md.zeros_like(value) - value) ** 2) / 2

    manual, auto = compute_grads(*args, func=loss, exclude=exclude, h=H)
    for i, (m, a) in enumerate(zip(manual, auto)):
        if m is None and a is None:
            continue
        m, a = _mask_nans(np.asarray(m), np.asarray(a))
        assert np.allclose(m, a, rtol=1e-3, atol=1e-5), (
            f"gradient mismatch wrt arg {i} for {backend_name}:\n"
            f"finite-diff:\n{m}\ntape:\n{a}\nmax err {np.max(np.abs(m - a))}"
        )


def rnd(*shape):
    return md.randn(*shape, allow_grad=True)


def rand_axis_subset():
    return random.choice(
        [tuple(random.sample(range(4), k=random.randint(0, 4))), None]
    )


# ---------------------------------------------------------------------------
# elementwise unary
# ---------------------------------------------------------------------------

ELEMENTWISE_UNARY = [
    "absolute", "cos", "cosh", "erf", "exp", "log", "sin", "sinh", "tan",
    "tanh",
]


@pytest.mark.parametrize("name", ELEMENTWISE_UNARY)
def test_elementwise_unary(backend, name):
    for _ in range(TRIALS):
        if name == "tan":
            # keep inputs away from the poles: central differences of tan
            # near ±π/2 are dominated by truncation error
            x = md.Tensor(np.random.uniform(-1.2, 1.2, (2, 2, 2, 2)), allow_grad=True)
        else:
            x = rnd(2, 2, 2, 2)
        check_op(getattr(md, name), name, [x])


NON_DIFF_UNARY = ["ceil", "floor", "sign", "all", "any", "argmax", "argmin"]


@pytest.mark.parametrize("name", NON_DIFF_UNARY)
def test_non_differentiable_unary_forward(backend, name):
    check_op(getattr(md, name), name, [rnd(2, 2, 2, 2)], grad_check=False)
    # gradients must not flow through non-differentiable ops
    x = rnd(2, 2)
    out = md.sum(getattr(md, name)(x).astype(x.dtype) * 1.0)
    out.backward()
    assert x.grad is None


# ---------------------------------------------------------------------------
# shape manipulation
# ---------------------------------------------------------------------------

def test_ravel(backend):
    for _ in range(TRIALS):
        check_op(md.ravel, "ravel", [rnd(2, 2, 2, 2)],
                 {"order": random.choice(["C", "F"])})


def test_flatten(backend):
    for _ in range(TRIALS):
        check_op(md.flatten, "flatten", [rnd(2, 2, 2, 2)],
                 {"order": random.choice(["C", "F"])})


def test_squeeze(backend):
    for _ in range(TRIALS):
        # random single size-1 axis, or None (squeeze all)
        axis = random.choice([None, 0, 2, (0,), (2,), (0, 2)])
        kwargs = {} if axis is None else {"axis": axis}
        check_op(md.squeeze, "squeeze", [rnd(1, 2, 1, 2)], kwargs)


def test_fortran_order_grads_route_back_correctly(backend):
    """Regression (round-2 fuzz find): flatten/ravel/reshape with
    order='F' must un-map the cotangent in F order — the kwarg was not
    propagated to the VJPs, silently producing C-order (permuted) grads."""
    x = md.Tensor(np.arange(6.0).reshape(2, 3), allow_grad=True)
    w = md.Tensor(np.arange(6.0) + 1.0)
    md.sum(md.flatten(x, order="F") * w).backward()
    # weight i lands on the i-th element in column-major order
    want = (np.arange(6.0) + 1.0).reshape((2, 3), order="F")
    np.testing.assert_allclose(np.asarray(x.grad.detach()), want)
    x2 = md.Tensor(np.arange(6.0).reshape(2, 3), allow_grad=True)
    md.sum(md.reshape(x2, (3, 2), order="F") * w.reshape((3, 2), order="F")
           ).backward()
    np.testing.assert_allclose(np.asarray(x2.grad.detach()), want)


def test_squeeze_partial_axis_grad(backend):
    """Regression (round-2 fuzz find): squeeze(axis=0) on a (1, 2, 1, 2)
    tensor keeps the OTHER size-1 axis; the un-propagated VJP re-inserted
    every size-1 axis and produced a wrong-shaped gradient."""
    x = md.Tensor(np.random.randn(1, 2, 1, 2), allow_grad=True)
    out = md.squeeze(x, axis=0)
    assert tuple(int(d) for d in out.shape) == (2, 1, 2)
    md.sum(out * md.Tensor(np.arange(4.0).reshape(2, 1, 2))).backward()
    np.testing.assert_allclose(
        np.asarray(x.grad.detach()),
        np.arange(4.0).reshape(1, 2, 1, 2))


def test_expand_dims(backend):
    for _ in range(TRIALS):
        axes = tuple(random.sample(range(4), k=random.randint(0, 4)))
        check_op(md.expand_dims, "expand_dims", [rnd(2, 2, 2, 2), axes])


def test_reshape(backend):
    for _ in range(TRIALS):
        shape = random.choice([(4, 4), (16,), (2, 8), (8, 2), (2, 2, 4),
                               (4, 2, 2), (1, 16)])
        check_op(md.reshape, "reshape", [rnd(2, 2, 2, 2), shape])


def test_transpose(backend):
    for _ in range(TRIALS):
        axes = tuple(int(v) for v in np.random.permutation(4))
        check_op(md.transpose, "transpose", [rnd(2, 2, 2, 2)], {"axes": axes})


def test_swapaxes(backend):
    for _ in range(TRIALS):
        check_op(
            md.swapaxes,
            "swapaxes",
            [rnd(2, 2, 2, 2), random.randint(0, 3), random.randint(0, 3)],
        )


def test_flip(backend):
    for _ in range(TRIALS):
        check_op(md.flip, "flip", [rnd(2, 2, 2, 2)], {"axis": rand_axis_subset()})


def test_broadcast_to(backend):
    for _ in range(TRIALS):
        check_op(md.broadcast_to, "broadcast_to", [rnd(2, 2, 2, 2), (4, 2, 2, 2, 2)])


def test_atleast_nd(backend):
    for name in ("atleast_1d", "atleast_2d", "atleast_3d"):
        check_op(getattr(md, name), name, [rnd(2, 2, 2, 2)])
        check_op(getattr(md, name), name, [rnd(3)])


def test_copy(backend):
    check_op(md.copy, "copy", [rnd(2, 2, 2, 2)])


def test_getitem(backend):
    for _ in range(TRIALS):
        indices = md.randint(low=(0, 0, 0, 0), high=(2, 2, 2, 2))
        check_op(
            md.getitem,
            "getitem",
            [rnd(2, 2, 2, 2), indices],
            exclude=[indices],
        )


def test_getitem_slices(backend):
    x = rnd(4, 4)
    check_op(md.getitem, "getitem", [x, (slice(1, 3), slice(None))])


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def _well_separated(*shape):
    """Random tensor whose values are pairwise >= 0.05 apart: finite
    differences of max/min split the derivative across near-ties closer
    than h, which the exact equality-mask VJP rightly does not."""
    n = int(np.prod(shape))
    vals = np.random.permutation(n) * 0.1 + np.random.uniform(-0.02, 0.02)
    return md.Tensor(vals.reshape(shape), allow_grad=True)


@pytest.mark.parametrize("name", ["sum", "mean", "max", "min", "prod", "std"])
def test_reductions(backend, name):
    for _ in range(TRIALS):
        x = _well_separated(2, 2, 2, 2) if name in ("max", "min") \
            else rnd(2, 2, 2, 2)
        check_op(
            getattr(md, name),
            name,
            [x],
            {"axis": rand_axis_subset(),
             "keepdims": random.choice([True, False])},
        )


@pytest.mark.parametrize("name", ["sum", "mean", "max", "min"])
def test_reductions_keepdims(backend, name):
    check_op(
        getattr(md, name),
        name,
        [rnd(2, 3, 4)],
        {"axis": (0, 2), "keepdims": True},
    )


def test_reduction_negative_axis(backend):
    check_op(md.sum, "sum", [rnd(2, 3, 4)], {"axis": -1})
    check_op(md.mean, "mean", [rnd(2, 3, 4)], {"axis": (-1, 0)})


def test_cumsum(backend):
    check_op(md.cumsum, "cumsum", [rnd(2, 3, 4)], {"axis": 1})
    check_op(md.cumsum, "cumsum", [rnd(2, 3, 4)], {"axis": -1})
    check_op(md.cumsum, "cumsum", [rnd(3, 4)])  # axis=None scans the flat array


def test_sort(backend):
    check_op(md.sort, "sort", [rnd(2, 3, 4)], {"axis": -1})
    check_op(md.sort, "sort", [rnd(2, 3, 4)], {"axis": 1})
    check_op(md.sort, "sort", [rnd(3, 4)], {"axis": None}, grad_check=False)
    # axis=None grad: flattened-sort cotangent lands back at source positions
    x = md.Tensor(np.random.randn(3, 4), allow_grad=True)
    out = md.sum(md.sort(x, axis=None) * md.Tensor(np.arange(12.0)))
    out.backward()
    flat = np.asarray(x.detach()).ravel()
    expect = np.empty(12)
    expect[np.argsort(flat)] = np.arange(12.0)
    np.testing.assert_allclose(np.asarray(x.grad).ravel(), expect, rtol=1e-10)


def test_argsort_forward(backend):
    check_op(md.argsort, "argsort", [rnd(2, 3, 4)], {"axis": -1},
             grad_check=False)


def test_gather_grad(backend):
    x = md.Tensor(np.random.randn(3, 5), allow_grad=True)
    idx = md.Tensor(np.array([[4, 0], [1, 1], [2, 3]]))
    out = md.gather(x, idx, axis=-1)
    np.testing.assert_allclose(
        np.asarray(out.detach()),
        np.take_along_axis(np.asarray(x.detach()), np.asarray(idx.detach()), -1),
    )
    md.sum(out).backward()
    g = np.asarray(x.grad)
    # row 1 picked index 1 twice -> grad 2 there; unpicked positions 0
    assert g[1, 1] == 2 and g[0, 4] == 1 and g[0, 1] == 0


def test_topk_values_and_grads(backend):
    np.random.seed(0)
    x = md.Tensor(np.random.randn(4, 9), allow_grad=True)
    vals, idx = md.topk(x, 3, axis=-1)
    xn = np.asarray(x.detach())
    expect = -np.sort(-xn, axis=-1)[:, :3]
    np.testing.assert_allclose(np.asarray(vals.detach()), expect, rtol=1e-12)
    np.testing.assert_array_equal(
        np.take_along_axis(xn, np.asarray(idx.detach()).astype(int), -1),
        np.asarray(vals.detach()),
    )
    md.sum(vals).backward()
    g = np.asarray(x.grad)
    assert g.sum() == 12  # 4 rows x 3 picks
    assert ((g == 0) | (g == 1)).all()
    # axis=0 variant
    vals0, _ = md.topk(x.detach(allow_grad=True), 2, axis=0)
    np.testing.assert_allclose(np.asarray(vals0.detach()),
                               -np.sort(-xn, axis=0)[:2], rtol=1e-12)


@pytest.mark.parametrize("name", ["maximum", "minimum"])
def test_elementwise_extrema(backend, name):
    for _ in range(TRIALS):
        check_op(getattr(md, name), name, [rnd(2, 3, 4), rnd(2, 3, 4)])
    # broadcasting
    check_op(getattr(md, name), name, [rnd(2, 3, 4), rnd(4)])


# ---------------------------------------------------------------------------
# binary arithmetic
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["add", "subtract", "multiply", "true_divide", "power"])
def test_binary_arithmetic(backend, name):
    for _ in range(TRIALS):
        if name == "true_divide":
            # denominators bounded away from 0: finite differences of x/y are
            # truncation-dominated when |y| ~ h
            y = md.Tensor(
                np.sign(np.random.randn(2, 2, 2, 2))
                * (np.abs(np.random.randn(2, 2, 2, 2)) + 0.5),
                allow_grad=True,
            )
        else:
            y = rnd(2, 2, 2, 2)
        check_op(getattr(md, name), name, [rnd(2, 2, 2, 2), y])


@pytest.mark.parametrize("name", ["add", "multiply", "subtract"])
def test_binary_broadcasting(backend, name):
    # broadcast both prepend-axes and stretched-axes paths of unbroadcast
    check_op(getattr(md, name), name, [rnd(3, 1, 4), rnd(2, 4)])


def test_mod_forward_and_reference_grad_semantics(backend):
    # mod keeps the reference's convention: pass grad through except at exact
    # multiples (reference definitions.py:493-497)
    x = md.Tensor(np.array([5.0, 6.0, 7.5]), allow_grad=True)
    y = md.Tensor(np.array([2.0, 3.0, 2.5]), allow_grad=True)
    check_op(md.mod, "mod", [x.detach(True), y.detach(True)], grad_check=False)
    out = md.sum(md.mod(x, y))
    out.backward()
    np.testing.assert_allclose(np.asarray(x.grad), [1.0, 0.0, 0.0])


def test_floor_divide_forward(backend):
    check_op(
        md.floor_divide,
        "floor_divide",
        [rnd(2, 2) * 10, md.Tensor(np.full((2, 2), 3.0), allow_grad=True)],
        grad_check=False,
    )


@pytest.mark.parametrize(
    "name",
    ["equal", "not_equal", "greater", "greater_equal", "less", "less_equal"],
)
def test_comparisons_forward(backend, name):
    check_op(getattr(md, name), name, [rnd(2, 2), rnd(2, 2)], grad_check=False)


@pytest.mark.parametrize("name", ["logical_and", "logical_or", "logical_xor"])
def test_logicals_forward(backend, name):
    a = md.Tensor(np.random.rand(3, 3) > 0.5)
    b = md.Tensor(np.random.rand(3, 3) > 0.5)
    got = getattr(md, name)(a, b)
    want = getattr(np, name)(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_astype(backend):
    x = rnd(2, 2)
    out = md.astype(x, md.float32)
    assert out.dtype == md.float32
    loss = md.sum(out * 2.0)
    loss.backward()
    assert x.grad.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(x.grad), 2.0 * np.ones((2, 2)), rtol=1e-5)


# ---------------------------------------------------------------------------
# contractions
# ---------------------------------------------------------------------------

def test_dot_1d(backend):
    for _ in range(TRIALS):
        check_op(md.dot, "dot", [rnd(4), rnd(4)])


def test_dot_2d(backend):
    check_op(md.dot, "dot", [rnd(3, 4), rnd(4, 5)])


def test_dot_nd(backend):
    # reference's dot VJP is elementwise (1-D only); ours is general
    check_op(md.dot, "dot", [rnd(2, 3, 4), rnd(4, 5)])


def test_matmul_2d(backend):
    for _ in range(TRIALS):
        check_op(md.matmul, "matmul", [rnd(10, 30), rnd(30, 20)])


def test_matmul_batched(backend):
    # untested (and broken) in the reference: batched operands
    check_op(md.matmul, "matmul", [rnd(3, 4, 5), rnd(3, 5, 6)])
    check_op(md.matmul, "matmul", [rnd(3, 4, 5), rnd(5, 6)])


def test_matmul_1d_cases(backend):
    check_op(md.matmul, "matmul", [rnd(4), rnd(4, 3)])
    check_op(md.matmul, "matmul", [rnd(3, 4), rnd(4)])
    check_op(md.matmul, "matmul", [rnd(4), rnd(4)])


def test_tensordot_default(backend):
    for _ in range(TRIALS):
        check_op(md.tensordot, "tensordot", [rnd(2, 2, 2, 2), rnd(2, 2, 2, 2)])


@pytest.mark.parametrize(
    "shapes,axes",
    [
        (((3, 4), (4, 5)), 1),
        (((2, 3, 4), (4, 3, 5)), ((1, 2), (1, 0))),
        (((2, 3, 4), (3, 4, 5)), ((2, 1), (1, 0))),
        (((5, 2, 3), (2, 3, 4)), 2),
    ],
)
def test_tensordot_axes_variants(backend, shapes, axes):
    # the reference only ever tests axes=2 (tests/test_ops.py:366-376)
    sx, sy = shapes
    check_op(md.tensordot, "tensordot", [rnd(*sx), rnd(*sy)], {"axes": axes})


# ---------------------------------------------------------------------------
# ternary / misc
# ---------------------------------------------------------------------------

def test_where(backend):
    for _ in range(TRIALS):
        cond = md.binomial(1, random.uniform(0.2, 0.8), (2, 2, 2, 2))
        check_op(
            md.where,
            "where",
            [cond, rnd(2, 2, 2, 2), rnd(2, 2, 2, 2)],
            exclude=[cond],
        )


def test_clip(backend):
    for _ in range(TRIALS):
        check_op(
            md.clip,
            "clip",
            [rnd(2, 2, 2, 2), random.uniform(-1.5, -0.5), random.uniform(0.5, 1.5)],
        )


def test_clip_one_sided(backend):
    x = rnd(3, 3)
    out = md.sum(md.clip(x, 0.0, None))
    out.backward()
    expected = (np.asarray(x.detach()) > 0).astype(float)
    np.testing.assert_allclose(np.asarray(x.grad), expected)


def test_unbroadcast_op(backend):
    x = rnd(4, 3)
    out = md.unbroadcast(md.broadcast_to(x, (5, 4, 3)), (4, 3))
    assert out.shape == (4, 3)
    loss = md.sum(out**2) / 2
    loss.backward()
    np.testing.assert_allclose(
        np.asarray(x.grad), 5 * np.asarray(x.detach()) * 5, rtol=1e-6
    )


def test_scatter_add(backend):
    x = rnd(5)
    idx = md.Tensor(np.array([0, 0, 2]))
    vals = rnd(3)
    out = md.scatter_add(x, idx, vals)
    expected = np.zeros(5)
    np.add.at(expected, np.asarray(idx), np.asarray(vals.detach()))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    loss = md.sum(out * out)
    loss.backward()
    np.testing.assert_allclose(
        np.asarray(vals.grad), 2 * expected[np.asarray(idx)], rtol=1e-6
    )


def test_sqrt_square(backend):
    x = md.Tensor(np.abs(np.random.randn(3, 3)) + 0.5, allow_grad=True)
    out = md.sum(md.sqrt(x))
    out.backward()
    np.testing.assert_allclose(
        np.asarray(x.grad), 0.5 / np.sqrt(np.asarray(x.detach())), rtol=1e-5
    )
    y = rnd(3, 3)
    out2 = md.sum(md.square(y))
    out2.backward()
    np.testing.assert_allclose(
        np.asarray(y.grad), 2 * np.asarray(y.detach()), rtol=1e-5
    )


def test_concat_is_differentiable(backend):
    a, b, c = md.randn(2, 3), md.randn(2, 2), md.randn(2, 4)
    out = md.concat([a, b, c], axis=1)
    assert out.shape == (2, 9)
    want = np.concatenate([np.asarray(backend_mod.as_numpy(t._data))
                           for t in (a, b, c)], axis=1)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(out._data)), want, rtol=1e-6)
    manual, auto = compute_grads(
        a, b, c, func=lambda x, y, z: md.sum(md.concat([x, y, z], axis=1) ** 2)
    )
    for m, g in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(m._data)),
            np.asarray(backend_mod.as_numpy(g._data)),
            rtol=1e-3, atol=1e-4,
        )
    # negative axis + second order
    x = md.randn(2, 2).detach(allow_grad=True)
    out = md.sum(md.concat([x, x * 2.0], axis=-1) ** 2)
    out.backward(allow_higher_order=True)
    md.sum(x.grad * x.grad).backward()
    assert x.grad.shape == x.shape


def test_matmul_batched_x_with_1d_y_gradcheck(backend):
    x = md.randn(2, 3, 4)
    y = md.randn(4)
    manual, auto = compute_grads(
        x, y, func=lambda a, b: md.sum(md.matmul(a, b) ** 2) / 2
    )
    for m, g in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(m._data)),
            np.asarray(backend_mod.as_numpy(g._data)),
            rtol=1e-3, atol=1e-4)


def test_matmul_1d_x_with_batched_y_gradcheck(backend):
    x = md.randn(4)
    y = md.randn(2, 4, 3)
    manual, auto = compute_grads(
        x, y, func=lambda a, b: md.sum(md.matmul(a, b) ** 2) / 2
    )
    for m, g in zip(manual, auto):
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(m._data)),
            np.asarray(backend_mod.as_numpy(g._data)),
            rtol=1e-3, atol=1e-4)


def test_power_grad_no_nan_at_zero_base(backend):
    x = md.Tensor(np.array([0.0, 2.0]), allow_grad=True)
    md.sum(md.power(x, 0)).backward()
    g = np.asarray(backend_mod.as_numpy(x.grad._data))
    np.testing.assert_allclose(g, [0.0, 0.0])  # d/dx x^0 = 0, not NaN
    # tensor exponent with a zero slot
    x2 = md.Tensor(np.array([0.0, 2.0]), allow_grad=True)
    e = md.Tensor(np.array([0.0, 3.0]))
    md.sum(md.power(x2, e)).backward()
    g2 = np.asarray(backend_mod.as_numpy(x2.grad._data))
    np.testing.assert_allclose(g2, [0.0, 12.0])


def test_zero_dim_reduction_negative_axis_backward():
    # numpy permits axis=-1 on 0-d arrays (jax raises at the forward, so this
    # reference quirk is numpy-backend-only); the BACKWARD must not crash
    md.set_backend("numpy")
    x = md.Tensor(np.array(3.0), allow_grad=True)
    md.sum(x, axis=-1).backward()
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(x.grad._data)), 1.0)


def test_unbroadcast_same_shape_does_not_corrupt_leaf(backend):
    leaf = md.Tensor(np.array([1.0, 2.0]), allow_grad=True)
    out = md.unbroadcast(leaf, (2,))
    assert out is not leaf
    assert leaf.op_node is None and leaf.is_leaf
    md.sum(out * 2.0).backward()
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(leaf.grad._data)), [2.0, 2.0])


def test_getitem_clamped_negative_slice_grad(backend):
    x = md.Tensor(np.arange(5.0), allow_grad=True)
    y = x[-7:-4]  # numpy resolves to x[0:1]
    assert y.shape == (1,)
    md.sum(y).backward()
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(x.grad._data)), [1, 0, 0, 0, 0])


def test_getitem_bool_scalar_index_grad(backend):
    x = md.Tensor(np.array([0.0, 1.0, 2.0]), allow_grad=True)
    y = x[True]  # adds a leading axis, not integer index 1
    assert y.shape == (1, 3)
    md.sum(y).backward()
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(x.grad._data)), [1.0, 1.0, 1.0])


def test_vmap_extra_args_pass_through_unmapped(backend):
    xs = md.Tensor(np.ones((3, 2)))
    bias = md.Tensor(np.array([10.0, 20.0]))
    out = md.vmap(lambda row, b: row + b)(xs, bias)
    assert out.shape == (3, 2)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(out._data)),
        np.full((3, 2), 1.0) + np.array([10.0, 20.0]))


# ---------------------------------------------------------------------------
# einsum
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("spec,shapes", [
    ("ij,jk->ik", [(3, 4), (4, 5)]),
    ("bij,bjk->bik", [(2, 3, 4), (2, 4, 5)]),
    ("ij,ij->", [(3, 4), (3, 4)]),
    ("ij->ji", [(3, 4)]),
    ("ij->", [(3, 4)]),
    ("i,j->ij", [(3,), (4,)]),
    ("ij,j->i", [(3, 4), (4,)]),
    ("ij,jk", [(3, 4), (4, 5)]),  # implicit output
    ("bhqd,bhkd->bhqk", [(2, 2, 3, 4), (2, 2, 5, 4)]),
    # >=3 operands
    ("ij,jk,kl->il", [(2, 3), (3, 4), (4, 2)]),
    ("bij,bjk,kl->bil", [(2, 2, 3), (2, 3, 4), (4, 2)]),
    ("i,j,k->ijk", [(2,), (3,), (4,)]),
    ("ij,jk,kl,lm->im", [(2, 3), (3, 2), (2, 3), (3, 2)]),
    # ellipsis
    ("...ij,jk->...ik", [(2, 2, 3, 4), (4, 5)]),
    ("...i->...", [(2, 3, 4)]),
    ("...ij->...ji", [(2, 3, 4)]),
    ("...i,...i->...", [(2, 3, 4), (2, 3, 4)]),
    ("...i,i", [(2, 3), (3,)]),  # implicit with ellipsis
    # diagonals (repeated indices within one operand)
    ("ii->i", [(4, 4)]),
    ("ii->", [(4, 4)]),
    ("ii", [(4, 4)]),  # implicit trace
    ("iji->j", [(3, 4, 3)]),
    ("ii,ij->j", [(3, 3), (3, 4)]),
    ("iij,jk->ik", [(3, 3, 4), (4, 2)]),
    # diagonals + ellipsis together
    ("...ii->...i", [(2, 3, 3)]),
])
def test_einsum(backend, spec, shapes):
    ts = [md.Tensor(np.random.randn(*s), allow_grad=True) for s in shapes]
    out = md.einsum(spec, *ts)
    ref = np.einsum(spec, *[np.asarray(backend_mod.as_numpy(t._data)) for t in ts])
    got = np.asarray(backend_mod.as_numpy(out._data))
    assert np.allclose(got, ref, rtol=1e-6), spec

    def f(*args, spec=spec):
        o = md.einsum(spec, *args)
        return md.sum(o * o)

    manual, auto = compute_grads(*ts, func=f, h=1e-4)
    for i, (m, a) in enumerate(zip(manual, auto)):
        assert np.allclose(np.asarray(m), np.asarray(a), rtol=1e-3,
                           atol=1e-5), (spec, i)


def test_einsum_rejects_invalid(backend):
    x = md.Tensor(np.random.randn(3, 3))
    with pytest.raises(ValueError):
        md.einsum("ij,jk->ik", x)  # operand count mismatch
    with pytest.raises(ValueError):
        md.einsum("ij->jj", x)  # repeated output index
    with pytest.raises(ValueError):
        md.einsum(".i->i", x)  # stray dot (not a full ellipsis)
    with pytest.raises(ValueError):
        md.einsum("...ijk->", x)  # rank too small for the term
    with pytest.raises(ValueError):
        md.einsum("")  # no operands


def test_einsum_diagonal_grad_structure(backend):
    """The diagonal VJP must scatter only onto the diagonal."""
    x = md.Tensor(np.random.randn(4, 4), allow_grad=True)
    md.sum(md.einsum("ii->i", x) ** 2).backward()
    g = np.asarray(backend_mod.as_numpy(x.grad._data))
    xd = np.diag(np.asarray(backend_mod.as_numpy(x._data)))
    assert np.allclose(np.diag(g), 2 * xd)
    off = g - np.diag(np.diag(g))
    assert np.allclose(off, 0.0)


def test_einsum_higher_order(backend):
    x = md.Tensor(np.random.randn(3), allow_grad=True)
    a = md.Tensor(np.random.randn(3, 3))
    loss = md.sum(md.einsum("i,ij->j", x, a) ** 2)
    loss.backward(allow_higher_order=True)
    g = x.grad
    md.sum(g).backward()
    an = np.asarray(backend_mod.as_numpy(a._data))
    h_row_sums = (2 * an @ an.T).sum(axis=1)
    np.testing.assert_allclose(np.asarray(x.grad), h_row_sums, rtol=1e-8)


def test_var(backend):
    check_op(md.var, "var", [rnd(2, 3, 4)], {"axis": -1})
    check_op(md.var, "var", [rnd(2, 3, 4)], {"axis": (0, 2), "keepdims": True})
    check_op(md.var, "var", [rnd(2, 3, 4)], {"axis": None})


def test_var_std_ddof_grads(backend):
    """ddof must reach the VJPs: d var/dx = 2(x-mu)/(N-ddof)."""
    check_op(md.var, "var", [rnd(3, 5)], {"axis": -1, "ddof": 1})
    check_op(md.std, "std", [rnd(3, 5)], {"axis": -1, "ddof": 1})
    x = md.Tensor(np.array([1.0, 2.0, 4.0]), allow_grad=True)
    md.var(x, ddof=1).backward()
    mu = 7.0 / 3.0
    expect = 2 * (np.array([1.0, 2.0, 4.0]) - mu) / 2.0
    np.testing.assert_allclose(np.asarray(x.grad), expect, rtol=1e-10)


def test_numpy_erf_fallback_without_scipy(monkeypatch):
    """The numpy oracle's erf must work on installs without scipy (review
    finding: scipy is not a declared dependency)."""
    import builtins
    import math

    real_import = builtins.__import__

    def no_scipy(name, *a, **k):
        if name.startswith("scipy"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_scipy)
    from minidiff_tpu.backend.numpy_backend import NumpyBackend

    x = np.array([0.0, 0.5, -1.5, 3.0])
    out = NumpyBackend.erf(x)
    np.testing.assert_allclose(out, [math.erf(v) for v in x], rtol=1e-12)
    # integer inputs promote to float64 like scipy's erf — casting back
    # would truncate the (-1, 1) range to {-1, 0, 1} (ADVICE r4)
    xi = np.array([0, 1, -2])
    oi = NumpyBackend.erf(xi)
    assert oi.dtype == np.float64
    np.testing.assert_allclose(oi, [math.erf(v) for v in xi], rtol=1e-12)
    # float32 keeps its dtype
    assert NumpyBackend.erf(np.float32(0.5)).dtype == np.float32
