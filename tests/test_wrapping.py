"""Op-factory layer: every public name in ops.wrapping.__all__.

VERDICT r1 item 6: the stateful-op protocol (OpClass /
create_stateful_op_func) had zero coverage.  These tests pin its contract —
a fresh instance per call whose create_forward/create_grads closures share
per-call state — plus the decorators, as_tensor_func, backend_fn epoch
caching, and create_op_func's non-differentiable / validation behavior.
"""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.ops import wrapping
from minidiff_tpu.utils import compute_grads


def test_all_public_names_exist():
    for name in wrapping.__all__:
        assert hasattr(wrapping, name), name


# ---------------------------------------------------------------------------
# stateful-op protocol
# ---------------------------------------------------------------------------


class _SquareWithState(wrapping.UnaryOpClass):
    """Stateful op: the forward saves its input; the grad reads it back from
    instance state instead of the engine-passed args (the protocol's point:
    create_forward/create_grads closures share one per-call instance)."""

    instances = 0

    def __init__(self):
        type(self).instances += 1
        self.saved = None

    def create_forward(self):
        def forward(x):
            self.saved = x
            return md.Tensor(
                x._data * x._data, allow_grad=x.allow_grad
            )

        forward.__name__ = "square_stateful"
        return forward

    def create_grads(self):
        def grad(x, grad_out):
            assert self.saved is x, "grad must see the SAME call's state"
            return 2.0 * self.saved * grad_out

        return [grad]


square_stateful = wrapping.create_stateful_op_func(_SquareWithState)


def test_stateful_op_forward_and_grad(backend):
    x = md.Tensor(np.array([1.0, -2.0, 3.0]), allow_grad=True)
    out = square_stateful(x)
    np.testing.assert_allclose(
        np.asarray(out.detach()), [1.0, 4.0, 9.0]
    )
    md.sum(out).backward()
    np.testing.assert_allclose(np.asarray(x.grad.detach()), [2.0, -4.0, 6.0])


def test_stateful_op_gradcheck_against_oracle(backend):
    x = md.Tensor(np.random.RandomState(0).randn(2, 3), allow_grad=True)
    manual, auto = compute_grads(x, func=lambda t: md.sum(square_stateful(t)))
    np.testing.assert_allclose(
        np.asarray(manual[0].detach()), np.asarray(auto[0].detach()),
        rtol=1e-3, atol=1e-6,
    )


def test_stateful_op_fresh_instance_per_call(backend):
    before = _SquareWithState.instances
    a = md.Tensor(np.ones(2), allow_grad=True)
    b = md.Tensor(np.full(2, 3.0), allow_grad=True)
    oa = square_stateful(a)
    ob = square_stateful(b)
    assert _SquareWithState.instances == before + 2
    # interleaved backwards: each node's grads read their OWN call's state
    md.sum(ob).backward()
    md.sum(oa).backward()
    np.testing.assert_allclose(np.asarray(a.grad.detach()), [2.0, 2.0])
    np.testing.assert_allclose(np.asarray(b.grad.detach()), [6.0, 6.0])


def test_stateful_op_respects_grad_mode(backend):
    x = md.Tensor(np.ones(2), allow_grad=True)
    with md.no_grad():
        out = square_stateful(x)
    assert out.op_node is None


def test_stateful_op_reuse_graph_structural_hash(backend):
    """Per-call forward closures carry a stable _structural_id so the
    toposort cache recognizes the repeated graph shape."""
    from minidiff_tpu import caching

    with md.reuse_graph():
        grads = []
        hashes = []
        for val in (1.0, 2.0):
            t = md.Tensor(np.full(3, val), allow_grad=True)
            out = md.sum(square_stateful(t))
            hashes.append(out.op_node.hash)
            out.backward()
            grads.append(np.asarray(t.grad.detach()))
    assert hashes[0] == hashes[1], "stateful op broke structural hashing"
    np.testing.assert_allclose(grads[0], [2.0, 2.0, 2.0])
    np.testing.assert_allclose(grads[1], [4.0, 4.0, 4.0])


def test_opclass_base_is_abstract():
    base = wrapping.OpClass()
    with pytest.raises(NotImplementedError):
        base.create_forward()
    with pytest.raises(NotImplementedError):
        base.create_grads()
    # arity marker subclasses exist (reference wrapping.py:47-76 hierarchy)
    assert issubclass(wrapping.UnaryOpClass, wrapping.OpClass)
    assert issubclass(wrapping.BinaryOpClass, wrapping.OpClass)
    assert issubclass(wrapping.TernaryOpClass, wrapping.OpClass)


# ---------------------------------------------------------------------------
# decorators + as_tensor_func + backend_fn
# ---------------------------------------------------------------------------


def test_decorator_sugar_unary(backend):
    @wrapping.unary_op_func(grad=lambda x, g: g * 3.0)
    def triple(x):
        return md.Tensor(x._data * 3.0, allow_grad=x.allow_grad)

    x = md.Tensor(np.ones(2), allow_grad=True)
    out = triple(x)
    md.sum(out).backward()
    np.testing.assert_allclose(np.asarray(x.grad.detach()), [3.0, 3.0])


def test_decorator_sugar_binary_and_ternary(backend):
    @wrapping.binary_op_func(
        grad_x=lambda x, y, g: g * y, grad_y=lambda x, y, g: g * x,
        tensor_only=True,
    )
    def mymul(x, y):
        return md.Tensor(x._data * y._data, allow_grad=True)

    @wrapping.ternary_op_func(
        grad_x=lambda x, y, z, g: g,
        grad_y=lambda x, y, z, g: g,
        grad_z=lambda x, y, z, g: g,
        tensor_only=True,
    )
    def add3(x, y, z):
        return md.Tensor(x._data + y._data + z._data, allow_grad=True)

    a = md.Tensor(np.full(2, 2.0), allow_grad=True)
    b = md.Tensor(np.full(2, 5.0), allow_grad=True)
    c = md.Tensor(np.full(2, 1.0), allow_grad=True)
    md.sum(add3(mymul(a, b), b, c)).backward()
    np.testing.assert_allclose(np.asarray(a.grad.detach()), [5.0, 5.0])
    np.testing.assert_allclose(np.asarray(b.grad.detach()), [3.0, 3.0])
    np.testing.assert_allclose(np.asarray(c.grad.detach()), [1.0, 1.0])


def test_op_func_decorator(backend):
    @wrapping.op_func(grad_funcs=[lambda x, g: g], tensor_only=True)
    def ident(x):
        return md.Tensor(x._data, allow_grad=x.allow_grad)

    x = md.Tensor(np.ones(3), allow_grad=True)
    md.sum(ident(x)).backward()
    np.testing.assert_allclose(np.asarray(x.grad.detach()), np.ones(3))


def test_as_tensor_func_and_alias(backend):
    import minidiff_tpu.backend as B

    lifted = wrapping.as_tensor_func(B.get_backend().exp)
    out = lifted(md.Tensor(np.zeros(2)))
    assert isinstance(out, md.Tensor)
    np.testing.assert_allclose(np.asarray(out.detach()), [1.0, 1.0])
    assert wrapping.as_minidiff is wrapping.as_tensor_func


def test_backend_fn_tracks_backend_swaps():
    fn = wrapping.backend_fn("sign")
    md.set_backend("numpy")
    out_np = fn(np.array([-2.0, 3.0]))
    assert isinstance(out_np, np.ndarray)
    md.set_backend("xla")
    out_x = fn(np.array([-2.0, 3.0]))
    import jax

    assert isinstance(out_x, jax.Array)
    np.testing.assert_allclose(np.asarray(out_x), [-1.0, 1.0])


# ---------------------------------------------------------------------------
# create_op_func corners
# ---------------------------------------------------------------------------


def test_non_differentiable_op_has_no_tape_node(backend):
    op = wrapping.create_op_func(
        forward_func=lambda x: md.Tensor(x._data * 2, allow_grad=True),
        grad_funcs=[lambda x, g: g],  # zeroed by is_differentiable=False
        is_differentiable=False,
        op_name="nondiff",
    )
    x = md.Tensor(np.ones(2), allow_grad=True)
    out = op(x)
    assert out.op_node is None
    assert out.allow_grad  # inherits tracking; backward stops here


def test_validation_errors(backend):
    with pytest.raises(ValueError):
        wrapping._validate_op_inputs((1, 2.0), tensor_only=False)
    with pytest.raises(ValueError):
        wrapping._validate_op_inputs(
            (md.Tensor(np.ones(1)), 2.0), tensor_only=True)
    # passes: at least one Tensor / all Tensors
    wrapping._validate_op_inputs((md.Tensor(np.ones(1)), 2.0), tensor_only=False)
    wrapping._validate_op_inputs((md.Tensor(np.ones(1)),), tensor_only=True)


def test_output_adoption_detaches_foreign_graph(backend):
    """A forward returning an already-graphed tensor: the op adopts a
    detached view so it becomes the sole producer (wrapping.py:158-159)."""
    x = md.Tensor(np.ones(2), allow_grad=True)

    def forward(t):
        return t * 2.0  # already graph-owned by mul

    op = wrapping.create_op_func(
        forward_func=forward, grad_funcs=[lambda t, g: g * 2.0],
        op_name="adopt", tensor_only=True,
    )
    out = op(x)
    assert out.op_node is not None
    assert out.op_node.op_name == "adopt"
    md.sum(out).backward()
    np.testing.assert_allclose(np.asarray(x.grad.detach()), [2.0, 2.0])
