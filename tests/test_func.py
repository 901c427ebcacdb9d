"""Functional transforms: grad / value_and_grad / jit — the trace-to-XLA path.

Key property: md.jit(md.value_and_grad(f)) — the tape engine running under a
jax trace — produces the same gradients as jax.grad of the equivalent pure
function, i.e. the eager tape lowers to the XLA program jax's AD would build.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minidiff_tpu as md
import minidiff_tpu.backend as backend_mod


def setup_function(_):
    md.set_backend("xla")


def loss_fn(w, x):
    return md.sum(md.tanh(x @ w) ** 2)


def test_grad_matches_eager_backward():
    w = md.Tensor(np.random.randn(4, 3), allow_grad=True)
    x = md.Tensor(np.random.randn(5, 4))
    g = md.grad(loss_fn)(w, x)

    w2 = w.detach(allow_grad=True)
    out = loss_fn(w2, x)
    out.backward()
    np.testing.assert_allclose(np.asarray(g), np.asarray(w2.grad), rtol=1e-6)


def test_value_and_grad_multiple_argnums():
    w = md.Tensor(np.random.randn(3, 3), allow_grad=True)
    x = md.Tensor(np.random.randn(2, 3), allow_grad=True)
    val, (gw, gx) = md.value_and_grad(loss_fn, argnums=(0, 1))(w, x)
    assert gw.shape == w.shape and gx.shape == x.shape
    assert val.size == 1


def test_tape_gradients_equal_jax_grad():
    wn = np.random.randn(4, 3)
    xn = np.random.randn(5, 4)

    def jax_loss(w):
        return jnp.sum(jnp.tanh(xn @ w) ** 2)

    expected = jax.grad(jax_loss)(jnp.asarray(wn))
    got = md.grad(loss_fn)(md.Tensor(wn), md.Tensor(xn))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_jit_matches_eager():
    w = md.Tensor(np.random.randn(4, 3), allow_grad=True)
    x = md.Tensor(np.random.randn(5, 4))
    vag = md.value_and_grad(loss_fn)
    jitted = md.jit(vag)

    out_e, g_e = vag(w, x)
    out_j, g_j = jitted(w, x)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_e), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_j), np.asarray(g_e), rtol=1e-6)


def test_jit_caches_by_structure():
    jitted = md.jit(md.value_and_grad(loss_fn))
    w = md.Tensor(np.random.randn(4, 3), allow_grad=True)
    x = md.Tensor(np.random.randn(5, 4))
    jitted(w, x)
    jitted(w, x)
    jitted(md.Tensor(np.random.randn(4, 3), allow_grad=True), x)
    assert len(jitted._cache) == 1


def test_jit_static_leaves():
    def f(x, mode):
        if mode == "double":
            return md.sum(x * 2)
        return md.sum(x * 3)

    jitted = md.jit(f)
    x = md.Tensor(np.arange(3.0))
    assert float(jitted(x, "double").item()) == pytest.approx(6.0)
    assert float(jitted(x, "triple").item()) == pytest.approx(9.0)
    assert len(jitted._cache) == 2


def test_jit_pytree_args():
    def f(params, x):
        return md.sum(md.tanh(x @ params["w"]) + params["b"])

    params = {
        "w": md.Tensor(np.random.randn(3, 2), allow_grad=True),
        "b": md.Tensor(np.zeros(2), allow_grad=True),
    }
    x = md.Tensor(np.random.randn(4, 3))
    vag = md.value_and_grad(f)
    out, grads = md.jit(vag)(params, x)
    assert grads["w"].shape == (3, 2)
    assert grads["b"].shape == (2,)
    out_e, grads_e = vag(params, x)
    np.testing.assert_allclose(np.asarray(grads["w"]), np.asarray(grads_e["w"]), rtol=1e-6)


def test_jit_requires_xla_backend():
    md.set_backend("numpy")
    try:
        with pytest.raises(RuntimeError):
            md.jit(lambda x: x)
    finally:
        md.set_backend("xla")


def test_jit_train_step_with_update():
    # an entire SGD step — forward, backward, parameter update — in one jit
    def train_step(w, x):
        out = loss_fn(w.detach(allow_grad=True), x)
        w2 = w.detach(allow_grad=True)
        val, g = md.value_and_grad(loss_fn)(w2, x)
        return w - 0.1 * g, val

    jitted = md.jit(train_step)
    w = md.Tensor(np.random.randn(4, 3))
    x = md.Tensor(np.random.randn(5, 4))
    losses = []
    for _ in range(10):
        w, val = jitted(w, x)
        losses.append(float(val.item()))
    assert losses[-1] < losses[0]


def test_lower_emits_hlo_with_backward():
    md.set_backend("xla")

    def program(x, w):
        out, g = md.value_and_grad(lambda a: md.sum(md.tanh(a @ w)))(x)
        return g

    x = md.Tensor(np.random.randn(4, 4), allow_grad=True)
    w = md.Tensor(np.random.randn(4, 4))
    lowered = md.lower(program, x, w)
    text = lowered.as_text()
    # the backward sweep's grad matmul must be in the lowered module
    assert "dot_general" in text
    assert "tanh" in text
    compiled = lowered.compile()
    assert "HloModule" in compiled.as_text() or compiled.as_text()


def test_lower_requires_xla_backend():
    md.set_backend("numpy")
    try:
        with pytest.raises(RuntimeError):
            md.lower(lambda x: x, md.Tensor([1.0]))
    finally:
        md.set_backend("xla")


def test_remat_matches_plain_grads(backend):
    def segment(a, b):
        return md.tanh(a @ b) * md.exp(-a)

    rng = np.random.RandomState(0)
    an, bn = rng.randn(5, 5), rng.randn(5, 5)

    def run(f):
        a = md.Tensor(an, allow_grad=True)
        b = md.Tensor(bn, allow_grad=True)
        md.sum(f(a, b) ** 2).backward()
        return (
            np.asarray(backend_mod.as_numpy(a.grad._data)),
            np.asarray(backend_mod.as_numpy(b.grad._data)),
        )

    for e, c in zip(run(segment), run(md.remat(segment))):
        np.testing.assert_allclose(e, c, rtol=1e-6, atol=1e-8)


def test_remat_stores_no_segment_tape(backend):
    def segment(a):
        return md.exp(md.tanh(a) * 2.0)

    a = md.Tensor(np.ones((3, 3)), allow_grad=True)
    out = md.remat(segment)(a)
    node = out.op_node
    assert node is not None and node.op_name.startswith("remat")
    # the only tape node is the remat node itself; inputs are raw leaves
    assert all(x.is_leaf for x in node.tensor_inputs)
    md.sum(out).backward()
    assert a.grad is not None


def test_remat_transformer_blocks_train():
    from minidiff_tpu.models import Adam, TransformerLM, lm_loss, make_train_step
    from minidiff_tpu.models import synthetic_lm_batches

    md.set_backend("xla")
    np.random.seed(0)
    model = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                          max_seq_len=16, remat_blocks=True)
    plain = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                          max_seq_len=16)
    np.random.seed(7)
    params = model.init()
    np.random.seed(7)
    params_plain = plain.init()
    x, y = next(synthetic_lm_batches(4, 8, 32, 1))
    # identical logits and identical grads with/without block remat
    l1 = model.apply(params, x)
    l2 = plain.apply(params_plain, x)
    np.testing.assert_allclose(
        np.asarray(backend_mod.as_numpy(l1._data)),
        np.asarray(backend_mod.as_numpy(l2._data)), rtol=1e-6, atol=1e-7)
    _, g1 = md.value_and_grad(lambda p: lm_loss(model.apply(p, x), y))(params)
    _, g2 = md.value_and_grad(lambda p: lm_loss(plain.apply(p, x), y))(params_plain)
    import jax
    for a, b in zip(jax.tree.leaves(g1, is_leaf=lambda t: isinstance(t, md.Tensor)),
                    jax.tree.leaves(g2, is_leaf=lambda t: isinstance(t, md.Tensor))):
        np.testing.assert_allclose(
            np.asarray(backend_mod.as_numpy(a._data)),
            np.asarray(backend_mod.as_numpy(b._data)), rtol=1e-5, atol=1e-6)
    # and it trains under md.jit
    opt = Adam(1e-2)
    state = opt.init(params)
    step = make_train_step(model, opt, loss_fn=lm_loss)
    losses = []
    for xb, yb in synthetic_lm_batches(4, 8, 32, 6):
        params, state, loss = step(params, state, xb, yb)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


def test_remat_shrinks_eager_tape(backend):
    def segment(x, w):
        h = md.tanh(x @ w)
        return md.exp(h * 0.5) + x

    x = md.Tensor(np.ones((8, 8)), allow_grad=True)
    w = md.Tensor(np.ones((8, 8)) * 0.01, allow_grad=True)
    n_plain = len(segment(x, w).op_node.toposort())
    n_remat = len(md.remat(segment)(x, w).op_node.toposort())
    assert n_remat < n_plain  # segment intermediates never join the tape


def test_jit_unhashable_static_raises_cleanly():
    md.set_backend("xla")

    class Cfg:
        __hash__ = None  # unhashable

    f = md.jit(lambda x, cfg: x * 2)
    with pytest.raises(TypeError, match="hashable"):
        f(md.Tensor(np.ones(2)), Cfg())


def test_lower_accepts_static_strings():
    md.set_backend("xla")

    def fn(x, mode):
        return md.sum(x) if mode == "sum" else md.mean(x)

    text = md.lower(fn, md.Tensor(np.ones((3, 3))), "sum").as_text()
    assert "reduce" in text


# ---------------------------------------------------------------------------
# md.vjp
# ---------------------------------------------------------------------------


def test_vjp_matches_value_and_grad(backend):
    np.random.seed(0)
    x = md.Tensor(np.random.randn(3, 4))

    def f(t):
        return md.sum(md.sin(t) * t, axis=0)  # non-scalar output (4,)

    out, vjp_fn = md.vjp(f, x)
    assert out.shape == (4,)
    ct = np.random.randn(4)
    g = vjp_fn(md.Tensor(ct))

    def scalarized(t):
        return md.sum(f(t) * md.Tensor(ct))

    _, ref = md.value_and_grad(scalarized)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_vjp_multiple_cotangents_reuse_tape(backend):
    x = md.Tensor(np.arange(3.0))
    out, vjp_fn = md.vjp(lambda t: t * t, x)
    g1 = vjp_fn(md.Tensor(np.array([1.0, 0.0, 0.0])))
    g2 = vjp_fn(md.Tensor(np.array([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(np.asarray(g1), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(g2), [0.0, 0.0, 4.0])


def test_vjp_multiple_primals(backend):
    a = md.Tensor(np.array([2.0, 3.0]))
    b = md.Tensor(np.array([5.0, 7.0]))
    out, vjp_fn = md.vjp(lambda x, y: x * y, a, b)
    ga, gb = vjp_fn(md.Tensor(np.ones(2)))
    np.testing.assert_allclose(np.asarray(ga), [5.0, 7.0])
    np.testing.assert_allclose(np.asarray(gb), [2.0, 3.0])


def test_value_and_grad_has_aux(backend):
    x = md.Tensor(np.arange(3.0), allow_grad=True)

    def f(t):
        return md.sum(t * t), {"mean": md.mean(t)}

    (loss, aux), g = md.value_and_grad(f, has_aux=True)(x)
    np.testing.assert_allclose(float(loss.item()), 5.0)
    np.testing.assert_allclose(float(aux["mean"].item()), 1.0)
    np.testing.assert_allclose(np.asarray(g), [0.0, 2.0, 4.0])

    g2, aux2 = md.grad(f, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(g2), [0.0, 2.0, 4.0])
    np.testing.assert_allclose(float(aux2["mean"].item()), 1.0)


def test_vjp_identity_passthrough(backend):
    out, f = md.vjp(lambda x: x, md.Tensor(np.ones(3)))
    g = f(md.Tensor(np.array([1.0, 2.0, 3.0])))
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0])


def test_scan_empty_xs_numpy_raises():
    md.set_backend("numpy")
    with pytest.raises(ValueError):
        md.scan(lambda c, x: (c, c))(md.Tensor(np.ones(2)),
                                     md.Tensor(np.zeros((0, 2))))
    md.set_backend("xla")
