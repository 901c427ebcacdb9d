"""Differentiable SPMD collectives and the expert-parallel all_to_all MoE.

Covers md.all_gather / md.psum_scatter / md.all_to_all / md.pmean:

* single-device semantics on the numpy oracle (identity / unit-axis forms);
* oracle gradcheck of a composed collective chain (the VJPs are framework
  ops, so this also proves they re-tape);
* SPMD forward semantics and tape-backward transposes inside shard_map on
  the 8-virtual-device mesh, checked against closed-form math;
* parallel/moe_ep.py: the GShard-style all_to_all expert-parallel FFN and
  train step, bit-compared against per-shard single-device routing.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import minidiff_tpu as md
from minidiff_tpu.parallel import make_mesh
from minidiff_tpu.utils.gradcheck import compute_grads


def _np(t):
    import minidiff_tpu.backend as backend

    return np.asarray(backend.as_numpy(t._data if isinstance(t, md.Tensor) else t))


# ---------------------------------------------------------------------------
# single-device semantics (numpy oracle; matches jax's world-size-1 behavior)
# ---------------------------------------------------------------------------


def test_single_device_semantics():
    md.set_backend("numpy")
    x = md.randn(2, 3)
    np.testing.assert_array_equal(_np(md.all_gather(x, axis_name="i")), _np(x))
    assert md.all_gather(x, axis_name="i", tiled=False, axis=0).shape == (1, 2, 3)
    assert md.all_gather(x, axis_name="i", tiled=False, axis=1).shape == (2, 1, 3)
    np.testing.assert_array_equal(
        _np(md.psum_scatter(x, axis_name="i")), _np(x))
    g = md.all_gather(x, axis_name="i", tiled=False, axis=0)
    np.testing.assert_array_equal(
        _np(md.psum_scatter(g, axis_name="i", scatter_dimension=0,
                            tiled=False)), _np(x))
    np.testing.assert_array_equal(
        _np(md.all_to_all(x, axis_name="i", split_axis=0, concat_axis=1)),
        _np(x))
    np.testing.assert_array_equal(_np(md.pmean(x, axis_name="i")), _np(x))
    md.set_backend("xla")


def test_single_device_gradcheck():
    md.set_backend("numpy")
    x = md.randn(2, 3, allow_grad=True)

    def f(t):
        g = md.all_gather(t, axis_name="i", tiled=False, axis=0)
        s = md.psum_scatter(g * 3.0, axis_name="i", scatter_dimension=0,
                            tiled=False)
        a = md.all_to_all(md.pmean(s, axis_name="i"), axis_name="i",
                          split_axis=0, concat_axis=1)
        return md.sum(a ** 2)

    fd, auto = compute_grads(x, func=f)
    for m, a in zip(fd, auto):
        np.testing.assert_allclose(_np(m), _np(a), rtol=1e-6, atol=1e-8)
    md.set_backend("xla")


# ---------------------------------------------------------------------------
# SPMD semantics + tape-backward transposes (8-virtual-device mesh)
# ---------------------------------------------------------------------------


def test_spmd_forward_semantics():
    md.set_backend("xla")
    mesh = make_mesh({"x": 8})
    X = np.arange(16 * 3, dtype=np.float64).reshape(16, 3)

    def body(xr, fullr):
        x = md.Tensor(xr)
        full = md.all_gather(x, axis_name="x", axis=0)          # (16, 3)
        stacked = md.all_gather(x, axis_name="x", axis=0, tiled=False)
        scat = md.psum_scatter(md.Tensor(fullr),
                               axis_name="x", scatter_dimension=0)
        return full._data, stacked._data, scat._data

    full, stacked, scat = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("x"), P()),
                      out_specs=(P(), P(), P("x")), check_vma=False)
    )(X, X)
    np.testing.assert_array_equal(np.asarray(full), X)
    np.testing.assert_array_equal(np.asarray(stacked),
                                  X.reshape(8, 2, 3))
    # every device contributed the full X replica: chunk d sums 8 copies
    np.testing.assert_array_equal(np.asarray(scat), 8 * X)


def test_spmd_all_to_all_roundtrip_and_transpose():
    md.set_backend("xla")
    mesh = make_mesh({"x": 8})
    # local shards are (8, 5): the split axis must divide by the 8 devices
    X = np.random.default_rng(0).normal(size=(8 * 8, 5))
    C = np.random.default_rng(1).normal(size=(8 * 8, 5))

    def body(xr, cr):
        x = md.Tensor(xr, allow_grad=True)
        c = md.Tensor(cr)
        ex = md.all_to_all(x, axis_name="x", split_axis=0, concat_axis=1)
        # roundtrip: the inverse exchange restores the operand
        back = md.all_to_all(ex.detach(), axis_name="x",
                             split_axis=1, concat_axis=0)
        # transpose check: d/dx sum(exchange(x) * c) == inverse-exchange(c)
        loss = md.sum(ex * md.all_to_all(c, axis_name="x",
                                         split_axis=0, concat_axis=1).detach())
        loss.backward()
        return back._data, x.grad._data

    back, grad = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("x"), P("x")),
                      out_specs=(P("x"), P("x")), check_vma=False)
    )(X, C)
    np.testing.assert_allclose(np.asarray(back), X, rtol=0, atol=0)
    # the cotangent c was exchanged forward, so its pullback is c itself
    np.testing.assert_allclose(np.asarray(grad), C, rtol=0, atol=0)


def test_spmd_collective_chain_gradients():
    """Closed form: loss == sum(X^3), so dloss/dX == 3 X^2."""
    md.set_backend("xla")
    mesh = make_mesh({"x": 8})
    X = np.random.default_rng(2).normal(size=(16, 3))

    def body(xr):
        x = md.Tensor(xr, allow_grad=True)
        g = md.all_gather(x, axis_name="x", axis=0)      # full X, replicated
        u = g * g                                        # X^2, replicated
        s = md.psum_scatter(u, axis_name="x",
                            scatter_dimension=0)         # 8 * X^2 chunk
        local = md.sum(s * x) / 8.0                      # sum(X^3 chunk)
        loss = md.psum(local, axis_name="x")             # sum(X^3)
        loss.backward()
        return loss._data, x.grad._data

    loss, grad = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("x"),),
                      out_specs=(P(), P("x")), check_vma=False)
    )(X)
    np.testing.assert_allclose(float(loss), (X ** 3).sum(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grad), 3 * X ** 2, rtol=1e-12)


def test_spmd_pmean_gradient():
    """pmean averages over devices and its backward carries the 1/N."""
    md.set_backend("xla")
    mesh = make_mesh({"x": 8})
    X = np.random.default_rng(3).normal(size=(8, 4))

    def body(xr):
        x = md.Tensor(xr, allow_grad=True)
        loss = md.pmean(md.sum(x * x), axis_name="x")
        loss.backward()
        return loss._data, x.grad._data

    loss, grad = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(P("x"),),
                      out_specs=(P(), P("x")), check_vma=False)
    )(X)
    np.testing.assert_allclose(float(loss),
                               (X ** 2).reshape(8, -1).sum(1).mean(),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grad), 2 * X / 8, rtol=1e-12)


# ---------------------------------------------------------------------------
# expert parallelism: all_to_all dispatch (parallel/moe_ep.py)
# ---------------------------------------------------------------------------


def _moe_modules():
    from minidiff_tpu.models.moe import MoEFeedForward

    return MoEFeedForward


def test_moe_ep_ffn_matches_per_shard_routing():
    from minidiff_tpu.parallel._util import _unwrap, _wrap
    from minidiff_tpu.parallel.moe_ep import moe_ep_ffn

    md.set_backend("xla")
    MoEFeedForward = _moe_modules()
    mesh = make_mesh({"ep": 8})
    rng = np.random.default_rng(4)
    dim, experts = 16, 8
    moe = MoEFeedForward(dim, experts, mlp_ratio=2, k=2)
    params = moe.init()
    Xg = rng.normal(size=(16, 3, dim))  # 8 shards x local batch 2

    # twin: route each batch shard independently (exactly what EP does)
    ys, auxs = [], []
    for g in range(8):
        y, aux = moe.apply_with_aux(params, md.Tensor(Xg[g * 2:(g + 1) * 2]))
        ys.append(_np(y))
        auxs.append(float(_np(aux)))
    y_ref = np.concatenate(ys, axis=0)

    raw_params = _unwrap(params)
    pspecs = {
        "router": jax.tree.map(lambda _: P(), raw_params["router"]),
        "experts": jax.tree.map(lambda _: P("ep"), raw_params["experts"]),
    }

    def body(raw_p, xr):
        p = _wrap(raw_p)
        y, aux = moe_ep_ffn(moe, p, md.Tensor(xr), axis_name="ep")
        return y._data, aux._data.reshape(1)

    y_ep, aux_ep = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(pspecs, P("ep")),
                      out_specs=(P("ep"), P("ep")), check_vma=False)
    )(raw_params, Xg)
    np.testing.assert_allclose(np.asarray(y_ep), y_ref, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(aux_ep), np.asarray(auxs),
                               rtol=1e-12)


def test_moe_ep_train_step_matches_single_device_twin():
    from minidiff_tpu.models.moe import MoETransformerLM, make_moe_loss
    from minidiff_tpu.models.optim import SGD
    from minidiff_tpu.parallel.moe_ep import make_moe_ep_train_step
    from minidiff_tpu.models.transformer import lm_loss

    md.set_backend("xla")
    mesh = make_mesh({"ep": 8})
    rng = np.random.default_rng(5)
    model = MoETransformerLM(vocab_size=31, dim=16, num_heads=2,
                             num_layers=1, num_experts=8, max_seq_len=8,
                             mlp_ratio=2, k=1)
    params = model.init()
    aux_coef = 0.01

    B, S = 16, 8
    x = md.Tensor(rng.integers(0, 31, (B, S)))
    y = md.Tensor(rng.integers(0, 31, (B, S)))

    step, ep_params, ep_state = make_moe_ep_train_step(
        model, mesh, optimizer=SGD(0.1), aux_coef=aux_coef,
        init_params=params)
    new_params, _, ep_loss = step(ep_params, ep_state, x, y)

    # twin: per-shard routing (local capacity) on one device, mean loss
    def twin_objective(p):
        total = None
        for g in range(8):
            xg = x[g * 2:(g + 1) * 2]
            yg = y[g * 2:(g + 1) * 2]
            logits, aux = model.apply_with_aux(p, xg)
            l = lm_loss(logits, yg) + aux.astype(logits.dtype) * aux_coef
            total = l if total is None else total + l
        return total / 8.0

    twin_loss, grads = md.value_and_grad(twin_objective)(params)
    opt = SGD(0.1)
    twin_params, _ = opt.update(params, grads, opt.init(params))

    np.testing.assert_allclose(float(_np(ep_loss)), float(_np(twin_loss)),
                               rtol=1e-12)
    flat_ep, _ = jax.tree.flatten(
        jax.tree.map(lambda t: _np(t), new_params,
                     is_leaf=lambda t: isinstance(t, md.Tensor)))
    flat_twin, _ = jax.tree.flatten(
        jax.tree.map(lambda t: _np(t), twin_params,
                     is_leaf=lambda t: isinstance(t, md.Tensor)))
    assert len(flat_ep) == len(flat_twin)
    for a, b in zip(flat_ep, flat_twin):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_moe_ep_grouped_matches_one_hot_oracle_on_mesh():
    """VERDICT r4 item 4: the grouped (slot-table gather) dispatch inside
    the EP shard_map must match the one-hot tensordot oracle — same
    params, same tokens, both k=1 and k=2, with capacity drops.  k=1 is
    bit-exact; k=2 differs by summation ORDER across the exchange (XLA
    reassociates the per-choice combine adds), so one f64 ULP is the
    tolerance there."""
    from minidiff_tpu.parallel._util import _unwrap, _wrap
    from minidiff_tpu.parallel.moe_ep import moe_ep_ffn

    md.set_backend("xla")
    MoEFeedForward = _moe_modules()
    mesh = make_mesh({"ep": 8})
    rng = np.random.default_rng(11)
    dim, experts = 16, 8
    for k in (1, 2):
        # capacity_factor < 1 forces drops so the dump-slot path is live
        moe_g = MoEFeedForward(dim, experts, mlp_ratio=2, k=k,
                               capacity_factor=0.75, grouped=True)
        moe_o = MoEFeedForward(dim, experts, mlp_ratio=2, k=k,
                               capacity_factor=0.75, grouped=False)
        params = moe_g.init()
        raw_params = _unwrap(params)
        Xg = rng.normal(size=(16, 3, dim))
        pspecs = {
            "router": jax.tree.map(lambda _: P(), raw_params["router"]),
            "experts": jax.tree.map(lambda _: P("ep"),
                                    raw_params["experts"]),
        }

        def run(moe):
            def body(raw_p, xr):
                p = _wrap(raw_p)
                y, aux = moe_ep_ffn(moe, p, md.Tensor(xr), axis_name="ep")
                return y._data, aux._data.reshape(1)

            return jax.jit(
                jax.shard_map(body, mesh=mesh, in_specs=(pspecs, P("ep")),
                              out_specs=(P("ep"), P("ep")),
                              check_vma=False))(raw_params, Xg)

        y_g, aux_g = run(moe_g)
        y_o, aux_o = run(moe_o)
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_o),
                                   rtol=1e-13, atol=1e-15)
        np.testing.assert_array_equal(np.asarray(aux_g), np.asarray(aux_o))


def test_moe_ep_grouped_train_step_matches_one_hot_step():
    """Whole EP train step: grouped dispatch == one-hot dispatch on every
    updated parameter (the backward all_to_all + gather transposes must
    carry identical cotangents)."""
    from minidiff_tpu.models.moe import MoETransformerLM
    from minidiff_tpu.models.optim import SGD
    from minidiff_tpu.parallel.moe_ep import make_moe_ep_train_step

    md.set_backend("xla")
    mesh = make_mesh({"ep": 8})
    rng = np.random.default_rng(12)
    results = {}
    for grouped in (True, False):
        np.random.seed(7)
        model = MoETransformerLM(vocab_size=31, dim=16, num_heads=2,
                                 num_layers=1, num_experts=8, max_seq_len=8,
                                 mlp_ratio=2, k=1)
        for blk in model.blocks:
            blk.moe.grouped = grouped
        params = model.init()
        B, S = 16, 8
        x = md.Tensor(np.random.RandomState(3).randint(0, 31, (B, S)))
        y = md.Tensor(np.random.RandomState(4).randint(0, 31, (B, S)))
        step, ep_params, ep_state = make_moe_ep_train_step(
            model, mesh, optimizer=SGD(0.1), init_params=params)
        new_params, _, loss = step(ep_params, ep_state, x, y)
        flat, _ = jax.tree.flatten(jax.tree.map(
            lambda t: _np(t), new_params,
            is_leaf=lambda t: isinstance(t, md.Tensor)))
        results[grouped] = (float(_np(loss)), flat)
    lg, fg = results[True]
    lo, fo = results[False]
    np.testing.assert_allclose(lg, lo, rtol=1e-12)
    for a, b in zip(fg, fo):
        np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-13)
