"""MoE routing invariants, training descent, and expert-parallel sharding.

The reference has no models layer (SURVEY.md §1); these tests cover the
framework-extension MoE family (models/moe.py): static-shape top-k routing
(dispatch/combine one-hot contractions), the Switch load-balancing aux loss,
and ep-axis expert parallelism over the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import (
    MoEFeedForward,
    MoETransformerLM,
    SGD,
    make_moe_loss,
    make_train_step,
)
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.transformer import synthetic_lm_batches


def test_single_expert_full_capacity_is_dense_ffn(backend):
    """With E=1 the gate is softmax over one logit == 1.0, and capacity >= T
    drops nothing — MoE output must equal the plain FFN applied to x."""
    np.random.seed(0)
    moe = MoEFeedForward(dim=8, num_experts=1, mlp_ratio=2, k=1,
                         capacity_factor=2.0)
    params = moe.init()
    x = md.Tensor(np.random.randn(2, 4, 8).astype(np.float32))
    assert moe.capacity(8) >= 8
    y, aux = moe.apply_with_aux(params, x)

    w1 = params["experts"]["w1"][0]
    b1 = params["experts"]["b1"][0]
    w2 = params["experts"]["w2"][0]
    b2 = params["experts"]["b2"][0]
    dense = (F.gelu(x.reshape((8, 8)) @ w1 + b1) @ w2 + b2).reshape((2, 4, 8))
    np.testing.assert_allclose(np.asarray(y.detach()),
                               np.asarray(dense.detach()),
                               rtol=1e-5, atol=1e-6)
    # one expert gets every first-choice token with probability 1: aux = E*f*P = 1
    np.testing.assert_allclose(float(aux.item()), 1.0, rtol=1e-6)


def test_topk_routing_conserves_tokens_and_capacity(backend):
    """Each kept token occupies exactly one (expert, slot); no slot is
    double-booked; per-expert load never exceeds capacity."""
    np.random.seed(1)
    t, d, e, k = 16, 8, 4, 2
    moe = MoEFeedForward(dim=d, num_experts=e, mlp_ratio=2, k=k,
                         capacity_factor=1.0)
    params = moe.init()
    x = md.Tensor(np.random.randn(1, t, d).astype(np.float32))
    c = moe.capacity(t)

    # re-run the routing math the way apply_with_aux does, capturing dispatch
    xt = x.reshape((t, d))
    probs = F.softmax(xt @ params["router"]["w"], axis=-1)
    remaining = probs
    counts = md.zeros((1, e)).astype(probs.dtype)
    dispatch = None
    for _ in range(k):
        oh = F.one_hot(md.argmax(remaining, axis=-1), e).astype(probs.dtype)
        pos = md.cumsum(oh, axis=0) - oh + counts
        counts = counts + md.sum(oh, axis=0, keepdims=True)
        pos_tok = md.sum(pos * oh, axis=-1)
        keep = md.less(pos_tok, float(c)).astype(probs.dtype)
        poh = F.one_hot(pos_tok, c).astype(probs.dtype)
        disp = (md.expand_dims(oh, -1) * md.expand_dims(poh, 1)
                * keep.reshape((t, 1, 1)))
        dispatch = disp if dispatch is None else dispatch + disp
        remaining = remaining * (1 - oh)

    disp_np = np.asarray(dispatch.detach())  # (T, E, C)
    per_token = disp_np.sum(axis=(1, 2))
    assert np.all(per_token <= k + 1e-6)
    # every (expert, slot) pair holds at most one token
    per_slot = disp_np.sum(axis=0)
    assert np.all(per_slot <= 1 + 1e-6), per_slot
    # per-expert load respects capacity
    per_expert = disp_np.sum(axis=(0, 2))
    assert np.all(per_expert <= c + 1e-6), per_expert
    # with capacity_factor=1.0 and k=2, most tokens keep both choices
    assert per_token.sum() > 0


def test_router_learns_through_tape(backend):
    """Gradients reach the router weight via the combine gate."""
    np.random.seed(2)
    moe = MoEFeedForward(dim=8, num_experts=4, mlp_ratio=2, k=2)
    params = moe.init()
    x = md.Tensor(np.random.randn(2, 4, 8).astype(np.float32))

    def objective(p):
        y, aux = moe.apply_with_aux(p, x)
        return md.sum(y * y) + aux

    _, grads = md.value_and_grad(objective)(params)
    g_router = np.asarray(grads["router"]["w"])
    assert np.any(g_router != 0), "router got no gradient"
    g_w1 = np.asarray(grads["experts"]["w1"])
    assert np.any(g_w1 != 0), "experts got no gradient"


def test_moe_lm_trains_and_backends_agree():
    np.random.seed(3)
    losses = {}
    for name in ["numpy", "xla"]:
        md.set_backend(name)
        np.random.seed(3)
        model = MoETransformerLM(vocab_size=17, dim=16, num_heads=2,
                                 num_layers=2, num_experts=4, max_seq_len=8,
                                 k=2)
        params = model.init()
        x, y = next(synthetic_lm_batches(4, 8, 17, 1))
        step = make_train_step(model, SGD(0.1), loss_fn=make_moe_loss(0.01),
                               jit=(name == "xla"),
                               apply_fn=model.apply_with_aux)
        state, out = None, []
        for _ in range(6):
            params, state, loss = step(params, state, x, y)
            out.append(float(loss.item()))
        losses[name] = out
        assert out[-1] < out[0], (name, out)
    np.testing.assert_allclose(losses["numpy"], losses["xla"],
                               rtol=1e-4, atol=1e-5)


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_expert_parallel_matches_single_device():
    """dp x ep sharded MoE step == single-device step, and the expert axis
    stays sharded on ep after the update."""
    md.set_backend("xla")
    np.random.seed(4)
    model = MoETransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=1,
                             num_experts=4, max_seq_len=8, k=1)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=make_moe_loss(0.01),
                            apply_fn=model.apply_with_aux)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"dp": 2, "ep": 4})
    step8, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), loss_fn=make_moe_loss(0.01),
        param_specs=parallel.moe_sharding_rules(init),
        apply_fn=model.apply_with_aux,
    )
    p8 = place_params(init)
    xb, yb = place_batch(x, y)
    p8, _, loss8 = step8(p8, None, xb, yb)

    np.testing.assert_allclose(float(loss8.item()), float(loss1.item()),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p8["blocks"][0]["moe"]["experts"]["w1"]),
        np.asarray(p1["blocks"][0]["moe"]["experts"]["w1"]),
        rtol=1e-6, atol=1e-7,
    )
    # XLA trims trailing Nones: P('ep',) == P('ep', None, None) semantically
    spec = p8["blocks"][0]["moe"]["experts"]["w1"]._data.sharding.spec
    assert tuple(spec)[:1] == ("ep",), spec


@needs_8
def test_expert_parallel_loss_decreases():
    md.set_backend("xla")
    np.random.seed(5)
    mesh = parallel.make_mesh({"dp": 2, "ep": 4})
    model = MoETransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                             num_experts=4, max_seq_len=8, k=2)
    init = model.init()
    step, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.5), loss_fn=make_moe_loss(0.01),
        param_specs=parallel.moe_sharding_rules(init),
        apply_fn=model.apply_with_aux,
    )
    params = place_params(init)
    x, y = next(synthetic_lm_batches(4, 8, 32, 1))
    x, y = place_batch(x, y)
    state, losses = None, []
    for _ in range(8):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses


def test_bf16_routing_positions_stay_exact():
    """Queue positions must be integer-exact even in bf16 models: capacity
    slots > 256 collide if the cumsum runs in bf16."""
    md.set_backend("xla")
    np.random.seed(20)
    t, d, e = 1200, 8, 2  # capacity = ceil(1.25 * 1200 / 2) = 750 > 256
    moe = MoEFeedForward(dim=d, num_experts=e, mlp_ratio=1, k=1,
                         capacity_factor=1.25, dtype=md.bfloat16)
    params = moe.init()
    x = md.Tensor(np.random.randn(1, t, d).astype(np.float32)).astype(md.bfloat16)
    c = moe.capacity(t)

    xt = x.reshape((t, d))
    probs = md.Tensor(
        np.asarray(
            np.exp(np.random.randn(t, e)) /
            np.exp(np.random.randn(t, e)).sum(-1, keepdims=True)
        ).astype(np.float32)
    ).astype(md.bfloat16)
    # reproduce apply_with_aux's routing in its own dtype discipline
    f32 = md.float32
    oh = (md.Tensor(np.eye(e, dtype=np.float32)[
        np.asarray(md.argmax(probs, axis=-1).detach()).astype(int)]))
    pos = md.cumsum(oh.astype(f32), axis=0) - oh.astype(f32)
    pos_tok = np.asarray(md.sum(pos * oh.astype(f32), axis=-1).detach())
    kept = pos_tok[pos_tok < c]
    # every kept token has a UNIQUE (expert, slot): no collisions
    expert = np.asarray(md.argmax(probs, axis=-1).detach())[pos_tok < c]
    pairs = set(zip(expert.tolist(), kept.astype(int).tolist()))
    assert len(pairs) == kept.shape[0], "capacity slot collision"
    # and the full layer runs + produces finite output at this scale
    y, aux = moe.apply_with_aux(params, x)
    assert np.isfinite(np.asarray(y.astype(md.float32).detach())).all()


def test_grouped_path_matches_one_hot_oracle(backend):
    """The gather/scatter dispatch is the same math as the one-hot
    contractions: outputs agree to accumulation rounding for k=1 and k=2,
    with capacity drops exercised."""
    np.random.seed(30)
    for k in (1, 2):
        dense = MoEFeedForward(dim=16, num_experts=4, mlp_ratio=2, k=k,
                               capacity_factor=0.6, grouped=False)
        grouped = MoEFeedForward(dim=16, num_experts=4, mlp_ratio=2, k=k,
                                 capacity_factor=0.6, grouped=True)
        np.random.seed(31)
        p1 = dense.init()
        np.random.seed(31)
        p2 = grouped.init()
        x = md.Tensor(np.random.RandomState(32).randn(2, 48, 16))
        y1, a1 = dense.apply_with_aux(p1, x)
        y2, a2 = grouped.apply_with_aux(p2, x)
        np.testing.assert_allclose(
            np.asarray(y2.detach(), np.float64),
            np.asarray(y1.detach(), np.float64), rtol=1e-9, atol=1e-12,
            err_msg=f"k={k}")
        np.testing.assert_allclose(float(a2.item()), float(a1.item()),
                                   rtol=1e-9)


def test_grouped_path_gradcheck(backend):
    """Finite differences through the grouped gathers: grads w.r.t. every
    expert/router leaf match the oracle."""
    from minidiff_tpu.utils import compute_grads

    np.random.seed(33)
    moe = MoEFeedForward(dim=6, num_experts=8, mlp_ratio=1, k=1,
                         capacity_factor=1.5)  # grouped auto-on at E=8
    assert moe.grouped
    params = moe.init()
    x = md.Tensor(np.random.RandomState(34).randn(1, 16, 6),
                  allow_grad=True)

    leaves = [params["router"]["w"], params["experts"]["w1"],
              params["experts"]["b1"], params["experts"]["w2"],
              params["experts"]["b2"], x]

    def fn(rw, w1, b1, w2, b2, xx):
        p = {"router": {"w": rw},
             "experts": {"w1": w1, "b1": b1, "w2": w2, "b2": b2}}
        y, aux = moe.apply_with_aux(p, xx)
        return md.sum(y * y) + aux

    manual, auto = compute_grads(*leaves, func=fn, h=1e-6)
    for m, a, name in zip(manual, auto,
                          ["rw", "w1", "b1", "w2", "b2", "x"]):
        np.testing.assert_allclose(
            np.asarray(m.detach()), np.asarray(a.detach()),
            rtol=2e-3, atol=1e-7, err_msg=name)


def test_grouped_moe_lm_trains():
    from minidiff_tpu.models import Adam, make_train_step

    md.set_backend("xla")
    np.random.seed(35)
    model = MoETransformerLM(vocab_size=37, dim=32, num_heads=2,
                             num_layers=2, num_experts=8, max_seq_len=32,
                             grouped=True)
    params = model.init()
    opt = Adam(3e-3)
    state = opt.init(params)
    step = make_train_step(model, opt, loss_fn=make_moe_loss(0.01),
                           apply_fn=model.apply_with_aux)
    x, y = next(synthetic_lm_batches(24, 16, 37, 1))
    losses = []
    for _ in range(30):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_grouped_extreme_capacity_drop(backend):
    # capacity 1: nearly every token drops; dump-slot collisions must not
    # corrupt live slots, and outputs still match the one-hot oracle
    np.random.seed(40)
    dense = MoEFeedForward(dim=8, num_experts=4, mlp_ratio=1, k=1,
                           capacity_factor=0.02, grouped=False)
    grouped = MoEFeedForward(dim=8, num_experts=4, mlp_ratio=1, k=1,
                             capacity_factor=0.02, grouped=True)
    np.random.seed(41)
    p1 = dense.init()
    np.random.seed(41)
    p2 = grouped.init()
    x = md.Tensor(np.random.RandomState(42).randn(2, 32, 8))
    assert dense.capacity(64) == 1
    y1, _ = dense.apply_with_aux(p1, x)
    y2, _ = grouped.apply_with_aux(p2, x)
    np.testing.assert_allclose(np.asarray(y2.detach(), np.float64),
                               np.asarray(y1.detach(), np.float64),
                               rtol=1e-9, atol=1e-12)


def test_grouped_fewer_tokens_than_experts(backend):
    np.random.seed(43)
    dense = MoEFeedForward(dim=8, num_experts=16, mlp_ratio=1, k=1,
                           grouped=False)
    grouped = MoEFeedForward(dim=8, num_experts=16, mlp_ratio=1, k=1,
                             grouped=True)
    np.random.seed(44)
    p1 = dense.init()
    np.random.seed(44)
    p2 = grouped.init()
    x = md.Tensor(np.random.RandomState(45).randn(1, 4, 8))  # T=4 < E=16
    y1, _ = dense.apply_with_aux(p1, x)
    y2, _ = grouped.apply_with_aux(p2, x)
    np.testing.assert_allclose(np.asarray(y2.detach(), np.float64),
                               np.asarray(y1.detach(), np.float64),
                               rtol=1e-9, atol=1e-12)


def test_grouped_bf16_matches_one_hot():
    md.set_backend("xla")
    np.random.seed(46)
    dense = MoEFeedForward(dim=16, num_experts=8, mlp_ratio=2, k=2,
                           grouped=False, dtype=md.bfloat16)
    grouped = MoEFeedForward(dim=16, num_experts=8, mlp_ratio=2, k=2,
                             grouped=True, dtype=md.bfloat16)
    np.random.seed(47)
    p1 = dense.init()
    np.random.seed(47)
    p2 = grouped.init()
    x = md.Tensor(np.random.RandomState(48).randn(2, 64, 16)).astype(
        md.bfloat16)
    y1, a1 = dense.apply_with_aux(p1, x)
    y2, a2 = grouped.apply_with_aux(p2, x)
    np.testing.assert_allclose(
        np.asarray(y2.astype(md.float32).detach()),
        np.asarray(y1.astype(md.float32).detach()), rtol=3e-2, atol=3e-2)


def test_mixtral_shaped_moe_dp_ep_and_explicit_ep():
    """The Mixtral option set (RoPE + GQA + RMSNorm + SwiGLU experts +
    renormalized top-2 gates + no-drop capacity) composes with BOTH
    expert-parallel paths on the 8-mesh: GSPMD dp x ep via
    moe_sharding_rules (which now mirrors the actual tree: rms {g},
    GQA wq/wkv, bias-free experts) and the explicit all_to_all EP step."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    md.set_backend("xla")
    from minidiff_tpu import parallel
    from minidiff_tpu.models import SGD, make_moe_loss, synthetic_lm_batches

    model = MoETransformerLM(
        vocab_size=32, dim=16, num_heads=4, num_layers=1, num_experts=8,
        max_seq_len=16, k=2, capacity_factor=4.0, grouped=True,
        norm="rms", num_kv_heads=2, rope=True, mlp="swiglu",
        mlp_hidden=24, mlp_bias=False, renorm_gates=True)
    init = model.init()
    mesh = parallel.make_mesh({"dp": 2, "ep": 4})
    step, place_p, place_b = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), loss_fn=make_moe_loss(0.01),
        param_specs=parallel.moe_sharding_rules(init),
        apply_fn=model.apply_with_aux)
    x, y = next(synthetic_lm_batches(4, 16, 32, 1))
    xp, yp = place_b(x, y)
    params = place_p(init)
    params, state, l1 = step(params, None, xp, yp)
    assert np.isfinite(float(l1.item()))
    params, state, l2 = step(params, state, xp, yp)
    assert np.isfinite(float(l2.item()))

    ep_mesh = parallel.make_mesh({"ep": 8})
    ep_model = MoETransformerLM(
        vocab_size=32, dim=16, num_heads=4, num_layers=1, num_experts=8,
        max_seq_len=16, k=2, capacity_factor=4.0, grouped=True,
        norm="rms", num_kv_heads=2, rope=True, mlp="swiglu",
        mlp_hidden=24, mlp_bias=False, renorm_gates=True)
    ep_step, ep_params, ep_state = parallel.make_moe_ep_train_step(
        ep_model, ep_mesh, optimizer=SGD(0.1))
    xe, ye = next(synthetic_lm_batches(16, 16, 32, 1))
    ep_params, ep_state, e1 = ep_step(ep_params, ep_state, xe, ye)
    assert np.isfinite(float(e1.item()))
    ep_params, ep_state, e2 = ep_step(ep_params, ep_state, xe, ye)
    assert np.isfinite(float(e2.item()))
