"""FSDP sharding rules, gradient accumulation, and profiling utilities."""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import MLP, SGD, Adam, make_train_step
from minidiff_tpu.models.data import synthetic_classification
from minidiff_tpu.utils import StepTimer, annotate, profile_fn, trace


def setup_function(_):
    md.set_backend("xla")


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


# ---------------------------------------------------------------------------
# gradient accumulation
# ---------------------------------------------------------------------------


def test_grad_accum_matches_full_batch():
    """K microbatches with averaged grads == one full-batch step (mean loss
    decomposes over equal chunks)."""
    np.random.seed(0)
    model = MLP(16, (8,), 4)
    init = model.init()
    xs, ys = synthetic_classification(32, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)

    p1, _, loss1 = make_train_step(model, SGD(0.1))(init, None, x, y)
    p4, _, loss4 = make_train_step(model, SGD(0.1), grad_accum=4)(
        init, None, x, y
    )
    np.testing.assert_allclose(float(loss4.item()), float(loss1.item()),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p4[0]["w"]), np.asarray(p1[0]["w"]),
                               rtol=1e-9, atol=1e-12)


def test_grad_accum_trains_with_adam():
    np.random.seed(1)
    model = MLP(16, (16,), 4)
    opt = Adam(1e-2)
    params = model.init()
    state = opt.init(params)
    step = make_train_step(model, opt, grad_accum=2)
    xs, ys = synthetic_classification(64, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)
    losses = []
    for _ in range(10):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.5, losses


def test_grad_accum_rejects_indivisible_batch():
    model = MLP(4, (4,), 2)
    step = make_train_step(model, SGD(0.1), grad_accum=3, jit=False)
    xs, ys = synthetic_classification(8, 4, 2)
    with pytest.raises(AssertionError):
        step(model.init(), None, md.Tensor(xs), md.Tensor(ys))


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3 sharding rules
# ---------------------------------------------------------------------------


@needs_8
def test_fsdp_rules_shard_large_params_only():
    mesh = parallel.make_mesh({"dp": 8})
    model = MLP(256, (128,), 64)
    init = model.init()
    rules = parallel.fsdp_sharding_rules(init, mesh, min_size=2**12)
    # w0 (256,128)=32768 elems -> sharded on its largest axis (256)
    assert rules[0]["w"] == PartitionSpec("dp", None)
    # biases are small -> replicated
    assert rules[0]["b"] == PartitionSpec()


@needs_8
def test_fsdp_training_matches_single_device():
    np.random.seed(2)
    mesh = parallel.make_mesh({"dp": 8})
    model = MLP(64, (64,), 8)
    init = model.init()
    xs, ys = synthetic_classification(64, 64, 8)
    x, y = md.Tensor(xs), md.Tensor(ys)

    p1, _, loss1 = make_train_step(model, SGD(0.1))(init, None, x, y)

    rules = parallel.fsdp_sharding_rules(init, mesh, min_size=2**10)
    assert rules[0]["w"] == PartitionSpec("dp", None)  # really sharded
    step8, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), param_specs=rules
    )
    p8 = place_params(init)
    xb, yb = place_batch(x, y)
    p8, _, loss8 = step8(p8, None, xb, yb)

    np.testing.assert_allclose(float(loss8.item()), float(loss1.item()),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(p8[0]["w"]), np.asarray(p1[0]["w"]),
                               rtol=1e-9, atol=1e-12)
    # parameters stay sharded after the update (ZeRO state layout persists)
    spec = p8[0]["w"]._data.sharding.spec
    assert tuple(spec)[:1] == ("dp",), spec


# ---------------------------------------------------------------------------
# profiling utilities
# ---------------------------------------------------------------------------


def test_step_timer_and_profile_fn():
    x = md.Tensor(np.random.randn(64, 64))

    def step(x):
        return md.sum(md.tanh(x @ x))

    stats = profile_fn(step, x, iters=5, warmup=1)
    assert stats["steps"] == 5
    assert stats["median_ms"] >= 0
    assert stats["total_s"] >= 0

    timer = StepTimer()
    with timer:
        out = step(x)
    timer.sync(out)
    assert timer.summary()["steps"] == 1


def test_trace_and_annotate_write_a_profile():
    x = md.Tensor(np.random.randn(32, 32))
    with tempfile.TemporaryDirectory() as d:
        with trace(d):
            with annotate("matmul-block"):
                md.sum(x @ x).item()
        # the profiler writes a plugins/profile/<run>/ directory
        found = []
        for root, dirs, files in os.walk(d):
            found.extend(files)
        assert found, "no profiler artifacts written"


def test_profile_utils_noop_on_numpy_backend():
    md.set_backend("numpy")
    x = md.Tensor(np.random.randn(8, 8))
    with tempfile.TemporaryDirectory() as d:
        with trace(d):
            with annotate("noop"):
                md.sum(x @ x).item()
    md.set_backend("xla")


# ---------------------------------------------------------------------------
# mixed precision (f32 master weights)
# ---------------------------------------------------------------------------


def test_mixed_precision_trains_bf16_with_f32_master():
    from minidiff_tpu.models import MixedPrecision

    np.random.seed(4)
    model = MLP(16, (32,), 4, dtype=md.bfloat16)
    opt = MixedPrecision(Adam(1e-2))
    params = model.init()
    state = opt.init(params)
    # master copy is f32, live params stay bf16
    assert str(state["master"][0]["w"].dtype) == "float32"
    step = make_train_step(model, opt)
    xs, ys = synthetic_classification(128, 16, 4)
    x, y = md.Tensor(xs).astype(md.bfloat16), md.Tensor(ys)
    losses = []
    for _ in range(20):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert str(params[0]["w"].dtype) == "bfloat16"
    assert str(state["master"][0]["w"].dtype) == "float32"
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])


def test_mixed_precision_keeps_f32_params_f32():
    """Wrapping an f32 model without compute_dtype must not re-cast the
    params to bf16 after the first update (each param keeps its own dtype)."""
    from minidiff_tpu.models import MixedPrecision
    from minidiff_tpu.models.optim import SGD as _SGD

    params = {
        "a": md.Tensor(np.ones((3, 3), dtype=np.float32), allow_grad=True),
        "b": md.Tensor(np.ones((3,), dtype=np.float32),
                       dtype=md.bfloat16, allow_grad=True),
    }
    opt = MixedPrecision(_SGD(0.1))
    state = opt.init(params)
    grads = {
        "a": md.Tensor(np.ones((3, 3), dtype=np.float32)),
        "b": md.Tensor(np.ones((3,), dtype=np.float32)),
    }
    new_params, _ = opt.update(params, grads, state)
    assert str(new_params["a"].dtype) == "float32"
    assert str(new_params["b"].dtype) == "bfloat16"
    # explicit compute_dtype still converts
    opt2 = MixedPrecision(_SGD(0.1), compute_dtype=md.bfloat16)
    state2 = opt2.init(params)
    conv, _ = opt2.update(params, grads, state2)
    assert str(conv["a"].dtype) == "bfloat16"


def test_mixed_precision_small_updates_survive():
    """A tiny update that rounds to zero in bf16 must accumulate in the f32
    master copy: that is the point of master weights."""
    from minidiff_tpu.models import MixedPrecision
    from minidiff_tpu.models.optim import SGD as _SGD

    w0 = np.ones((4, 4), dtype=np.float32)
    params = {"w": md.Tensor(w0, dtype=md.bfloat16, allow_grad=True)}
    opt = MixedPrecision(_SGD(1.0))
    state = opt.init(params)
    tiny = {"w": md.Tensor(np.full((4, 4), 1e-4, dtype=np.float32))}
    p = params
    for _ in range(50):
        p, state = opt.update(p, tiny, state)
    # 50 * 1e-4 = 5e-3: invisible per-step in bf16 (eps(1) ~ 7.8e-3) but
    # accumulated in the master copy
    master = np.asarray(state["master"]["w"].detach())
    np.testing.assert_allclose(master, 1.0 - 5e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# training-state checkpoint / resume
# ---------------------------------------------------------------------------


def test_train_state_checkpoint_resume_exact():
    """Interrupt-and-resume == uninterrupted: identical losses and params."""
    import io

    from minidiff_tpu.utils import load_train_state, save_train_state

    np.random.seed(5)
    model = MLP(16, (16,), 4)
    opt = Adam(1e-2)
    xs, ys = synthetic_classification(64, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)
    step = make_train_step(model, opt)

    # uninterrupted: 6 steps
    p_ref = model.init()
    s_ref = opt.init(p_ref)
    import copy as _copy
    init_snapshot = jax.tree.map(
        lambda t: md.Tensor(np.asarray(t.detach()), allow_grad=t.allow_grad),
        p_ref, is_leaf=lambda t: isinstance(t, md.Tensor))
    ref_losses = []
    for _ in range(6):
        p_ref, s_ref, loss = step(p_ref, s_ref, x, y)
        ref_losses.append(float(loss.item()))

    # interrupted at 3, checkpointed, resumed
    p = init_snapshot
    s = opt.init(p)
    losses = []
    for _ in range(3):
        p, s, loss = step(p, s, x, y)
        losses.append(float(loss.item()))
    buf = io.BytesIO()
    save_train_state(buf, p, s, step=3, extra={"epoch": 1})
    buf.seek(0)
    p2, s2, at_step, extra = load_train_state(buf, p, s)
    assert at_step == 3 and extra == {"epoch": 1}
    for _ in range(3):
        p2, s2, loss = step(p2, s2, x, y)
        losses.append(float(loss.item()))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p2[0]["w"]), np.asarray(p_ref[0]["w"]),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# buffer donation
# ---------------------------------------------------------------------------


def test_donated_train_step_loops_and_matches():
    """donate=True trains identically; old param buffers are consumed."""
    np.random.seed(6)
    model = MLP(16, (16,), 4)
    init = model.init()
    xs, ys = synthetic_classification(64, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)

    p_ref, _, l_ref = make_train_step(model, SGD(0.1))(init, None, x, y)

    init2 = jax.tree.map(
        lambda t: md.Tensor(np.asarray(t.detach()), allow_grad=t.allow_grad),
        init, is_leaf=lambda t: isinstance(t, md.Tensor))
    step = make_train_step(model, SGD(0.1), donate=True)
    p_don, state, l_don = step(init2, None, x, y)
    np.testing.assert_allclose(float(l_don.item()), float(l_ref.item()),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p_don[0]["w"]),
                               np.asarray(p_ref[0]["w"]), rtol=1e-12)
    # the loop pattern keeps working across steps (fresh buffers each time)
    losses = [float(l_don.item())]
    for _ in range(5):
        p_don, state, loss = step(p_don, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


# ---------------------------------------------------------------------------
# Muon + EMA
# ---------------------------------------------------------------------------


def test_newton_schulz_orthogonalizes():
    from minidiff_tpu.models.optim import _newton_schulz

    md.set_backend("xla")
    for shape in ((32, 64), (64, 32), (48, 48)):
        rng = np.random.RandomState(0)
        g_np = rng.randn(*shape)
        g = md.Tensor(g_np)
        x = _newton_schulz(g.astype(md.float32))
        sv = np.linalg.svd(np.asarray(x.detach(), np.float64),
                           compute_uv=False)
        # the quintic NS is deliberately loose (Muon's coefficients trade
        # exactness for speed): the bulk lands near 1; the smallest
        # directions of a near-square Gaussian (min sv ~ 1/n) lag behind
        assert sv.max() < 1.5, (shape, sv.max())
        assert np.median(sv) > 0.65, (shape, np.median(sv))
        if shape[0] != shape[1]:  # aspect ratio 2: well-conditioned input
            assert sv.min() > 0.3, (shape, sv.min())


def test_muon_trains_mlp(backend):
    from minidiff_tpu.models import Muon

    np.random.seed(3)
    model = MLP(16, (32,), 4)
    params = model.init()
    xs, ys = synthetic_classification(128, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)
    step = make_train_step(model, Muon(lr=0.02))
    state = None
    losses = []
    for _ in range(15):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < 0.5 * losses[0], losses


def test_muon_bf16_params_keep_dtype():
    from minidiff_tpu.models import Muon

    md.set_backend("xla")
    p = {"w": md.Tensor(np.random.randn(16, 32)).astype(md.bfloat16)
            .detach(allow_grad=True),
         "b": md.Tensor(np.random.randn(32)).astype(md.bfloat16)
            .detach(allow_grad=True)}
    g = jax.tree.map(lambda t: md.ones_like(t), p,
                     is_leaf=lambda t: isinstance(t, md.Tensor))
    opt = Muon(lr=0.01)
    st = opt.init(p)
    p2, st2 = opt.update(p, g, st)
    assert p2["w"].dtype == p["w"].dtype
    assert p2["b"].dtype == p["b"].dtype
    # momentum buffers accumulate in f32 regardless of param dtype
    assert str(st2["w"].dtype) == "float32"


def test_ema_formula_and_convergence(backend):
    from minidiff_tpu.models import EMA

    ema = EMA(decay=0.9)
    p = {"w": md.Tensor(np.zeros((4,)))}
    e = ema.init(p)
    target = {"w": md.Tensor(np.ones((4,)))}
    vals = []
    for _ in range(3):
        e = ema.update(e, target)
        vals.append(np.asarray(e["w"].detach()).copy())
    np.testing.assert_allclose(vals[0], 0.1 * np.ones(4), rtol=1e-12)
    np.testing.assert_allclose(vals[1], 0.19 * np.ones(4), rtol=1e-12)
    np.testing.assert_allclose(vals[2], 0.271 * np.ones(4), rtol=1e-12)


def test_ema_init_is_detached_copy(backend):
    from minidiff_tpu.models import EMA

    p = {"w": md.Tensor(np.ones((3,)), allow_grad=True)}
    e = EMA().init(p)
    assert e["w"].op_node is None
    np.testing.assert_allclose(np.asarray(e["w"].detach()),
                               np.asarray(p["w"].detach()))


# ---------------------------------------------------------------------------
# Adam8bit: blockwise-quantized optimizer states
# ---------------------------------------------------------------------------


def _np(t):
    import minidiff_tpu.backend as backend_mod

    return np.asarray(backend_mod.get_backend().as_numpy(t._data))


def test_adam8bit_moment_roundtrip(backend):
    from minidiff_tpu.models.optim import (_dq8_block, _dq8_log_block,
                                           _q8_block, _q8_log_block)

    rng = np.random.default_rng(50)
    x = md.Tensor(rng.standard_normal((13, 7)))  # non-multiple of block
    q, s, n = _q8_block(x, 32)
    back = _np(_dq8_block(q, s, n, (13, 7)))
    amax = np.abs(_np(x)).max()
    assert np.abs(back - _np(x)).max() <= amax / 127 + 1e-9
    # log quantization of a WIDE-dynamic-range nonnegative tensor: small
    # values must survive (the linear scheme zeroed them — regression)
    v = md.Tensor(np.concatenate([rng.uniform(1e-10, 1e-9, 50),
                                  rng.uniform(0.1, 1.0, 14)]))
    ql, sl, nl = _q8_log_block(v, 64)
    vb = _np(_dq8_log_block(ql, sl, nl, (64,)))
    assert (vb[:50] > 0).all()
    rel = np.abs(vb - _np(v)) / _np(v)
    assert rel.max() < 0.15, rel.max()  # ~e^(range/254) multiplicative


def test_adam8bit_tracks_full_adam(backend):
    from minidiff_tpu.models import MLP, make_train_step
    from minidiff_tpu.models.optim import Adam, Adam8bit

    np.random.seed(1)
    model = MLP(in_features=8, hidden=(32,), num_classes=4)
    params = model.init()
    x = md.Tensor(np.random.randn(32, 8))
    y = md.Tensor(np.random.randint(0, 4, (32,)))

    def clone(tree):
        import jax

        return jax.tree.map(
            lambda t: md.Tensor(_np(t).copy(), allow_grad=True), tree,
            is_leaf=lambda z: isinstance(z, md.Tensor))

    p1, p2 = clone(params), clone(params)
    o1, o2 = Adam(5e-3), Adam8bit(5e-3, block=64)
    s1, s2 = o1.init(p1), o2.init(p2)
    st1 = make_train_step(model, o1)
    st2 = make_train_step(model, o2)
    for _ in range(40):
        p1, s1, l1 = st1(p1, s1, x, y)
        p2, s2, l2 = st2(p2, s2, x, y)
    assert float(_np(l2)) < 1.0
    assert abs(float(_np(l1)) - float(_np(l2))) < 0.1

    def nbytes(t):
        total = 0

        def walk(z):
            nonlocal total
            if isinstance(z, dict):
                [walk(v) for v in z.values()]
            elif isinstance(z, (list, tuple)):
                [walk(v) for v in z]
            elif z is not None:
                total += _np(z).nbytes
        walk(t)
        return total

    assert nbytes(s2) < 0.5 * nbytes(s1)
