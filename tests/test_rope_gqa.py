"""Rotary embeddings and grouped-query attention across all model paths."""

from __future__ import annotations

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu.models import (
    SGD,
    TransformerLM,
    generate,
    generate_cached,
    generate_compiled,
    lm_loss,
    make_train_step,
)
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.transformer import synthetic_lm_batches


def setup_function(_):
    md.set_backend("xla")


def test_apply_rope_properties():
    """Rotation preserves pair norms, and relative-position invariance:
    <rope(q, i), rope(k, j)> depends only on i - j."""
    np.random.seed(0)
    q = md.Tensor(np.random.randn(1, 1, 1, 8))
    k = md.Tensor(np.random.randn(1, 1, 1, 8))

    def dot_at(i, j):
        qi = F.apply_rope(q, md.Tensor(np.asarray(i)))
        kj = F.apply_rope(k, md.Tensor(np.asarray(j)))
        return float(md.sum(qi * kj).item())

    assert abs(dot_at(5, 3) - dot_at(9, 7)) < 1e-8  # same offset 2
    assert abs(dot_at(5, 3) - dot_at(6, 3)) > 1e-4  # different offset
    # norm preservation
    x = md.Tensor(np.random.randn(2, 2, 4, 8))
    rx = F.apply_rope(x, md.arange(4))
    np.testing.assert_allclose(
        np.asarray(md.sum(rx * rx, axis=-1).detach()),
        np.asarray(md.sum(x * x, axis=-1).detach()), rtol=1e-8)
    # position 0 is the identity rotation
    x0 = F.apply_rope(x[:, :, :1], md.Tensor(np.asarray(0)))
    np.testing.assert_allclose(np.asarray(x0.detach()),
                               np.asarray(x[:, :, :1].detach()), rtol=1e-8)


@pytest.mark.parametrize("kv_heads", [None, 2, 1])
def test_rope_gqa_lm_trains(kv_heads):
    np.random.seed(1)
    model = TransformerLM(vocab_size=17, dim=16, num_heads=4,
                          num_kv_heads=kv_heads, rope=True, num_layers=2,
                          max_seq_len=8)
    params = model.init()
    assert "pos_emb" not in params  # rope replaces absolute positions
    x, y = next(synthetic_lm_batches(4, 8, 17, 1))
    step = make_train_step(model, SGD(0.2), loss_fn=lm_loss)
    state, losses = None, []
    for _ in range(8):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


def test_gqa_param_shapes_and_cache():
    from minidiff_tpu.models import init_kv_cache

    model = TransformerLM(vocab_size=11, dim=16, num_heads=4, num_kv_heads=2,
                          num_layers=1, max_seq_len=8)
    params = model.init()
    blk = params["blocks"][0]["attn"]
    assert blk["wq"]["w"].shape == (16, 16)
    assert blk["wkv"]["w"].shape == (16, 2 * 2 * 4)  # 2 kv heads x 2 (k,v) x hd
    caches = init_kv_cache(model, batch=3)
    assert caches[0]["k"].shape == (3, 2, 8, 4)  # kv heads, not q heads


@pytest.mark.parametrize("kv_heads,rope", [(2, False), (None, True), (2, True)])
def test_decode_paths_agree(kv_heads, rope):
    """generate == generate_cached == generate_compiled for GQA/RoPE models
    (f32: exact)."""
    np.random.seed(2)
    model = TransformerLM(vocab_size=23, dim=16, num_heads=4,
                          num_kv_heads=kv_heads, rope=rope, num_layers=2,
                          max_seq_len=24)
    params = model.init()
    prompt = md.Tensor(np.random.randint(1, 23, size=(2, 5)))
    full = generate(model, params, prompt, 8, greedy=True)
    cached = generate_cached(model, params, prompt, 8)
    compiled = generate_compiled(model, params, prompt, 8)
    np.testing.assert_array_equal(np.asarray(cached.detach()),
                                  np.asarray(full.detach()))
    np.testing.assert_array_equal(np.asarray(compiled.detach()),
                                  np.asarray(full.detach()))


def test_rope_ring_train_matches_single_device():
    """Sequence-parallel ring training of a RoPE model == single device
    (RoPE rotation uses global positions, so chunking must not change it)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from minidiff_tpu import parallel
    from minidiff_tpu.models.mlp import make_train_step as mts

    np.random.seed(3)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, rope=True,
                          num_layers=2, max_seq_len=16)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 16, 16, 1))

    p1, _, loss1 = mts(model, SGD(0.1), loss_fn=lm_loss)(init, None, x, y)

    mesh = parallel.make_mesh({"sp": 4})
    step, params, state = parallel.make_ring_train_step(
        model, mesh, SGD(0.1), init_params=init
    )
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(params["blocks"][0]["attn"]["qkv"]["w"]),
        np.asarray(p1["blocks"][0]["attn"]["qkv"]["w"]),
        rtol=1e-12, atol=1e-14)


def test_gqa_expand_kv_matches_full_heads():
    """A GQA model with kv repeated == an MHA model whose K/V weights are
    the tiled GQA weights (construction check of expand_kv)."""
    np.random.seed(4)
    from minidiff_tpu.models.transformer import MultiHeadAttention

    gqa = MultiHeadAttention(16, 4, num_kv_heads=2)
    p = gqa.init()
    x = md.Tensor(np.random.randn(2, 6, 16))
    out = gqa.apply(p, x)
    assert out.shape == (2, 6, 16)
    # grads flow to the shared kv projection
    xg = x.detach(allow_grad=True)
    loss, grads = md.value_and_grad(
        lambda pp: md.sum(gqa.apply(pp, xg) ** 2)
    )(p)
    assert np.any(np.asarray(grads["wkv"]["w"]) != 0)
