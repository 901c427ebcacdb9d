"""Sharded training over a virtual 8-device CPU mesh (dp x tp SPMD)."""

from __future__ import annotations

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import MLP, SGD
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.data import synthetic_classification
from minidiff_tpu.models.mlp import make_train_step


def setup_function(_):
    md.set_backend("xla")


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_make_mesh():
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    assert mesh.shape == {"dp": 2, "tp": 4}


@needs_8
def test_constrain_is_differentiable_identity():
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    sharding = parallel.named_sharding(mesh, "dp", None)
    x = md.Tensor(np.random.randn(4, 6), allow_grad=True)
    out = md.sum(parallel.constrain(x, sharding) ** 2)
    out.backward()
    np.testing.assert_allclose(np.asarray(x.grad), 2 * np.asarray(x.detach()), rtol=1e-10)


@needs_8
def test_shard_tree_places_leaves():
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    model = MLP(16, (8,), 4)
    params = parallel.shard_tree(
        model.init(), mesh, parallel.mlp_sharding_rules(model.init())
    )
    w0 = params[0]["w"]._data
    assert w0.sharding.spec == PartitionSpec(None, "tp")


@needs_8
def test_sharded_training_matches_single_device():
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    model = MLP(16, (8,), 4)
    init = model.init()
    xs, ys = synthetic_classification(32, 16, 4)
    x, y = md.Tensor(xs), md.Tensor(ys)

    # single-device run
    step1 = make_train_step(model, SGD(0.1), jit=True)
    p1, s1, loss1 = step1(init, None, x, y)

    # sharded run from identically-initialized params
    step8, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), param_specs=parallel.mlp_sharding_rules(init)
    )
    p8 = place_params(init)
    xb, yb = place_batch(x, y)
    p8, s8, loss8 = step8(p8, None, xb, yb)

    np.testing.assert_allclose(float(loss8.item()), float(loss1.item()), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(p8[0]["w"]), np.asarray(p1[0]["w"]), rtol=1e-9
    )


@needs_8
def test_sharded_multi_step_loss_decreases():
    mesh = parallel.make_mesh({"dp": 4, "tp": 2})
    model = MLP(32, (16,), 4)
    step, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.2),
        param_specs=parallel.mlp_sharding_rules(model.init()),
    )
    params = place_params(model.init())
    state = None
    xs, ys = synthetic_classification(64, 32, 4)
    x, y = place_batch(md.Tensor(xs), md.Tensor(ys))
    losses = []
    for _ in range(10):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.5, losses


@needs_8
def test_sharded_transformer_matches_single_device():
    from minidiff_tpu.models import TransformerLM, lm_loss, synthetic_lm_batches

    np.random.seed(0)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=4, num_layers=1,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, s1, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    step8, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), loss_fn=lm_loss,
        param_specs=parallel.transformer_sharding_rules(init),
    )
    p8 = place_params(init)
    xb, yb = place_batch(x, y)
    p8, s8, loss8 = step8(p8, None, xb, yb)

    np.testing.assert_allclose(float(loss8.item()), float(loss1.item()),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p8["blocks"][0]["attn"]["qkv"]["w"]),
        np.asarray(p1["blocks"][0]["attn"]["qkv"]["w"]),
        rtol=1e-6, atol=1e-7,
    )
    # TP placement survives the step (no silent gather-to-replicated)
    spec = p8["blocks"][0]["fc1"]["w"]._data.sharding.spec
    assert spec == PartitionSpec(None, "tp"), spec


@needs_8
def test_sharded_transformer_loss_decreases():
    from minidiff_tpu.models import TransformerLM, lm_loss, synthetic_lm_batches

    np.random.seed(0)
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    model = TransformerLM(vocab_size=32, dim=32, num_heads=4, num_layers=2,
                          max_seq_len=16)
    init = model.init()
    step, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.5), loss_fn=lm_loss,
        param_specs=parallel.transformer_sharding_rules(init),
    )
    params = place_params(init)
    x, y = next(synthetic_lm_batches(4, 8, 32, 1))
    x, y = place_batch(x, y)
    state = None
    losses = []
    for _ in range(8):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses


@needs_8
def test_sequence_parallel_transformer_matches_single_device():
    """dp x sp x tp: batch sharded over batch AND sequence axes."""
    from minidiff_tpu.models import TransformerLM, lm_loss, synthetic_lm_batches

    np.random.seed(0)
    model = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=1,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 8, 32, 1))
    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    _, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"dp": 2, "sp": 2, "tp": 2})
    step8, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), loss_fn=lm_loss,
        param_specs=parallel.transformer_sharding_rules(init),
        batch_spec=PartitionSpec("dp", "sp"),
    )
    xb, yb = place_batch(x, y)
    _, _, loss8 = step8(place_params(init), None, xb, yb)
    np.testing.assert_allclose(float(loss8.item()), float(loss1.item()),
                               rtol=1e-6)
    # tokens really are sharded over both axes
    spec = xb._data.sharding.spec
    assert spec == PartitionSpec("dp", "sp"), spec


@needs_8
def test_tp_rules_cover_model_variants():
    """transformer_sharding_rules follows the actual params tree: rope (no
    pos_emb), GQA (wq/wkv), tied embeddings (no head) all place cleanly."""
    from minidiff_tpu.models import TransformerLM, lm_loss, SGD
    from minidiff_tpu.models.transformer import synthetic_lm_batches

    np.random.seed(9)
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    model = TransformerLM(vocab_size=16, dim=16, num_heads=4, num_kv_heads=4,
                          num_layers=1, max_seq_len=8, rope=True,
                          tie_embeddings=True)
    init = model.init()
    rules = parallel.transformer_sharding_rules(init)
    placed = parallel.shard_tree(init, mesh, rules)  # must not raise
    step, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), loss_fn=lm_loss, param_specs=rules
    )
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))
    xb, yb = place_batch(x, y)
    p, s, loss = step(place_params(init), None, xb, yb)
    assert np.isfinite(float(loss.item()))


@needs_8
def test_sharded_mamba_tp_matches_single_device():
    """mamba_sharding_rules: dp x tp step == single-device step; the
    channel-parallel placement survives the update."""
    from minidiff_tpu.models import MambaLM, SGD, lm_loss
    from minidiff_tpu.models.transformer import synthetic_lm_batches

    np.random.seed(3)
    model = MambaLM(vocab_size=16, dim=16, num_layers=2, d_state=4,
                    d_conv=3, expand=2)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, s1, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    step8, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), loss_fn=lm_loss,
        param_specs=parallel.mamba_sharding_rules(init),
    )
    p8 = place_params(init)
    xb, yb = place_batch(x, y)
    p8, s8, loss8 = step8(p8, None, xb, yb)

    np.testing.assert_allclose(float(loss8.item()), float(loss1.item()),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p8["blocks"][0]["in_proj"]["w"]),
        np.asarray(p1["blocks"][0]["in_proj"]["w"]),
        rtol=1e-6, atol=1e-7,
    )
    spec = p8["blocks"][0]["out_proj"]["w"]._data.sharding.spec
    assert spec == PartitionSpec("tp", None), spec


@needs_8
def test_sharded_mamba_loss_decreases():
    from minidiff_tpu.models import MambaLM, Adam, lm_loss
    from minidiff_tpu.models.transformer import synthetic_lm_batches

    np.random.seed(4)
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    model = MambaLM(vocab_size=32, dim=16, num_layers=2, d_state=4)
    init = model.init()
    step, place_params, place_batch = parallel.make_sharded_train_step(
        model, mesh, Adam(5e-3), loss_fn=lm_loss,
        param_specs=parallel.mamba_sharding_rules(init),
    )
    params = place_params(init)
    opt_state = Adam(5e-3).init(params)
    x, y = next(synthetic_lm_batches(4, 8, 32, 1))
    xb, yb = place_batch(x, y)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, xb, yb)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] - 0.05, losses
