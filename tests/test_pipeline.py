"""GPipe pipeline parallelism over the virtual 8-device mesh.

Validates the collective-pipeline train step (parallel/pipeline.py): the
whole step runs inside one shard_map over ``pp``, activations cross stages
via the differentiable md.ppermute, and the engine's tape backward reverses
the pipeline.  The hard check is bit-level parity with the single-device
step from identical initial parameters.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import SGD, Adam, TransformerLM, lm_loss
from minidiff_tpu.models.mlp import make_train_step
from minidiff_tpu.models.transformer import synthetic_lm_batches


def setup_function(_):
    md.set_backend("xla")


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_collective_ops_single_device_semantics(backend):
    """psum is identity and ppermute keeps only the self-edge in a 1-device
    world (numpy backend parity with jax.lax missing-source semantics)."""
    if backend != "numpy":
        pytest.skip("xla collectives need an SPMD region; covered below")
    x = md.Tensor(np.arange(4.0), allow_grad=True)
    y = md.sum(md.psum(x, axis_name="pp") * 2)
    y.backward()
    np.testing.assert_allclose(np.asarray(x.grad), 2 * np.ones(4))
    z = md.ppermute(x.detach(), axis_name="pp", perm=[(0, 0)])
    np.testing.assert_allclose(np.asarray(z.detach()), np.arange(4.0))
    z2 = md.ppermute(x.detach(), axis_name="pp", perm=[])
    np.testing.assert_allclose(np.asarray(z2.detach()), np.zeros(4))


@needs_8
def test_stack_unstack_roundtrip():
    model = TransformerLM(vocab_size=8, dim=8, num_heads=2, num_layers=4,
                          max_seq_len=4)
    init = model.init()
    stacked = parallel.stack_stage_params(init, 4)
    assert len(stacked["stages"]) == 1  # 4 layers / 4 stages
    back = parallel.unstack_stage_params(stacked, 4)
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(lambda t: np.asarray(t.detach()), init,
                                     is_leaf=lambda t: isinstance(t, md.Tensor))),
        jax.tree.leaves(jax.tree.map(lambda t: np.asarray(t.detach()), back,
                                     is_leaf=lambda t: isinstance(t, md.Tensor))),
    ):
        np.testing.assert_array_equal(a, b)


@needs_8
def test_pipeline_matches_single_device():
    """pp=4 pipeline step == plain step: loss and every updated parameter."""
    np.random.seed(0)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=4,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(8, 8, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"pp": 4})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=4, optimizer=SGD(0.1), init_params=init
    )
    params, state, loss = step(params, state, x, y)

    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-9)
    un = parallel.unstack_stage_params(params, 4)
    for path in [
        lambda p: p["blocks"][0]["attn"]["qkv"]["w"],
        lambda p: p["blocks"][3]["fc2"]["w"],
        lambda p: p["tok_emb"],
        lambda p: p["head"]["w"],
        lambda p: p["ln_f"]["g"],
    ]:
        np.testing.assert_allclose(np.asarray(path(un)), np.asarray(path(p1)),
                                   rtol=1e-12, atol=1e-12)


@needs_8
def test_pipeline_multiple_stages_per_device():
    """num_layers=4 over pp=2: two blocks per stage still match."""
    np.random.seed(1)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=4,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))

    step1 = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = step1(init, None, x, y)

    mesh = parallel.make_mesh({"pp": 2})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=SGD(0.1), init_params=init
    )
    params, state, loss = step(params, state, x, y)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-9)
    un = parallel.unstack_stage_params(params, 2)
    np.testing.assert_allclose(
        np.asarray(un["blocks"][1]["fc1"]["w"]),
        np.asarray(p1["blocks"][1]["fc1"]["w"]), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(un["blocks"][2]["fc1"]["w"]),
        np.asarray(p1["blocks"][2]["fc1"]["w"]), rtol=1e-12, atol=1e-12)


@needs_8
def test_pipeline_with_adam_state_specs():
    """Optimizer-state trees (Adam m/v + step counter) shard correctly."""
    np.random.seed(2)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=4,
                          max_seq_len=8)
    mesh = parallel.make_mesh({"pp": 4})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=Adam(1e-2)
    )
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))
    losses = []
    for _ in range(6):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


@needs_8
def test_pipeline_loss_decreases():
    np.random.seed(3)
    model = TransformerLM(vocab_size=32, dim=32, num_heads=2, num_layers=4,
                          max_seq_len=8)
    mesh = parallel.make_mesh({"pp": 4})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=4, optimizer=SGD(0.5)
    )
    x, y = next(synthetic_lm_batches(8, 8, 32, 1))
    losses = []
    for _ in range(8):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0] * 0.8, losses


@needs_8
def test_pipeline_with_mixed_precision_state_specs():
    """MixedPrecision nests {master, inner:{m,v,t}}: the recursive state-spec
    matcher must shard the stage-param-shaped subtrees on pp."""
    from minidiff_tpu.models import Adam, MixedPrecision

    np.random.seed(22)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=4,
                          max_seq_len=8, dtype=md.bfloat16)
    mesh = parallel.make_mesh({"pp": 4})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=MixedPrecision(Adam(1e-2))
    )
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))
    losses = []
    for _ in range(5):
        params, state, loss = step(params, state, x, y)
        losses.append(float(loss.item()))
    assert losses[-1] < losses[0], losses


@needs_8
def test_pipeline_remat_matches_plain():
    """remat=True recomputes block interiors in the VJP; losses and the
    updated params must match the un-remat'd pipeline bit-for-bit."""
    np.random.seed(5)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=4,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(4, 8, 16, 1))
    mesh = parallel.make_mesh({"pp": 2})

    step_a, pa, sa = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=SGD(0.1), init_params=init)
    step_b, pb, sb = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=SGD(0.1), init_params=init,
        remat=True)
    for _ in range(2):
        pa, sa, la = step_a(pa, sa, x, y)
        pb, sb, lb = step_b(pb, sb, x, y)
        np.testing.assert_allclose(float(la.item()), float(lb.item()),
                                   rtol=1e-12)
    ua = parallel.unstack_stage_params(pa, 2)
    ub = parallel.unstack_stage_params(pb, 2)
    for blk_a, blk_b in zip(ua["blocks"], ub["blocks"]):
        np.testing.assert_allclose(
            np.asarray(blk_a["fc1"]["w"]), np.asarray(blk_b["fc1"]["w"]),
            rtol=1e-12, atol=1e-12)


@needs_8
def test_pipeline_dp_tp_pp_composed_matches_single_device():
    """dp=2 x tp=2 x pp=2 in ONE train step (VERDICT r4 item 8): pp and dp
    are manual shard_map axes (explicit ppermute ticks, grad pmean over
    dp), tp rides GSPMD from the Megatron PartitionSpecs placed on the
    stage weights.  Loss and every updated parameter must match the plain
    single-device step from identical initial parameters."""
    np.random.seed(7)
    from jax.sharding import PartitionSpec as P

    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(8, 8, 16, 1))

    solo = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = solo(init, None, x, y)

    mesh = parallel.make_mesh({"dp": 2, "tp": 2, "pp": 2})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=SGD(0.1), init_params=init,
        tp_rules=parallel.transformer_sharding_rules(init))
    xp, yp = step.place_batch(x, y)
    params, state, loss = step(params, state, xp, yp)

    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-9)
    un = parallel.unstack_stage_params(params, 2)
    for path in [
        lambda p: p["blocks"][0]["attn"]["qkv"]["w"],
        lambda p: p["blocks"][1]["fc2"]["w"],
        lambda p: p["tok_emb"],
        lambda p: p["head"]["w"],
        lambda p: p["ln_f"]["g"],
    ]:
        np.testing.assert_allclose(np.asarray(path(un)), np.asarray(path(p1)),
                                   rtol=1e-9, atol=1e-10)


@needs_8
def test_pipeline_dp_pp_no_tp_rules():
    """dp=4 x pp=2 without tp: batch rows shard over dp manually, grads
    pmean over dp — still exact vs the solo step."""
    np.random.seed(8)
    model = TransformerLM(vocab_size=16, dim=16, num_heads=2, num_layers=2,
                          max_seq_len=8)
    init = model.init()
    x, y = next(synthetic_lm_batches(8, 8, 16, 1))
    solo = make_train_step(model, SGD(0.1), loss_fn=lm_loss)
    p1, _, loss1 = solo(init, None, x, y)

    mesh = parallel.make_mesh({"dp": 4, "pp": 2})
    step, params, state = parallel.make_pipeline_train_step(
        model, mesh, n_micro=2, optimizer=SGD(0.1), init_params=init)
    xp, yp = step.place_batch(x, y)
    params, state, loss = step(params, state, xp, yp)
    np.testing.assert_allclose(float(loss.item()), float(loss1.item()),
                               rtol=1e-9)
    un = parallel.unstack_stage_params(params, 2)
    np.testing.assert_allclose(np.asarray(un["tok_emb"]),
                               np.asarray(p1["tok_emb"]),
                               rtol=1e-9, atol=1e-10)
