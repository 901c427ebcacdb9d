"""Structural collective assertions per parallelism mode (VERDICT r2 item 8).

The numerical parallelism tests (test_parallel.py, test_pipeline.py,
test_ring.py, test_collectives.py) prove each sharded step computes the
right VALUES on the virtual mesh — but a sharding-rule regression can keep
values right while silently changing the communication pattern (e.g. a
dropped PartitionSpec turns a Megatron all-reduce into a full all-gather
of the weights).  This file pins the STRUCTURE: the post-SPMD optimized
HLO of each mode's train step must contain exactly the expected collective
ops.

Derivations (8 virtual CPU devices, see each test):
* XLA's all-reduce combiner folds every same-pass gradient/activation
  all-reduce into ONE combined instruction where dependencies allow, so
  small programs pin to 1 combined all-reduce rather than per-tensor
  counts.
* Explicit-EP MoE: 2 ``md.all_to_all`` per layer per direction (dispatch +
  combine), so 1 layer = 4 instructions; the tape backward emits the
  inverse exchanges as all_to_alls too (they ARE the 2 backward ones).
* Ring attention: sp-1 = 7 ``md.ppermute`` rotations per program point;
  the step has 4 (forward rotation + the backward's re-taped rotation and
  its two cotangent inverse-rotations) = 28 collective-permutes.
* GPipe: one ppermute stage-shift per tick; 2 microbatches over pp=4 = 4
  forward ticks + 4 backward ticks = 8 collective-permutes.

No reference counterpart: /root/reference is single-device (SURVEY §2.2).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pytest

import minidiff_tpu as md
from minidiff_tpu import parallel
from minidiff_tpu.models import (MLP, SGD, MoETransformerLM, TransformerLM,
                                 lm_loss, synthetic_lm_batches)
from minidiff_tpu.models.data import synthetic_classification

_COLL = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"reduce-scatter)(-start)?\(")


def _collective_counts(fn, *args) -> dict:
    md.set_backend("xla")
    text = md.lower(fn, *args).compile().as_text()
    return dict(Counter(m.group(1) for m in _COLL.finditer(text)))


def test_tp_mlp_one_combined_all_reduce():
    """Megatron MLP on tp=8: the row-parallel fc2 forward partial-sum and
    the column-parallel fc1 input-grad reduction are the only cross-device
    sums; XLA combines them into one all-reduce instruction.  Any
    all-gather appearing here means a weight got replicated mid-step."""
    mesh = parallel.make_mesh({"dp": 1, "tp": 8})
    model = MLP(16, (64,), 4)
    init = model.init()
    step, place_p, place_b = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1), param_specs=parallel.mlp_sharding_rules(init))
    xs, ys = synthetic_classification(8, 16, 4)
    x, y = place_b(md.Tensor(xs), md.Tensor(ys))
    assert _collective_counts(step, place_p(init), None, x, y) == {
        "all-reduce": 1}


def test_dp_mlp_one_combined_grad_all_reduce():
    mesh = parallel.make_mesh({"dp": 8})
    model = MLP(16, (64,), 4)
    init = model.init()
    step, place_p, place_b = parallel.make_sharded_train_step(
        model, mesh, SGD(0.1))
    xs, ys = synthetic_classification(8, 16, 4)
    x, y = place_b(md.Tensor(xs), md.Tensor(ys))
    assert _collective_counts(step, place_p(init), None, x, y) == {
        "all-reduce": 1}


def test_dp_tp_transformer_all_reduce_only():
    """dp=2 x tp=4, 2 transformer layers: Megatron attention + MLP shards
    communicate by all-reduce ONLY (12 after combining at this size) —
    no all-gather / reduce-scatter may appear (those would mean a
    PartitionSpec stopped propagating and XLA fell back to resharding)."""
    mesh = parallel.make_mesh({"dp": 2, "tp": 4})
    lm = TransformerLM(vocab_size=32, dim=16, num_heads=4, num_layers=2,
                       max_seq_len=8)
    init = lm.init()
    step, place_p, place_b = parallel.make_sharded_train_step(
        lm, mesh, SGD(0.1), loss_fn=lm_loss,
        param_specs=parallel.transformer_sharding_rules(init))
    xt, yt = next(synthetic_lm_batches(4, 8, 32, 1))
    xt, yt = place_b(xt, yt)
    got = _collective_counts(step, place_p(init), None, xt, yt)
    assert set(got) == {"all-reduce"}, got
    assert got["all-reduce"] == 12, got


def test_ep_moe_two_all_to_alls_per_layer_per_direction():
    """GShard explicit EP (ep=8, 1 MoE layer): exactly 2 all_to_alls
    forward (token dispatch + expert-output combine) and the tape
    backward's 2 inverse exchanges = 4; plus 1 combined all-reduce for
    the replicated (non-expert) grads."""
    mesh = parallel.make_mesh({"ep": 8})
    moe = MoETransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=1,
                           num_experts=8, max_seq_len=8, k=1)
    step, params, state = parallel.make_moe_ep_train_step(
        moe, mesh, optimizer=SGD(0.1))
    xa, ya = next(synthetic_lm_batches(16, 8, 32, 1))
    got = _collective_counts(step, params, state, xa, ya)
    assert got.get("all-to-all") == 4, got
    assert set(got) == {"all-to-all", "all-reduce"}, got


def test_ring_attention_rotation_count():
    """Ring attention on sp=8: K/V rotate sp-1 = 7 times at each of 4
    program points (forward; backward re-tape; dK and dV inverse
    rotations) = 28 collective-permutes, plus the combined grad
    all-reduce."""
    mesh = parallel.make_mesh({"sp": 8})
    rm = TransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=1,
                       max_seq_len=32)
    step, params, state = parallel.make_ring_train_step(rm, mesh, SGD(0.1))
    xr, yr = next(synthetic_lm_batches(2, 32, 32, 1))
    got = _collective_counts(step, params, state, xr, yr)
    assert got.get("collective-permute") == 28, got
    assert set(got) == {"collective-permute", "all-reduce"}, got


def test_pipeline_tick_count():
    """GPipe on pp=4 with 2 microbatches: one stage-shift ppermute per
    tick, 4 forward + 4 backward ticks = 8 collective-permutes, plus the
    combined loss/grad all-reduce."""
    mesh = parallel.make_mesh({"pp": 4})
    pm = TransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=4,
                       max_seq_len=8)
    step, params, state = parallel.make_pipeline_train_step(
        pm, mesh, n_micro=2, optimizer=SGD(0.1))
    xp, yp = next(synthetic_lm_batches(4, 8, 32, 1))
    got = _collective_counts(step, params, state, xp, yp)
    assert got.get("collective-permute") == 8, got
    assert set(got) == {"collective-permute", "all-reduce"}, got


def test_dp_tp_pp_composed_collectives():
    """dp=2 x tp=2 x pp=2 composed GPipe step (VERDICT r4 item 8): the
    partial-manual shard_map keeps pp/dp explicit and leaves tp to GSPMD.
    Expected structure: ticks = n_micro + pp - 1 = 3 stage-shift
    ppermutes with the final (dead) send DCE'd -> 2 forward + 2 backward
    = 4 collective-permutes.  All cross-device sums are all-reduces:
    the Megatron tp pairs (attention-out + fc2 row-parallel forward,
    their column-parallel input-grad reductions backward) per live tick,
    the pp psum of shared-param grads, the dp grad pmean, and the loss
    reductions — 17 instructions after XLA's all-reduce combiner at this
    size.  No all-gather / reduce-scatter may appear: one would mean a
    stage-weight PartitionSpec stopped propagating into the body and
    GSPMD fell back to resharding the weights."""
    from jax.sharding import PartitionSpec as P

    mesh = parallel.make_mesh({"dp": 2, "tp": 2, "pp": 2})
    pm = TransformerLM(vocab_size=32, dim=16, num_heads=2, num_layers=2,
                       max_seq_len=8)
    init = pm.init()
    step, params, state = parallel.make_pipeline_train_step(
        pm, mesh, n_micro=2, optimizer=SGD(0.1), init_params=init,
        tp_rules=parallel.transformer_sharding_rules(init))
    xp, yp = next(synthetic_lm_batches(4, 8, 32, 1))
    xp, yp = step.place_batch(xp, yp)
    got = _collective_counts(step, params, state, xp, yp)
    assert set(got) == {"all-reduce", "collective-permute"}, got
    assert got["collective-permute"] == 4, got
    assert got["all-reduce"] == 17, got
