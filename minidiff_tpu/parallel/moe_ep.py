"""Expert parallelism via explicit all_to_all dispatch (GShard-style).

models/moe.py shards *stacked* expert weights with a PartitionSpec and lets
XLA's SPMD partitioner derive the exchanges.  This module is the explicit
formulation used at production scale: the whole MoE train step runs inside ONE
``jax.shard_map`` over the ``ep`` mesh axis, and the token<->expert exchange is
two differentiable ``md.all_to_all`` ops, so the tape backward emits the
reverse exchanges by construction (all_to_all's cotangent is the inverse
exchange — see ops/definitions.py all_to_all_grad).

Layout (N = ep axis size, E experts, E % N == 0):

* the batch is data-sharded over ``ep`` — each device routes its own tokens
  with its LOCAL capacity C = ceil(cf * k * T_local / E);
* per-device dispatch produces (E, C, d) expert slots; the first all_to_all
  splits the expert axis (chunk j -> device j) and concatenates the received
  chunks on the slot axis, giving every device the (E/N, N*C, d) inputs for
  its resident experts;
* expert weights live pre-sharded on their leading expert axis
  (PartitionSpec("ep", ...)) — no replication, the memory win of EP;
* the second all_to_all is the exact inverse (split slots, concat experts),
  returning each device its own tokens' (E, C, d) outputs for the local
  gate-weighted combine.

Gradient flow: expert-shard grads arrive complete with NO extra collective —
the backward all_to_all routes every device's cotangents back to the expert
that produced them.  Replicated (non-expert) params need the usual psum over
data shards, exactly like parallel/pipeline.py's shared-param treatment.

The reference is single-device (SURVEY.md §2.2 lists EP as absent).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
from jax.sharding import Mesh, PartitionSpec as P

import minidiff_tpu as md
from minidiff_tpu.models.optim import SGD, Optimizer
from minidiff_tpu.models.transformer import lm_loss
from minidiff_tpu.parallel._util import _is_tensor, _unwrap, _wrap
from minidiff_tpu.parallel.pipeline import _state_specs

if TYPE_CHECKING:
    from typing import Any, Callable, Optional

    from minidiff_tpu.models.moe import MoEFeedForward, MoETransformerLM


def moe_ep_ffn(moe: "MoEFeedForward", params: "Any", x: "md.Tensor",
               axis_name: str = "ep"):
    """Expert-parallel MoEFeedForward forward for one local batch shard.

    Must run inside a shard_map binding ``axis_name``; ``params["experts"]``
    leaves are the LOCAL (E/N, ...) shards while the router is replicated.
    Returns ``(y, aux)`` exactly like ``MoEFeedForward.apply_with_aux``.
    """
    b, s, d = x.shape
    t = b * s
    c = moe.capacity(t)
    xt = x.reshape((t, d))

    if moe.grouped:
        # grouped dispatch (VERDICT r4 item 4): the slot-table row gather
        # replaces the (T, E, C) one-hot tensordot INSIDE the shard_map —
        # the exchanged (E, C, d) buffer is identical, so the all_to_all
        # pair and the expert matmuls are untouched; only the O(E*C*T*d)
        # dispatch/combine FLOPs become O(k*T*d) gathers.  The one-hot
        # branch below remains the parity oracle.
        expert_in, choices, aux = moe.dispatch_grouped(params, xt, c)
    else:
        dispatch, combine, aux = moe.compute_routing(params, xt, c)
        dispatch = dispatch.astype(xt.dtype)
        expert_in = md.tensordot(dispatch, xt, axes=([0], [0]))  # (E, C, d)

    # exchange: send expert-chunk j to device j; receive every device's slots
    # for the experts resident here -> (E/N, N*C, d)
    expert_in = md.all_to_all(expert_in, axis_name=axis_name,
                              split_axis=0, concat_axis=1)
    # local resident experts: the shared stacked-FFN forward runs on the
    # (E/N, N*C, d) shard unchanged (gelu or swiglu kind, optional biases)
    out = moe._experts_forward(params, expert_in)
    # inverse exchange: every token's slot outputs return to its home device
    out = md.all_to_all(out, axis_name=axis_name,
                        split_axis=1, concat_axis=0)  # (E, C, d)
    if moe.grouped:
        y = moe.combine_grouped(choices, out)
    else:
        y = md.tensordot(combine, out, axes=([1, 2], [0, 1]))
    return y.reshape((b, s, d)), aux


def moe_ep_param_specs(raw_params: "Any") -> "Any":
    """PartitionSpec tree: expert stacks shard their leading axis on ``ep``,
    everything else (router, attention, norms, embeddings, head) replicates."""
    specs = jax.tree.map(lambda _: P(), raw_params)
    for bp in specs["blocks"]:
        bp["moe"]["experts"] = jax.tree.map(
            lambda _: P("ep"), bp["moe"]["experts"])
    return specs


def make_moe_ep_train_step(
    model: "MoETransformerLM",
    mesh: Mesh,
    optimizer: "Optional[Optimizer]" = None,
    loss_fn: "Callable" = lm_loss,
    aux_coef: float = 0.01,
    init_params: "Any" = None,
):
    """Returns ``(step, params, opt_state)``.

    ``step(params, opt_state, x, y) -> (params, opt_state, loss)``; x/y are
    full-batch (B, S) token Tensors with B divisible by the ``ep`` axis size
    (each device trains on its batch shard and hosts E/N experts).  The loss
    is the mean over shards of the local ``loss_fn + aux_coef * aux``.
    """
    ep = mesh.shape["ep"]
    assert model.num_experts % ep == 0, (model.num_experts, ep)
    optimizer = optimizer or SGD(0.1)

    params = init_params or model.init()
    opt_state = optimizer.init(params)

    raw_params = _unwrap(params)
    param_specs = moe_ep_param_specs(raw_params)
    raw_state = _unwrap(opt_state) if opt_state is not None else None
    state_specs = _state_specs(raw_state, raw_params, param_specs)

    # identify which leaves are expert shards (grads there are already total)
    is_expert_leaf = jax.tree.map(lambda _: False, raw_params)
    for bp in is_expert_leaf["blocks"]:
        bp["moe"]["experts"] = jax.tree.map(
            lambda _: True, bp["moe"]["experts"])

    def body(raw_p, raw_s, raw_x, raw_y):
        p = _wrap(raw_p, allow_grad=True)
        state = _wrap(raw_s) if raw_s is not None else None
        x, y = md.Tensor(raw_x), md.Tensor(raw_y)

        def objective(p):
            b, s = x.shape
            h = p["tok_emb"][x]
            if not model.rope:
                h = h + p["pos_emb"][:s]
            aux_total = None
            for blk, bp in zip(model.blocks, p["blocks"]):
                h = h + blk.attn.apply(
                    bp["attn"], blk.ln1.apply(bp["ln1"], h))
                yf, aux = moe_ep_ffn(
                    blk.moe, bp["moe"], blk.ln2.apply(bp["ln2"], h),
                    axis_name="ep")
                h = h + yf
                aux_total = aux if aux_total is None else aux_total + aux
            h = model.ln_f.apply(p["ln_f"], h)
            logits = model.lm_head(p, h)
            local = loss_fn(logits, y) + aux_total.astype(
                logits.dtype) * aux_coef
            # mean over data shards; its cotangent seeds each local term 1/N
            return md.pmean(local, axis_name="ep")

        loss, grads = md.value_and_grad(objective)(p)
        with md.no_grad():
            # replicated params: each shard holds (1/N) d(local)/dp of its own
            # term only — sum the shards.  Expert shards already received every
            # token's cotangent through the backward all_to_all: leave them.
            grads = jax.tree.map(
                lambda g, is_exp: g if is_exp else md.psum(g, axis_name="ep"),
                grads, is_expert_leaf, is_leaf=_is_tensor)
        new_params, new_state = optimizer.update(p, grads, state)
        new_raw_s = _unwrap(new_state) if new_state is not None else None
        return _unwrap(new_params), new_raw_s, loss._data

    jitted = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(param_specs, state_specs, P("ep"), P("ep")),
            out_specs=(param_specs, state_specs, P()),
            check_vma=False,
        )
    )

    def step(params, state, x, y):
        raw_p, new_raw_s, raw_loss = jitted(
            _unwrap(params),
            _unwrap(state) if state is not None else None,
            x._data,
            y._data,
        )
        new_params = _wrap(raw_p, allow_grad=True)
        new_state = _wrap(new_raw_s) if new_raw_s is not None else None
        return new_params, new_state, md.Tensor(raw_loss)

    return step, params, opt_state
