"""Pipeline parallelism: GPipe microbatch schedule over a ``pp`` mesh axis.

The reference is single-device (SURVEY.md §2.2 lists PP as absent); this is
the TPU-native pipeline layer.  The design is the *collective pipeline* of
the SPMD world, not a multi-process runtime:

* the WHOLE train step — embedding, blocks, head, loss, engine backward,
  optimizer — runs inside ONE ``jax.shard_map`` over the ``pp`` axis, so all
  devices execute the same compiled program on their local stage;
* per-stage block parameters are stacked on a leading stage axis and arrive
  pre-sharded (in_specs ``P('pp')``) — each device holds its stage's blocks;
* activations move between stages with the differentiable ``md.ppermute``
  op, so the engine's own tape backward emits the reverse pipeline (the
  cotangent rides the inverse permutation) — no jax.grad involved;
* stage-specific work (embedding on stage 0, head+loss on the last stage)
  is computed everywhere and masked by ``axis_index`` — the SPMD idiom:
  identical program, divergent data;
* replicated parameters (embeddings, final norm, head) get their gradients
  summed across stages with the differentiable ``md.psum`` before the
  optimizer update, keeping every device's copy bit-identical.

The schedule is classic GPipe: ``n_micro`` microbatches flow through
``pp`` stages in ``n_micro + pp - 1`` ticks (statically unrolled — tick
structure is compile-time, only data is dynamic).  Bubble fraction is
``(pp-1)/(n_micro+pp-1)``; raise ``n_micro`` to amortize.

Composing axes (dp x tp x pp): on a mesh with extra axes the shard_map
goes PARTIAL-MANUAL — ``pp`` (and ``dp`` when present) are manual axes;
``tp`` stays in GSPMD's hands *inside* the body.  Manual dp shards the
batch rows (each dp group runs the pipeline on its rows; gradients are
``md.pmean``-ed over dp before the update), while Megatron
PartitionSpecs on the stage weights (``tp_rules=
transformer_sharding_rules(...)``) make XLA insert the tp all-reduces
inside each block's matmuls.  The explicit ``md.ppermute`` stage shifts
ride the manual ``pp`` axis.  One program, three forms of parallelism,
only the pipeline's own communication written by hand.  (dp is manual
rather than GSPMD-auto deliberately: XLA 0.9's SPMD partitioner
hard-crashes — ``spmd_partitioner_util.cc`` CHECK — partitioning the
embedding gather when auto-dp-sharded indices meet a manual-axis
subgroup.)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import minidiff_tpu as md
from minidiff_tpu.models.optim import SGD, Optimizer
from minidiff_tpu.models.transformer import lm_loss

if TYPE_CHECKING:
    from typing import Any, Callable, Optional

    from minidiff_tpu.models.transformer import TransformerLM


from minidiff_tpu.parallel._util import _is_tensor, _unwrap, _wrap  # noqa: E402


def stack_stage_params(params: "Any", pp: int) -> "Any":
    """TransformerLM params -> {"stages": [per-stage-stacked block trees],
    "shared": everything else}.

    ``stages[j]`` holds block ``s*per_stage + j`` of every stage ``s``,
    stacked on a new leading axis of size ``pp`` (the axis shard_map splits).
    """
    blocks = params["blocks"]
    assert len(blocks) % pp == 0, (len(blocks), pp)
    per_stage = len(blocks) // pp
    stages = []
    for j in range(per_stage):
        group = [blocks[s * per_stage + j] for s in range(pp)]
        stages.append(
            jax.tree.map(
                lambda *ts: md.Tensor(
                    jnp.stack([t._data for t in ts]), allow_grad=True
                ),
                *group,
                is_leaf=_is_tensor,
            )
        )
    shared = {k: v for k, v in params.items() if k != "blocks"}
    return {"stages": stages, "shared": shared}


def unstack_stage_params(stacked: "Any", pp: int) -> "Any":
    """Inverse of stack_stage_params (for checkpointing / single-device use)."""
    per_stage = len(stacked["stages"])
    blocks = []
    for s in range(pp):
        for j in range(per_stage):
            blocks.append(
                jax.tree.map(
                    lambda t: md.Tensor(t._data[s], allow_grad=True),
                    stacked["stages"][j],
                    is_leaf=_is_tensor,
                )
            )
    out = dict(stacked["shared"])
    out["blocks"] = blocks
    return out


def stack_stage_specs(rules: "Any", pp: int) -> "Any":
    """Unstacked per-param PartitionSpec rules (e.g. from
    ``transformer_sharding_rules``) -> the stacked ``{stages, shared}``
    layout of ``stack_stage_params``, with the leading stage axis on
    ``pp`` prepended to every block leaf's spec.

    Used to PLACE the stacked params on a composed (dp x tp x pp) mesh:
    the pp dimension is consumed by the shard_map's manual in_specs, the
    remaining axes stay visible to GSPMD inside the body."""
    blocks = rules["blocks"]
    assert len(blocks) % pp == 0, (len(blocks), pp)
    per_stage = len(blocks) // pp

    def _is_spec(s):
        return isinstance(s, P)

    stages = [
        jax.tree.map(lambda sp: P("pp", *sp), blocks[j], is_leaf=_is_spec)
        for j in range(per_stage)
    ]
    shared = {k: v for k, v in rules.items() if k != "blocks"}
    return {"stages": stages, "shared": shared}


def _state_specs(raw_state, raw_params, param_specs):
    """Specs for an optimizer-state tree: reuse the param spec tree wherever
    the state embeds a params-shaped subtree, RECURSIVELY (SGD momentum,
    Adam m/v, MixedPrecision's {master, inner:{m,v,t}} nesting); everything
    else (step counters, scalars) is replicated.

    Limitation: optimizers whose state replaces each param leaf with a
    differently-shaped sub-structure (Adafactor's factored r/c vectors)
    have no params-shaped subtree; their stage-sharded moments would need
    shape-aware placement — unsupported here (the trace fails loudly with
    a shape mismatch rather than training with a wrong layout)."""
    if raw_state is None:
        return None
    pstruct = jax.tree.structure(raw_params)

    def walk(sub):
        try:
            if jax.tree.structure(sub) == pstruct:
                return param_specs
        except Exception:
            pass
        if isinstance(sub, dict):
            return {k: walk(v) for k, v in sub.items()}
        if isinstance(sub, tuple) and hasattr(sub, "_fields"):
            return type(sub)(*[walk(v) for v in sub])  # namedtuple
        if isinstance(sub, (list, tuple)):
            return type(sub)(walk(v) for v in sub)
        return P()

    return walk(raw_state)


def make_pipeline_train_step(
    model: "TransformerLM",
    mesh: Mesh,
    n_micro: int,
    optimizer: "Optional[Optimizer]" = None,
    loss_fn: "Callable" = lm_loss,
    init_params: "Any" = None,
    remat: bool = False,
    tp_rules: "Any" = None,
    batch_spec: "Optional[P]" = None,
):
    """Returns (step, stacked_params, opt_state).

    ``step(params, opt_state, x, y) -> (params, opt_state, loss)`` where
    ``params`` is the stacked tree from ``stack_stage_params`` (leading
    stage axis sharded on ``pp``); x/y are full-batch (B, S) token Tensors,
    split into ``n_micro`` equal microbatches along B inside the step.
    ``init_params`` (unstacked TransformerLM tree) seeds the stacked params;
    omitted, a fresh ``model.init()`` is used.

    ``remat=True`` wraps every (tick, block) forward in ``md.remat``: GPipe
    holds all ``n_micro`` in-flight microbatches' activations until the
    backward sweep, so per-block intermediates dominate peak memory; remat
    keeps only the block BOUNDARY activations and recomputes the interiors
    inside the VJP — the schedule-free TPU answer to 1F1B's memory win
    (same peak-activation scaling, no handwritten interleave).

    On a mesh with axes beyond ``pp`` (dp/tp composition): pass
    ``tp_rules`` (an UNSTACKED spec tree, e.g.
    ``transformer_sharding_rules(model.init())``) to place the stage
    weights Megatron-style over the extra axes, and ``batch_spec`` (e.g.
    ``P('dp', None)``) to shard the batch rows; use the returned
    ``step.place_batch(x, y)`` for inputs.  Returned params/opt_state are
    already placed.  Only ``pp`` is manual inside the shard_map — GSPMD
    inserts every tp/dp collective.
    """
    pp = mesh.shape["pp"]
    assert len(model.blocks) % pp == 0, "num_layers must divide over pp stages"
    per_stage = len(model.blocks) // pp
    optimizer = optimizer or SGD(0.1)
    has_dp = "dp" in mesh.axis_names
    extra_axes = [a for a in mesh.axis_names if a != "pp"]
    if batch_spec is None and has_dp:
        batch_spec = P("dp")

    stacked = stack_stage_params(init_params or model.init(), pp)
    opt_state = optimizer.init(stacked)

    raw_params = _unwrap(stacked)
    param_specs = {
        "stages": jax.tree.map(lambda _: P("pp"), raw_params["stages"]),
        "shared": jax.tree.map(lambda _: P(), raw_params["shared"]),
    }
    raw_state = _unwrap(opt_state) if opt_state is not None else None
    state_specs = _state_specs(raw_state, raw_params, param_specs)

    send_next = [(i, i + 1) for i in range(pp - 1)]

    def body(raw_p, raw_s, raw_x, raw_y):
        params = {
            "stages": _wrap(raw_p["stages"], allow_grad=True),
            "shared": _wrap(raw_p["shared"], allow_grad=True),
        }
        state = _wrap(raw_s) if raw_s is not None else None
        x, y = md.Tensor(raw_x), md.Tensor(raw_y)

        stage = jax.lax.axis_index("pp")
        is_first = md.Tensor(stage == 0)
        is_last_f = md.Tensor((stage == pp - 1))

        b, s_len = x.shape
        assert b % n_micro == 0, (b, n_micro)
        mb = b // n_micro
        ticks = n_micro + pp - 1

        def objective(p):
            tok = p["shared"]["tok_emb"]
            # RoPE models carry no pos_emb (rotation happens inside each
            # block's attention, with the full local sequence's positions)
            pos = p["shared"].get("pos_emb")
            carry = md.zeros((mb, s_len, model.dim)).astype(tok.dtype)
            loss_total = None
            for t in range(ticks):
                if t < n_micro:
                    xt = x[t * mb:(t + 1) * mb]
                    inp0 = tok[xt]
                    if pos is not None:
                        inp0 = inp0 + pos[:s_len]
                else:
                    inp0 = md.zeros_like(carry)
                h = md.where(is_first, inp0, carry)
                for j in range(per_stage):
                    local = jax.tree.map(
                        lambda w: w[0], p["stages"][j], is_leaf=_is_tensor
                    )
                    if remat:
                        flat, treedef = jax.tree.flatten(
                            local, is_leaf=_is_tensor)

                        def _seg(h, *leaves, _blk=model.blocks[j],
                                 _treedef=treedef):
                            return _blk.apply(
                                jax.tree.unflatten(_treedef, list(leaves)), h)

                        h = md.remat(_seg)(h, *flat)
                    else:
                        h = model.blocks[j].apply(local, h)
                if t >= pp - 1:
                    i = t - (pp - 1)
                    z = model.ln_f.apply(p["shared"]["ln_f"], h)
                    logits = model.lm_head(p["shared"], z)
                    l = loss_fn(logits, y[i * mb:(i + 1) * mb])
                    l = l * is_last_f.astype(l.dtype)
                    loss_total = l if loss_total is None else loss_total + l
                if pp > 1:
                    carry = md.ppermute(h, axis_name="pp", perm=send_next)
            return md.psum(loss_total / n_micro, axis_name="pp")

        loss, grads = md.value_and_grad(objective)(params)
        with md.no_grad():
            grads = {
                "stages": grads["stages"],
                # replicated params: total gradient = sum of stage-local parts
                "shared": jax.tree.map(
                    lambda g: md.psum(g, axis_name="pp"),
                    grads["shared"],
                    is_leaf=_is_tensor,
                ),
            }
            if has_dp:
                # each dp group saw its own batch rows: the global-batch
                # gradient (and reported loss) is the mean over dp groups
                grads = jax.tree.map(
                    lambda g: md.pmean(g, axis_name="dp"),
                    grads, is_leaf=_is_tensor)
                loss = md.pmean(loss, axis_name="dp")
        new_params, new_state = optimizer.update(params, grads, state)
        new_raw_s = _unwrap(new_state) if new_state is not None else None
        return _unwrap(new_params), new_raw_s, loss._data

    xy_spec = P("dp") if has_dp else P()
    sm_kwargs = dict(
        mesh=mesh,
        in_specs=(param_specs, state_specs, xy_spec, xy_spec),
        out_specs=(param_specs, state_specs, P()),
        check_vma=False,
    )
    if extra_axes:
        # partial-manual: pp + dp explicit, tp left GSPMD-auto inside
        sm_kwargs["axis_names"] = frozenset(
            {"pp", "dp"} & set(mesh.axis_names))
    jitted = jax.jit(jax.shard_map(body, **sm_kwargs))

    if tp_rules is not None:
        from minidiff_tpu.parallel.mesh import shard_tree

        place_specs = stack_stage_specs(tp_rules, pp)
        stacked = shard_tree(stacked, mesh, place_specs)
        if opt_state is not None:
            opt_state = shard_tree(
                opt_state, mesh,
                _state_specs(_unwrap(opt_state), raw_params, place_specs))

    def step(params, state, x, y):
        raw_p, new_raw_s, raw_loss = jitted(
            _unwrap(params),
            _unwrap(state) if state is not None else None,
            x._data,
            y._data,
        )
        new_params = {
            "stages": _wrap(raw_p["stages"], allow_grad=True),
            "shared": _wrap(raw_p["shared"], allow_grad=True),
        }
        new_state = _wrap(new_raw_s) if new_raw_s is not None else None
        return new_params, new_state, md.Tensor(raw_loss)

    def place_batch(x, y):
        if batch_spec is None:
            return x, y
        from jax.sharding import NamedSharding

        sh = NamedSharding(mesh, batch_spec)
        return (md.Tensor(jax.device_put(x._data, sh)),
                md.Tensor(jax.device_put(y._data, sh)))

    step.place_batch = place_batch
    return step, stacked, opt_state
