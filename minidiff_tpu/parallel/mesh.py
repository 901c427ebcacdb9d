"""Device meshes and sharding placement for minidiff_tpu tensors.

The reference is single-process/single-device (SURVEY.md §2.2); this is the
TPU-native scaling layer: a ``jax.sharding.Mesh`` plus NamedSharding
placements on Tensor leaves.  XLA's SPMD partitioner then inserts the
ICI collectives (all-reduce for dp grads, all-gather/reduce-scatter for tp)
from the placements — no hand-written communication code.

Conventions: mesh axes ``dp`` (data/batch) and ``tp`` (tensor/feature).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

import minidiff_tpu as md
import minidiff_tpu.ops.wrapping as wrapping

if TYPE_CHECKING:
    from typing import Any, Dict, Optional, Sequence


def make_mesh(axis_sizes: "Dict[str, int]", devices: "Optional[Sequence]" = None) -> Mesh:
    """Mesh over the first prod(sizes) devices, axes in dict order.

    ``make_mesh({"dp": 2, "tp": 4})`` on 8 devices gives a 2x4 mesh.
    """
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(grid, names)


def named_sharding(mesh: Mesh, *spec: "Any") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))


def _constrain_raw(x, sharding):
    # Inside a trace: a partitioner constraint. Eagerly: a real device_put.
    if isinstance(x, jax.core.Tracer):
        return jax.lax.with_sharding_constraint(x, sharding)
    return jax.device_put(x, sharding)


# Differentiable identity: the constraint applies to both the forward value
# and (via the same constraint on the cotangent) the backward flow.
constrain = wrapping.create_binary_op_func(
    forward_func=wrapping.as_tensor_func(_constrain_raw),
    grad_x=lambda x, sharding, grad: constrain(grad, sharding),
    op_name="constrain",
)


def shard_tree(tree: "Any", mesh: Mesh, specs: "Any") -> "Any":
    """device_put every Tensor leaf per the matching PartitionSpec leaf.

    ``specs`` mirrors ``tree``'s structure (or is a single spec applied to all
    leaves).  Leaves whose spec is None are replicated.
    """

    def is_tensor(x):
        return isinstance(x, md.Tensor)

    def place(t, spec):
        if not is_tensor(t):
            return t
        if not isinstance(spec, PartitionSpec):
            spec = PartitionSpec() if spec is None else PartitionSpec(*spec)
        data = jax.device_put(t._data, NamedSharding(mesh, spec))
        return md.Tensor(data, allow_grad=t.allow_grad)

    if isinstance(specs, PartitionSpec) or specs is None:
        return jax.tree.map(lambda t: place(t, specs), tree, is_leaf=is_tensor)
    return jax.tree.map(place, tree, specs, is_leaf=is_tensor)


def transformer_sharding_rules(params: "Any") -> "Any":
    """Megatron-style TP placement for models.TransformerLM parameter trees.

    Per block: the QKV projections (fused ``qkv`` or GQA's ``wq``/``wkv``)
    are column-parallel (heads split across ``tp``), the attention output
    projection row-parallel; the MLP's fc1 is column-, fc2 row-parallel —
    one all-reduce per sublayer.  Embeddings, LayerNorms, and fc2/out
    biases are replicated; the vocab head is column-parallel over the
    vocabulary.  The spec tree mirrors whatever the params tree actually
    contains (rope drops pos_emb, tie_embeddings drops head, GQA swaps the
    attention keys), so every model variant composes.
    """
    def attn_rules(attn_params):
        # column-parallel biases shard with their columns; the row-parallel
        # out-projection bias replicates (it adds after the all-reduce)
        def proj(name, spec, bias_spec):
            r = {"w": spec}
            if "b" in attn_params[name]:
                r["b"] = bias_spec
            return r

        rules = {"out": proj("out", PartitionSpec("tp", None), PartitionSpec())}
        if "qkv" in attn_params:
            rules["qkv"] = proj("qkv", PartitionSpec(None, "tp"),
                                PartitionSpec("tp"))
        else:  # GQA: separate q and kv projections, both column-parallel
            rules["wq"] = proj("wq", PartitionSpec(None, "tp"),
                               PartitionSpec("tp"))
            rules["wkv"] = proj("wkv", PartitionSpec(None, "tp"),
                                PartitionSpec("tp"))
        return rules

    def norm_rules(norm_params):
        # LayerNorm has {g, b}; RMSNorm just {g} — replicate whatever exists
        return {k: PartitionSpec() for k in norm_params}

    blocks = []
    for blk in params["blocks"]:
        blocks.append({
            "ln1": norm_rules(blk["ln1"]),
            "attn": attn_rules(blk["attn"]),
            # parallel blocks (Phi) have no ln2 — mirror the actual tree
            **({"ln2": norm_rules(blk["ln2"])} if "ln2" in blk else {}),
            # column-parallel fc1 also covers SwiGLU: its gate/value columns
            # are PAIR-major, so a tp shard holds matching pairs
            # (mlp_bias=False drops the b leaves — mirror what exists)
            "fc1": ({"w": PartitionSpec(None, "tp"), "b": PartitionSpec("tp")}
                    if "b" in blk["fc1"]
                    else {"w": PartitionSpec(None, "tp")}),
            "fc2": ({"w": PartitionSpec("tp", None), "b": PartitionSpec()}
                    if "b" in blk["fc2"]
                    else {"w": PartitionSpec("tp", None)}),
        })
    rules = {
        "tok_emb": PartitionSpec(),
        "blocks": blocks,
        "ln_f": norm_rules(params["ln_f"]),
    }
    if "pos_emb" in params:
        rules["pos_emb"] = PartitionSpec()
    if "head" in params:
        rules["head"] = {"w": PartitionSpec(None, "tp")}
        if "b" in params["head"]:  # head_bias (Phi): column-parallel
            rules["head"]["b"] = PartitionSpec("tp")
    return rules


def mamba_sharding_rules(params: "Any") -> "Any":
    """Megatron-style TP placement for models.MambaLM parameter trees.

    The whole block is channel-parallel over ``d_inner``: in_proj is
    column-parallel (its PAIR-major (x_j, z_j) column layout means a tp
    shard holds matching gate/value channels — see MambaBlock.apply), the
    conv taps / dt_proj / A_log / D shard their d_inner axis, and the two
    matmuls that CONTRACT d_inner (x_proj producing the small dt/B/C
    vector, out_proj closing the block) are row-parallel — XLA SPMD
    inserts the two all-reduces per block from the shardings alone.  The
    selective scan itself is elementwise over (d_inner, n), so it runs
    fully sharded with zero communication.  Norms and embeddings
    replicate; the untied head is column-parallel over the vocabulary.
    """
    def blk_rules(bp):
        return {
            "in_proj": {"w": PartitionSpec(None, "tp")},
            "conv_w": PartitionSpec(None, "tp"),
            "conv_b": PartitionSpec("tp"),
            "x_proj": {"w": PartitionSpec("tp", None)},
            "dt_proj": {"w": PartitionSpec(None, "tp"),
                        "b": PartitionSpec("tp")},
            "A_log": PartitionSpec("tp", None),
            "D": PartitionSpec("tp"),
            "out_proj": {"w": PartitionSpec("tp", None)},
        }

    rules = {
        "tok_emb": PartitionSpec(),
        "blocks": [blk_rules(bp) for bp in params["blocks"]],
        "norms": [{k: PartitionSpec() for k in nm}
                  for nm in params["norms"]],
        "ln_f": {k: PartitionSpec() for k in params["ln_f"]},
    }
    if "head" in params:
        rules["head"] = {"w": PartitionSpec(None, "tp")}
        if "b" in params["head"]:  # head_bias (Phi): column-parallel
            rules["head"]["b"] = PartitionSpec("tp")
    return rules


def fsdp_sharding_rules(params: "Any", mesh: Mesh, axis: str = "dp",
                        min_size: int = 2 ** 14) -> "Any":
    """ZeRO-3/FSDP-style placement: every large parameter fully sharded.

    Each Tensor leaf with >= ``min_size`` elements shards its largest
    ``mesh.shape[axis]``-divisible dimension over ``axis``; small or
    indivisible leaves stay replicated.  Because optimizer states mirror
    the parameter tree, the sharded train step's state inherits the same
    layout — parameters, gradients, and optimizer moments all live sharded,
    and XLA SPMD derives the ZeRO communication schedule (all-gather at use
    sites, reduce-scatter on grads) from the shardings alone.

    Works for any model's pytree; combine with ``batch_spec=P(axis)`` in
    make_sharded_train_step so the same mesh axis carries data parallelism.
    """
    n = mesh.shape[axis]

    def rule(leaf):
        if not isinstance(leaf, md.Tensor) or leaf.size < min_size:
            return PartitionSpec()
        divisible = [d for d in range(leaf.ndim) if leaf.shape[d] % n == 0]
        if not divisible:
            return PartitionSpec()
        best = max(divisible, key=lambda d: leaf.shape[d])
        spec = [None] * leaf.ndim
        spec[best] = axis
        return PartitionSpec(*spec)

    return jax.tree.map(rule, params, is_leaf=lambda x: isinstance(x, md.Tensor))


def moe_sharding_rules(params: "Any") -> "Any":
    """Expert-parallel placement for models.MoETransformerLM parameter trees.

    Stacked expert weights (E, d, ff)/(E, ff, d) shard their leading expert
    axis on ``ep`` — each device holds E/ep whole experts, and XLA SPMD turns
    the dispatch/combine tensordots into the all-to-all-shaped collectives.
    The router, attention, norms, embeddings, and head are replicated (compose
    a ``dp`` axis for batch scaling; ``tp`` composes via the attention rules
    of transformer_sharding_rules if needed).
    """
    def replicate(sub):
        return jax.tree.map(
            lambda _: PartitionSpec(), sub,
            is_leaf=lambda x: isinstance(x, md.Tensor))

    blocks = []
    for bp in params["blocks"]:
        # mirror whatever the block tree actually contains (GQA wq/wkv vs
        # fused qkv, RMSNorm's bare {g}, bias-free experts): expert-stacked
        # leaves shard their leading E axis on ep, the rest replicate
        experts = {
            k: PartitionSpec("ep", *([None] * (v.ndim - 1)))
            for k, v in bp["moe"]["experts"].items()
        }
        blocks.append({
            **{k: replicate(v) for k, v in bp.items() if k != "moe"},
            "moe": {"router": replicate(bp["moe"]["router"]),
                    "experts": experts},
        })
    rules = {k: replicate(v) for k, v in params.items() if k != "blocks"}
    rules["blocks"] = blocks
    return rules


def mlp_sharding_rules(params: "Any") -> "Any":
    """Megatron-style TP placement for models.MLP parameter trees.

    Alternating Linear layers shard their weights column- then row-wise on
    the ``tp`` axis, so each Linear pair needs only one all-reduce:
    w[0] (in, h) → P(None, 'tp'); w[1] (h, out) → P('tp', None); biases follow
    their output dim.  Works for any depth of models.layers.Sequential params.
    """
    rules = []
    col = True
    for layer_params in params:
        if not layer_params:  # activation layers hold no params
            rules.append(layer_params)
            continue
        if col:
            rule = {"w": PartitionSpec(None, "tp")}
            if "b" in layer_params:
                rule["b"] = PartitionSpec("tp")
        else:
            rule = {"w": PartitionSpec("tp", None)}
            if "b" in layer_params:
                rule["b"] = PartitionSpec()
        rules.append(rule)
        col = not col
    return rules
