"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

Fine-tuning a pretrained model touches every weight; LoRA instead freezes
the base parameters and learns a rank-``r`` update per Linear weight:
``y = x @ W + (x @ A) @ B * (alpha / r)`` with ``A`` (K, r) small-random and
``B`` (r, N) zero-initialised, so the adapted model starts exactly equal to
the base model.  On TPU this is the right decomposition — the adapter path
adds two skinny MXU matmuls (O(r) FLOPs/bytes) instead of materialising a
(K, N) delta, and the optimizer state shrinks to the adapter leaves only.

Everything rides the existing functional-params machinery:

- ``lora_init(params, rank)`` returns a NEW tree where each eligible Linear
  dict gains ``lora_a``/``lora_b``/``lora_s`` keys.  ``layers.Linear.apply``
  dispatches on the keys, so every forward path (eager, KV-cached decode,
  compiled scan decode, speculative) picks the adapters up unchanged — the
  same protocol ``models.quant`` uses for ``w_q``.  Adapters compose with a
  quantized base tree (QLoRA-style serving: int8 frozen weights + bf16
  adapters).
- ``mlp.make_train_step(..., trainable=lora_predicate)`` differentiates and
  updates ONLY the adapter leaves; the frozen base crosses the step as a
  closed-over constant subtree, bit-identical on exit.
- ``merge_lora(params)`` folds ``W + A @ B * s`` back into ``w`` and strips
  the adapter keys for zero-overhead serving (quantize after merging).

No reference counterpart: /root/reference (ahoynodnarb/minidiff) is an
autodiff engine with no models/fine-tuning layer; this extends SURVEY §8's
training-toolkit row.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Sequence, Tuple

__all__ = [
    "lora_init", "merge_lora", "lora_predicate", "trainable_params",
    "partition_params", "combine_params",
]

_ADAPTER_KEYS = ("lora_a", "lora_b", "lora_s")


def _is_tensor(t) -> bool:
    return isinstance(t, md.Tensor)


def _weight_shape(node: dict):
    """(K, N) of the Linear weight in ``node``, full-precision or int8."""
    w = node.get("w")
    if _is_tensor(w) and w.ndim == 2:
        return w.shape, w.dtype
    wq = node.get("w_q")
    if _is_tensor(wq) and wq.ndim == 2:
        # quantized base: adapters run in the scale dtype (f32/bf16)
        return wq.shape, node["w_s"].dtype
    wp = node.get("w_q4")
    if _is_tensor(wp) and wp.ndim == 2:
        # int4 base: packed rows count half of K
        return (2 * wp.shape[0], wp.shape[1]), node["w_s4"].dtype
    return None, None


def lora_init(
    params: "Any",
    rank: int,
    alpha: "Optional[float]" = None,
    targets: "Optional[Sequence[str]]" = None,
    dtype: "Optional[Any]" = None,
    seed: int = 0,
    min_features: int = 1,
) -> "Any":
    """Insert rank-``rank`` adapters into every eligible Linear param dict.

    Eligible = a dict holding a 2-D ``"w"`` (or quantized ``"w_q"``) whose
    tree path contains one of ``targets`` (substring match on the
    ``"blocks/0/attn/qkv"``-style path; ``None`` = every Linear) and whose
    smaller dimension is >= ``min_features``.  ``alpha`` defaults to
    ``rank`` (scale 1.0).  Returns a new tree; the input is not mutated and
    the base leaves are shared, not copied.
    """
    scale = (alpha if alpha is not None else float(rank)) / float(rank)
    rng = np.random.default_rng(seed)
    inserted = 0

    def walk(node, path):
        nonlocal inserted
        if isinstance(node, dict):
            out = {k: walk(v, f"{path}/{k}" if path else k)
                   for k, v in node.items()}
            shape, wdtype = _weight_shape(node)
            if shape is None:
                return out
            if targets is not None and not any(t in path for t in targets):
                return out
            k_in, n_out = shape
            if min(k_in, n_out) < min_features or rank > min(k_in, n_out):
                return out
            adtype = dtype if dtype is not None else wdtype
            bound = 1.0 / math.sqrt(k_in)
            a = rng.uniform(-bound, bound, (k_in, rank))
            out["lora_a"] = md.Tensor(a, allow_grad=True, dtype=adtype)
            out["lora_b"] = md.Tensor(np.zeros((rank, n_out)),
                                      allow_grad=True, dtype=adtype)
            # scale stays in the adapter dtype: an f32 scalar here would
            # silently promote every adapted projection of a bf16 model
            # to f32 (activation memory + kernel dtypes downstream)
            out["lora_s"] = md.Tensor(np.asarray(scale), dtype=adtype)
            inserted += 1
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, f"{path}/{i}")
                              for i, v in enumerate(node))
        return node

    adapted = walk(params, "")
    if not inserted:
        raise ValueError(
            f"lora_init inserted zero adapters (rank={rank}, "
            f"targets={targets!r}): no eligible Linear weight matched — "
            "a fine-tuning run would silently train nothing")
    return adapted


def merge_lora(params: "Any") -> "Any":
    """Fold adapters into the base weights and strip the adapter keys.

    ``w <- w + (lora_a @ lora_b) * lora_s`` in f32, cast back to ``w``'s
    dtype.  Raises on a quantized base (``w_q``) — int8 weights cannot
    absorb a float delta; merge before ``quantize_for_serving``.
    """

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()
                   if k not in _ADAPTER_KEYS}
            if "lora_a" not in node:
                return out
            if "w" not in node:
                raise ValueError(
                    "cannot merge LoRA adapters into a quantized (w_q) base; "
                    "merge_lora first, then quantize_for_serving")
            w = node["w"]
            with md.no_grad():
                delta = (node["lora_a"].astype(md.float32)
                         @ node["lora_b"].astype(md.float32))
                merged = w.astype(md.float32) + delta * node["lora_s"]
            out["w"] = merged.astype(w.dtype).detach(allow_grad=True)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def lora_predicate(path: str) -> bool:
    """``trainable=`` predicate selecting exactly the adapter matrices."""
    name = path.rsplit("/", 1)[-1]
    return name in ("lora_a", "lora_b")


def partition_params(
    params: "Any", predicate: "Callable[[str], bool]",
) -> "Tuple[Any, Any]":
    """Split a params tree into (selected, rest) by a path predicate.

    Both outputs keep the full tree structure with ``None`` at the
    complementary leaf positions, so jax.tree/``md.value_and_grad`` treat
    the holes as empty subtrees.  ``combine_params`` inverts.
    """

    def walk(node, path):
        if isinstance(node, dict):
            pairs = {k: walk(v, f"{path}/{k}" if path else k)
                     for k, v in node.items()}
            return ({k: p[0] for k, p in pairs.items()},
                    {k: p[1] for k, p in pairs.items()})
        if isinstance(node, (list, tuple)):
            pairs = [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
            tp = type(node)
            return tp(p[0] for p in pairs), tp(p[1] for p in pairs)
        if predicate(path):
            return node, None
        return None, node

    return walk(params, "")


def combine_params(a: "Any", b: "Any") -> "Any":
    """Inverse of ``partition_params``: graft two complementary trees."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, dict):
        return {k: combine_params(a[k], b[k]) for k in a}
    if isinstance(a, (list, tuple)):
        return type(a)(combine_params(x, y) for x, y in zip(a, b))
    raise ValueError(f"overlapping leaves in combine_params: {a!r} / {b!r}")


def trainable_params(params: "Any",
                     predicate: "Callable[[str], bool]" = lora_predicate):
    """The subtree an optimizer should own (``optimizer.init`` input)."""
    return partition_params(params, predicate)[0]
