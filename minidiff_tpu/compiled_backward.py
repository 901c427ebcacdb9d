"""Compiled backward replay: the toposort cache evolved into an executable cache.

SURVEY.md §7 step 7: the reference's ``reuse_graph`` memoizes a traversal
*order* and still executes the reverse sweep op-by-op in Python
(minidiff/caching.py); here the same structural hash additionally keys a
**compiled** backward — the whole VJP sweep traced once onto jax tracers and
replayed as a single XLA executable.  Each replay takes the current tensor
VALUES as inputs, so a training loop that rebuilds the same graph shape every
iteration pays Python for the eager forward only; its backward is one device
call.

Eligibility (else the engine silently falls back to the eager sweep):
* XLA backend, inside ``reuse_graph``, first-order, ``reset_grads=True``;
* every non-Tensor op input / kwarg is static-hashable (ints, floats, bools,
  strings, None, slices, or tuples thereof) — they are baked into the trace,
  so they must be part of the cache key.

Correctness keys: (structural hash, per-node static signature, leaf
allow_grad pattern, retain_grads).  Grad values, cleanup-mode side effects,
and which tensors end up with ``.grad`` match the eager path exactly
(tests/test_caching.py runs the same assertions over both).

``MINIDIFF_TPU_COMPILED_BACKWARD=0`` disables the feature.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

import minidiff_tpu as md
import minidiff_tpu.backend as backend

if TYPE_CHECKING:
    from typing import Any, List, Optional, Tuple

_cache: dict = {}

_STATIC_OK = (int, float, bool, str, bytes, type(None), slice)


def enabled() -> bool:
    return (
        os.environ.get("MINIDIFF_TPU_COMPILED_BACKWARD", "1") != "0"
        and backend.backend_name() == "xla"
    )


def _static_sig(value: "Any"):
    """Hashable signature for a non-Tensor op input / kwarg, or None."""
    if isinstance(value, _STATIC_OK):
        return (type(value).__name__, value)
    if isinstance(value, tuple):
        parts = tuple(_static_sig(v) for v in value)
        if any(p is None for p in parts):
            return None
        return ("tuple", parts)
    return None


def _collect(root_node, traversal):
    """Ordered distinct tensors + processed nodes, structure-deterministic."""
    tensors: dict = {}
    for t in traversal:
        tensors.setdefault(id(t), t)
    nodes = [root_node]
    for t in reversed(traversal):
        if not t.is_leaf:
            nodes.append(t.op_node)
    for n in nodes:
        for inp in n.tensor_inputs:
            tensors.setdefault(id(inp), inp)
    return list(tensors.values()), nodes


def _node_sig(node):
    if getattr(node.forward_func, "_stateful", False):
        # stateful-protocol ops: grads may read per-call instance state,
        # which a cached executable would freeze as trace-time constants
        return None
    parts = []
    for k in sorted(node.op_kwargs):
        s = _static_sig(node.op_kwargs[k])
        if s is None:
            return None
        parts.append((k, s))
    for inp in node.op_inputs:
        if isinstance(inp, md.Tensor):
            parts.append("T")
        else:
            s = _static_sig(inp)
            if s is None:
                return None
            parts.append(s)
    return tuple(parts)


def try_run(root_node, traversal, seed_grad, retain_grads: bool,
            cleanup_mode: str, root_output=None) -> bool:
    """Run the backward as a compiled replay; False → caller goes eager."""
    if not enabled():
        return False

    order, nodes = _collect(root_node, traversal)
    sigs = []
    for n in nodes:
        s = _node_sig(n)
        if s is None:
            return False
        sigs.append(s)
    key = (
        root_node.hash,
        tuple(sigs),
        tuple(t.allow_grad for t in order),
        retain_grads,
        root_output is not None,
    )

    import jax

    entry = _cache.get(key)
    if entry is None:
        # Build LIGHT per-node records so the cached closure retains no
        # Tensor/OpNode from this graph instance (holding the first
        # instance's tensors would pin one full activation set — including
        # its device buffers — in memory for process lifetime).
        flags = [t.allow_grad for t in order]
        pos_of = {id(t): i for i, t in enumerate(order)}

        def node_record(node):
            arg_slots = tuple(
                ("t", pos_of[id(x)]) if isinstance(x, md.Tensor) else ("s", x)
                for x in node.op_inputs
            )
            return (
                arg_slots,
                tuple(node.grad_functions),
                dict(node.op_kwargs) if node.kwargs_to_grads else {},
            )

        root_record = node_record(root_node)
        # sweep steps in execution order: (node record, output order index)
        steps = tuple(
            (node_record(t.op_node), pos_of[id(t)])
            for t in reversed(traversal)
            if not t.is_leaf
        )
        positions: "List[int]" = []
        # which sweep steps saw a None grad at trace time (None-VJP-slot
        # tensors): the eager loop `continue`s on those BEFORE cleanup, so
        # the host-side cleanup below must skip them identically
        none_steps: "List[bool]" = []
        positions_frozen = [False]

        def pure_backward(values, seed_val, root_val):
            with md.no_grad():
                shadows = [
                    md.Tensor(v, allow_grad=f) for v, f in zip(values, flags)
                ]
                root_shadow = md.Tensor(root_val) if root_val is not None else None

                def apply_node(record, grad, output=None):
                    arg_slots, grad_fns, kwargs0 = record
                    args = [
                        shadows[slot] if kind == "t" else slot
                        for kind, slot in arg_slots
                    ]
                    for arg, grad_fn in zip(args, grad_fns):
                        if not isinstance(arg, md.Tensor):
                            continue
                        if not arg.allow_grad or grad_fn is None:
                            continue
                        kwargs = kwargs0
                        if getattr(grad_fn, "needs_output", False):
                            kwargs = dict(kwargs0)
                            kwargs["_output"] = output
                        g = grad_fn(*args, grad, **kwargs)
                        if g.shape != arg.shape:
                            g = md.unbroadcast(g, arg.shape)
                        arg.grad = g if arg.grad is None else arg.grad + g

                apply_node(root_record, md.Tensor(seed_val), output=root_shadow)
                for record, out_pos in steps:
                    sh = shadows[out_pos]
                    if sh.grad is None:
                        # same guard as the eager sweep: reachable only
                        # through None-VJP slots -> nothing to propagate
                        if not positions_frozen[0]:
                            none_steps.append(True)
                        continue
                    if not positions_frozen[0]:
                        none_steps.append(False)
                    apply_node(record, sh.grad, output=sh)
                    if not retain_grads:
                        sh.grad = None

                outs = []
                for i, sh in enumerate(shadows):
                    if sh.grad is not None:
                        if not positions_frozen[0]:
                            positions.append(i)
                        outs.append(sh.grad._data)
                return outs

        compiled = jax.jit(pure_backward)
        # Trace now with the current values so `positions` is filled before
        # the entry is cached (jax traces lazily otherwise).
        values = [t._data for t in order]
        outs = compiled(
            values, seed_grad._data,
            root_output._data if root_output is not None else None,
        )
        positions_frozen[0] = True
        positions = tuple(positions)
        skip_cleanup = tuple(none_steps)
        _cache[key] = (compiled, positions, skip_cleanup)
    else:
        compiled, positions, skip_cleanup = entry
        values = [t._data for t in order]
        outs = compiled(
            values, seed_grad._data,
            root_output._data if root_output is not None else None,
        )
    # assign grads exactly as the eager sweep would leave them
    grads_by_pos = dict(zip(positions, outs))
    for i, t in enumerate(order):
        g = grads_by_pos.get(i)
        t.grad = md.Tensor(g) if g is not None else None

    # replicate the eager cleanup loop's side effects (skipping the steps
    # the eager sweep would have `continue`d on for a None grad)
    step_i = 0
    for tensor in reversed(traversal):
        if tensor.is_leaf:
            continue
        skipped = step_i < len(skip_cleanup) and skip_cleanup[step_i]
        step_i += 1
        if skipped:
            continue
        node = tensor.op_node
        if cleanup_mode == "keep":
            continue
        if cleanup_mode == "destroy":
            tensor.wipe()
            continue
        if tensor.consumer_refs > 0:
            continue
        for child in node.tensor_inputs:
            child.consumer_refs -= 1
        tensor.wipe()
    return True
