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

# higher-order cycle cache (see try_run_higher / try_run_cycle below):
# key1 (the sweep-1 structural key) -> entry dict with forward-rebuild
# records and per-second-root compiled cycle executables
_HO_CYCLES: dict = {}
_in_cycle_trace = False  # suppresses recursive replay while tracing a cycle

_STATIC_OK = (int, float, bool, str, bytes, type(None), slice)


def enabled() -> bool:
    return (
        os.environ.get("MINIDIFF_TPU_COMPILED_BACKWARD", "1") != "0"
        and not _in_cycle_trace
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


# --------------------------------------------------------------------------
# Compiled higher-order cycle (VERDICT r4 item 5)
#
# The README's flagship pattern under ``reuse_graph``::
#
#     f.backward(allow_higher_order=True)   # sweep 1 (re-tapes the grads)
#     x.grad.backward()                     # sweep 2 (second order)
#
# ran the first sweep eagerly every iteration (the gate at tape.py kept
# compiled replay first-order only).  Here the SECOND iteration onward runs:
#
# * sweep 1 as the existing compiled first-order replay (grad VALUES, one
#   device call), with each produced grad tensor marked ``_ho_origin`` so a
#   later ``.backward()`` on it can be recognized;
# * sweep 2 as ONE compiled cycle executable that rebuilds the forward graph
#   from leaf values IN-TRACE (the stash records every node's forward fn +
#   static args), reruns sweep 1 on the shadow graph under re-taping, and
#   then runs the second-order sweep — the whole
#   forward+backward+backward composite is one XLA program.
#
# Iteration 1 runs sweep 1 eagerly (stashing the records and marking grads)
# and serves ``x.grad.backward()`` by tracing the cycle.
#
# Divergence contract: replayed grads are tape-FREE (values identical to
# eager; the eager sweep leaves re-taped grad tensors).  Using such a grad
# as an op input, or backwarding through a post-cycle grad, would silently
# diverge from eager semantics — both are made LOUD instead: op use raises
# via the ``_validate_op_inputs`` guard, and ``.backward()`` on a marker the
# cycle cannot serve raises here.  ``t.detach()`` is the explicit escape
# hatch (tape-free semantics by request).
# --------------------------------------------------------------------------


class _HoOrigin:
    """Marker attached to grad tensors produced under the cycle machinery.

    ``taped=True``: the eager tape exists too (iteration 1) — downstream use
    behaves exactly like eager and is allowed.  ``taped=False``: the tensor
    is a tape-free replay of a grad that WOULD have carried a tape — only
    the recognized ``.backward()`` cycle may consume it.
    """

    __slots__ = ("key1", "pos", "taped")

    def __init__(self, key1, pos, taped):
        self.key1 = key1
        self.pos = pos
        self.taped = taped


def _cycle_key(root_node, traversal):
    """(key1, order, rebuild-eligible) for the sweep-1 graph, or None."""
    order, nodes = _collect(root_node, traversal)
    sigs = []
    for n in nodes:
        s = _node_sig(n)
        if s is None:
            return None
        sigs.append(s)
    key1 = (
        "ho",
        root_node.hash,
        tuple(sigs),
        tuple(t.allow_grad for t in order),
    )
    return key1, order


def _rebuild_record(node, pos_of):
    """Everything needed to re-execute this node's forward on shadows."""
    arg_slots = tuple(
        ("t", pos_of[id(x)]) if isinstance(x, md.Tensor) else ("s", x)
        for x in node.op_inputs
    )
    return (
        arg_slots,
        tuple(node.grad_functions),
        dict(node.op_kwargs),
        node.forward_func,
        node.kwargs_to_grads,
        node.op_name,
    )


def _rebuild_node(record, shadows, allow_grad):
    """Re-run one forward record on shadow tensors, re-attaching an OpNode."""
    from minidiff_tpu.tape import OpNode

    arg_slots, grad_fns, kwargs, fwd, k2g, name = record
    args = [shadows[slot] if kind == "t" else slot for kind, slot in arg_slots]
    out = fwd(*args, **kwargs)
    if out.op_node is not None:
        out = out.detach()
    out.allow_grad = allow_grad
    out.op_node = OpNode(
        forward_func=fwd, grad_functions=grad_fns, op_inputs=args,
        op_kwargs=kwargs, op_name=name, kwargs_to_grads=k2g,
    )
    return out


def stash_cycle(root_node, traversal, seed_grad, root_output) -> None:
    """Record sweep-1 structure + mark its grads (called after the eager
    higher-order sweep inside reuse_graph)."""
    if _in_cycle_trace or not enabled():
        return
    ck = _cycle_key(root_node, traversal)
    if ck is None:
        return
    key1, order = ck
    entry = _HO_CYCLES.get(key1)
    if entry is None:
        pos_of = {id(t): i for i, t in enumerate(order)}
        try:
            rebuild = tuple(
                None if t.is_leaf else _rebuild_record(t.op_node, pos_of)
                for t in order
            )
            root_rebuild = _rebuild_record(root_node, pos_of)
        except KeyError:
            return  # node input outside the collected order: not rebuildable
        entry = {
            "valid": True,
            "flags": tuple(t.allow_grad for t in order),
            "rebuild": rebuild,
            "root_rebuild": root_rebuild,
            "root_flag": (root_output.allow_grad
                          if root_output is not None else True),
            "has_root_output": root_output is not None,
            "cycles": {},
            "live": None,
        }
        _HO_CYCLES[key1] = entry
    if not entry["valid"]:
        return
    for i, t in enumerate(order):
        if t.grad is not None and isinstance(t.grad, md.Tensor):
            t.grad._ho_origin = _HoOrigin(key1, i, taped=True)
    entry["live"] = (list(order), seed_grad._data)


def try_run_higher(root_node, traversal, seed_grad, cleanup_mode,
                   root_output) -> bool:
    """Warm sweep 1: compiled first-order replay + markers.

    Activates only after a full cycle has been traced for this structure
    (``entry["cycles"]``) — until then the eager sweep keeps running so the
    re-taped gradients stay available for arbitrary higher-order use.
    """
    if not enabled():
        return False
    ck = _cycle_key(root_node, traversal)
    if ck is None:
        return False
    key1, order = ck
    entry = _HO_CYCLES.get(key1)
    if entry is None or not entry["valid"] or not entry["cycles"]:
        return False
    if not try_run(root_node, traversal, seed_grad, True, cleanup_mode,
                   root_output=root_output):
        return False
    for i, t in enumerate(order):
        if t.grad is not None:
            t.grad._ho_origin = _HoOrigin(key1, i, taped=False)
    entry["live"] = (list(order), seed_grad._data)
    return True


def _trace_cycle(entry, key1, pos, live_order):
    """Build the one-executable forward+sweep1+sweep2 cycle for root2 =
    grad of base tensor ``pos``."""
    import jax

    flags = entry["flags"]
    rebuild = entry["rebuild"]
    leaf_idx = [i for i, rb in enumerate(rebuild) if rb is None]

    final_positions: list = []
    cleanup_spec: list = []
    root2_leaf: list = []
    frozen = [False]

    def pure_cycle(leaf_vals, seed1_val):
        global _in_cycle_trace
        prev = _in_cycle_trace
        _in_cycle_trace = True
        try:
            shadows: list = [None] * len(flags)
            for li, i in enumerate(leaf_idx):
                shadows[i] = md.Tensor(leaf_vals[li], allow_grad=flags[i])
            for i, rb in enumerate(rebuild):
                if rb is not None:
                    shadows[i] = _rebuild_node(rb, shadows, flags[i])
            root = _rebuild_node(entry["root_rebuild"], shadows,
                                 entry["root_flag"])
            # sweep 1: the real engine on the shadow graph, re-taping
            root.op_node.backward(
                md.Tensor(seed1_val), retain_grads=True, cleanup_mode="keep",
                allow_higher_order=True, reset_grads=True,
                root_output=root if entry["has_root_output"] else None,
            )
            g_root = shadows[pos].grad
            if g_root is None or g_root.is_leaf:
                if not frozen[0]:
                    root2_leaf.append(True)
                return []
            if not frozen[0]:
                root2_leaf.append(False)
            # sweep 2: mirror of the eager engine loop (first-order,
            # reset_grads=True, retain_grads=False, cleanup recorded for
            # host-side replication)
            pos_of_shadow = {id(s): i for i, s in enumerate(shadows)}
            pos_of_shadow[id(root)] = len(shadows)
            node2 = g_root.op_node
            trav2 = node2.toposort()
            for t in trav2:
                t.grad = None
            with md.enable_grad(False):
                seed2 = md.ones_like(g_root)
                node2.update_grads(seed2, output=g_root)
                for t in reversed(trav2):
                    if t.is_leaf:
                        continue
                    g = t.grad
                    bpos = pos_of_shadow.get(id(t))
                    if g is None:
                        if not frozen[0]:
                            cleanup_spec.append((bpos, True))
                        continue
                    if not frozen[0]:
                        cleanup_spec.append((bpos, False))
                    t.op_node.update_grads(g, output=t)
                    t.grad = None
            outs = []
            for i, sh in enumerate(shadows + [root]):
                if sh.grad is not None:
                    if not frozen[0]:
                        final_positions.append(i)
                    outs.append(sh.grad._data)
            return outs
        finally:
            _in_cycle_trace = prev

    compiled = jax.jit(pure_cycle)
    leaf_vals = [live_order[i]._data for i in leaf_idx]
    seed1 = entry["live"][1]
    outs = compiled(leaf_vals, seed1)
    frozen[0] = True
    if root2_leaf and root2_leaf[0]:
        return ("leaf",), []
    return (compiled, tuple(leaf_idx), tuple(final_positions),
            tuple(cleanup_spec)), outs


def try_run_cycle(grad_tensor, retain_grads, cleanup_mode,
                  allow_higher_order, reset_grads) -> bool:
    """Serve ``x.grad.backward()`` from the compiled cycle.  Returns True
    when handled; raises when the marker is tape-free and the call cannot
    be served faithfully (silent divergence is never an option)."""
    origin = grad_tensor._ho_origin
    if origin is None:
        return False
    if origin.pos is None:
        # POST-cycle grad (written by a completed replay): its eager
        # counterpart is a tape-free allow_grad=False leaf, whose
        # backward() is a silent no-op (tensor.py:221-224) — serving it
        # as a no-op here keeps warm-replay behavior identical to eager
        # instead of refusing (the grad itself stays untouched either way)
        return True

    def _refuse(why):
        if origin.taped:
            return False  # the eager tape exists; fall through to it
        raise RuntimeError(
            "backward() through a compiled-replay gradient cannot be served "
            f"({why}); rerun with MINIDIFF_TPU_COMPILED_BACKWARD=0 or "
            "restructure the loop so the same second-order cycle repeats")

    if not (os.environ.get("MINIDIFF_TPU_COMPILED_BACKWARD", "1") != "0"
            and not _in_cycle_trace
            and backend.backend_name() == "xla"):
        return _refuse("compiled replay is disabled or unavailable")
    if allow_higher_order or not reset_grads or retain_grads:
        return _refuse("only plain backward() (first-order, reset_grads, "
                       "no retain) composes with cycle replay")
    entry = _HO_CYCLES.get(origin.key1)
    if entry is None or not entry["valid"] or entry["live"] is None:
        return _refuse("the sweep-1 replay state for this gradient is gone")
    live_order = entry["live"][0]

    cent = entry["cycles"].get(origin.pos)
    outs = None
    if cent is None:
        try:
            cent, outs = _trace_cycle(entry, origin.key1, origin.pos,
                                      live_order)
        except Exception:
            entry["valid"] = False  # never go warm for this structure again
            return _refuse("the cycle executable failed to trace")
        entry["cycles"][origin.pos] = cent

    if cent[0] == "leaf":
        # eager semantics: backward() on a leaf gradient is a silent no-op
        entry["live"] = None
        return True

    compiled, leaf_idx, final_positions, cleanup_spec = cent
    if outs is None:
        leaf_vals = [live_order[i]._data for i in leaf_idx]
        outs = compiled(leaf_vals, entry["live"][1])

    # post-cycle grad state for every base tensor (+ the sweep-1 root)
    grads_by_pos = dict(zip(final_positions, outs))
    for i, t in enumerate(live_order):
        g = grads_by_pos.get(i)
        if g is None:
            t.grad = None
        else:
            t.grad = md.Tensor(g)
            t.grad._ho_origin = _HoOrigin(origin.key1, None, taped=False)
    # the called tensor's own grad is the seed, exactly as Tensor.backward
    # would have left it
    with md.no_grad():
        grad_tensor.grad = md.ones_like(grad_tensor)

    # host-side cleanup replication over the base tensors that appeared in
    # the sweep-2 traversal (gradient-graph tensors only exist in-trace)
    for bpos, skipped in cleanup_spec:
        if skipped or bpos is None or bpos >= len(live_order):
            continue
        tensor = live_order[bpos]
        if tensor.is_leaf or cleanup_mode == "keep":
            continue
        if cleanup_mode == "destroy":
            tensor.wipe()
            continue
        if tensor.consumer_refs > 0:
            continue
        for child in tensor.op_node.tensor_inputs:
            child.consumer_refs -= 1
        tensor.wipe()
    entry["live"] = None
    return True


def clear_cycle_live() -> None:
    """Drop strong tensor references held between sweep 1 and sweep 2
    (called when a reuse_graph context exits)."""
    for entry in _HO_CYCLES.values():
        entry["live"] = None
