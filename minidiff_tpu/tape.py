"""The tape: OpNode graph nodes and the reverse-mode backward engine.

Semantic parity with the reference engine (minidiff/topology.py):

* ``OpNode`` records (forward fn, per-input VJPs, inputs, kwargs) and
  refcounts its tensor inputs (topology.py:41-42).
* ``update_grads`` applies the chain rule per input with automatic
  unbroadcasting and accumulation (topology.py:81-104).
* ``backward`` drives the reverse sweep with three cleanup modes
  (keep / prune / destroy) and higher-order support via re-taping under
  ``enable_grad`` (topology.py:132-200): when ``allow_higher_order`` is on,
  each VJP call itself builds a fresh tape, which is what makes
  ``x.grad.backward()`` work.  Note on ``prune`` (reference-faithful,
  topology.py:195-200): it only wipes tensors whose refcount has reached 0;
  interior tensors are inputs of their consumers (refs >= 1) and the root
  output is not in the traversal, so on a typical graph prune frees nothing
  extra — Python GC reclaims the graph when the user drops the root.
  ``destroy`` is the mode that actively severs every visited tensor.

Engine-level differences from the reference (behavior-preserving):

* ``toposort`` is iterative (the reference's recursive DFS, topology.py:106-128,
  overflows Python's stack on the deep op-chains that long TPU training loops
  build).  Postorder is identical.
* On the XLA backend every VJP call dispatches jax ops; under
  ``minidiff_tpu.func.jit`` this whole sweep runs on tracers and collapses
  into one compiled executable (the reference's per-op Python loop is the
  overhead this design deletes).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md
import minidiff_tpu.caching as mdc

if TYPE_CHECKING:
    from typing import Any, Dict, List, Literal, Optional, Sequence

    import minidiff_tpu.typing as mdt


class OpNode:
    def __init__(
        self,
        forward_func: "mdt.GenericOp",
        grad_functions: "Sequence[Optional[mdt.GenericOpGrad]]",
        op_inputs: "Sequence[Any]",
        op_kwargs: "Optional[Dict[str, Any]]" = None,
        op_name: "Optional[str]" = None,
        kwargs_to_grads: bool = False,
    ):
        self.forward_func = forward_func
        self.grad_functions = grad_functions
        self.op_inputs = op_inputs
        self.op_kwargs = op_kwargs or {}
        self.op_name = op_name or ""
        self.kwargs_to_grads = kwargs_to_grads

        self.tensor_inputs = [x for x in op_inputs if isinstance(x, md.Tensor)]
        for tensor in self.tensor_inputs:
            tensor.consumer_refs += 1

        # Structural-identity metadata, built only under reuse_graph
        # (topology.py:46-74): _struct_sig is a nested tuple hashing the graph
        # *shape* (which forward fns feed which positions), _tensor_graph is a
        # nested list that lets cached toposort orders be replayed by index.
        self._tensor_graph: list = []
        # replay metadata is only trustworthy if EVERY reachable node was
        # built inside reuse_graph; nodes created outside poison the flag so
        # backward falls back to a real toposort instead of crashing on (or
        # colliding with) incomplete index paths
        self._cache_meta_complete = mdc.currently_caching()
        if not mdc.currently_caching():
            self._struct_sig: tuple = ()
            return

        ids: list = []
        seen_pos: dict = {}
        for pos, op_input in enumerate(self.op_inputs):
            if not isinstance(op_input, md.Tensor):
                ids.append(("const",))
                continue
            # alias signature: repeated inputs (x*x vs a*b) must hash apart —
            # their _tensor_graph shapes differ and replaying one graph's
            # index paths onto the other crashes or silently reorders
            first = seen_pos.setdefault(id(op_input), pos)
            # consumer_refs at consumption time = number of consumers so far:
            # this encodes CROSS-node sharing (a diamond's second consumer
            # sees refs=2, an unshared twin sees refs=1), which nested ids
            # alone cannot distinguish — confirmed to otherwise collide and
            # replay a traversal that silently drops gradient terms
            share = op_input.consumer_refs
            if op_input.is_leaf:
                ids.append(("leaf", first, share))
            else:
                node = op_input.op_node
                if not node._struct_sig or not getattr(
                    node, "_cache_meta_complete", False
                ):
                    self._cache_meta_complete = False
                ids.append((first, share, node._struct_sig))
        # per-call forwards (stateful ops, concat, remat) carry a stable
        # structural token — raw id() would never repeat across instances
        # (cache never hits) and can alias recycled ids after GC
        ids.append(getattr(forward_func, "_structural_id", None) or id(forward_func))
        self._struct_sig = tuple(ids)

        seen: set = set()
        for op_input in self.op_inputs:
            if not isinstance(op_input, md.Tensor) or id(op_input) in seen:
                continue
            if not op_input.is_leaf:
                self._tensor_graph.append(op_input.op_node._tensor_graph)
            self._tensor_graph.append(op_input)
            seen.add(id(op_input))

    @property
    def hash(self) -> int:
        return hash(self._struct_sig)

    def update_grads(self, grad: "md.Tensor", output: "Optional[md.Tensor]" = None) -> None:
        """Chain rule: accumulate VJP(grad) into each tracked input's .grad.

        Runs in whatever grad mode the caller set — backward() enables grad
        only for higher-order sweeps, so these VJP calls re-tape exactly when
        they should (topology.py:81-104).

        ``output`` is this node's forward result when the engine has it in
        hand (the sweep is iterating over output tensors anyway): VJPs marked
        ``needs_output`` receive it as ``_output`` and can reuse the forward
        value instead of recomputing it — XLA on TPU does NOT reliably CSE a
        VJP's recomputed transcendental against the forward pass (measured:
        exp fwd+bwd 2.4x slower with recompute-style grads).
        """
        for op_input, grad_function in zip(self.op_inputs, self.grad_functions):
            if not isinstance(op_input, md.Tensor):
                continue
            if not op_input.allow_grad:
                continue
            if grad_function is None:
                continue

            kwargs = self.op_kwargs if self.kwargs_to_grads else {}
            if getattr(grad_function, "needs_output", False):
                kwargs = dict(kwargs)
                kwargs["_output"] = output
            grad_computation = grad_function(*self.op_inputs, grad, **kwargs)
            # Forward-pass broadcasting must be undone so gradients land with
            # the input's shape (topology.py:94-99).
            if grad_computation.shape == op_input.shape:
                collected = grad_computation
            else:
                collected = md.unbroadcast(grad_computation, op_input.shape)

            if op_input.grad is None:
                op_input.grad = collected
            else:
                op_input.grad = op_input.grad + collected

    def toposort(self) -> "List[md.Tensor]":
        """Postorder over the tensor DAG feeding this node (iterative DFS).

        Returns the same ordering as the reference's recursive version
        (topology.py:106-128): inputs appear after everything beneath them.
        """
        seen: set = set()
        order: list = []
        # Explicit stack mirroring the recursion frames exactly: "node" expands
        # a node's inputs, "child" performs the seen-check at visit time (NOT
        # at push time — early marking would emit a shared tensor before a
        # consumer that reaches it through a deeper path, breaking the
        # topological property), "emit" appends after the subtree completes.
        work: list = [("node", self)]
        while work:
            kind, item = work.pop()
            if kind == "emit":
                order.append(item)
            elif kind == "child":
                input_id = id(item)
                if input_id in seen:
                    continue
                seen.add(input_id)
                work.append(("emit", item))
                work.append(("node", item.op_node))
            else:
                if item is None:
                    continue
                for op_input in reversed(item.tensor_inputs):
                    work.append(("child", op_input))
        return order

    def backward(
        self,
        seed_grad: "md.Tensor",
        retain_grads: bool = False,
        cleanup_mode: "Literal['keep', 'prune', 'destroy']" = "prune",
        allow_higher_order: bool = False,
        reset_grads: bool = True,
        root_output: "Optional[md.Tensor]" = None,
    ) -> None:
        if cleanup_mode not in ("keep", "prune", "destroy"):
            raise ValueError(
                f"unknown cleanup_mode {cleanup_mode!r}; "
                "expected 'keep', 'prune', or 'destroy'")

        # Higher-order sweeps re-traverse the same subgraph, so intermediates'
        # grads and the graph itself must survive (topology.py:147-150).
        if allow_higher_order:
            retain_grads = True
            if cleanup_mode == "destroy":
                cleanup_mode = "prune"

        stash_higher = False
        if mdc.currently_caching() and getattr(self, "_cache_meta_complete", False):
            traversal_path = mdc.replay_traversal(self)
            # reuse_graph's executable cache: same structural hash => the
            # whole reverse sweep replays as ONE compiled XLA call (first-
            # order, fresh-grads sweeps on the XLA backend; silently eager
            # otherwise).  SURVEY.md §7 step 7.
            import minidiff_tpu.compiled_backward as mcb

            if not allow_higher_order and reset_grads:
                if mcb.try_run(
                    self, traversal_path, seed_grad, retain_grads,
                    cleanup_mode, root_output=root_output,
                ):
                    return
            elif allow_higher_order and reset_grads:
                # higher-order cycle (compiled_backward.try_run_higher):
                # once a full f.backward(higher) -> grad.backward() cycle
                # has been traced for this structure, sweep 1 replays
                # compiled (grad VALUES + markers); until then it runs
                # eagerly below and stashes its records afterwards
                if mcb.try_run_higher(
                    self, traversal_path, seed_grad, cleanup_mode,
                    root_output,
                ):
                    return
                stash_higher = True
        else:
            traversal_path = self.toposort()

        if reset_grads:
            for tensor in traversal_path:
                tensor.grad = None

        try:
            with md.enable_grad(allow_higher_order):
                self.update_grads(seed_grad, output=root_output)
                for tensor in reversed(traversal_path):
                    if tensor.is_leaf:
                        continue
                    grad = tensor.grad
                    if grad is None:
                        # reachable only through None-VJP slots (e.g. where's
                        # condition, getitem keys): nothing to propagate
                        continue
                    node = tensor.op_node
                    node.update_grads(grad, output=tensor)
                    if not retain_grads:
                        tensor.grad = None

                    if cleanup_mode == "keep":
                        continue
                    if cleanup_mode == "destroy":
                        tensor.wipe()
                        continue
                    # prune: free this subgraph once nothing else references
                    # it
                    if tensor.consumer_refs > 0:
                        continue
                    for child in node.tensor_inputs:
                        child.consumer_refs -= 1
                    tensor.wipe()
            if stash_higher:
                import minidiff_tpu.compiled_backward as mcb

                mcb.stash_cycle(self, traversal_path, seed_grad, root_output)
        finally:
            # fused-backward memos (sdpa/norm/xent/linear_scan) only carry
            # state BETWEEN the grad calls of one sweep; dropping them here
            # releases the pinned operand/result buffers with the step
            from minidiff_tpu.ops.definitions import clear_fused_memos

            clear_fused_memos()

    def __repr__(self) -> str:
        return f"{self.op_name}({', '.join(str(x) for x in self.op_inputs)})"
