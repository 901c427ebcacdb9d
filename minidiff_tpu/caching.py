"""Toposort-order cache for repeated backward passes over identical graphs.

Parity with the reference (minidiff/caching.py): under ``reuse_graph``, every
OpNode also records a structural hash (nested tuples of forward-fn ids) and a
nested ``_tensor_graph`` list.  The first backward for a given graph *shape*
runs a real toposort and inverts the nested list into index paths; subsequent
backwards with the same hash replay the order by indexing — no DFS.

In the TPU build this is the eager-mode cache; the heavyweight analog is
:mod:`minidiff_tpu.func`, where the same "same structure ⇒ reuse" idea keys
jitted XLA executables.
"""

from __future__ import annotations

from contextvars import ContextVar
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from typing import List, Tuple

    import minidiff_tpu as md

_caching_graph = ContextVar("caching_graph", default=False)
_cached_graph_indices = ContextVar("cached_indices", default=None)


class reuse_graph:
    """Context manager enabling structural graph caching (caching.py:15-23)."""

    def __enter__(self):
        self._prev = _caching_graph.get()
        _caching_graph.set(True)
        _cached_graph_indices.set({})

    def __exit__(self, exc_type, exc, tb):
        _caching_graph.set(self._prev)
        _cached_graph_indices.set({})


def currently_caching() -> bool:
    return _caching_graph.get()


def backward_indices_for_root(root_node: "md.OpNode") -> tuple:
    """Index paths (into the nested _tensor_graph) for the toposort order.

    Cache miss: toposort once, then walk the nested list to find each sorted
    tensor's index path (caching.py:31-65).  Cache hit: return memoized paths.
    """
    if not _caching_graph.get():
        raise ValueError(
            "toposort replay requires an active reuse_graph() context")

    graph_hash = root_node.hash
    indices_dict = _cached_graph_indices.get()
    if graph_hash in indices_dict:
        return indices_dict[graph_hash]

    sorted_tensors = root_node.toposort()
    if not sorted_tensors:
        indices_dict[graph_hash] = ()
        return ()

    tensor_to_path = {id(t): None for t in sorted_tensors}

    stack = [([i], item) for i, item in enumerate(root_node._tensor_graph)]
    while stack:
        path, item = stack.pop()
        if isinstance(item, list):
            stack.extend((path + [i], sub) for i, sub in enumerate(item))
            continue
        if id(item) in tensor_to_path:
            tensor_to_path[id(item)] = path

    indices = tuple(tensor_to_path[id(t)] for t in sorted_tensors)
    indices_dict[graph_hash] = indices
    return indices


def replay_traversal(root_node: "md.OpNode") -> "List[md.Tensor]":
    """Materialize the cached traversal order by walking index paths.

    Defensive: if a cached path does not fit this graph's nested list (a
    structural-hash collision the alias signature didn't cover), rebuild via
    a real toposort instead of crashing or silently reordering.
    """
    import minidiff_tpu as md

    full_graph = root_node._tensor_graph
    traversal_indices = backward_indices_for_root(root_node)
    path: list = [None] * len(traversal_indices)
    try:
        for i, indices in enumerate(traversal_indices):
            item = full_graph
            for index in indices:
                item = item[index]
            if not isinstance(item, md.Tensor):
                raise TypeError
            path[i] = item
    except (IndexError, TypeError):
        path = root_node.toposort()
        _cached_graph_indices.get().pop(root_node.hash, None)
    return path
