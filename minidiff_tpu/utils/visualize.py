"""Tape visualizer: render the OpNode graph as Graphviz DOT.

Parity with the reference's draw_tensor_op_graph (minidiff/utils.py:17-101):
leaves are named t0, t1, ...; non-leaf tensors get nested expression labels
like ``add(mul(t0, t1), t2)``; ``insert_intermediates`` names every node.

Unlike the reference we do not require the ``graphviz`` package: ``to_dot``
returns DOT source text; ``draw_tensor_op_graph`` returns a graphviz.Digraph
when the package is importable and the DOT text otherwise.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Dict, List, Optional, Tuple


def _build_graph(
    root: "md.Tensor",
    tensor_names: "Optional[Dict[int, str]]" = None,
    insert_intermediates: bool = False,
) -> "Tuple[List[Tuple[str, str]], List[Tuple[str, str]]]":
    """Return (nodes, edges) where nodes are (id, label) and edges (src, dst)."""
    if tensor_names is None:
        insert_intermediates = True
        tensor_names = {}

    all_names: dict = dict(tensor_names)
    counter = [0]

    def nested_name(tensor: "md.Tensor") -> str:
        node = tensor.op_node
        input_names = [lookup_name(t) for t in node.op_inputs]
        return f"{node.op_name}({', '.join(input_names)})"

    def lookup_name(tensor) -> str:
        # key on the Tensor object itself — never on id() of a transient
        # .item() scalar (CPython freelists recycle those addresses, which
        # mislabeled later scalars and shadowed user tensor_names entries)
        key = id(tensor)
        if key in all_names:
            return all_names[key]
        if not isinstance(tensor, md.Tensor):
            name = str(tensor)
        elif tensor.size == 1 and tensor.is_leaf:
            name = str(tensor.item())  # label scalars by value
        elif insert_intermediates or tensor.is_leaf:
            name = f"t{counter[0]}"
            counter[0] += 1
        else:
            name = nested_name(tensor)
        all_names[key] = name
        return name

    nodes: list = []
    edges: list = []
    all_tensors = root.op_node.toposort() + [root] if root.op_node else [root]
    for tensor in all_tensors:
        tid = str(id(tensor))
        label = lookup_name(tensor)
        expand = insert_intermediates or id(tensor) in tensor_names
        if not tensor.is_leaf and expand:
            label = f"{label} = {nested_name(tensor)}"
        nodes.append((tid, label))
        if not tensor.is_leaf:
            for pos, child in enumerate(tensor.op_node.op_inputs):
                if isinstance(child, md.Tensor):
                    edges.append((str(id(child)), tid))
                else:
                    # constants get their own labeled node per (op, slot) —
                    # raw id() edges would render as bare memory addresses
                    # (and every None would collapse into one shared node)
                    cid = f"{tid}_c{pos}"
                    nodes.append((cid, str(child)))
                    edges.append((cid, tid))
    return nodes, edges


def to_dot(
    root: "md.Tensor",
    tensor_names: "Optional[Dict[int, str]]" = None,
    insert_intermediates: bool = False,
) -> str:
    """Render the tape reachable from ``root`` as DOT source text."""
    nodes, edges = _build_graph(root, tensor_names, insert_intermediates)
    lines = ["digraph tape {"]
    for nid, label in nodes:
        escaped = label.replace('"', '\\"')
        lines.append(f'  "{nid}" [label="{escaped}"];')
    for src, dst in edges:
        lines.append(f'  "{src}" -> "{dst}";')
    lines.append("}")
    return "\n".join(lines)


def draw_tensor_op_graph(
    root: "md.Tensor",
    tensor_names: "Optional[Dict[int, str]]" = None,
    graph=None,
    insert_intermediates: bool = False,
    **kwargs,
):
    """Graphviz Digraph of the tape (DOT text if graphviz is unavailable)."""
    try:
        import graphviz
    except ImportError:
        return to_dot(root, tensor_names, insert_intermediates)

    nodes, edges = _build_graph(root, tensor_names, insert_intermediates)
    if graph is None:
        graph = graphviz.Digraph(**kwargs)
    for nid, label in nodes:
        graph.node(nid, label)
    for src, dst in edges:
        graph.edge(src, dst)
    return graph
