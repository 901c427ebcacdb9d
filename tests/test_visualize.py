"""Tape visualizer: DOT structure, scalar labels, constant nodes."""

from __future__ import annotations

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.utils import to_dot


def test_dot_contains_all_nodes_and_constant_labels(backend):
    x = md.Tensor(np.array([1.0, 2.0]), allow_grad=True)
    out = md.clip(x * 2.0, 0.0, None)  # clip carries non-Tensor op inputs
    dot = to_dot(out)
    assert dot.startswith("digraph")
    # every edge source must be a declared node (no bare memory addresses)
    import re

    declared = set(re.findall(r'^\s*"([^"]+)" \[', dot, re.M))
    for src, dst in re.findall(r'"([^"]+)" -> "([^"]+)"', dot):
        assert src in declared, f"undeclared edge source {src}"
        assert dst in declared, f"undeclared edge target {dst}"
    # the clip bounds appear as labeled constant nodes
    assert 'label="0.0"' in dot
    assert 'label="None"' in dot


def test_scalar_leaves_label_by_value_without_aliasing(backend):
    a = md.Tensor(2.0, allow_grad=True)
    b = md.Tensor(3.0, allow_grad=True)
    out = a * b
    dot = to_dot(out)
    assert 'label="2.0"' in dot and 'label="3.0"' in dot


def test_nested_expression_labels(backend):
    """With an explicit (empty) name map and no intermediate insertion,
    non-leaf tensors compose NESTED expression labels from op names."""
    x = md.Tensor(np.ones(2), allow_grad=True)
    y = md.Tensor(np.ones(2), allow_grad=True)
    out = md.sum(x * y + x)
    dot = to_dot(out, tensor_names={})
    # leaves named t0, t1; root label nests the whole expression
    assert 'label="t0"' in dot and 'label="t1"' in dot
    import re

    labels = re.findall(r'\[label="([^"]+)"\]', dot)
    nested = [l for l in labels if "(" in l]
    assert nested, labels
    # the root expression mentions both leaves and both op names
    root_label = max(nested, key=len)
    assert "t0" in root_label and "t1" in root_label
    assert "sum" in root_label and "add" in root_label


def test_shared_subgraph_renders_once_with_two_edges(backend):
    """A tensor consumed twice must appear as ONE node with two out-edges
    (aliasing fidelity), not be duplicated per consumer."""
    import re

    x = md.Tensor(np.ones(3), allow_grad=True)
    shared = x * 2.0
    out = shared + shared  # diamond
    dot = to_dot(out)
    node_ids = re.findall(r'^\s*"([^"]+)" \[', dot, re.M)
    assert len(node_ids) == len(set(node_ids)), "duplicate node declarations"
    srcs = [s for s, _ in re.findall(r'"([^"]+)" -> "([^"]+)"', dot)]
    shared_id = str(id(shared))
    assert srcs.count(shared_id) == 2, "shared subgraph must feed both edges"


def test_tensor_names_are_honored_and_expand_named_nodes(backend):
    x = md.Tensor(np.ones(2), allow_grad=True)
    y = md.Tensor(np.ones(2), allow_grad=True)
    mid = x * y
    out = mid + x
    dot = to_dot(out, tensor_names={id(x): "input", id(mid): "hidden"})
    assert 'label="input"' in dot
    # a named intermediate shows "name = expression"
    assert "hidden = " in dot
    # the unnamed y still gets an automatic leaf name
    assert 'label="t0"' in dot


def test_insert_intermediates_names_every_node(backend):
    x = md.Tensor(np.ones(2), allow_grad=True)
    out = md.sum(md.tanh(x * 2.0))
    dot = to_dot(out, insert_intermediates=True)
    import re

    labels = re.findall(r'\[label="([^"]+)"\]', dot)
    named = [l for l in labels if l.split(" ")[0].startswith("t")]
    # every non-constant node gets a tN name; intermediates get "tN = expr"
    assert any("= tanh(" in l for l in labels), labels
    assert any("= sum(" in l for l in labels), labels
    assert len(named) >= 3


def test_leaf_root_renders(backend):
    """A bare leaf (no tape) must still produce a one-node graph."""
    x = md.Tensor(np.ones(2), allow_grad=True)
    dot = to_dot(x)
    assert dot.startswith("digraph") and str(id(x)) in dot


def test_kwarg_ops_do_not_leak_kwargs_into_labels(backend):
    x = md.Tensor(np.ones((2, 3)), allow_grad=True)
    out = md.sum(x, axis=1)
    dot = to_dot(out)
    assert "sum(" in dot
    assert "axis" not in dot  # kwargs are not part of the expression label
