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
