"""Shared Tensor<->raw pytree helpers for the shard_map-based layers."""

from __future__ import annotations

import jax

import minidiff_tpu as md


def _is_tensor(x):
    return isinstance(x, md.Tensor)


def _unwrap(tree):
    return jax.tree.map(lambda t: t._data, tree, is_leaf=_is_tensor)


def _wrap(tree, allow_grad=False):
    return jax.tree.map(lambda a: md.Tensor(a, allow_grad=allow_grad), tree)
