"""Functional optimizers over parameter pytrees.

``update(params, grads, state) -> (new_params, new_state)`` is pure in the
Tensor values, so an optimizer step jits into the same executable as the
forward/backward (see models.mlp.make_train_step).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Any, Tuple


def _is_tensor(x):
    return isinstance(x, md.Tensor)


def _tree_map(fn, *trees):
    return jax.tree.map(fn, *trees, is_leaf=_is_tensor)


class Optimizer:
    def init(self, params: "Any") -> "Any":
        raise NotImplementedError

    def update(self, params: "Any", grads: "Any", state: "Any") -> "Tuple[Any, Any]":
        raise NotImplementedError


class SGD(Optimizer):
    def __init__(self, lr: float, momentum: float = 0.0):
        self.lr = lr
        self.momentum = momentum

    def init(self, params: "Any") -> "Any":
        if self.momentum == 0.0:
            return None
        return _tree_map(lambda p: md.zeros_like(p), params)

    def update(self, params, grads, state):
        # no_grad: optimizer math never needs a tape
        with md.no_grad():
            if self.momentum == 0.0:
                new_params = _tree_map(
                    lambda p, g: (p - self.lr * g).detach(allow_grad=True),
                    params,
                    grads,
                )
                return new_params, None
            new_state = _tree_map(lambda v, g: self.momentum * v + g, state, grads)
            new_params = _tree_map(
                lambda p, v: (p - self.lr * v).detach(allow_grad=True),
                params,
                new_state,
            )
            return new_params, new_state


class Adam(Optimizer):
    def __init__(self, lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8):
        self.lr = lr
        self.b1 = b1
        self.b2 = b2
        self.eps = eps

    def init(self, params: "Any") -> "Any":
        zeros = lambda p: md.zeros_like(p)
        return {
            "m": _tree_map(zeros, params),
            "v": _tree_map(zeros, params),
            "t": md.Tensor(0.0),
        }

    def update(self, params, grads, state):
        with md.no_grad():
            t = state["t"] + 1.0
            m = _tree_map(
                lambda m_, g: self.b1 * m_ + (1 - self.b1) * g, state["m"], grads
            )
            v = _tree_map(
                lambda v_, g: self.b2 * v_ + (1 - self.b2) * g * g, state["v"], grads
            )
            # bias-corrected step size folded into a scalar Tensor
            step = self.lr * md.sqrt(1 - self.b2**t) / (1 - self.b1**t)
            new_params = _tree_map(
                lambda p, m_, v_: (p - step * m_ / (md.sqrt(v_) + self.eps)).detach(
                    allow_grad=True
                ),
                params,
                m,
                v,
            )
            return new_params, {"m": m, "v": v, "t": t}
