"""Minimal functional module system.

Modules are parameter *factories*: ``init()`` returns a pytree of Tensors and
``apply(params, x)`` is a pure function of (params, inputs) — the shape that
md.jit and the parallel layer want.  No hidden state on the module object.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F

if TYPE_CHECKING:
    from typing import Any, Callable, Dict, List, Optional, Sequence


class Module:
    def init(self) -> "Any":
        raise NotImplementedError

    def apply(self, params: "Any", x: "md.Tensor") -> "md.Tensor":
        raise NotImplementedError

    def __call__(self, params: "Any", x: "md.Tensor") -> "md.Tensor":
        return self.apply(params, x)


class Linear(Module):
    """y = x @ w + b with Kaiming-uniform init."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype: "Optional[Any]" = None):
        self.in_features = in_features
        self.out_features = out_features
        self.bias = bias
        self.dtype = dtype

    def init(self) -> "Dict[str, md.Tensor]":
        bound = 1.0 / math.sqrt(self.in_features)
        w = np.random.uniform(-bound, bound, (self.in_features, self.out_features))
        params = {"w": md.Tensor(w, allow_grad=True, dtype=self.dtype)}
        if self.bias:
            b = np.random.uniform(-bound, bound, (self.out_features,))
            params["b"] = md.Tensor(b, allow_grad=True, dtype=self.dtype)
        return params

    def apply(self, params: "Dict[str, md.Tensor]", x: "md.Tensor") -> "md.Tensor":
        if "w_q" in params:
            # weight-only int8 (models.quant.quantize_for_serving): the
            # fused dequant-matmul keeps the weight stream int8 in HBM
            out = md.dequant_matmul(x, params["w_q"], params["w_s"])
        elif "w_q4" in params:
            # int4: packed nibbles + group scales — half the int8 stream
            out = md.dequant_matmul4(x, params["w_q4"], params["w_s4"])
        else:
            out = x @ params["w"]
        if "lora_a" in params:
            # LoRA adapter (models.lora): two skinny rank-r matmuls added
            # to the frozen base projection; zero-init lora_b keeps the
            # fresh adapter an exact no-op
            out = out + (x @ params["lora_a"]) @ params["lora_b"] * params["lora_s"]
        if self.bias:
            out = out + params["b"]
        return out


_ACTIVATIONS: dict = {
    "relu": F.relu,
    "tanh": md.tanh,
    "sigmoid": F.sigmoid,
    "gelu": F.gelu,
    None: lambda x: x,
}


class Activation(Module):
    def __init__(self, name: str):
        self.name = name
        self.fn = _ACTIVATIONS[name]

    def init(self):
        return {}

    def apply(self, params, x):
        return self.fn(x)


class Sequential(Module):
    def __init__(self, layers: "Sequence[Module]"):
        self.layers = list(layers)

    def init(self) -> "List[Any]":
        return [layer.init() for layer in self.layers]

    def apply(self, params: "List[Any]", x: "md.Tensor") -> "md.Tensor":
        for layer, p in zip(self.layers, params):
            x = layer.apply(p, x)
        return x
