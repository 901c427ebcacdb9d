"""CNN classifier — the convolutional model family.

Built on the conv2d op triple (ops/definitions.py), which lowers to XLA's
native convolutions on TPU; pooling is composed from reshape + max/mean, so
the whole model differentiates through the tape with no pooling primitive.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
from minidiff_tpu.models import functional as F
from minidiff_tpu.models.layers import Linear, Module

if TYPE_CHECKING:
    from typing import Any, Dict, Optional, Sequence


class Conv2d(Module):
    """NHWC convolution layer: y = conv2d(x, w) + b, Kaiming-uniform init."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int = 3,
                 stride: int = 1, padding: int = 0, bias: bool = True,
                 dtype: "Optional[Any]" = None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.bias = bias
        self.dtype = dtype

    def init(self) -> "Dict[str, md.Tensor]":
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        bound = 1.0 / math.sqrt(fan_in)
        w = np.random.uniform(-bound, bound, (k, k, self.in_channels, self.out_channels))
        params = {"w": md.Tensor(w, allow_grad=True, dtype=self.dtype)}
        if self.bias:
            b = np.random.uniform(-bound, bound, (self.out_channels,))
            params["b"] = md.Tensor(b, allow_grad=True, dtype=self.dtype)
        return params

    def apply(self, params: "Dict[str, md.Tensor]", x: "md.Tensor") -> "md.Tensor":
        out = md.conv2d(x, params["w"], stride=self.stride, padding=self.padding)
        if self.bias:
            out = out + params["b"]
        return out


class CNN(Module):
    """Small conv net: [conv-relu-pool] x N -> flatten -> dense head.

    Defaults fit MNIST-shaped inputs (B, 28, 28, 1) -> 10 classes.
    """

    def __init__(self, in_channels: int = 1, channels: "Sequence[int]" = (16, 32),
                 num_classes: int = 10, image_size: int = 28,
                 dtype: "Optional[Any]" = None):
        self.convs = []
        c_in = in_channels
        size = image_size
        for i, c_out in enumerate(channels):
            if size % 2 != 0:
                raise ValueError(
                    f"image_size={image_size} is not divisible by 2^{i + 1} "
                    f"(stage {i} would pool a {size}x{size} map); pick an "
                    f"image size divisible by 2**len(channels)"
                )
            self.convs.append(Conv2d(c_in, c_out, kernel_size=3, padding=1,
                                     dtype=dtype))
            c_in = c_out
            size //= 2  # each stage ends with 2x2 max pooling
        self._flat = size * size * c_in
        self.head = Linear(self._flat, num_classes, dtype=dtype)

    def init(self):
        return {
            "convs": [conv.init() for conv in self.convs],
            "head": self.head.init(),
        }

    def apply(self, params, x):
        for conv, p in zip(self.convs, params["convs"]):
            x = F.relu(conv.apply(p, x))
            x = F.max_pool2d(x, 2)
        x = x.reshape((x.shape[0], self._flat))
        return self.head.apply(params["head"], x)
