"""Type aliases (TYPE_CHECKING-only), mirroring minidiff/typing.py."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from typing import Any, Callable, TypeVar, Union

    import minidiff_tpu as md

    T = TypeVar("T")

    TensorLike = Union[int, float, "md.Tensor"]

    dtype = Any

    GenericFunc = Callable[..., "md.Tensor"]
    GenericOp = GenericFunc
    GenericOpGrad = Callable[..., "md.Tensor"]

    UnaryFunc = Callable[["md.Tensor"], "md.Tensor"]
    UnaryOp = UnaryFunc
    UnaryOpGrad = Callable[["md.Tensor", "md.Tensor"], "md.Tensor"]

    BinaryFunc = Callable[..., "md.Tensor"]
    BinaryOp = BinaryFunc
    BinaryOpGrad = Callable[..., "md.Tensor"]

    TernaryFunc = Callable[..., "md.Tensor"]
    TernaryOp = TernaryFunc
    TernaryOpGrad = Callable[..., "md.Tensor"]
