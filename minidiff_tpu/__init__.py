"""minidiff_tpu: a TPU-native reverse-mode autodiff framework.

Same capabilities and API surface as the reference eager autodiff engine
(PyTorch-like Tensor/backward(), higher-order gradients via tape re-tracing,
explicit graph lifetime management, pluggable array backends, toposort cache,
finite-difference oracle) — re-designed for TPU: values are jax.Arrays, the
XLA backend runs every op through jax.numpy / Pallas kernels, and ``md.jit``
traces whole tape programs (forward + backward + update) into single fused
XLA executables.

Typical usage::

    import minidiff_tpu as md

    x = md.Tensor([[0, 2, -2, 1], [-1, -1, -2, -2]], allow_grad=True)
    y = md.Tensor([[2, 3, 4, 5], [0, -1, -3, 2]], allow_grad=True)
    f = 2 * y * md.sin(x) - x ** 2
    f.backward(allow_higher_order=True)
    x.grad.backward()          # second-order
"""

from __future__ import annotations

from minidiff_tpu import backend  # noqa: F401  (must precede ops/tensor)
from minidiff_tpu.ops.definitions import *  # noqa: F401,F403
from minidiff_tpu.tensor import *  # noqa: F401,F403
from minidiff_tpu.tape import OpNode  # noqa: F401
from minidiff_tpu.caching import (  # noqa: F401
    backward_indices_for_root,
    currently_caching,
    reuse_graph,
)
from minidiff_tpu.func import (  # noqa: F401
    cond,
    grad,
    hessian,
    hvp,
    jit,
    jvp,
    lower,
    remat,
    scan,
    value_and_grad,
    vjp,
    while_loop,
)
from minidiff_tpu.backend import (  # noqa: F401
    available_backends,
    backend_name,
    set_backend,
    use_backend,
)
from minidiff_tpu.random import (  # noqa: F401
    fold_in,
    random_bernoulli,
    random_key,
    random_normal,
    random_uniform,
    split_key,
)
from minidiff_tpu.dataloader import DataLoader, save_dataset  # noqa: F401
from minidiff_tpu.tokenizer import BPETokenizer  # noqa: F401

__version__ = "0.1.0"

# dtype symbols resolve against the *active* backend (md.float32, md.bool, …);
# the reference binds them once at import (minidiff/tensor.py:680-693).
_DTYPE_NAMES = frozenset(
    {
        "dtype",
        "float64",
        "float32",
        "float16",
        "bfloat16",
        "uint64",
        "uint32",
        "uint16",
        "uint8",
        "int64",
        "int32",
        "int16",
        "int8",
        "bool",
        "nan",
    }
)


def __getattr__(name: str):
    if name in _DTYPE_NAMES:
        return getattr(backend, name)
    if name == "dtypes":
        return [
            getattr(backend, n)
            for n in (
                "float64",
                "float32",
                "float16",
                "bfloat16",
                "uint64",
                "uint32",
                "uint16",
                "uint8",
                "int64",
                "int32",
                "int16",
                "int8",
                "bool",
            )
        ]
    raise AttributeError(f"module 'minidiff_tpu' has no attribute {name!r}")
