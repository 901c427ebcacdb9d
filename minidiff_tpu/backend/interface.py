"""The backend interface contract.

A backend is any object (class or module) exposing the attributes below.  This
mirrors the reference's abstract interface (minidiff/backend/__init__.py:88-759)
with two deliberate deviations, both required for an immutable-array (XLA)
backend and documented in README.md:

1. *Mutation-style functions return the result.*  ``index_add``,
   ``put_along_axis``, ``setitem`` and ``shuffle`` cannot mutate a
   ``jax.Array`` in place, so every backend returns the updated array and the
   Tensor layer rebinds ``._data``.  (The NumPy backend still updates in place
   *and* returns the same array, so aliasing behavior matches the reference.)
2. ``full(shape, fill_value)`` takes the fill value; the reference's
   ``full(shape)`` (minidiff/tensor.py:480-481) passes no fill value and always
   raises — a latent bug we fix rather than reproduce.

Required attributes
-------------------
Identity / construction:
    tensor_class, tensor_constructor, as_numpy, nan

Elementwise unary:  absolute, ceil, copy, cos, cosh, exp, floor, invert, log,
    logical_not, sign, sin, sinh, sqrt, square, tan, tanh
Shape unary:        atleast_1d, atleast_2d, atleast_3d, flatten, flip, ravel,
    squeeze, transpose
Reductions:         all, any, argmax, argmin, max, mean, min, prod, std, sum
Scans:              cumsum, linear_scan (y_t = a_t*y_{t-1} + b_t)
Ordering:           sort, argsort, top_k_indices (k largest on the last axis)
Search:             argwhere
Binary:             add, astype, broadcast_to, dot, equal, expand_dims,
    floor_divide, getitem, greater, greater_equal, less, less_equal,
    logical_and, logical_or, logical_xor, matmul, mod, multiply, not_equal,
    power, reshape, subtract, tensordot, true_divide
Ternary:            clip, swapaxes, where
Creation:           ones_like, ones, zeros_like, zeros, full_like, full,
    concatenate, arange, stack, tile, repeat
Indexing/scatter:   index_add, put_along_axis, take_along_axis, setitem,
    isin, unravel_index, split
Random:             choice, rand, randint, randn, binomial, permutation,
    shuffle, seed
Functional random:  key_from_seed, key_fold_in, key_split, key_uniform,
    key_normal (explicit (2,)-uint32 keys; pure functions of the key, so a
    compiled program that takes the key as an input stays random per call —
    the stateful fns above become trace-time constants under jit)
IO:                 save, load
Collectives:        psum, ppermute, pmean, all_gather, psum_scatter,
    all_to_all, axis_size (SPMD axis collectives; single-device semantics —
    identity / self-edge-only / unit axis size — on the numpy backend)
Functional:         vmap
Properties:         tensor_shape, tensor_size, tensor_ndim, tensor_dtype,
    tensor_item, repr, len, array_interface, array
Dtypes:             dtype, float64, float32, float16, bfloat16, uint64,
    uint32, uint16, uint8, int64, int32, int16, int8, bool
"""

from __future__ import annotations

# Names every backend must expose; used by tests to verify interface coverage.
REQUIRED_ATTRS = [
    # identity / construction
    "tensor_class", "tensor_constructor", "as_numpy", "nan",
    # elementwise unary
    "absolute", "ceil", "copy", "cos", "cosh", "erf", "exp", "floor",
    "invert",
    "log", "logical_not", "sign", "sin", "sinh", "sqrt", "square", "tan",
    "tanh",
    # shape unary
    "atleast_1d", "atleast_2d", "atleast_3d", "flatten", "flip", "ravel",
    "squeeze", "transpose",
    # reductions / search / scans / ordering
    "all", "any", "argmax", "argmin", "max", "mean", "min", "prod", "std",
    "sum", "var", "cumsum", "linear_scan", "argwhere", "sort", "argsort",
    "top_k_indices",
    # binary
    "add", "astype", "broadcast_to", "dot", "equal", "expand_dims",
    "floor_divide", "getitem", "greater", "greater_equal", "less",
    "less_equal", "logical_and", "logical_or", "logical_xor", "matmul",
    "matmul_nt", "matmul_tn", "sdpa", "layernorm", "rmsnorm",
    "add_layernorm", "add_rmsnorm", "softmax_xent",
    "quantize_int8", "dequant_matmul", "quantize_int8_rows", "sdpa_int8_cache",
    "quantize_int4", "dequant_matmul4", "unpack_int4",
    "quantize_int8_stacked", "dequant_matmul_bmm",
    "conv2d", "conv2d_input_grad", "conv2d_kernel_grad",
    "einsum", "maximum", "minimum",
    "mod", "multiply", "not_equal", "power", "reshape", "subtract",
    "tensordot", "true_divide",
    # ternary
    "clip", "swapaxes", "where",
    # creation
    "ones_like", "ones", "zeros_like", "zeros", "full_like", "full",
    "concatenate", "arange", "stack", "tile", "repeat",
    # indexing / scatter
    "index_add", "scatter_add", "put_along_axis", "take_along_axis",
    "setitem", "isin", "unravel_index", "split",
    # random (stateful, reference-parity surface)
    "choice", "rand", "randint", "randn", "binomial", "permutation",
    "shuffle", "seed",
    # random (functional, counter-based: explicit keys that stay random per
    # step when threaded through a jit-compiled program as inputs)
    "key_from_seed", "key_fold_in", "key_split", "key_uniform", "key_normal",
    # io
    "save", "load",
    # collectives
    "psum", "ppermute", "pmean", "all_gather", "psum_scatter", "all_to_all",
    "axis_size",
    # functional
    "vmap",
    # properties
    "tensor_shape", "tensor_size", "tensor_ndim", "tensor_dtype",
    "tensor_item", "repr", "len", "array_interface", "array",
    # dtypes
    "dtype", "float64", "float32", "float16", "bfloat16", "uint64",
    "uint32", "uint16", "uint8", "int64", "int32", "int16", "int8", "bool",
]
