"""Tiled MXU matmul kernel with a fused custom-VJP backward.

Replaces the C-core matmul the reference borrows from NumPy/CuPy
(minidiff/backend/numpy.py:84, cupy.py) with a TPU-native Pallas kernel:

* grid (M/bm, N/bn, K/bk), K innermost ("arbitrary") so each (i, j) output
  tile accumulates partial products in an f32 VMEM scratch accumulator —
  bf16/f16 inputs still accumulate in f32 on the MXU.
* custom_vjp so the kernel is differentiable under plain ``jax.grad`` too
  (the tape supplies its own VJPs through ops.definitions.matmul_grad_*,
  which re-enter this dispatcher for the two backward matmuls).

Dispatch policy: Pallas only on TPU, 2-D, tile-aligned shapes, float dtypes,
and problems big enough to matter; everything else falls back to jnp.matmul
(itself XLA→MXU).  ``MINIDIFF_TPU_DISABLE_PALLAS=1`` disables all kernels.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: multiples of the MXU (128x128) and the bf16 min tile (16, 128).
_BM = 256
_BN = 256
_BK = 512

_SUPPORTED_DTYPES = (jnp.float32, jnp.bfloat16)


def _pallas_enabled() -> bool:
    if os.environ.get("MINIDIFF_TPU_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _mm_kernel(x_ref, y_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], y_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _pallas_matmul_2d(
    x: jax.Array, y: jax.Array, bm: int = _BM, bn: int = _BN, bk: int = _BK
) -> jax.Array:
    m, k = x.shape
    _, n = y.shape
    out_dtype = jnp.promote_types(x.dtype, y.dtype)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize
            + k * n * y.dtype.itemsize
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x, y)


def _eligible(x: jax.Array, y: jax.Array) -> bool:
    if not _pallas_enabled():
        return False
    if x.ndim != 2 or y.ndim != 2:
        return False
    if x.dtype not in _SUPPORTED_DTYPES or y.dtype not in _SUPPORTED_DTYPES:
        return False
    m, k = x.shape
    k2, n = y.shape
    if k != k2:
        return False
    # Tile-aligned and big enough that kernel launch beats XLA's fused matmul.
    return (
        m % _BM == 0
        and n % _BN == 0
        and k % _BK == 0
        and m * n * k >= 512 * 512 * 512
    )


@jax.custom_vjp
def _pallas_matmul(x: jax.Array, y: jax.Array) -> jax.Array:
    return _pallas_matmul_2d(x, y)


def _pallas_matmul_fwd(x, y):
    return _pallas_matmul_2d(x, y), (x, y)


def _pallas_matmul_bwd(residuals, g):
    x, y = residuals
    dx = matmul(g, y.T)
    dy = matmul(x.T, g)
    return dx.astype(x.dtype), dy.astype(y.dtype)


_pallas_matmul.defvjp(_pallas_matmul_fwd, _pallas_matmul_bwd)


def matmul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Backend entry point: Pallas for large aligned 2-D, jnp otherwise."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if _eligible(x, y):
        return _pallas_matmul(x, y)
    return jnp.matmul(x, y)


# ---------------------------------------------------------------------------
# Transpose-free NT / TN variants — the tape's matmul VJPs call these so the
# backward pass never materializes a transposed copy (feeding a transpose
# into a custom kernel would cost two extra HBM round-trips per grad matmul;
# XLA's own dot_general absorbs the transpose into dimension numbers, and the
# Pallas kernels below read the "transposed" operand tile-natively).
# ---------------------------------------------------------------------------


def _mm_nt_kernel(x_ref, y_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # x (bm, bk) · y (bn, bk) contracted on the shared k axis
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], y_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _mm_tn_kernel(x_ref, y_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # x (bk, bm) · y (bk, bn) contracted on the shared k axis
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], y_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _pallas_matmul_nt_2d(
    x: jax.Array, y: jax.Array, bm: int = _BM, bn: int = _BN, bk: int = _BK
) -> jax.Array:
    m, k = x.shape
    n, _ = y.shape
    out_dtype = jnp.promote_types(x.dtype, y.dtype)
    return pl.pallas_call(
        _mm_nt_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize
            + k * n * y.dtype.itemsize
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x, y)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def _pallas_matmul_tn_2d(
    x: jax.Array, y: jax.Array, bm: int = _BM, bn: int = _BN, bk: int = _BK
) -> jax.Array:
    k, m = x.shape
    _, n = y.shape
    out_dtype = jnp.promote_types(x.dtype, y.dtype)
    return pl.pallas_call(
        _mm_tn_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(m // bm, n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize
            + k * n * y.dtype.itemsize
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x, y)


def _nt_eligible(x: jax.Array, y: jax.Array) -> bool:
    if not (_pallas_enabled() and x.ndim == 2 and y.ndim == 2):
        return False
    if x.dtype not in _SUPPORTED_DTYPES or y.dtype not in _SUPPORTED_DTYPES:
        return False
    m, k = x.shape
    n, k2 = y.shape
    return (
        k == k2
        and m % _BM == 0
        and n % _BN == 0
        and k % _BK == 0
        and m * n * k >= 512 * 512 * 512
    )


def _tn_eligible(x: jax.Array, y: jax.Array) -> bool:
    if not (_pallas_enabled() and x.ndim == 2 and y.ndim == 2):
        return False
    if x.dtype not in _SUPPORTED_DTYPES or y.dtype not in _SUPPORTED_DTYPES:
        return False
    k, m = x.shape
    k2, n = y.shape
    return (
        k == k2
        and m % _BM == 0
        and n % _BN == 0
        and k % _BK == 0
        and m * n * k >= 512 * 512 * 512
    )


def _dot_general_nt(x: jax.Array, y: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((x.ndim - 1,), (y.ndim - 1,)), ((), ()))
    )


def _dot_general_tn(x: jax.Array, y: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((0,), (0,)), ((), ()))
    )


def matmul_nt(x: jax.Array, y: jax.Array) -> jax.Array:
    """x @ y^T over the last two axes, transpose-free."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if _nt_eligible(x, y):
        return _pallas_matmul_nt_2d(x, y)
    if x.ndim == 2 and y.ndim == 2:
        return _dot_general_nt(x, y)
    return jnp.matmul(x, jnp.swapaxes(y, -1, -2))


def matmul_tn(x: jax.Array, y: jax.Array) -> jax.Array:
    """x^T @ y over the last two axes, transpose-free."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if _tn_eligible(x, y):
        return _pallas_matmul_tn_2d(x, y)
    if x.ndim == 2 and y.ndim == 2:
        return _dot_general_tn(x, y)
    return jnp.matmul(jnp.swapaxes(x, -1, -2), y)
