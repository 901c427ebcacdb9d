"""Weight-only int8 quantization: fused dequant-matmul Pallas kernel.

Serving on TPU is HBM-bound: each decoded token re-reads every weight
matrix, so the weight stream's byte count IS the latency floor.  Storing
weights as int8 with per-output-channel f32 scales halves the bytes vs
bf16 — but only if the dequantize fuses into the matmul's operand fetch.
XLA materializes ``convert(int8->bf16)`` dot operands through HBM, which
would pay the bf16 stream anyway (plus the int8 read); this kernel instead
dequantizes int8 tiles in VMEM, so HBM only ever sees int8 weights.

Semantics (shared by every backend and the jnp fallback):
    dequant_matmul(x, q, s) == (x @ q.astype(f32)) * s   cast to x.dtype
with f32 accumulation.  int8 values are exactly representable in bf16
(|v| <= 127 < 2^8), so dequantizing tiles to x.dtype before the MXU dot
loses nothing.

Quantization is symmetric per output channel: s[n] = max|w[:, n]| / 127,
q = round(w / s) in [-127, 127].

Dispatch policy mirrors kernels/matmul.py: Pallas on TPU for supported
dtypes and VMEM-fitting K; jnp fallback everywhere else (including the
numpy-oracle parity path in backend/numpy_backend.py, which reimplements
the same arithmetic directly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minidiff_tpu.kernels.matmul import _pallas_enabled

_SUPPORTED_X_DTYPES = (jnp.float32, jnp.bfloat16)

# N-tile width: multiples of the 128-lane minor dim.  256 keeps the int8
# weight tile (K x 256) at 2 MB for K=8192 — comfortably inside VMEM next
# to the activation block and f32 accumulator.
_BN = 256
# Full-K tiles above this would overflow VMEM; larger K falls back to jnp.
_MAX_K = 8192


def quantize_int8(w: jax.Array) -> "tuple[jax.Array, jax.Array]":
    """(K, N) float -> (q int8 (K, N), s f32 (N,)) symmetric per-column."""
    if w.ndim != 2:
        raise ValueError("quantize_int8 expects a 2-D weight matrix")
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _dq_mm_kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(x_ref.dtype)  # exact: int8 range fits bf16 mantissa
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn",))
def _pallas_dequant_matmul(x: jax.Array, q: jax.Array, s: jax.Array,
                           bn: int = _BN) -> jax.Array:
    m, k = x.shape
    _, n = q.shape
    s2 = s.reshape(1, n).astype(jnp.float32)
    return pl.pallas_call(
        _dq_mm_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, q, s2)


def _jnp_dequant_matmul(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    # accumulate at x's precision but never below f32 (bf16 -> f32 like the
    # kernel; f64 stays f64 so the x64 finite-difference oracle holds)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    acc = jax.lax.dot_general(
        x, q.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )
    return (acc * s.astype(acc_dtype)).astype(x.dtype)


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _pallas_eligible(m: int, k: int, n: int, dtype) -> bool:
    if not _pallas_enabled():
        return False
    if dtype not in _SUPPORTED_X_DTYPES:
        return False
    # The fused tile dequant pays off when the weight stream dominates,
    # i.e. few activation rows per weight read (decode / small-batch
    # serving).  Large-M prefill is compute-bound; XLA's MXU pipeline with
    # a one-off dequantized operand wins there.
    if m > 256:
        return False
    return k <= _MAX_K and k % 128 == 0 and n % _BN == 0


def dequant_matmul(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """x (..., K) float @ q (K, N) int8 scaled by s (N,) -> (..., N)."""
    if q.ndim != 2:
        raise ValueError("dequant_matmul expects a 2-D int8 weight")
    if x.shape[-1] != q.shape[0]:
        raise ValueError(
            f"dequant_matmul: x contracts {x.shape[-1]}, weight has "
            f"{q.shape[0]} rows")
    k, n = q.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= int(d)
    if not _pallas_eligible(m, k, n, x.dtype):
        return _jnp_dequant_matmul(x, q, s)
    x2 = x.reshape(m, k)
    sub = _sublane(x.dtype)
    mp = -(-m // sub) * sub
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    out = _pallas_dequant_matmul(x2, q, s)
    if mp != m:
        out = out[:m]
    return out.reshape(lead + (n,))
