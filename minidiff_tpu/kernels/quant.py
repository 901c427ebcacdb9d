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


# ---------------------------------------------------------------------------
# int8 KV cache: fused masked decode attention
# ---------------------------------------------------------------------------
#
# Cache rows are quantized per (batch, kv-head, position) over head_dim, so
# both attention contractions absorb the scales outside the int8 dots:
#     scores[i, l] = (q_i . K8_l) * sK_l * scale   (scale per KEY row)
#     out[i, d]    = ((p_i * sV) . V8)[d]          (scales folded into probs)
# HBM sees int8 cache lines only; dequantization happens on VMEM tiles.
# The jnp fallback computes the same algebra (used off-TPU and as the
# oracle for the kernel's interpret-mode tests).


def quantize_int8_rows(x: jax.Array):
    """(..., hd) float -> (q int8 same shape, s f32 (...,)) per-row."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _make_sdpa_int8_kernel(c: int, scale: float):
    def kernel(pos_ref, q_ref, k8_ref, ks_ref, v8_ref, vs_ref, o_ref):
        gc, hd = q_ref.shape[2], q_ref.shape[3]
        L = k8_ref.shape[2]
        b = pl.program_id(0)
        q = q_ref[0, 0]                                # (gc, hd)
        k = k8_ref[0, 0].astype(q.dtype)               # (L, hd) exact
        sk = ks_ref[0, 0, 0].astype(jnp.float32)       # (L,)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (sk[None, :] * scale)                      # (gc, L)
        # q rows are (head-in-group, chunk) pairs laid out gi*c + i: key l
        # is visible to chunk position i iff l <= pos_b + i
        row_i = jax.lax.broadcasted_iota(jnp.int32, (gc, L), 0) % c
        col_l = jax.lax.broadcasted_iota(jnp.int32, (gc, L), 1)
        visible = col_l <= pos_ref[b] + row_i
        scores = jnp.where(visible, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)     # (gc, L) f32
        sv = vs_ref[0, 0, 0].astype(jnp.float32)       # (L,)
        pv = (p * sv[None, :]).astype(q.dtype)
        v = v8_ref[0, 0].astype(q.dtype)               # (L, hd)
        o_ref[0, 0] = jnp.dot(
            pv, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return kernel


def _pallas_sdpa_int8(q, k8, ks, v8, vs, pos, c: int, scale: float,
                      interpret: bool = False):
    """q (B, kv, g*c, hd); k8/v8 (B, kv, L, hd) int8; ks/vs (B, kv, L) f32;
    pos (B,) int32.  One grid cell per (batch, kv-head).

    The scale rows ride as (B, kv, 1, L) with (1, 1, 1, L) blocks: a
    (1, 1, L) block over (B, kv, L) puts a size-1 second-to-last block dim
    against an array dim of kv, which Mosaic refuses for kv > 1 (the
    VERDICT r2 bench crash); inserting the singleton axis makes the block
    dim EQUAL the array dim, which always lowers.
    """
    bq, kv, gc, hd = q.shape
    L = k8.shape[2]
    ks4 = ks.reshape(bq, kv, 1, L)
    vs4 = vs.reshape(bq, kv, 1, L)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bq, kv),
        in_specs=[
            pl.BlockSpec((1, 1, gc, hd), lambda b, h, pos: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda b, h, pos: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), lambda b, h, pos: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, hd), lambda b, h, pos: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, L), lambda b, h, pos: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gc, hd), lambda b, h, pos: (b, h, 0, 0)),
    )
    return pl.pallas_call(
        _make_sdpa_int8_kernel(c, scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bq, kv, gc, hd), q.dtype),
        interpret=interpret,
    )(pos.astype(jnp.int32), q, k8, ks4, v8, vs4)


def _jnp_sdpa_int8(q, k8, ks, v8, vs, pos, c: int, scale: float):
    """Reference algebra on jnp arrays; same shapes as _pallas_sdpa_int8."""
    bq, kv, gc, hd = q.shape
    L = k8.shape[2]
    scores = jax.lax.dot_general(
        q, k8.astype(q.dtype),
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) * (ks[:, :, None, :].astype(jnp.float32) * scale)  # (B, kv, gc, L)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (gc, L), 0) % c
    col_l = jax.lax.broadcasted_iota(jnp.int32, (gc, L), 1)
    visible = (col_l[None, None] <=
               pos.astype(jnp.int32)[:, None, None, None] + row_i[None, None])
    scores = jnp.where(visible, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    pv = (p * vs[:, :, None, :].astype(jnp.float32)).astype(q.dtype)
    return jax.lax.dot_general(
        pv, v8.astype(q.dtype),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def sdpa_int8_cache(q, k8, ks, v8, vs, pos, scale=None):
    """Masked attention over an int8-quantized KV cache (serving path).

    q (B, h, c, hd) with h a multiple of the cache's kv heads; k8/v8
    (B, kv, L, hd) int8; ks/vs (B, kv, L) f32 per-row scales; pos (B,)
    int32 — key l is visible to chunk position i iff l <= pos + i.
    The chunk size c is q.shape[2].  Returns (B, h, c, hd) in q.dtype.
    """
    bq, h, c, hd = q.shape
    kv = k8.shape[1]
    g = h // kv
    scale = float(scale) if scale is not None else 1.0 / (hd ** 0.5)
    qg = q.reshape(bq, kv, g * c, hd)
    if (_pallas_enabled() and q.dtype in _SUPPORTED_X_DTYPES
            and k8.shape[2] % 128 == 0 and hd % 128 == 0):
        out = _pallas_sdpa_int8(qg, k8, ks, v8, vs, pos, c, scale)
    else:
        out = _jnp_sdpa_int8(qg, k8, ks, v8, vs, pos, c, scale)
    return out.reshape(bq, h, c, hd)


# ---------------------------------------------------------------------------
# Stacked (batched) dequant-matmul: quantized MoE expert banks
# ---------------------------------------------------------------------------
#
# MoE serving moves the weight problem from one matrix to a BANK: every
# decode step streams all E experts' FFN weights (the tokens routed to
# each expert contract against that expert's slice), so the expert bank
# dominates a Mixtral-class model's per-token HBM bytes.  The batched
# kernel runs one grid cell per (expert, N-tile): HBM sees int8 expert
# slices only, dequantized in VMEM against that expert's per-column
# scales, with f32 MXU accumulation — the 2-D dequant_matmul contract
# lifted onto a leading expert axis.


def quantize_int8_stacked(w: jax.Array):
    """(E, K, N) float -> (q int8 (E, K, N), s f32 (E, N)) symmetric
    per (expert, output-column)."""
    if w.ndim != 3:
        raise ValueError("quantize_int8_stacked expects a 3-D weight bank")
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=1)                  # (E, N)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s[:, None, :]), -127, 127).astype(jnp.int8)
    return q, s


def _dq_bmm_kernel(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[0].astype(x_ref.dtype)                      # (K, bn) exact
    acc = jnp.dot(x_ref[0], w, preferred_element_type=jnp.float32)
    o_ref[0] = (acc * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn",))
def _pallas_dequant_bmm(x: jax.Array, q: jax.Array, s: jax.Array,
                        bn: int = _BN) -> jax.Array:
    e, c, k = x.shape
    _, _, n = q.shape
    s3 = s.reshape(e, 1, n).astype(jnp.float32)
    return pl.pallas_call(
        _dq_bmm_kernel,
        out_shape=jax.ShapeDtypeStruct((e, c, n), x.dtype),
        grid=(e, n // bn),
        in_specs=[
            pl.BlockSpec((1, c, k), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, k, bn), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, c, bn), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, q, s3)


def _jnp_dequant_bmm(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    acc = jax.lax.dot_general(
        x, q.astype(x.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc_dtype,
    )
    return (acc * s[:, None, :].astype(acc_dtype)).astype(x.dtype)


def dequant_matmul_bmm(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """x (E, C, K) float @ q (E, K, N) int8 * s (E, N) -> (E, C, N)."""
    if x.ndim != 3 or q.ndim != 3:
        raise ValueError("dequant_matmul_bmm expects 3-D x and weight bank")
    if x.shape[0] != q.shape[0] or x.shape[2] != q.shape[1]:
        raise ValueError(
            f"dequant_matmul_bmm: x {x.shape} vs bank {q.shape}")
    e, c, k = x.shape
    n = q.shape[2]
    if not _pallas_eligible(c, k, n, x.dtype):
        return _jnp_dequant_bmm(x, q, s)
    sub = _sublane(x.dtype)
    cp = -(-c // sub) * sub
    xp = x if cp == c else jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    out = _pallas_dequant_bmm(xp, q, s)
    return out if cp == c else out[:, :c]


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


# ---------------------------------------------------------------------------
# int4 weight-only: packed nibbles + group-wise scales
# ---------------------------------------------------------------------------
#
# int8 halves the weight stream; int4 halves it AGAIN.  4-bit symmetric
# quantization needs finer scale granularity than per-column to hold
# accuracy, so scales are per (K-group, column) with group size G (default
# 128, the GPTQ convention).  Two weight rows pack into one int8 byte
# SPLIT-HALF: packed[i] holds original rows i (low nibble) and i + K/2
# (high nibble), so each nibble plane is a contiguous block of original
# rows and the kernel's dot can SPLIT over them with no relayout.
#
# v5e ROOFLINE (measured, round 4): the unpack must run in i32 vector
# lanes (Mosaic cannot legalize int8-domain shifts — 'arith.shrsi' on i8
# fails to lower), costing ~8-10 VPU ops per packed byte ≈ 390 GB/s of
# effective unpack throughput — almost exactly the ~820 GB/s HBM rate of
# the int8 kernel's half-size... i.e. the VPU ceiling lands where int8's
# HBM floor already is.  int4 therefore TIES int8 on decode speed at
# large K/N (1.0-1.1x per kernel after the split-dot rewrite; the
# pre-rewrite concat-based kernel LOST at 0.6-0.8x) and its real win is
# CAPACITY: half the weight HBM residency, which is what lets a model
# fit next to its KV pool.  Beating int8 on speed on this generation
# would need hardware int4/int8-lane shifts or an MXU-side dequant,
# neither of which Mosaic exposes today.

_GROUP4 = 128


def quantize_int4(w: jax.Array, group: int = _GROUP4):
    """(K, N) float -> (packed int8 (K/2, N), s f32 (K/group, N))."""
    if w.ndim != 2:
        raise ValueError("quantize_int4 expects a 2-D weight matrix")
    k, n = w.shape
    if k % 2 or k % group:
        raise ValueError(f"K={k} must be even and divisible by group={group}")
    w32 = w.astype(jnp.float32)
    wg = w32.reshape(k // group, group, n)
    amax = jnp.max(jnp.abs(wg), axis=1)
    s = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w32 / jnp.repeat(s, group, axis=0)), -7, 7)
    q = q.astype(jnp.int32)
    lo, hi = q[: k // 2], q[k // 2:]
    packed = ((hi << 4) | (lo & 0xF)) & 0xFF
    packed = jax.lax.bitcast_convert_type(
        packed.astype(jnp.uint8), jnp.int8)
    return packed, s


def unpack_int4(packed: jax.Array) -> jax.Array:
    """(K/2, N) int8 -> (K, N) int8 in [-7, 7] (split-half layout)."""
    pi = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(pi, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(pi, 24), 28)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _dq4_mm_kernel(x_ref, p_ref, s_ref, o_ref, *, groups, group):
    # Dequantize at x's precision, then MXU dots.  Two design rules, both
    # measured on the v5e (the per-group-partial-dot formulation they
    # replace lost to plain int8 — BENCH_r03 decode_int4 = 0.86x):
    # * NO concat of the lo/hi nibble planes: an axis-0 concatenate of
    #   (K/2, bn) tiles is a sublane relayout pass over the whole tile;
    #   instead the dot SPLITS — x's first K/2 columns contract with the
    #   lo plane, the rest with the hi plane (split-half packing makes
    #   those exactly the original rows).
    # * hi nibble by ONE arithmetic shift (sign extends), lo by the
    #   shift-up/shift-down pair.
    # int4 values are exact in bf16; the f32 group scale rounds once into
    # x.dtype, indistinguishable next to the 4-bit quantization error and
    # matching the numpy/torch backends' algebra.
    pi = p_ref[:].astype(jnp.int32)                 # (K/2, bn)
    hi = jnp.right_shift(pi, 4)
    lo = jnp.right_shift(jnp.left_shift(pi, 28), 28)
    g2 = groups // 2
    bn = pi.shape[-1]
    k2 = pi.shape[0]
    sw = s_ref[:]                                   # (G, bn) f32
    w_lo = (lo.reshape(g2, group, bn).astype(jnp.float32)
            * sw[:g2].reshape(g2, 1, bn)).astype(
        x_ref.dtype).reshape(k2, bn)
    w_hi = (hi.reshape(g2, group, bn).astype(jnp.float32)
            * sw[g2:].reshape(g2, 1, bn)).astype(
        x_ref.dtype).reshape(k2, bn)
    x = x_ref[:]
    acc = jnp.dot(x[:, :k2], w_lo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x[:, k2:], w_hi,
                        preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bn", "group", "interpret"))
def _pallas_dequant_matmul4(x: jax.Array, p: jax.Array, s: jax.Array,
                            bn: int = _BN, group: int = _GROUP4,
                            interpret: bool = False) -> jax.Array:
    m, k = x.shape
    _, n = p.shape
    groups = k // group
    return pl.pallas_call(
        functools.partial(_dq4_mm_kernel, groups=groups, group=group),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0)),
            pl.BlockSpec((k // 2, bn), lambda j: (0, j)),
            pl.BlockSpec((groups, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x, p, s.astype(jnp.float32))


def _jnp_dequant_matmul4(x: jax.Array, p: jax.Array,
                         s: jax.Array) -> jax.Array:
    # same algebra as the Pallas kernel and the numpy/torch backends:
    # dequantize the weight at (at least) f32, cast to x's dtype, one dot
    k = 2 * p.shape[0]
    groups = s.shape[0]
    group = k // groups
    q = unpack_int4(p)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    w = (q.reshape(groups, group, q.shape[-1]).astype(acc_dtype)
         * s.astype(acc_dtype)[:, None, :]).reshape(k, -1).astype(x.dtype)
    out = jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)
    return out.astype(x.dtype)


def dequant_matmul4(x: jax.Array, p: jax.Array, s: jax.Array) -> jax.Array:
    """x (..., K) @ unpack4(p (K/2, N)) * s (K/G, N) -> (..., N)."""
    k = 2 * p.shape[0]
    n = p.shape[1]
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= int(d)
    group = k // s.shape[0]
    # the split-dot kernel needs each nibble plane to hold whole groups:
    # (K/2) % group == 0 (equivalently an even group count)
    if (_pallas_eligible(m, k, n, x.dtype) and group % 128 == 0
            and k % group == 0 and (k // 2) % group == 0):
        out = _pallas_dequant_matmul4(x.reshape(m, k), p, s, group=group)
        return out.reshape(lead + (n,))
    return _jnp_dequant_matmul4(x, p, s)
