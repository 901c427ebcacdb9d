"""Fused LayerNorm Pallas kernels (forward + first-order backward).

LayerNorm is the train step's non-matmul HBM hotspot (VERDICT r1 item 1:
"fuse the non-attention residual").  Composed under XLA, the forward is a
reduce fusion plus an elementwise fusion — x crosses HBM at least twice —
and the backward re-reads x/dy across several fusions.  Each kernel here
makes exactly ONE pass: a row block of x (and dy) loads into VMEM, the
row statistics are computed in registers, and the output leaves — x is
read once per pass, period.

Semantics (shared by the jnp fallback, the numpy/torch backends, and the
composed framework-ops VJP in ops/definitions.py):

    acc = f32 if x is sub-f32 (bf16/f16) else x.dtype
    mu  = mean(x, -1);  var = mean((x-mu)^2, -1)      # biased, in acc
    y   = (x-mu) * rsqrt(var+eps) * g + b             # cast back to x.dtype

Backward (dy, same shape as x) closed form with xhat=(x-mu)*rsqrt(var+eps),
w = dy*g:
    dx = (w - mean(w) - xhat * mean(w*xhat)) * rsqrt(var+eps)
    dg = sum_rows(dy * xhat);  db = sum_rows(dy)

Dispatch policy mirrors kernels/attention.py: on TPU an autotuned race
(chained in-trace unrolls, >=8% win margin — see matmul._autotune_eager
for why) decides fused-vs-composed per (rows, dim, dtype); everywhere
else the jnp fallback runs.  No reference counterpart (/root/reference
has no kernels); extends SURVEY §7 step 8's "elementwise chains" row.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from minidiff_tpu.kernels.matmul import _pallas_enabled

_SUPPORTED_DTYPES = (jnp.float32, jnp.bfloat16)
# widest row block whose f32 working set stays inside the ~16 MB scoped
# VMEM stack: the BACKWARD kernel holds ~6 f32 tiles (x, dy, xc, xhat, w,
# dx) plus staging, so a 2 MB tile cap overflowed by 476 KB at
# (8192, 1024) f32 on v5e (caught by tests_tpu/ the day it was written);
# 1 MB keeps the worst case near 8 MB.  Actual block = largest
# power-of-two divisor of R under this.
_MAX_BLOCK_BYTES = 1024 * 1024
_MAX_D = 8192


def _acc_dtype(dt):
    dt = jnp.dtype(dt)
    return dt if dt in (jnp.float64, jnp.float32) else jnp.float32


def _row_block(r: int, d: int) -> int:
    cap = max(8, _MAX_BLOCK_BYTES // (4 * d))
    br = 8
    for cand in (16, 32, 64, 128, 256, 512, 1024):
        if cand > cap or r % cand:
            break
        br = cand
    return br


def _eligible(r: int, d: int, dtype) -> bool:
    return (jnp.dtype(dtype) in _SUPPORTED_DTYPES
            and d % 128 == 0 and d <= _MAX_D and r % 8 == 0)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _stats(x, eps):
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    return xc, jax.lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    xc, rsig = _stats(x, eps)
    y = xc * rsig * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _rms_fwd_kernel(x_ref, g_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    rsig = jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + eps)
    o_ref[:] = (x * rsig * g_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _pad_partial(row):
    """(1, d) f32 partial -> (8, d) block, data in row 0, rows 1-7 zero.

    Mosaic requires the second-to-last block dim be divisible by 8 (the f32
    sublane) or equal to the array dim; a (1, d) block over a (grid, d)
    partials array is neither once grid > 1 — the exact lowering failure
    VERDICT r2 found shipped (ln/rms bwd never ran fused on real TPU).
    Padding each partial to a full sublane tile keeps the grid parallel and
    costs 7 dead rows per block; the caller sums over axis 0, which folds
    the zeros away.
    """
    return jnp.concatenate(
        [row, jnp.zeros((7, row.shape[1]), row.dtype)], axis=0)


def _rms_bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    rsig = jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + eps)
    xhat = x * rsig
    w = dy * g_ref[:].astype(jnp.float32)
    m = jnp.mean(w * xhat, axis=1, keepdims=True)
    dx_ref[:] = ((w - xhat * m) * rsig).astype(dx_ref.dtype)
    dg_ref[:] = _pad_partial(jnp.sum(dy * xhat, axis=0, keepdims=True))


def _addln_fwd_kernel(x_ref, a_ref, g_ref, b_ref, o_ref, *, eps):
    """Fused residual-add + LayerNorm: o[0] = x + a, o[1] = LN(x + a).

    The residual stream crosses HBM once instead of twice (the separate
    add kernel's write of t plus this kernel's read of it); t is emitted
    because downstream residuals consume it.  t is formed in the MODEL
    dtype before the f32 stats cast, so both outputs are bitwise equal to
    the unfused add -> layernorm pipeline.
    """
    t = x_ref[:] + a_ref[:]
    o_ref[0] = t
    xf = t.astype(jnp.float32)
    xc, rsig = _stats(xf, eps)
    y = xc * rsig * g_ref[:].astype(jnp.float32) + b_ref[:].astype(
        jnp.float32)
    o_ref[1] = y.astype(o_ref.dtype)


def _addrms_fwd_kernel(x_ref, a_ref, g_ref, o_ref, *, eps):
    t = x_ref[:] + a_ref[:]
    o_ref[0] = t
    xf = t.astype(jnp.float32)
    rsig = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    o_ref[1] = (xf * rsig * g_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _addln_bwd_kernel(x_ref, g_ref, dy_ref, g0_ref, dx_ref, dg_ref, db_ref,
                      *, eps, nd):
    """_bwd_kernel + the residual cotangent: dx = LN_dx(t, dy) + g0 in one
    pass (g0 = the stream gradient arriving from downstream uses of t),
    saving the separate elementwise-add kernel's read+write of the
    stream."""
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    xc, rsig = _stats(x, eps)
    xhat = xc * rsig
    w = dy * g_ref[:].astype(jnp.float32)
    m1 = jnp.sum(w, axis=1, keepdims=True) * nd
    m2 = jnp.sum(w * xhat, axis=1, keepdims=True) * nd
    dxln = ((w - m1 - xhat * m2) * rsig).astype(dx_ref.dtype)
    dx_ref[:] = dxln + g0_ref[:]
    dg_ref[:] = _pad_partial(jnp.sum(dy * xhat, axis=0, keepdims=True))
    db_ref[:] = _pad_partial(jnp.sum(dy, axis=0, keepdims=True))


def _addrms_bwd_kernel(x_ref, g_ref, dy_ref, g0_ref, dx_ref, dg_ref,
                       *, eps):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    rsig = jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + eps)
    xhat = x * rsig
    w = dy * g_ref[:].astype(jnp.float32)
    m = jnp.mean(w * xhat, axis=1, keepdims=True)
    dxln = ((w - xhat * m) * rsig).astype(dx_ref.dtype)
    dx_ref[:] = dxln + g0_ref[:]
    dg_ref[:] = _pad_partial(jnp.sum(dy * xhat, axis=0, keepdims=True))


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *, eps, nd):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    xc, rsig = _stats(x, eps)
    xhat = xc * rsig
    w = dy * g_ref[:].astype(jnp.float32)
    m1 = jnp.sum(w, axis=1, keepdims=True) * nd
    m2 = jnp.sum(w * xhat, axis=1, keepdims=True) * nd
    dx_ref[:] = ((w - m1 - xhat * m2) * rsig).astype(dx_ref.dtype)
    # per-row-block partials, sublane-padded; the caller sums the strips
    dg_ref[:] = _pad_partial(jnp.sum(dy * xhat, axis=0, keepdims=True))
    db_ref[:] = _pad_partial(jnp.sum(dy, axis=0, keepdims=True))


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_ln_fwd(x2, g, b, eps: float, br: int, interpret: bool = False):
    r, d = x2.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((r, d), x2.dtype),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, g.reshape(1, d), b.reshape(1, d))


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_ln_bwd(x2, g, dy2, eps: float, br: int, interpret: bool = False):
    r, d = x2.shape
    grid = r // br
    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, nd=1.0 / d),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x2, g.reshape(1, d), dy2)
    return dx, jnp.sum(dgp, axis=0), jnp.sum(dbp, axis=0)


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_addln_fwd(x2, a2, g, b, eps: float, br: int,
                      interpret: bool = False):
    """(2, r, d): row 0 = x + a (the residual stream), row 1 = LN(x + a)."""
    r, d = x2.shape
    return pl.pallas_call(
        functools.partial(_addln_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((2, r, d), x2.dtype),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, br, d), lambda i: (0, i, 0)),
        interpret=interpret,
    )(x2, a2, g.reshape(1, d), b.reshape(1, d))


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_addrms_fwd(x2, a2, g, eps: float, br: int,
                       interpret: bool = False):
    r, d = x2.shape
    return pl.pallas_call(
        functools.partial(_addrms_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((2, r, d), x2.dtype),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, br, d), lambda i: (0, i, 0)),
        interpret=interpret,
    )(x2, a2, g.reshape(1, d))


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_addln_bwd(x2, g, dy2, g02, eps: float, br: int,
                      interpret: bool = False):
    r, d = x2.shape
    grid = r // br
    dx, dgp, dbp = pl.pallas_call(
        functools.partial(_addln_bwd_kernel, eps=eps, nd=1.0 / d),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x2, g.reshape(1, d), dy2, g02)
    return dx, jnp.sum(dgp, axis=0), jnp.sum(dbp, axis=0)


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_addrms_bwd(x2, g, dy2, g02, eps: float, br: int,
                       interpret: bool = False):
    r, d = x2.shape
    grid = r // br
    dx, dgp = pl.pallas_call(
        functools.partial(_addrms_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x2, g.reshape(1, d), dy2, g02)
    return dx, jnp.sum(dgp, axis=0)


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_rms_fwd(x2, g, eps: float, br: int, interpret: bool = False):
    r, d = x2.shape
    return pl.pallas_call(
        functools.partial(_rms_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((r, d), x2.dtype),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, g.reshape(1, d))


@functools.partial(jax.jit, static_argnames=("eps", "br", "interpret"))
def _pallas_rms_bwd(x2, g, dy2, eps: float, br: int, interpret: bool = False):
    r, d = x2.shape
    grid = r // br
    dx, dgp = pl.pallas_call(
        functools.partial(_rms_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2.dtype),
            jax.ShapeDtypeStruct((grid * 8, d), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((8, d), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x2, g.reshape(1, d), dy2)
    return dx, jnp.sum(dgp, axis=0)


# ---------------------------------------------------------------------------
# jnp fallback (the semantics contract; also the composed race baseline)
# ---------------------------------------------------------------------------


def _jnp_layernorm(x, g, b, eps: float):
    acc = _acc_dtype(x.dtype)
    xa = x.astype(acc)
    mu = jnp.mean(xa, axis=-1, keepdims=True)
    xc = xa - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + jnp.asarray(eps, acc))
    return (y * g.astype(acc) + b.astype(acc)).astype(x.dtype)


def _jnp_rmsnorm(x, g, eps: float):
    acc = _acc_dtype(x.dtype)
    xa = x.astype(acc)
    rsig = jax.lax.rsqrt(
        jnp.mean(xa * xa, axis=-1, keepdims=True) + jnp.asarray(eps, acc))
    return (xa * rsig * g.astype(acc)).astype(x.dtype)


def _jnp_rms_grads(x, g, dy, eps: float):
    acc = _acc_dtype(x.dtype)
    xa = x.astype(acc)
    rsig = jax.lax.rsqrt(
        jnp.mean(xa * xa, axis=-1, keepdims=True) + jnp.asarray(eps, acc))
    xhat = xa * rsig
    w = dy.astype(acc) * g.astype(acc)
    m = jnp.mean(w * xhat, axis=-1, keepdims=True)
    dx = ((w - xhat * m) * rsig).astype(x.dtype)
    red = tuple(range(x.ndim - 1))
    dg = jnp.sum(dy.astype(acc) * xhat, axis=red).astype(g.dtype)
    return dx, dg


def _jnp_ln_grads(x, g, dy, eps: float):
    acc = _acc_dtype(x.dtype)
    xa = x.astype(acc)
    mu = jnp.mean(xa, axis=-1, keepdims=True)
    xc = xa - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + jnp.asarray(eps, acc))
    xhat = xc * rsig
    w = dy.astype(acc) * g.astype(acc)
    m1 = jnp.mean(w, axis=-1, keepdims=True)
    m2 = jnp.mean(w * xhat, axis=-1, keepdims=True)
    dx = ((w - m1 - xhat * m2) * rsig).astype(x.dtype)
    red = tuple(range(x.ndim - 1))
    dg = jnp.sum(dy.astype(acc) * xhat, axis=red).astype(g.dtype)
    db = jnp.sum(dy.astype(acc), axis=red).astype(g.dtype)
    return dx, dg, db


# ---------------------------------------------------------------------------
# autotuned dispatch
# ---------------------------------------------------------------------------

_ln_cache: dict = {}


def _ln_autotune(r: int, d: int, dtype, eps: float,
                 kind: str = "ln") -> bool:
    """True iff the fused kernels beat the composed XLA fwd+bwd by >8%."""
    import numpy as np

    from minidiff_tpu.kernels.matmul import (
        _measure_pull_latency,
        time_device_chain,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((r, d)), dtype)
    dy = jnp.asarray(rng.standard_normal((r, d)), dtype)
    g = jnp.asarray(rng.standard_normal((d,)), dtype)
    b = jnp.asarray(rng.standard_normal((d,)), dtype)
    br = _row_block(r, d)
    lat = _measure_pull_latency(x)

    def _chain(core, unroll):
        @jax.jit
        def step(carry):
            xx, fb = carry
            for _ in range(unroll):
                xp = xx * (jnp.asarray(1.0, jnp.float32) + fb).astype(xx.dtype)
                out = core(xp)
                fb = sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(out)
                ) * jnp.asarray(1e-30, jnp.float32)
            return xx, fb

        return step

    import time as _time

    def _race(core):
        step1 = _chain(core, 1)
        carry0 = (x, jnp.zeros((), jnp.float32))
        out = step1(carry0)
        float(out[-1])
        t0 = _time.perf_counter()
        out = carry0
        for _ in range(4):
            out = step1(out)
        float(out[-1])
        per_est = max((_time.perf_counter() - t0 - lat) / 4, 1e-6)
        unroll = max(1, min(64, int(4e-3 / per_est) + 1))
        step = step1 if unroll == 1 else _chain(core, unroll)
        if unroll > 1:
            out = step(carry0)
            float(out[-1])
        return time_device_chain(step, carry0, lat) / unroll

    # composed: ONE value_and_grad executable (fwd+bwd), same as real use
    if kind == "ln":
        comp = jax.value_and_grad(
            lambda xx, gg, bb: jnp.sum(
                _jnp_layernorm(xx, gg, bb, eps).astype(jnp.float32)
                * dy.astype(jnp.float32)),
            argnums=(0, 1, 2),
        )
        t_comp = _race(lambda xp: comp(xp, g, b))

        def fused(xp):
            y = _pallas_ln_fwd(xp, g, b, eps, br)
            return (y,) + _pallas_ln_bwd(xp, g, dy, eps, br)
    else:
        comp = jax.value_and_grad(
            lambda xx, gg: jnp.sum(
                _jnp_rmsnorm(xx, gg, eps).astype(jnp.float32)
                * dy.astype(jnp.float32)),
            argnums=(0, 1),
        )
        t_comp = _race(lambda xp: comp(xp, g))

        def fused(xp):
            y = _pallas_rms_fwd(xp, g, eps, br)
            return (y,) + _pallas_rms_bwd(xp, g, dy, eps, br)

    try:
        t_fused = _race(fused)
    except Exception as e:
        # _eligible() pre-screened shapes, so a compile failure here is a
        # lowering BUG, not a race loss — surface it (VERDICT r2: this
        # except silently hid a never-lowers backward for a full round)
        from minidiff_tpu.kernels.matmul import report_kernel_failure

        report_kernel_failure(
            f"{kind}-fused", (r, d, str(jnp.dtype(dtype))), e)
        return False
    return t_fused < 0.92 * t_comp


def _ln_decision(r: int, d: int, dtype, eps: float,
                 kind: str = "ln") -> bool:
    if not (_pallas_enabled() and _eligible(r, d, dtype)):
        return False
    key = (kind, r, d, str(jnp.dtype(dtype)), float(eps))
    if key not in _ln_cache:
        if _os.environ.get("MINIDIFF_TPU_AUTOTUNE", "1") == "0":
            _ln_cache[key] = True
        else:
            from minidiff_tpu.kernels import tunecache
            from minidiff_tpu.kernels.matmul import (
                KernelLoweringError,
                run_outside_trace,
            )

            hit, dec = tunecache.lookup("layernorm", key)
            if not hit:
                try:
                    dec = run_outside_trace(
                        lambda: _ln_autotune(r, d, dtype, eps, kind))
                    tunecache.record("layernorm", key, dec)
                except KernelLoweringError:
                    raise  # strict mode: a compile failure must stay loud
                except Exception:
                    # transient race failure (OOM, tunnel hiccup): fall
                    # back in-process only — never pin it to disk
                    dec = False
            _ln_cache[key] = dec
    return _ln_cache[key]


def _rows(shape) -> int:
    r = 1
    for s in shape[:-1]:
        r *= int(s)
    return r


def layernorm(x, g, b, eps: float = 1e-5):
    """Last-axis LayerNorm; fused Pallas on TPU when the race says so."""
    d = x.shape[-1]
    r = _rows(x.shape)
    if _ln_decision(r, d, x.dtype, float(eps)):
        y = _pallas_ln_fwd(x.reshape(r, d), g, b, float(eps),
                           _row_block(r, d))
        return y.reshape(x.shape)
    return _jnp_layernorm(x, g, b, float(eps))


def ln_grads(x, g, dy, eps: float = 1e-5):
    """(dx, dg, db) in one fused pass on TPU when the race says so."""
    d = x.shape[-1]
    r = _rows(x.shape)
    if _ln_decision(r, d, x.dtype, float(eps)):
        dx, dg, db = _pallas_ln_bwd(
            x.reshape(r, d), g, dy.reshape(r, d), float(eps),
            _row_block(r, d))
        return dx.reshape(x.shape), dg.astype(g.dtype), db.astype(g.dtype)
    return _jnp_ln_grads(x, g, dy, float(eps))


def rmsnorm(x, g, eps: float = 1e-6):
    """Last-axis RMSNorm; fused Pallas on TPU when the race says so."""
    d = x.shape[-1]
    r = _rows(x.shape)
    if _ln_decision(r, d, x.dtype, float(eps), kind="rms"):
        y = _pallas_rms_fwd(x.reshape(r, d), g, float(eps),
                            _row_block(r, d))
        return y.reshape(x.shape)
    return _jnp_rmsnorm(x, g, float(eps))


def rms_grads(x, g, dy, eps: float = 1e-6):
    """(dx, dg) in one fused pass on TPU when the race says so."""
    d = x.shape[-1]
    r = _rows(x.shape)
    if _ln_decision(r, d, x.dtype, float(eps), kind="rms"):
        dx, dg = _pallas_rms_bwd(
            x.reshape(r, d), g, dy.reshape(r, d), float(eps),
            _row_block(r, d))
        return dx.reshape(x.shape), dg.astype(g.dtype)
    return _jnp_rms_grads(x, g, dy, float(eps))


# ---------------------------------------------------------------------------
# fused residual-add + norm (VERDICT r4 item 3): t = x + a crosses HBM once
# ---------------------------------------------------------------------------


def add_layernorm(x, a, g, b, eps: float = 1e-5):
    """Stacked (2, *x.shape): [0] = x + a, [1] = LN(x + a).

    Reuses the plain-LN race decision for the same (rows, dim, dtype) key —
    the added elementwise work is far below the race margin, so a separate
    race would just re-measure the same verdict.
    """
    d = x.shape[-1]
    r = _rows(x.shape)
    if _ln_decision(r, d, x.dtype, float(eps)):
        out = _pallas_addln_fwd(x.reshape(r, d), a.reshape(r, d), g, b,
                                float(eps), _row_block(r, d))
        return out.reshape((2,) + x.shape)
    t = x + a
    return jnp.stack([t, _jnp_layernorm(t, g, b, float(eps))])


def addln_grads(t, g, dy, g0, eps: float = 1e-5):
    """(dx, dg, db) for the fused add+LN: dx = LN_dx(t, dy) + g0 in one
    pass (dx doubles as da — the residual add routes the same cotangent to
    both inputs)."""
    d = t.shape[-1]
    r = _rows(t.shape)
    if _ln_decision(r, d, t.dtype, float(eps)):
        dx, dg, db = _pallas_addln_bwd(
            t.reshape(r, d), g, dy.reshape(r, d), g0.reshape(r, d),
            float(eps), _row_block(r, d))
        return dx.reshape(t.shape), dg.astype(g.dtype), db.astype(g.dtype)
    dx, dg, db = _jnp_ln_grads(t, g, dy, float(eps))
    return dx + g0, dg, db


def add_rmsnorm(x, a, g, eps: float = 1e-6):
    """Stacked (2, *x.shape): [0] = x + a, [1] = RMSNorm(x + a)."""
    d = x.shape[-1]
    r = _rows(x.shape)
    if _ln_decision(r, d, x.dtype, float(eps), kind="rms"):
        out = _pallas_addrms_fwd(x.reshape(r, d), a.reshape(r, d), g,
                                 float(eps), _row_block(r, d))
        return out.reshape((2,) + x.shape)
    t = x + a
    return jnp.stack([t, _jnp_rmsnorm(t, g, float(eps))])


def addrms_grads(t, g, dy, g0, eps: float = 1e-6):
    """(dx, dg) for the fused add+RMSNorm (dx doubles as da)."""
    d = t.shape[-1]
    r = _rows(t.shape)
    if _ln_decision(r, d, t.dtype, float(eps), kind="rms"):
        dx, dg = _pallas_addrms_bwd(
            t.reshape(r, d), g, dy.reshape(r, d), g0.reshape(r, d),
            float(eps), _row_block(r, d))
        return dx.reshape(t.shape), dg.astype(g.dtype)
    dx, dg = _jnp_rms_grads(t, g, dy, float(eps))
    return dx + g0, dg


# Decision-relevant sources for the persistent tune cache (see
# tunecache._fingerprint): the fused kernels + the row-block/eligibility
# logic a recorded verdict depends on.
TUNE_FINGERPRINT_SOURCES = (
    _fwd_kernel, _rms_fwd_kernel, _bwd_kernel, _rms_bwd_kernel,
    _addln_fwd_kernel, _addrms_fwd_kernel, _addln_bwd_kernel,
    _addrms_bwd_kernel,
    _pallas_ln_fwd, _pallas_ln_bwd, _pallas_rms_fwd, _pallas_rms_bwd,
    _row_block, _eligible, _pad_partial,
)
