"""Fused softmax cross-entropy Pallas kernels (forward + backward).

The LM loss block is the train step's last non-matmul HBM consumer
(VERDICT r1 item 1 names it next to LayerNorm): composed under XLA the
forward reads the (rows, V) logits across max/exp-sum/gather fusions and
the backward rebuilds softmax across more.  Each kernel here makes ONE
pass over a row block of logits held in VMEM:

  forward:  loss_r = logsumexp(z_r) - z_r[label_r]   (f32, per row)
  backward: dz_r   = (softmax(z_r) - onehot(label_r)) * g_r

The label gather/scatter is an iota-compare inside the tile — no
gather/scatter primitive, so it rides the VPU as a masked reduction.

Dispatch policy mirrors kernels/layernorm.py: autotuned race on TPU per
(rows, V, dtype) with the chained in-trace protocol and an 8% win
margin; jnp fallback (f32 accumulation for sub-f32 logits) is the
semantics contract reimplemented by the numpy/torch backends.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from minidiff_tpu.kernels.matmul import _pallas_enabled

_SUPPORTED_DTYPES = (jnp.float32, jnp.bfloat16)
_MAX_BLOCK_BYTES = 2 * 1024 * 1024
_MAX_V = 65536


def _acc_dtype(dt):
    dt = jnp.dtype(dt)
    return dt if dt in (jnp.float64, jnp.float32) else jnp.float32


def _row_block(r: int, v: int) -> int:
    # rows land on the LANE dim of the (1, rows) loss/label layout, so the
    # block must be a 128-multiple divisor of r
    cap = max(128, _MAX_BLOCK_BYTES // (4 * v))
    br = 128
    for cand in (256, 512, 1024, 2048):
        if cand > cap or r % cand:
            break
        br = cand
    return br


def _eligible(r: int, v: int, dtype) -> bool:
    return (jnp.dtype(dtype) in _SUPPORTED_DTYPES
            and v % 128 == 0 and v <= _MAX_V and r % 128 == 0)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(z_ref, lab_ref, loss_ref):
    z = z_ref[:].astype(jnp.float32)  # (br, V)
    lab = lab_ref[0, :]  # (br,) int32
    m = jnp.max(z, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(z - m), axis=1, keepdims=True)) + m
    iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    zlab = jnp.sum(jnp.where(iota == lab[:, None], z, 0.0), axis=1)
    loss_ref[0, :] = lse[:, 0] - zlab


def _bwd_kernel(z_ref, lab_ref, g_ref, dz_ref):
    z = z_ref[:].astype(jnp.float32)
    lab = lab_ref[0, :]
    g = g_ref[0, :].astype(jnp.float32)  # (br,) upstream per-row cotangent
    m = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    onehot = (iota == lab[:, None]).astype(jnp.float32)
    dz_ref[:] = ((p - onehot) * g[:, None]).astype(dz_ref.dtype)


@functools.partial(jax.jit, static_argnames=("br", "interpret"))
def _pallas_xent_fwd(z2, lab, br: int, interpret: bool = False):
    r, v = z2.shape
    loss = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, r), jnp.float32),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, v), lambda i: (i, 0)),
            pl.BlockSpec((1, br), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, br), lambda i: (0, i)),
        interpret=interpret,
    )(z2, lab.reshape(1, r).astype(jnp.int32))
    return loss[0]


@functools.partial(jax.jit, static_argnames=("br", "interpret"))
def _pallas_xent_bwd(z2, lab, g, br: int, interpret: bool = False):
    r, v = z2.shape
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((r, v), z2.dtype),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, v), lambda i: (i, 0)),
            pl.BlockSpec((1, br), lambda i: (0, i)),
            pl.BlockSpec((1, br), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((br, v), lambda i: (i, 0)),
        interpret=interpret,
    )(z2, lab.reshape(1, r).astype(jnp.int32),
      g.reshape(1, r).astype(jnp.float32))


# ---------------------------------------------------------------------------
# jnp fallback (the semantics contract)
# ---------------------------------------------------------------------------


def _jnp_xent(z, lab):
    acc = _acc_dtype(z.dtype)
    za = z.astype(acc)
    m = jnp.max(za, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(za - m), axis=-1, keepdims=True)) + m
    zlab = jnp.take_along_axis(
        za, lab[..., None].astype(jnp.int32), axis=-1)
    # loss carries the accumulation dtype: f32 for bf16 logits, the input
    # dtype for f32/f64 (so f64 oracle gradchecks keep f64 precision)
    return (lse - zlab)[..., 0]


def _jnp_xent_grad(z, lab, g):
    acc = _acc_dtype(z.dtype)
    za = z.astype(acc)
    m = jnp.max(za, axis=-1, keepdims=True)
    e = jnp.exp(za - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    onehot = (jnp.arange(z.shape[-1], dtype=jnp.int32)
              == lab[..., None].astype(jnp.int32)).astype(acc)
    return ((p - onehot) * g[..., None].astype(acc)).astype(z.dtype)


# ---------------------------------------------------------------------------
# autotuned dispatch
# ---------------------------------------------------------------------------

_xent_cache: dict = {}


def _xent_autotune(r: int, v: int, dtype) -> bool:
    import numpy as np

    from minidiff_tpu.kernels.matmul import (
        _measure_pull_latency,
        time_device_chain,
    )

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.standard_normal((r, v)), dtype)
    lab = jnp.asarray(rng.randint(0, v, r), jnp.int32)
    g = jnp.asarray(rng.standard_normal(r), jnp.float32)
    br = _row_block(r, v)
    lat = _measure_pull_latency(z)

    def _chain(core, unroll):
        @jax.jit
        def step(carry):
            zz, fb = carry
            for _ in range(unroll):
                zp = zz * (jnp.asarray(1.0, jnp.float32) + fb).astype(zz.dtype)
                out = core(zp)
                fb = sum(
                    jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree.leaves(out)
                ) * jnp.asarray(1e-30, jnp.float32)
            return zz, fb

        return step

    import time as _time

    def _race(core):
        step1 = _chain(core, 1)
        carry0 = (z, jnp.zeros((), jnp.float32))
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

    comp = jax.value_and_grad(
        lambda zz: jnp.sum(_jnp_xent(zz, lab) * g))
    t_comp = _race(comp)

    def fused(zp):
        return (_pallas_xent_fwd(zp, lab, br),
                _pallas_xent_bwd(zp, lab, g, br))

    try:
        t_fused = _race(fused)
    except Exception as e:
        # shapes were pre-screened by _eligible: a compile failure is a
        # lowering bug, not a race loss — surface it
        from minidiff_tpu.kernels.matmul import report_kernel_failure

        report_kernel_failure("xent-fused", (r, v, str(jnp.dtype(dtype))), e)
        return False
    return t_fused < 0.92 * t_comp


def _xent_decision(r: int, v: int, dtype) -> bool:
    if not (_pallas_enabled() and _eligible(r, v, dtype)):
        return False
    key = (r, v, str(jnp.dtype(dtype)))
    if key not in _xent_cache:
        if _os.environ.get("MINIDIFF_TPU_AUTOTUNE", "1") == "0":
            _xent_cache[key] = True
        else:
            from minidiff_tpu.kernels import tunecache
            from minidiff_tpu.kernels.matmul import (
                KernelLoweringError,
                run_outside_trace,
            )

            hit, dec = tunecache.lookup("xent", key)
            if not hit:
                try:
                    dec = run_outside_trace(
                        lambda: _xent_autotune(r, v, dtype))
                    tunecache.record("xent", key, dec)
                except KernelLoweringError:
                    raise  # strict mode: a compile failure must stay loud
                except Exception:
                    # transient race failure: in-process fallback only
                    dec = False
            _xent_cache[key] = dec
    return _xent_cache[key]


def _rows(shape) -> int:
    r = 1
    for s in shape[:-1]:
        r *= int(s)
    return r


def softmax_xent(z, lab):
    """Per-row loss (labels' shape), f32; fused Pallas when the race says
    so.  ``z`` (..., V) logits, ``lab`` (...) int class ids."""
    v = z.shape[-1]
    r = _rows(z.shape)
    if _xent_decision(r, v, z.dtype):
        loss = _pallas_xent_fwd(z.reshape(r, v), lab.reshape(r),
                                _row_block(r, v))
        return loss.reshape(z.shape[:-1])
    return _jnp_xent(z, lab)


def xent_grad(z, lab, g):
    """dz for softmax_xent in one fused pass when the race says so."""
    v = z.shape[-1]
    r = _rows(z.shape)
    if _xent_decision(r, v, z.dtype):
        dz = _pallas_xent_bwd(z.reshape(r, v), lab.reshape(r),
                              g.reshape(r), _row_block(r, v))
        return dz.reshape(z.shape)
    return _jnp_xent_grad(z, lab, g)


# Decision-relevant sources for the persistent tune cache (see
# tunecache._fingerprint).
TUNE_FINGERPRINT_SOURCES = (
    _fwd_kernel, _bwd_kernel, _pallas_xent_fwd, _pallas_xent_bwd,
    _row_block, _eligible,
)
