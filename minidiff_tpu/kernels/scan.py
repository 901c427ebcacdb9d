"""Fused Pallas linear-scan kernel: ``y_t = a_t * y_{t-1} + b_t`` in ONE pass.

``jax.lax.associative_scan`` (the xla backend's fallback formulation) is
work-efficient in FLOPs but not in HBM traffic: its O(log T) combine
rounds each materialize full (B, T, C) intermediates, so the scan's
operands cross HBM several times.  The scan is purely memory-bound —
per element the math is one multiply-add — so traffic IS the runtime.

This kernel makes exactly one pass.  TPU Pallas executes the grid
sequentially on a core, so a VMEM scratch can carry state across grid
steps: the grid walks (batch row, channel block, time block) with time
innermost; each step loads a (bt, cb) tile, runs a Hillis-Steele affine
scan IN VMEM (log2(bt) full-tile FMAs — affine maps compose associatively:
(a1,b1)∘(a2,b2) = (a1*a2, b1*a2 + b2)), folds in the carried prefix, and
writes the tile out.  a/b are read once and y written once, period.

Accumulation is f32 regardless of the stored dtype (bf16 decay chains
compound error over T otherwise).  Dispatch mirrors kernels/layernorm.py:
an autotuned race (chained in-trace unrolls, >=8% win margin) decides
fused-vs-associative per (B, T, C, dtype) on TPU; everywhere else — and
whenever the race or the Mosaic compile fails — the associative_scan
fallback runs.  The op's VJPs (ops/definitions.py linear_scan_grad_*) are
themselves linear scans, so the tape backward dispatches through this
same entry with no extra protocol.

No reference counterpart: /root/reference has no scan primitive or
kernels at all; extends SURVEY §7 step 8's native-kernel obligation.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minidiff_tpu.kernels.matmul import _pallas_enabled

_SUPPORTED_DTYPES = (jnp.float32, jnp.bfloat16)
# (bt, cb) f32 working set for a, b, y plus scan temporaries — keep a
# handful of tiles comfortably inside VMEM
_BT = 256
_CB = 512
_MAX_C_PAD_RATIO = 4  # don't pad tiny channel counts 100x up to 128


def _combine_shift(a, b, off):
    ident_a = jnp.ones((off,) + a.shape[1:], a.dtype)
    ident_b = jnp.zeros((off,) + b.shape[1:], b.dtype)
    a_sh = jnp.concatenate([ident_a, a[:-off]], axis=0)
    b_sh = jnp.concatenate([ident_b, b[:-off]], axis=0)
    return a_sh * a, b_sh * a + b


def _block_scan(a, b):
    """Inclusive affine scan along axis 0 (static length, Hillis-Steele)."""
    off = 1
    while off < a.shape[0]:
        a, b = _combine_shift(a, b, off)
        off *= 2
    return a, b


def _scan_kernel(a_ref, b_ref, y_ref, carry_ref):
    @pl.when(pl.program_id(2) == 0)
    def _reset():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    a = a_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)
    prod, pref = _block_scan(a, b)
    y = pref + prod * carry_ref[...]  # (1, cb) prefix broadcasts over bt
    y_ref[0] = y.astype(y_ref.dtype)
    carry_ref[...] = y[-1:, :]


@functools.partial(jax.jit, static_argnames=("bt", "cb", "interpret"))
def _pallas_scan(a3, b3, bt: int, cb: int, interpret: bool = False):
    bsz, t, c = a3.shape
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, t, c), a3.dtype),
        grid=(bsz, c // cb, t // bt),  # time innermost: the carry is live
        in_specs=[
            pl.BlockSpec((1, bt, cb), lambda ib, ic, it: (ib, it, ic)),
            pl.BlockSpec((1, bt, cb), lambda ib, ic, it: (ib, it, ic)),
        ],
        out_specs=pl.BlockSpec((1, bt, cb), lambda ib, ic, it: (ib, it, ic)),
        scratch_shapes=[pltpu.VMEM((1, cb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # batch/channel grid dims are independent (Megacore splits
            # them across cores); only time is a true sequential carry
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a3, b3)


def _jnp_scan(a, b, axis: int):
    def combine(lo, hi):
        a1, b1 = lo
        a2, b2 = hi
        return a1 * a2, b1 * a2 + b2

    return jax.lax.associative_scan(combine, (a, b), axis=axis)[1]


def _canonical(shape, axis: int):
    axis = axis % len(shape)
    lead = 1
    for s in shape[:axis]:
        lead *= int(s)
    trail = 1
    for s in shape[axis + 1:]:
        trail *= int(s)
    return axis, lead, int(shape[axis]), trail


def _tiles(t: int, c: int):
    """(bt, cb, t_pad, c_pad) or None when padding waste is unreasonable."""
    c_pad = -(-c // 128) * 128
    if c_pad > _MAX_C_PAD_RATIO * c:
        # tiny channel counts would pad up to 128x the bytes — the exact
        # HBM traffic this kernel exists to avoid (and AUTOTUNE=0 would
        # force the fused path without a race to catch it)
        return None
    cb = min(_CB, c_pad)
    while c_pad % cb:
        cb //= 2
    bt = min(_BT, 1 << (t - 1).bit_length())
    t_pad = -(-t // bt) * bt
    return bt, cb, t_pad, c_pad


def _run_padded(a3, b3, t, c, bt, cb, t_pad, c_pad, interpret=False):
    if (t_pad, c_pad) != (t, c):
        pad = [(0, 0), (0, t_pad - t), (0, c_pad - c)]
        a3 = jnp.pad(a3, pad)  # zero decay/input rows: outputs sliced off
        b3 = jnp.pad(b3, pad)
    y = _pallas_scan(a3, b3, bt, cb, interpret=interpret)
    return y[:, :t, :c]


# ---------------------------------------------------------------------------
# autotuned dispatch
# ---------------------------------------------------------------------------

_scan_cache: dict = {}


def _scan_autotune(bsz: int, t: int, c: int, dtype) -> bool:
    import numpy as np

    from minidiff_tpu.kernels.matmul import (
        _measure_pull_latency,
        time_device_chain,
    )

    tiles = _tiles(t, c)
    if tiles is None:
        return False
    bt, cb, t_pad, c_pad = tiles
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.uniform(0.2, 0.95, (bsz, t, c)), dtype)
    b = jnp.asarray(rng.standard_normal((bsz, t, c)), dtype)
    lat = _measure_pull_latency(a)

    def _chain(core, unroll):
        @jax.jit
        def step(carry):
            bb, fb = carry
            for _ in range(unroll):
                bp = bb * (jnp.asarray(1.0, jnp.float32) + fb).astype(bb.dtype)
                out = core(bp)
                fb = jnp.sum(out.astype(jnp.float32)) * jnp.asarray(
                    1e-30, jnp.float32)
            return bb, fb

        return step

    import time as _time

    def _race(core):
        step1 = _chain(core, 1)
        carry0 = (b, jnp.zeros((), jnp.float32))
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

    t_assoc = _race(lambda bp: _jnp_scan(a, bp, 1))
    try:
        t_fused = _race(
            lambda bp: _run_padded(a, bp, t, c, bt, cb, t_pad, c_pad))
    except Exception as e:
        # _tiles() pre-screened the shape: a compile failure is a lowering
        # bug, not a race loss — surface it
        from minidiff_tpu.kernels.matmul import report_kernel_failure

        report_kernel_failure(
            "linear-scan-fused", (bsz, t, c, str(jnp.dtype(dtype))), e)
        return False
    return t_fused < 0.92 * t_assoc


def _scan_decision(bsz: int, t: int, c: int, dtype) -> bool:
    if not _pallas_enabled() or jnp.dtype(dtype) not in _SUPPORTED_DTYPES:
        return False
    if _tiles(t, c) is None or t < 2:
        return False
    key = (bsz, t, c, str(jnp.dtype(dtype)))
    if key not in _scan_cache:
        if _os.environ.get("MINIDIFF_TPU_AUTOTUNE", "1") == "0":
            _scan_cache[key] = True
        else:
            from minidiff_tpu.kernels import tunecache
            from minidiff_tpu.kernels.matmul import (
                KernelLoweringError,
                run_outside_trace,
            )

            hit, dec = tunecache.lookup("scan", key)
            if not hit:
                try:
                    dec = run_outside_trace(
                        lambda: _scan_autotune(bsz, t, c, dtype))
                    tunecache.record("scan", key, dec)
                except KernelLoweringError:
                    raise  # strict mode: a compile failure must stay loud
                except Exception:
                    # transient race failure: in-process fallback only
                    dec = False
            _scan_cache[key] = dec
    return _scan_cache[key]


def linear_scan(a, b, axis: int = -1):
    """Backend entry: fused single-pass Pallas on TPU when the race says
    so, jax.lax.associative_scan otherwise.  Same semantics either way."""
    dtype = jnp.result_type(a, b)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    ax, lead, t, trail = _canonical(a.shape, axis)
    if _scan_decision(lead, t, trail, dtype):
        tiles = _tiles(t, trail)
        bt, cb, t_pad, c_pad = tiles
        y = _run_padded(a.reshape(lead, t, trail), b.reshape(lead, t, trail),
                        t, trail, bt, cb, t_pad, c_pad)
        return y.reshape(a.shape)
    return _jnp_scan(a, b, ax)


# Decision-relevant sources for the persistent tune cache (see
# tunecache._fingerprint).
TUNE_FINGERPRINT_SOURCES = (
    _scan_kernel, _pallas_scan, _combine_shift, _block_scan, _run_padded,
    _tiles, _canonical,
)
