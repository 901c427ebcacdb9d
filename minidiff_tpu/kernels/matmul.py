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
# Defaults measured on v5e for 4096^2 bf16 (benchmarks/matmul_kernel_bench.py);
# the autotuner below refines the choice per (variant, shape, dtype).
_BM = 1024
_BN = 1024
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pallas_matmul(x: jax.Array, y: jax.Array, bm: int, bn: int, bk: int):
    return _pallas_matmul_2d(x, y, bm=bm, bn=bn, bk=bk)


def _pallas_matmul_fwd(x, y, bm, bn, bk):
    return _pallas_matmul_2d(x, y, bm=bm, bn=bn, bk=bk), (x, y)


def _pallas_matmul_bwd(bm, bn, bk, residuals, g):
    x, y = residuals
    dx = matmul_nt(g, y)
    dy = matmul_tn(x, g)
    return dx.astype(x.dtype), dy.astype(y.dtype)


_pallas_matmul.defvjp(_pallas_matmul_fwd, _pallas_matmul_bwd)


def matmul(x: jax.Array, y: jax.Array) -> jax.Array:
    """Backend entry point: autotuned Pallas vs XLA for large aligned 2-D."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim == 2 and y.ndim == 2:
        choice = _choose("nn", x, y)
        if choice is not None:
            return _pallas_matmul(x, y, *choice)
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
    if x.ndim < 2 or y.ndim < 2:
        raise ValueError("matmul_nt requires operands with ndim >= 2")
    if x.ndim == 2 and y.ndim == 2:
        choice = _choose("nt", x, y)
        if choice is not None:
            bm, bn, bk = choice
            return _pallas_matmul_nt_2d(x, y, bm=bm, bn=bn, bk=bk)
        return _dot_general_nt(x, y)
    return jnp.matmul(x, jnp.swapaxes(y, -1, -2))


def matmul_tn(x: jax.Array, y: jax.Array) -> jax.Array:
    """x^T @ y over the last two axes, transpose-free."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim < 2 or y.ndim < 2:
        raise ValueError("matmul_tn requires operands with ndim >= 2")
    if x.ndim == 2 and y.ndim == 2:
        choice = _choose("tn", x, y)
        if choice is not None:
            bm, bn, bk = choice
            return _pallas_matmul_tn_2d(x, y, bm=bm, bn=bn, bk=bk)
        return _dot_general_tn(x, y)
    return jnp.matmul(jnp.swapaxes(x, -1, -2), y)


# ---------------------------------------------------------------------------
# Autotuner: per (variant, m, n, k, dtypes) pick the fastest of {XLA's
# dot_general, the Pallas kernel at a few tile configs} by timing real
# executions on device, once, at first dispatch (trace time under md.jit —
# shapes are static so the decision is too).  This is the TPU analog of
# cuBLAS-style algorithm selection: XLA's matmul is near-roofline for most
# shapes, so the kernel must EARN each dispatch; measured on v5e the Pallas
# TN kernel beats XLA by ~10% at 4096^2 bf16 while NT loses, and a static
# table cannot know that per shape.
# ---------------------------------------------------------------------------

# (bm, bn, bk) candidates per variant, best-first (measured on v5e 4096^2).
_TILE_CANDIDATES = {
    "nn": ((1024, 1024, 512), (512, 512, 2048), (512, 512, 512), (256, 256, 512)),
    "nt": ((1024, 512, 512), (512, 512, 1024), (512, 512, 512), (256, 256, 512)),
    "tn": ((512, 1024, 512), (512, 512, 512), (1024, 256, 1024), (256, 256, 512)),
}
# Below this many FLOPs, kernel-launch overhead dominates: always XLA.
_MIN_FLOPS = 2 * 1024 * 1024 * 1024

_XLA_FNS = {
    "nn": lambda a, b: jnp.matmul(a, b),
    "nt": _dot_general_nt,
    "tn": _dot_general_tn,
}
_PALLAS_FNS = {
    "nn": _pallas_matmul_2d,
    "nt": _pallas_matmul_nt_2d,
    "tn": _pallas_matmul_tn_2d,
}

_choice_cache: dict = {}


def _mnk(variant: str, xs: tuple, ys: tuple) -> tuple:
    if variant == "nn":
        (m, k), (k2, n) = xs, ys
    elif variant == "nt":
        (m, k), (n, k2) = xs, ys
    else:  # tn
        (k, m), (k2, n) = xs, ys
    return (m, n, k) if k == k2 else (0, 0, 0)


def _tiles_fit(variant: str, tiles: tuple, m: int, n: int, k: int) -> bool:
    bm, bn, bk = tiles
    return m % bm == 0 and n % bn == 0 and k % bk == 0


def time_device_thunk(thunk, pull_latency: float) -> float:
    """Seconds per call of a device thunk, latency-robust.

    The tunnel's scalar-pull latency (~25 ms) can dwarf the kernel under
    test, so reps are calibrated until the chained device work is >=5x the
    pull latency; min over 3 interleaved rounds strips the (one-sided)
    latency jitter.
    """
    import time

    t0 = time.perf_counter()
    for _ in range(4):
        out = thunk()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    per = max((time.perf_counter() - t0 - pull_latency) / 4, 1e-5)
    reps = min(512, max(8, int(5 * pull_latency / per) + 1))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = thunk()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        times.append(max(time.perf_counter() - t0 - pull_latency, 1e-9) / reps)
    return min(times)


def _time_fn(fn, a, b) -> float:
    return time_device_thunk(lambda: fn(a, b), _time_fn.pull_latency)


_time_fn.pull_latency = 0.0


def _measure_pull_latency(a) -> float:
    import time

    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(a).astype(jnp.float32))
        lats.append(time.perf_counter() - t0)
    return sorted(lats)[len(lats) // 2]


def run_outside_trace(fn):
    """Execute ``fn`` with no ambient jax trace (fresh thread).

    Autotuning may fire while an outer md.jit trace is active; trace state is
    thread-local, so a worker thread times real device executions instead of
    staging into the caller's jaxpr.  (jax.ensure_compile_time_eval is NOT
    usable here: it routes jitted Pallas calls through eval rules, which
    pallas primitives do not implement.)
    """
    import threading

    box: dict = {}

    def worker():
        try:
            box["value"] = fn()
        except BaseException as e:  # propagate into the calling thread
            box["error"] = e

    t = threading.Thread(target=worker, name="minidiff-autotune")
    t.start()
    t.join()
    if "error" in box:
        raise box["error"]
    return box["value"]


def _autotune(variant: str, xs, ys, xdt, ydt, m, n, k):
    """Race XLA against eligible Pallas tile configs on throwaway inputs."""
    return run_outside_trace(
        lambda: _autotune_eager(variant, xs, ys, xdt, ydt, m, n, k)
    )


def _autotune_eager(variant: str, xs, ys, xdt, ydt, m, n, k):
    import numpy as np

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.standard_normal(xs), dtype=xdt)
    b = jnp.asarray(rng.standard_normal(ys), dtype=ydt)

    # Composition-aware racing: in real programs a matmul sits next to
    # elementwise work (activation forward, activation-grad producer in the
    # backward).  XLA fuses that into the dot's epilogue for free, while an
    # opaque pallas_call forces the elementwise pass through HBM again —
    # ~2 extra full-array passes that an isolated race never prices in
    # (measured: Pallas "wins" 4096^2 bf16 NN by 17% bare but loses the
    # fwd+bwd chain).  Timing every candidate under a cheap affine epilogue
    # (VPU multiply-add, bandwidth-bound, fusable) makes the dispatch
    # decision reflect in-context cost.
    def _with_epilogue(fn):
        def wrapped(x, y):
            out = fn(x, y)
            return out * jnp.asarray(1.0009765625, out.dtype) + jnp.asarray(
                0.5, out.dtype
            )

        return wrapped

    candidates: "list[tuple[tuple | None, Any]]" = [
        (None, jax.jit(_with_epilogue(_XLA_FNS[variant])))
    ]
    for tiles in _TILE_CANDIDATES[variant]:
        if _tiles_fit(variant, tiles, m, n, k):
            bm, bn, bk = tiles
            candidates.append(
                (
                    tiles,
                    jax.jit(
                        _with_epilogue(
                            functools.partial(
                                _PALLAS_FNS[variant], bm=bm, bn=bn, bk=bk
                            )
                        )
                    ),
                )
            )

    # Warm up (compile) every candidate; drop the ones that fail to compile
    # (e.g. VMEM overflow at large tiles).
    alive = []
    for tiles, fn in candidates:
        try:
            out = fn(a, b)
            float(jnp.sum(out).astype(jnp.float32))
            alive.append((tiles, fn))
        except Exception:
            if tiles is None:
                raise
    _time_fn.pull_latency = _measure_pull_latency(a)

    # Interleaved rounds + per-candidate MIN: robust to tunnel-latency drift
    # (a one-sided additive noise, which min strips and medians don't).
    best = {id(fn): float("inf") for _, fn in alive}
    for _ in range(4):
        for tiles, fn in alive:
            best[id(fn)] = min(best[id(fn)], _time_fn(fn, a, b))

    xla_t = best[id(alive[0][1])]
    winner, winner_t = None, xla_t
    for tiles, fn in alive[1:]:
        if best[id(fn)] < winner_t:
            winner, winner_t = tiles, best[id(fn)]
    # Pallas must beat XLA by >3% to win: ties go to XLA, which fuses better
    # with neighboring elementwise work inside a larger jit.
    if winner is not None and winner_t > 0.97 * xla_t:
        winner = None
    return winner


def _choose(variant: str, x: jax.Array, y: jax.Array):
    """None → use XLA; (bm, bn, bk) → use the Pallas kernel with those tiles."""
    if not _pallas_enabled():
        return None
    if x.dtype not in _SUPPORTED_DTYPES or y.dtype not in _SUPPORTED_DTYPES:
        return None
    m, n, k = _mnk(variant, tuple(x.shape), tuple(y.shape))
    if 2 * m * n * k < _MIN_FLOPS:
        return None
    if not any(_tiles_fit(variant, t, m, n, k) for t in _TILE_CANDIDATES[variant]):
        return None
    key = (variant, m, n, k, str(x.dtype), str(y.dtype))
    if key not in _choice_cache:
        if os.environ.get("MINIDIFF_TPU_AUTOTUNE", "1") == "0":
            # static fallback: first tile config that fits, best-first order
            _choice_cache[key] = next(
                t
                for t in _TILE_CANDIDATES[variant]
                if _tiles_fit(variant, t, m, n, k)
            )
        else:
            _choice_cache[key] = _autotune(
                variant, tuple(x.shape), tuple(y.shape), x.dtype, y.dtype, m, n, k
            )
    return _choice_cache[key]
