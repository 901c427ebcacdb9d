"""XLA/TPU backend — jax.numpy compute with Pallas kernels for hot ops.

This is the TPU-native analog of the reference's GPU backend
(minidiff/backend/cupy.py delegates every op to the CuPy library; here we
delegate to jax.numpy so every op is XLA-compiled, and route the
performance-bearing ops through hand-written Pallas TPU kernels in
:mod:`minidiff_tpu.kernels`).

Design notes:

* Arrays are immutable ``jax.Array``s.  Mutation-style interface functions
  return the updated array (see backend/interface.py); the Tensor layer
  rebinds ``._data``.
* Randomness is a stateful splitting PRNG key (seeded via ``seed()`` or the
  ``MINIDIFF_TPU_SEED`` env var).  Inside a traced/jitted region the draws
  become trace-time constants — use explicit keys via jax directly for traced
  randomness.
* Ops run eagerly op-by-op here; whole-graph compilation happens one level up
  (minidiff_tpu.func.jit traces the tape into a single XLA executable).
"""

from __future__ import annotations

import os
from builtins import bool as py_bool
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Sequence, Tuple, Union


class _PRNG:
    """Stateful splitting PRNG over jax.random keys."""

    def __init__(self) -> None:
        self._key = None

    def seed(self, value: int) -> None:
        self._key = jax.random.PRNGKey(value)

    def next_key(self) -> jax.Array:
        if self._key is None:
            self.seed(int(os.environ.get("MINIDIFF_TPU_SEED", "0")))
        self._key, sub = jax.random.split(self._key)
        return sub


_prng = _PRNG()


def _float_dtype() -> Any:
    # canonicalizes to float64 under x64, float32 otherwise
    return jnp.result_type(float)


def _as_shape(size: Any) -> Tuple[int, ...]:
    if size is None:
        return ()
    if isinstance(size, int):
        return (size,)
    return tuple(size)


class XlaBackend:
    name = "xla"

    tensor_class = jax.Array
    tensor_constructor = staticmethod(jnp.asarray)

    # ---- elementwise unary ----
    absolute = staticmethod(jnp.absolute)
    ceil = staticmethod(jnp.ceil)

    @staticmethod
    def copy(a: jax.Array) -> jax.Array:
        return jnp.array(a, copy=True)

    cos = staticmethod(jnp.cos)
    cosh = staticmethod(jnp.cosh)
    erf = staticmethod(jax.lax.erf)
    exp = staticmethod(jnp.exp)
    floor = staticmethod(jnp.floor)
    invert = staticmethod(jnp.invert)
    log = staticmethod(jnp.log)
    logical_not = staticmethod(jnp.logical_not)
    sign = staticmethod(jnp.sign)
    sin = staticmethod(jnp.sin)
    sinh = staticmethod(jnp.sinh)
    sqrt = staticmethod(jnp.sqrt)
    square = staticmethod(jnp.square)
    tan = staticmethod(jnp.tan)
    tanh = staticmethod(jnp.tanh)

    # ---- shape unary ----
    atleast_1d = staticmethod(jnp.atleast_1d)
    atleast_2d = staticmethod(jnp.atleast_2d)
    atleast_3d = staticmethod(jnp.atleast_3d)

    @staticmethod
    def flatten(a: jax.Array, order: str = "C") -> jax.Array:
        return jnp.ravel(a, order=order)

    flip = staticmethod(jnp.flip)

    @staticmethod
    def ravel(a: jax.Array, order: str = "C") -> jax.Array:
        return jnp.ravel(a, order=order)

    squeeze = staticmethod(jnp.squeeze)
    transpose = staticmethod(jnp.transpose)

    # ---- reductions / search ----
    all = staticmethod(jnp.all)
    any = staticmethod(jnp.any)
    argmax = staticmethod(jnp.argmax)
    argmin = staticmethod(jnp.argmin)
    argwhere = staticmethod(jnp.argwhere)
    max = staticmethod(jnp.max)
    mean = staticmethod(jnp.mean)
    min = staticmethod(jnp.min)
    prod = staticmethod(jnp.prod)
    std = staticmethod(jnp.std)
    var = staticmethod(jnp.var)
    sum = staticmethod(jnp.sum)
    cumsum = staticmethod(jnp.cumsum)
    sort = staticmethod(jnp.sort)
    argsort = staticmethod(jnp.argsort)

    @staticmethod
    def linear_scan(a: jax.Array, b: jax.Array, axis: int = -1) -> jax.Array:
        # y_t = a_t * y_{t-1} + b_t (y_{-1} = 0), parallel either way: the
        # autotuned dispatch races the single-HBM-pass Pallas kernel
        # (VMEM-carried prefix across time blocks) against
        # jax.lax.associative_scan per shape — see kernels/scan.py.  The
        # op's VJPs are linear scans too, so the backward rides the same
        # dispatch with no extra protocol.
        from minidiff_tpu.kernels import scan as _scan_kernels

        return _scan_kernels.linear_scan(a, b, axis=axis)

    @staticmethod
    def top_k_indices(a: jax.Array, k: int) -> jax.Array:
        # O(n log k) on device; last axis, descending value
        return jax.lax.top_k(a, k)[1]

    # ---- binary ----
    add = staticmethod(jnp.add)
    einsum = staticmethod(jnp.einsum)
    maximum = staticmethod(jnp.maximum)
    minimum = staticmethod(jnp.minimum)

    @staticmethod
    def astype(a: jax.Array, dtype: Any, **kwargs: Any) -> jax.Array:
        return jnp.asarray(a).astype(dtype)

    broadcast_to = staticmethod(jnp.broadcast_to)
    dot = staticmethod(jnp.dot)
    equal = staticmethod(jnp.equal)
    expand_dims = staticmethod(jnp.expand_dims)
    floor_divide = staticmethod(jnp.floor_divide)

    @staticmethod
    def getitem(a: jax.Array, key: Any) -> jax.Array:
        return a[key]

    greater = staticmethod(jnp.greater)
    greater_equal = staticmethod(jnp.greater_equal)
    less = staticmethod(jnp.less)
    less_equal = staticmethod(jnp.less_equal)
    logical_and = staticmethod(jnp.logical_and)
    logical_or = staticmethod(jnp.logical_or)
    logical_xor = staticmethod(jnp.logical_xor)

    @staticmethod
    def matmul(x: jax.Array, y: jax.Array) -> jax.Array:
        # Routed through the kernel dispatcher: Pallas tiled matmul on TPU for
        # large aligned shapes, jnp.matmul otherwise.
        from minidiff_tpu.kernels import matmul as _mm

        return _mm.matmul(x, y)

    @staticmethod
    def matmul_nt(x: jax.Array, y: jax.Array) -> jax.Array:
        # x @ y^T without materializing the transpose (dot_general / Pallas NT)
        from minidiff_tpu.kernels import matmul as _mm

        return _mm.matmul_nt(x, y)

    @staticmethod
    def matmul_tn(x: jax.Array, y: jax.Array) -> jax.Array:
        # x^T @ y without materializing the transpose
        from minidiff_tpu.kernels import matmul as _mm

        return _mm.matmul_tn(x, y)

    @staticmethod
    def quantize_int8(w: jax.Array):
        from minidiff_tpu.kernels import quant as _q

        return _q.quantize_int8(w)

    @staticmethod
    def dequant_matmul(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
        # fused in-VMEM dequantize + MXU matmul on TPU (weight stream stays
        # int8 in HBM); dot_general fallback elsewhere — kernels/quant.py
        from minidiff_tpu.kernels import quant as _q

        return _q.dequant_matmul(x, q, s)

    @staticmethod
    def quantize_int8_stacked(w: jax.Array):
        from minidiff_tpu.kernels import quant as _q

        return _q.quantize_int8_stacked(w)

    @staticmethod
    def dequant_matmul_bmm(x: jax.Array, q: jax.Array,
                           s: jax.Array) -> jax.Array:
        # one grid cell per (expert, N-tile): int8 expert bank in HBM,
        # VMEM dequant, f32 MXU accumulation — kernels/quant.py
        from minidiff_tpu.kernels import quant as _q

        return _q.dequant_matmul_bmm(x, q, s)

    @staticmethod
    def quantize_int4(w: jax.Array, group: int = 128):
        from minidiff_tpu.kernels import quant as _q

        return _q.quantize_int4(w, group=group)

    @staticmethod
    def unpack_int4(p: jax.Array) -> jax.Array:
        from minidiff_tpu.kernels import quant as _q

        return _q.unpack_int4(p)

    @staticmethod
    def dequant_matmul4(x: jax.Array, p: jax.Array,
                        s: jax.Array) -> jax.Array:
        # packed-nibble weights + group scales; fused per-group MXU dots on
        # TPU, einsum fallback elsewhere — kernels/quant.py
        from minidiff_tpu.kernels import quant as _q

        return _q.dequant_matmul4(x, p, s)

    @staticmethod
    def quantize_int8_rows(x: jax.Array):
        from minidiff_tpu.kernels import quant as _q

        return _q.quantize_int8_rows(x)

    @staticmethod
    def sdpa_int8_cache(q: jax.Array, k8: jax.Array, ks: jax.Array,
                        v8: jax.Array, vs: jax.Array, pos: jax.Array,
                        scale=None) -> jax.Array:
        # fused masked decode attention over int8 cache lines (Pallas on
        # TPU; same-algebra jnp fallback elsewhere) — kernels/quant.py
        from minidiff_tpu.kernels import quant as _q

        return _q.sdpa_int8_cache(q, k8, ks, v8, vs, pos, scale=scale)

    # -- conv2d family (NHWC x HWIO -> NHWC via XLA's native convolution;
    # the grads are the exact conv-transpose programs jax derives, obtained
    # through jax.vjp of the same forward so they lower to XLA's fused
    # ConvBackwardInput / ConvBackwardFilter) ------------------------------

    @staticmethod
    def conv2d(x: jax.Array, w: jax.Array, stride: int = 1,
               padding: int = 0) -> jax.Array:
        # TPU f32 convolutions default to fast bf16-pass accumulation
        # (~5e-3 relative error); set jax_default_matmul_precision='highest'
        # for exact f32 when accuracy matters more than the 3x slowdown.
        # lax.conv requires matching dtypes (jnp ops auto-promote; conv won't)
        dt = jnp.promote_types(x.dtype, w.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt),
            window_strides=(stride, stride),
            padding=[(padding, padding), (padding, padding)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @staticmethod
    def conv2d_input_grad(grad: jax.Array, w: jax.Array, x_shape=None,
                          stride: int = 1, padding: int = 0) -> jax.Array:
        zeros = jnp.zeros(tuple(x_shape), dtype=grad.dtype)
        _, vjp = jax.vjp(
            lambda x: XlaBackend.conv2d(x, w.astype(grad.dtype),
                                        stride=stride, padding=padding),
            zeros,
        )
        return vjp(grad)[0]

    @staticmethod
    def conv2d_kernel_grad(x: jax.Array, grad: jax.Array, x_shape=None,
                           w_shape=None, stride: int = 1,
                           padding: int = 0) -> jax.Array:
        zeros = jnp.zeros(tuple(w_shape), dtype=grad.dtype)
        _, vjp = jax.vjp(
            lambda w: XlaBackend.conv2d(x.astype(grad.dtype), w,
                                        stride=stride, padding=padding),
            zeros,
        )
        return vjp(grad)[0]

    @staticmethod
    def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
             causal: bool = False, scale=None, mask=None,
             window=None, sinks: int = 0, segment_ids=None) -> jax.Array:
        # flash-attention Pallas kernel on TPU when eligible; composed jnp
        # softmax attention otherwise (always composed when a mask is given)
        from minidiff_tpu.kernels import attention as _att

        return _att.sdpa(q, k, v, causal=causal, scale=scale, mask=mask,
                         window=window, sinks=sinks,
                         segment_ids=segment_ids)

    @staticmethod
    def layernorm(x: jax.Array, g: jax.Array, b: jax.Array,
                  eps: float = 1e-5) -> jax.Array:
        # one-pass fused Pallas kernel on TPU when the autotune race says
        # so; composed jnp (same accumulation rule) otherwise —
        # kernels/layernorm.py
        from minidiff_tpu.kernels import layernorm as _ln

        return _ln.layernorm(x, g, b, eps=eps)

    @staticmethod
    def rmsnorm(x: jax.Array, g: jax.Array, eps: float = 1e-6) -> jax.Array:
        # same dispatch policy as layernorm — kernels/layernorm.py
        from minidiff_tpu.kernels import layernorm as _ln

        return _ln.rmsnorm(x, g, eps=eps)

    @staticmethod
    def add_layernorm(x: jax.Array, a: jax.Array, g: jax.Array,
                      b: jax.Array, eps: float = 1e-5) -> jax.Array:
        # fused residual-add + LN: one Pallas pass writes both the summed
        # stream and its norm (kernels/layernorm.py add_layernorm)
        from minidiff_tpu.kernels import layernorm as _ln

        return _ln.add_layernorm(x, a, g, b, eps=eps)

    @staticmethod
    def add_rmsnorm(x: jax.Array, a: jax.Array, g: jax.Array,
                    eps: float = 1e-6) -> jax.Array:
        from minidiff_tpu.kernels import layernorm as _ln

        return _ln.add_rmsnorm(x, a, g, eps=eps)

    @staticmethod
    def softmax_xent(z: jax.Array, lab: jax.Array) -> jax.Array:
        # fused one-pass loss kernel on TPU when the race says so —
        # kernels/xent.py
        from minidiff_tpu.kernels import xent as _x

        return _x.softmax_xent(z, lab)

    mod = staticmethod(jnp.mod)
    multiply = staticmethod(jnp.multiply)
    not_equal = staticmethod(jnp.not_equal)
    power = staticmethod(jnp.power)
    reshape = staticmethod(jnp.reshape)
    subtract = staticmethod(jnp.subtract)
    tensordot = staticmethod(jnp.tensordot)
    true_divide = staticmethod(jnp.true_divide)

    # ---- ternary ----
    @staticmethod
    def clip(a: jax.Array, a_min: Any = None, a_max: Any = None) -> jax.Array:
        # normalizes the numpy-style a_min/a_max keyword names onto jnp.clip
        return jnp.clip(a, a_min, a_max)
    swapaxes = staticmethod(jnp.swapaxes)
    where = staticmethod(jnp.where)

    # ---- creation ----
    ones_like = staticmethod(jnp.ones_like)
    ones = staticmethod(jnp.ones)
    zeros_like = staticmethod(jnp.zeros_like)
    zeros = staticmethod(jnp.zeros)
    full_like = staticmethod(jnp.full_like)
    full = staticmethod(jnp.full)
    concatenate = staticmethod(jnp.concatenate)
    arange = staticmethod(jnp.arange)
    stack = staticmethod(jnp.stack)
    tile = staticmethod(jnp.tile)
    repeat = staticmethod(jnp.repeat)

    # ---- indexing / scatter (functional; return the result) ----
    @staticmethod
    def index_add(a: jax.Array, indices: Any, b: Any) -> jax.Array:
        return a.at[indices].add(b)

    @staticmethod
    def scatter_add(a: jax.Array, indices: Any, b: Any) -> jax.Array:
        # Contiguous basic keys (ints / unit-step slices) select each
        # position at most once, so add == set — emitted as an explicit
        # dynamic_update_slice into zeros instead of a scatter (TPU lowers
        # .at[].add/.set to a real scatter, 2x+ slower; this is the getitem
        # VJP's hot path for slicing).
        idx = indices if isinstance(indices, tuple) else (indices,)
        if (
            all(isinstance(i, (int, slice)) for i in idx)
            and len(idx) <= a.ndim
        ):
            starts: list = []
            vshape: list = []
            ok = True
            for d, i in enumerate(idx):
                n = a.shape[d]
                if isinstance(i, bool):
                    # bool is an int subclass but means mask indexing
                    ok = False
                    break
                if isinstance(i, int):
                    starts.append(i + n if i < 0 else i)
                    vshape.append(1)
                elif i.step in (None, 1):
                    # full numpy slice resolution incl. clamping below -n / above n
                    st = 0 if i.start is None else (i.start + n if i.start < 0 else i.start)
                    sp = n if i.stop is None else (i.stop + n if i.stop < 0 else i.stop)
                    st = min(max(st, 0), n)
                    sp = min(max(sp, 0), n)
                    starts.append(st)
                    vshape.append(max(sp - st, 0))
                else:
                    ok = False
                    break
            if ok:
                starts += [0] * (a.ndim - len(idx))
                vshape += list(a.shape[len(idx):])
                vals = jnp.asarray(b, a.dtype)
                # int-indexed dims were dropped from b; reinsert them so the
                # broadcast aligns positionally
                for pos, i in enumerate(idx):
                    if isinstance(i, int):
                        vals = jnp.expand_dims(vals, pos)
                vals = jnp.broadcast_to(vals, tuple(vshape))
                return jax.lax.dynamic_update_slice(
                    jnp.zeros_like(a), vals, tuple(starts)
                )
        return jnp.zeros_like(a).at[indices].add(b)

    @staticmethod
    def put_along_axis(
        arr: jax.Array, indices: jax.Array, values: Any, axis: Optional[int]
    ) -> jax.Array:
        if axis is None:
            flat = jnp.ravel(arr)
            out = flat.at[jnp.ravel(indices)].set(jnp.ravel(jnp.asarray(values)))
            return out.reshape(arr.shape)
        return jnp.put_along_axis(arr, indices, values, axis, inplace=False)

    take_along_axis = staticmethod(jnp.take_along_axis)

    @staticmethod
    def setitem(a: jax.Array, key: Any, value: Any) -> jax.Array:
        # Basic-index keys (full slices + int/0-d-int positions, possibly
        # TRACED) lower to dynamic_update_slice instead of .at[].set — with
        # a traced index .at emits a SCATTER, which copies the whole buffer
        # and cannot be updated in place inside lax.scan (measured 40x+ on
        # the compiled-decode KV cache).
        idx = key if isinstance(key, tuple) else (key,)

        def _scalar_int(i):
            if isinstance(i, bool):
                return False
            if isinstance(i, int):
                return True
            return (
                hasattr(i, "dtype")
                and getattr(i, "ndim", None) == 0
                and jnp.issubdtype(i.dtype, jnp.integer)
            )

        if len(idx) <= a.ndim and all(
            (isinstance(i, slice) and i == slice(None)) or _scalar_int(i)
            for i in idx
        ):
            starts: list = []
            vshape: list = []
            for d in range(a.ndim):
                i = idx[d] if d < len(idx) else slice(None)
                if isinstance(i, slice):
                    starts.append(0)
                    vshape.append(a.shape[d])
                elif isinstance(i, int):
                    starts.append(i + a.shape[d] if i < 0 else i)
                    vshape.append(1)
                else:  # traced 0-d integer: wrap negatives like numpy
                    starts.append(jnp.where(i < 0, i + a.shape[d], i))
                    vshape.append(1)
            vals = jnp.asarray(value, a.dtype)
            # int-indexed dims were dropped from value; reinsert them so the
            # broadcast aligns positionally
            for pos in range(len(idx)):
                if not isinstance(idx[pos], slice):
                    vals = jnp.expand_dims(vals, pos)
            vals = jnp.broadcast_to(vals, tuple(vshape))
            return jax.lax.dynamic_update_slice(a, vals, tuple(starts))
        return a.at[key].set(value)

    @staticmethod
    def isin(element: Any, test_elements: Any) -> jax.Array:
        return jnp.isin(jnp.asarray(element), jnp.asarray(test_elements))
    unravel_index = staticmethod(jnp.unravel_index)
    split = staticmethod(jnp.split)

    # ---- random ----
    @staticmethod
    def seed(value: int) -> None:
        _prng.seed(value)

    @staticmethod
    def choice(
        a: Any,
        size: Any = None,
        replace: py_bool = True,
        p: Any = None,
    ) -> jax.Array:
        a = a if isinstance(a, jax.Array) else jnp.asarray(a)
        return jax.random.choice(
            _prng.next_key(), a, shape=_as_shape(size), replace=replace, p=p
        )

    @staticmethod
    def rand(*dims: int) -> jax.Array:
        return jax.random.uniform(_prng.next_key(), dims, dtype=_float_dtype())

    @staticmethod
    def randint(low: Any, high: Any = None, size: Any = None) -> jax.Array:
        if high is None:
            low, high = 0, low
        low = jnp.asarray(low)
        high = jnp.asarray(high)
        if size is None:
            shape = jnp.broadcast_shapes(low.shape, high.shape)
        else:
            shape = _as_shape(size)
        return jax.random.randint(_prng.next_key(), shape, low, high)

    @staticmethod
    def randn(*dims: int) -> jax.Array:
        return jax.random.normal(_prng.next_key(), dims, dtype=_float_dtype())

    @staticmethod
    def binomial(n: Any, p: Any, size: Any = None) -> jax.Array:
        n = jnp.asarray(n, dtype=_float_dtype())
        p = jnp.asarray(p, dtype=_float_dtype())
        if size is None:
            shape = jnp.broadcast_shapes(n.shape, p.shape)
        else:
            shape = _as_shape(size)
        out = jax.random.binomial(_prng.next_key(), n, p, shape=shape)
        return out.astype(jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)

    @staticmethod
    def permutation(x: Any) -> jax.Array:
        if isinstance(x, int):
            x = jnp.arange(x)
        return jax.random.permutation(_prng.next_key(), x)

    @staticmethod
    def shuffle(x: jax.Array) -> jax.Array:
        return jax.random.permutation(_prng.next_key(), x)

    # ---- functional (counter-based) random: explicit keys, traceable ----
    # Unlike the stateful draws above (which become trace-time constants
    # under jit), these are pure functions of a (2,) uint32 key array, so a
    # jitted program taking the key as an INPUT stays random per call.
    @staticmethod
    def key_from_seed(seed: int) -> jax.Array:
        return jax.random.PRNGKey(seed)

    @staticmethod
    def key_fold_in(key: jax.Array, data: Any) -> jax.Array:
        return jax.random.fold_in(key, data)

    @staticmethod
    def key_split(key: jax.Array, num: int) -> jax.Array:
        return jax.random.split(key, num)

    @staticmethod
    def key_uniform(key: jax.Array, shape: Any, dtype: Any = None) -> jax.Array:
        return jax.random.uniform(key, _as_shape(shape) or (),
                                  dtype=dtype or _float_dtype())

    @staticmethod
    def key_normal(key: jax.Array, shape: Any, dtype: Any = None) -> jax.Array:
        return jax.random.normal(key, _as_shape(shape) or (),
                                 dtype=dtype or _float_dtype())

    # ---- io ----
    @staticmethod
    def save(file: Any, arr: jax.Array) -> None:
        np.save(file, np.asarray(arr))

    @staticmethod
    def load(file: Any) -> jax.Array:
        return jnp.asarray(np.load(file))

    # ---- collectives (SPMD, inside shard_map regions) ----
    @staticmethod
    def psum(x: jax.Array, axis_name: str) -> jax.Array:
        return jax.lax.psum(x, axis_name)

    @staticmethod
    def ppermute(x: jax.Array, axis_name: str, perm: Any) -> jax.Array:
        return jax.lax.ppermute(x, axis_name, perm=[tuple(p) for p in perm])

    @staticmethod
    def pmean(x: jax.Array, axis_name: str) -> jax.Array:
        return jax.lax.pmean(x, axis_name)

    @staticmethod
    def all_gather(x: jax.Array, axis_name: str, axis: int = 0,
                   tiled: bool = True) -> jax.Array:
        return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)

    @staticmethod
    def psum_scatter(x: jax.Array, axis_name: str,
                     scatter_dimension: int = 0,
                     tiled: bool = True) -> jax.Array:
        return jax.lax.psum_scatter(
            x, axis_name, scatter_dimension=scatter_dimension, tiled=tiled)

    @staticmethod
    def all_to_all(x: jax.Array, axis_name: str, split_axis: int,
                   concat_axis: int) -> jax.Array:
        return jax.lax.all_to_all(x, axis_name, split_axis=split_axis,
                                  concat_axis=concat_axis, tiled=True)

    @staticmethod
    def axis_size(axis_name: str) -> int:
        # static mesh property at trace time (shard_map binds the axis env)
        return jax.lax.psum(1, axis_name)

    # ---- functional ----
    @staticmethod
    def vmap(fun: Callable) -> Callable:
        # reference contract (minidiff/tensor.py:518-536): only the FIRST
        # argument maps over its leading axis; extras pass through unmapped
        # (bare jax.vmap would map every positional arg — backends diverge)
        def mapped(arr: jax.Array, *args: Any, **kwargs: Any) -> jax.Array:
            return jax.vmap(lambda a: fun(a, *args, **kwargs))(arr)

        return mapped

    # ---- properties ----
    @staticmethod
    def tensor_shape(data: jax.Array) -> Tuple[int, ...]:
        return tuple(data.shape)

    @staticmethod
    def tensor_size(data: jax.Array) -> int:
        return int(np.prod(data.shape)) if data.shape else 1

    @staticmethod
    def tensor_ndim(data: jax.Array) -> int:
        return data.ndim

    @staticmethod
    def tensor_dtype(data: jax.Array) -> Any:
        return data.dtype

    @staticmethod
    def tensor_item(data: jax.Array) -> Any:
        return data.item()

    @staticmethod
    def repr(data: jax.Array) -> str:
        return data.__repr__()

    @staticmethod
    def len(data: jax.Array) -> int:
        return data.__len__()

    @staticmethod
    def array_interface(data: jax.Array) -> dict:
        return np.asarray(data).__array_interface__

    @staticmethod
    def array(
        data: jax.Array,
        dtype: Optional[Any] = None,
        copy: Optional[py_bool] = None,
    ) -> np.ndarray:
        if dtype is not None and dtype != data.dtype:
            if copy is False:
                raise ValueError("attempted cast, but copies are not permitted")
            return np.asarray(data).astype(dtype)
        return np.asarray(data)

    @staticmethod
    def as_numpy(a: Any) -> np.ndarray:
        return np.asarray(a)

    # ---- dtypes ----
    dtype = jnp.dtype
    float64 = jnp.float64
    float32 = jnp.float32
    float16 = jnp.float16
    bfloat16 = jnp.bfloat16
    uint64 = jnp.uint64
    uint32 = jnp.uint32
    uint16 = jnp.uint16
    uint8 = jnp.uint8
    int64 = jnp.int64
    int32 = jnp.int32
    int16 = jnp.int16
    int8 = jnp.int8
    bool = jnp.bool_
    nan = jnp.nan


from minidiff_tpu.backend import register_backend

register_backend("xla", XlaBackend)
