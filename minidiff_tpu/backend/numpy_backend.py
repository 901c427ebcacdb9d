"""NumPy reference backend — the numerical oracle.

Plays the role of the reference's CPU backend (minidiff/backend/numpy.py) and
exists primarily so every XLA/Pallas op can be cross-checked against plain
NumPy by the finite-difference gradcheck suite.  Mutation-style functions
(``index_add``, ``put_along_axis``, ``setitem``, ``shuffle``) update in place
*and* return the array, per the interface contract in
:mod:`minidiff_tpu.backend.interface`.
"""

from __future__ import annotations

from builtins import bool as py_bool
from typing import TYPE_CHECKING

import numpy as np

try:  # bfloat16 exists via ml_dtypes (a jax dependency); optional here.
    import ml_dtypes

    _bfloat16 = ml_dtypes.bfloat16
except Exception:  # pragma: no cover
    _bfloat16 = np.float32

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Sequence, Tuple, Union


class NumpyBackend:
    name = "numpy"

    tensor_class = np.ndarray
    tensor_constructor = staticmethod(np.array)

    # ---- elementwise unary ----
    absolute = staticmethod(np.absolute)
    ceil = staticmethod(np.ceil)
    copy = staticmethod(np.copy)
    cos = staticmethod(np.cos)
    cosh = staticmethod(np.cosh)

    @staticmethod
    def erf(x):
        try:  # scipy's vectorized erf when present (not a declared dep)
            from scipy.special import erf as _erf

            return _erf(np.asarray(x))
        except ImportError:  # stdlib fallback: exact, element-at-a-time
            import math

            xa = np.asarray(x)
            out = np.vectorize(math.erf, otypes=[np.float64])(
                xa.astype(np.float64))
            # match scipy's promotion: floating inputs keep their dtype,
            # integer/bool inputs promote to float64 (casting back would
            # truncate erf's (-1, 1) range to {-1, 0, 1})
            if np.issubdtype(xa.dtype, np.floating):
                return out.astype(xa.dtype)
            return out

    exp = staticmethod(np.exp)
    floor = staticmethod(np.floor)
    invert = staticmethod(np.invert)
    log = staticmethod(np.log)
    logical_not = staticmethod(np.logical_not)
    sign = staticmethod(np.sign)
    sin = staticmethod(np.sin)
    sinh = staticmethod(np.sinh)
    sqrt = staticmethod(np.sqrt)
    square = staticmethod(np.square)
    tan = staticmethod(np.tan)
    tanh = staticmethod(np.tanh)

    # ---- shape unary ----
    atleast_1d = staticmethod(np.atleast_1d)
    atleast_2d = staticmethod(np.atleast_2d)
    atleast_3d = staticmethod(np.atleast_3d)

    @staticmethod
    def flatten(a: np.ndarray, order: str = "C") -> np.ndarray:
        return np.asarray(a).flatten(order=order)

    flip = staticmethod(np.flip)

    @staticmethod
    def ravel(a: np.ndarray, order: str = "C") -> np.ndarray:
        return np.ravel(a, order=order)

    squeeze = staticmethod(np.squeeze)
    transpose = staticmethod(np.transpose)

    # ---- reductions / search ----
    all = staticmethod(np.all)
    any = staticmethod(np.any)
    argmax = staticmethod(np.argmax)
    argmin = staticmethod(np.argmin)
    argwhere = staticmethod(np.argwhere)
    max = staticmethod(np.max)
    mean = staticmethod(np.mean)
    min = staticmethod(np.min)
    prod = staticmethod(np.prod)
    std = staticmethod(np.std)
    var = staticmethod(np.var)
    sum = staticmethod(np.sum)
    cumsum = staticmethod(np.cumsum)
    sort = staticmethod(np.sort)
    argsort = staticmethod(np.argsort)

    @staticmethod
    def linear_scan(a: np.ndarray, b: np.ndarray,
                    axis: int = -1) -> np.ndarray:
        # y_t = a_t * y_{t-1} + b_t, y_{-1} = 0 — sequential oracle for the
        # xla backend's associative parallel scan
        a = np.moveaxis(np.asarray(a), axis, 0)
        b = np.moveaxis(np.asarray(b), axis, 0)
        out = np.empty(b.shape, dtype=np.result_type(a, b))
        acc = np.zeros(b.shape[1:], dtype=out.dtype)
        for t in range(b.shape[0]):
            acc = a[t] * acc + b[t]
            out[t] = acc
        return np.moveaxis(out, 0, axis)

    @staticmethod
    def top_k_indices(a: np.ndarray, k: int) -> np.ndarray:
        # indices of the k largest along the LAST axis, descending value
        part = np.argpartition(-a, k - 1, axis=-1)[..., :k]
        vals = np.take_along_axis(a, part, axis=-1)
        order = np.argsort(-vals, axis=-1, kind="stable")
        return np.take_along_axis(part, order, axis=-1)

    # ---- binary ----
    add = staticmethod(np.add)
    einsum = staticmethod(np.einsum)
    maximum = staticmethod(np.maximum)
    minimum = staticmethod(np.minimum)

    @staticmethod
    def astype(a: np.ndarray, dtype: Any, **kwargs: Any) -> np.ndarray:
        return np.asarray(a).astype(dtype, **kwargs)

    broadcast_to = staticmethod(np.broadcast_to)
    dot = staticmethod(np.dot)
    equal = staticmethod(np.equal)
    expand_dims = staticmethod(np.expand_dims)
    floor_divide = staticmethod(np.floor_divide)

    @staticmethod
    def getitem(a: np.ndarray, key: Any) -> np.ndarray:
        return a[key]

    greater = staticmethod(np.greater)
    greater_equal = staticmethod(np.greater_equal)
    less = staticmethod(np.less)
    less_equal = staticmethod(np.less_equal)
    logical_and = staticmethod(np.logical_and)
    logical_or = staticmethod(np.logical_or)
    logical_xor = staticmethod(np.logical_xor)
    matmul = staticmethod(np.matmul)

    @staticmethod
    def matmul_nt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # a @ b^T over the last two axes
        if np.ndim(a) < 2 or np.ndim(b) < 2:
            raise ValueError("matmul_nt requires operands with ndim >= 2")
        return np.matmul(a, np.swapaxes(b, -1, -2))

    @staticmethod
    def matmul_tn(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # a^T @ b over the last two axes
        if np.ndim(a) < 2 or np.ndim(b) < 2:
            raise ValueError("matmul_tn requires operands with ndim >= 2")
        return np.matmul(np.swapaxes(a, -1, -2), b)

    # -- weight-only int8 (the oracle for the fused Pallas dequant-matmul
    # behind XlaBackend.dequant_matmul; see kernels/quant.py) ---------------

    @staticmethod
    def quantize_int8(w: np.ndarray):
        """(K, N) float -> (q int8, s f32 (N,)): symmetric per-out-channel."""
        if np.ndim(w) != 2:
            raise ValueError("quantize_int8 expects a 2-D weight matrix")
        w32 = np.asarray(w, np.float32)
        amax = np.max(np.abs(w32), axis=0)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w32 / s), -127, 127).astype(np.int8)
        return q, s

    @staticmethod
    def dequant_matmul(x: np.ndarray, q: np.ndarray, s: np.ndarray) -> np.ndarray:
        """x (..., K) @ (q (K, N) int8 * s (N,)) -> (..., N) in x.dtype.

        The oracle computes at x's own precision (f64 under the test
        suite's x64 mode) — strictly tighter than the kernel's f32
        accumulation, which the parity tests absorb in their tolerance.
        """
        if np.ndim(q) != 2:
            raise ValueError("dequant_matmul expects a 2-D int8 weight")
        xd = np.asarray(x)
        acc = np.matmul(xd, np.asarray(q, xd.dtype))
        return (acc * np.asarray(s, xd.dtype)).astype(xd.dtype)

    @staticmethod
    def quantize_int4(w: np.ndarray, group: int = 128):
        """(K, N) float -> (packed int8 (K/2, N) split-half nibbles,
        s f32 (K/group, N)) — the oracle for kernels/quant.py int4."""
        if np.ndim(w) != 2:
            raise ValueError("quantize_int4 expects a 2-D weight matrix")
        k, n = np.shape(w)
        if k % 2 or k % group:
            raise ValueError(
                f"K={k} must be even and divisible by group={group}")
        w32 = np.asarray(w, np.float32)
        wg = w32.reshape(k // group, group, n)
        amax = np.max(np.abs(wg), axis=1)
        s = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w32 / np.repeat(s, group, axis=0)), -7, 7)
        q = q.astype(np.int32)
        lo, hi = q[: k // 2], q[k // 2:]
        packed = (((hi << 4) | (lo & 0xF)) & 0xFF).astype(np.uint8)
        return packed.view(np.int8), s

    @staticmethod
    def unpack_int4(p: np.ndarray) -> np.ndarray:
        """(K/2, N) packed int8 -> (K, N) int8 in [-7, 7] (split-half)."""
        pi = np.asarray(p, np.int32)
        lo = (pi << 28) >> 28
        hi = (pi << 24) >> 28
        return np.concatenate([lo, hi], axis=0).astype(np.int8)

    @staticmethod
    def quantize_int8_stacked(w: np.ndarray):
        """(E, K, N) float -> (q int8, s f32 (E, N)) per (expert, column)."""
        if np.ndim(w) != 3:
            raise ValueError(
                "quantize_int8_stacked expects a 3-D weight bank")
        w32 = np.asarray(w, np.float32)
        amax = np.max(np.abs(w32), axis=1)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w32 / s[:, None, :]), -127, 127).astype(np.int8)
        return q, s

    @staticmethod
    def dequant_matmul_bmm(x: np.ndarray, q: np.ndarray,
                           s: np.ndarray) -> np.ndarray:
        """x (E, C, K) @ (q (E, K, N) int8 * s (E, N)) -> (E, C, N).

        Oracle at x's own precision, like dequant_matmul."""
        if np.ndim(q) != 3:
            raise ValueError("dequant_matmul_bmm expects a 3-D int8 bank")
        xd = np.asarray(x)
        acc = np.matmul(xd, np.asarray(q, xd.dtype))
        return (acc * np.asarray(s, xd.dtype)[:, None, :]).astype(xd.dtype)

    @staticmethod
    def dequant_matmul4(x: np.ndarray, p: np.ndarray,
                        s: np.ndarray) -> np.ndarray:
        """x (..., K) @ (unpacked int4 * group scales) at x's precision."""
        pi = np.asarray(p, np.int32)
        lo = (pi << 28) >> 28
        hi = (pi << 24) >> 28
        q = np.concatenate([lo, hi], axis=0)
        k = q.shape[0]
        groups = np.shape(s)[0]
        xd = np.asarray(x)
        w = q.astype(xd.dtype) * np.repeat(np.asarray(s, xd.dtype),
                                           k // groups, axis=0)
        return np.matmul(xd, w).astype(xd.dtype)

    @staticmethod
    def quantize_int8_rows(x: np.ndarray):
        """(..., hd) float -> (q int8, s f32 (...,)) per-row symmetric."""
        x32 = np.asarray(x, np.float32)
        amax = np.max(np.abs(x32), axis=-1)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(x32 / s[..., None]), -127, 127).astype(np.int8)
        return q, s

    @staticmethod
    def sdpa_int8_cache(q, k8, ks, v8, vs, pos, scale=None):
        """Masked attention over an int8 KV cache: the reference algebra
        for the fused Pallas kernel (kernels/quant.py).  q (B, h, c, hd);
        k8/v8 (B, kv, L, hd) int8; ks/vs (B, kv, L); pos (B,).  Key l is
        visible to chunk position i iff l <= pos + i."""
        qd = np.asarray(q)
        b, h, c, hd = qd.shape
        kv, L = k8.shape[1], k8.shape[2]
        g = h // kv
        sc = float(scale) if scale is not None else 1.0 / np.sqrt(hd)
        qg = qd.reshape(b, kv, g * c, hd).astype(np.float32)
        scores = np.einsum("bkqd,bkld->bkql", qg,
                           np.asarray(k8, np.float32))
        scores *= np.asarray(ks, np.float32)[:, :, None, :] * sc
        row_i = (np.arange(g * c) % c)[None, None, :, None]
        col_l = np.arange(L)[None, None, None, :]
        visible = col_l <= np.asarray(pos)[:, None, None, None] + row_i
        scores = np.where(visible, scores, -1e30)
        scores -= scores.max(axis=-1, keepdims=True)
        e = np.exp(scores)
        p = e / e.sum(axis=-1, keepdims=True)
        pv = p * np.asarray(vs, np.float32)[:, :, None, :]
        out = np.einsum("bkql,bkld->bkqd", pv, np.asarray(v8, np.float32))
        return out.reshape(b, h, c, hd).astype(qd.dtype)

    # -- conv2d family (NHWC inputs, HWIO kernels; the oracle for the XLA
    # backend's lax.conv_general_dilated path) -----------------------------

    @staticmethod
    def conv2d(x: np.ndarray, w: np.ndarray, stride: int = 1,
               padding: int = 0) -> np.ndarray:
        from numpy.lib.stride_tricks import sliding_window_view

        if padding:
            x = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        kh, kw = w.shape[0], w.shape[1]
        win = sliding_window_view(x, (kh, kw), axis=(1, 2))  # (B,H',W',C,kh,kw)
        win = win[:, ::stride, ::stride]
        return np.einsum("bhwckl,klco->bhwo", win, w)

    @staticmethod
    def conv2d_kernel_grad(x: np.ndarray, grad: np.ndarray, x_shape=None,
                           w_shape=None, stride: int = 1,
                           padding: int = 0) -> np.ndarray:
        from numpy.lib.stride_tricks import sliding_window_view

        if padding:
            x = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        ho, wo = grad.shape[1], grad.shape[2]
        kh, kw = w_shape[0], w_shape[1]
        win = sliding_window_view(x, (kh, kw), axis=(1, 2))
        # strided output positions; clip the tail rows a non-dividing stride
        # never visited
        win = win[:, ::stride, ::stride][:, :ho, :wo]
        return np.einsum("bhwckl,bhwo->klco", win, grad)

    @staticmethod
    def conv2d_input_grad(grad: np.ndarray, w: np.ndarray, x_shape=None,
                          stride: int = 1, padding: int = 0) -> np.ndarray:
        b, h, wd, c = x_shape
        kh, kw = w.shape[0], w.shape[1]
        hp, wp = h + 2 * padding, wd + 2 * padding
        dx = np.zeros((b, hp, wp, c), dtype=np.result_type(grad, w))
        ho, wo = grad.shape[1], grad.shape[2]
        for i in range(kh):
            for j in range(kw):
                dx[:, i:i + stride * ho:stride, j:j + stride * wo:stride, :] += (
                    np.einsum("bhwo,co->bhwc", grad, w[i, j])
                )
        if padding:
            dx = dx[:, padding:-padding, padding:-padding, :]
        return dx

    @staticmethod
    def layernorm(x, g, b, eps: float = 1e-5):
        """Last-axis LayerNorm, the oracle for the fused TPU kernel
        (kernels/layernorm.py).  Statistics accumulate in f32 for sub-f32
        inputs and in the input dtype for f32/f64 (so f64 gradchecks keep
        f64 precision); biased variance; output in x.dtype."""
        xd = np.asarray(x)
        acc = xd.dtype if xd.dtype in (np.float64, np.float32) else np.float32
        xa = xd.astype(acc)
        mu = xa.mean(axis=-1, keepdims=True)
        xc = xa - mu
        var = (xc * xc).mean(axis=-1, keepdims=True)
        y = xc / np.sqrt(var + np.asarray(eps, acc))
        y = y * np.asarray(g, acc) + np.asarray(b, acc)
        return y.astype(xd.dtype)

    @staticmethod
    def add_layernorm(x, a, g, b, eps: float = 1e-5):
        """Fused residual-add + LayerNorm: stacked (2, *x.shape) with
        [0] = x + a and [1] = layernorm(x + a).  On TPU this is one
        HBM pass (kernels/layernorm.py); here it is the semantics oracle."""
        t = np.asarray(x) + np.asarray(a)
        return np.stack([t, NumpyBackend.layernorm(t, g, b, eps=eps)])

    @staticmethod
    def add_rmsnorm(x, a, g, eps: float = 1e-6):
        """Fused residual-add + RMSNorm (see add_layernorm)."""
        t = np.asarray(x) + np.asarray(a)
        return np.stack([t, NumpyBackend.rmsnorm(t, g, eps=eps)])

    @staticmethod
    def softmax_xent(z, lab):
        """Per-row softmax cross-entropy loss = lse(z) - z[label]; the
        oracle for the fused TPU kernel (kernels/xent.py).  Same
        accumulation-dtype rule as layernorm; loss carries that dtype."""
        zd = np.asarray(z)
        acc = zd.dtype if zd.dtype in (np.float64, np.float32) else np.float32
        za = zd.astype(acc)
        m = za.max(axis=-1, keepdims=True)
        lse = np.log(np.exp(za - m).sum(axis=-1, keepdims=True)) + m
        lab_i = np.asarray(lab).astype(np.int64)
        zlab = np.take_along_axis(za, lab_i[..., None], axis=-1)
        return (lse - zlab)[..., 0]

    @staticmethod
    def rmsnorm(x, g, eps: float = 1e-6):
        """Last-axis RMSNorm (LLaMA-style, no centering/bias); same
        accumulation-dtype rule as layernorm."""
        xd = np.asarray(x)
        acc = xd.dtype if xd.dtype in (np.float64, np.float32) else np.float32
        xa = xd.astype(acc)
        rms = np.sqrt((xa * xa).mean(axis=-1, keepdims=True)
                      + np.asarray(eps, acc))
        return (xa / rms * np.asarray(g, acc)).astype(xd.dtype)

    @staticmethod
    def sdpa(q: np.ndarray, k: np.ndarray, v: np.ndarray,
             causal: bool = False, scale=None, mask=None,
             window=None, sinks: int = 0, segment_ids=None) -> np.ndarray:
        # composed reference softmax attention (the oracle for the TPU flash
        # kernel behind XlaBackend.sdpa).  ``mask``: optional boolean,
        # broadcastable to (..., Sq, Sk); True = attend.  ``window``/
        # ``sinks``: sliding-window attention band + StreamingLLM sinks
        # (requires causal).  ``segment_ids``: (S,) or (B, S) int document
        # ids — attention stays within a document (sequence packing) —
        # all matching kernels/attention.py semantics.
        if scale is None:
            scale = 1.0 / np.sqrt(q.shape[-1])
        if window is not None and not causal:
            raise ValueError("sliding-window attention requires causal=True")
        s = np.matmul(q, np.swapaxes(k, -1, -2)).astype(np.float64) * scale
        if segment_ids is not None:
            if q.shape[-2] != k.shape[-2]:
                raise ValueError(
                    "segment_ids requires S_q == S_k (self-attention "
                    f"packing); got {q.shape[-2]} vs {k.shape[-2]}")
            sg = np.asarray(segment_ids)
            if sg.ndim == 1:
                sg = sg[None, :]
            sm = sg[:, :, None] == sg[:, None, :]   # (B, Sq, Sk)
            while sm.ndim < s.ndim:                 # head axis broadcast
                sm = sm[:, None]
            m = np.broadcast_to(sm, s.shape)
            mask = m if mask is None else (np.asarray(mask, bool) & m)
        if causal:
            sq, sk = s.shape[-2], s.shape[-1]
            rows = np.arange(sq)[:, None]
            cols = np.arange(sk)[None, :]
            cm = rows >= cols
            if window is not None and (int(window) < sq or int(window) < sk):
                live = rows - cols < int(window)
                if sinks:
                    live = live | (cols < int(sinks))
                cm = cm & live
            s = np.where(cm, s, -1e30)
        if mask is not None:
            s = np.where(np.asarray(mask, bool), s, -1e30)
        s -= s.max(axis=-1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=-1, keepdims=True)
        return np.matmul(p, v.astype(np.float64)).astype(
            np.result_type(q, k, v))
    mod = staticmethod(np.mod)
    multiply = staticmethod(np.multiply)
    not_equal = staticmethod(np.not_equal)
    power = staticmethod(np.power)
    reshape = staticmethod(np.reshape)
    subtract = staticmethod(np.subtract)
    tensordot = staticmethod(np.tensordot)
    true_divide = staticmethod(np.true_divide)

    # ---- ternary ----
    clip = staticmethod(np.clip)
    swapaxes = staticmethod(np.swapaxes)
    where = staticmethod(np.where)

    # ---- creation ----
    ones_like = staticmethod(np.ones_like)
    ones = staticmethod(np.ones)
    zeros_like = staticmethod(np.zeros_like)
    zeros = staticmethod(np.zeros)
    full_like = staticmethod(np.full_like)
    full = staticmethod(np.full)
    concatenate = staticmethod(np.concatenate)
    arange = staticmethod(np.arange)
    stack = staticmethod(np.stack)
    tile = staticmethod(np.tile)
    repeat = staticmethod(np.repeat)

    # ---- indexing / scatter (return-the-result contract) ----
    @staticmethod
    def index_add(a: np.ndarray, indices: Any, b: Any) -> np.ndarray:
        np.add.at(a, indices, b)
        return a

    @staticmethod
    def scatter_add(a: np.ndarray, indices: Any, b: Any) -> np.ndarray:
        out = np.zeros_like(a)
        np.add.at(out, indices, b)
        return out

    @staticmethod
    def put_along_axis(
        arr: np.ndarray, indices: np.ndarray, values: Any, axis: Optional[int]
    ) -> np.ndarray:
        np.put_along_axis(arr, indices, values, axis)
        return arr

    take_along_axis = staticmethod(np.take_along_axis)

    @staticmethod
    def setitem(a: np.ndarray, key: Any, value: Any) -> np.ndarray:
        a[key] = value
        return a

    isin = staticmethod(np.isin)
    unravel_index = staticmethod(np.unravel_index)
    split = staticmethod(np.split)

    # ---- random ----
    choice = staticmethod(np.random.choice)
    rand = staticmethod(np.random.rand)
    randint = staticmethod(np.random.randint)
    randn = staticmethod(np.random.randn)
    binomial = staticmethod(np.random.binomial)
    permutation = staticmethod(np.random.permutation)

    @staticmethod
    def shuffle(x: np.ndarray) -> np.ndarray:
        np.random.shuffle(x)
        return x

    @staticmethod
    def seed(value: int) -> None:
        np.random.seed(value)

    # ---- functional (counter-based) random: explicit (2,) uint32 keys ----
    # Deterministic functions of the key (splitmix64 mixing + Philox
    # bit-generation), mirroring the XLA backend's jax.random semantics.
    # Streams are backend-specific (like the reference's numpy/cupy/mlx
    # stateful streams); determinism per key is the contract, not bit
    # equality across backends.
    @staticmethod
    def _key_base(key: np.ndarray) -> int:
        k = np.asarray(key, dtype=np.uint64)
        return (int(k[0]) << 32) | int(k[1])

    @staticmethod
    def _mix64(z: int) -> int:
        m = (1 << 64) - 1
        z = (z + 0x9E3779B97F4A7C15) & m
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
        return (z ^ (z >> 31)) & m

    @staticmethod
    def _key_pack(base: int) -> np.ndarray:
        return np.array([(base >> 32) & 0xFFFFFFFF, base & 0xFFFFFFFF],
                        dtype=np.uint32)

    @classmethod
    def key_from_seed(cls, seed: int) -> np.ndarray:
        return cls._key_pack(cls._mix64(int(seed) & ((1 << 64) - 1)))

    @classmethod
    def key_fold_in(cls, key: np.ndarray, data: Any) -> np.ndarray:
        base = cls._key_base(key)
        return cls._key_pack(cls._mix64(base ^ cls._mix64(int(data))))

    @classmethod
    def key_split(cls, key: np.ndarray, num: int) -> np.ndarray:
        base = cls._key_base(key)
        return np.stack([
            cls._key_pack(cls._mix64(base ^ cls._mix64((i << 1) | 1)))
            for i in range(num)
        ])

    @classmethod
    def _key_gen(cls, key: np.ndarray) -> np.random.Generator:
        return np.random.Generator(np.random.Philox(key=cls._key_base(key)))

    @classmethod
    def key_uniform(cls, key: np.ndarray, shape: Any,
                    dtype: Any = None) -> np.ndarray:
        out = cls._key_gen(key).random(tuple(shape) if shape else ())
        return out.astype(dtype or np.float64)

    @classmethod
    def key_normal(cls, key: np.ndarray, shape: Any,
                   dtype: Any = None) -> np.ndarray:
        out = cls._key_gen(key).standard_normal(tuple(shape) if shape else ())
        return out.astype(dtype or np.float64)

    # ---- io ----
    save = staticmethod(np.save)
    load = staticmethod(np.load)

    # ---- collectives: single-device world, so psum is identity and
    # ppermute delivers only the self-edge (absent edge -> zeros, matching
    # jax.lax.ppermute's missing-source semantics) ----
    @staticmethod
    def psum(x: np.ndarray, axis_name: str) -> np.ndarray:
        return x

    @staticmethod
    def ppermute(x: np.ndarray, axis_name: str, perm: Any) -> np.ndarray:
        if any(tuple(p) == (0, 0) for p in perm):
            return x
        return np.zeros_like(x)

    @staticmethod
    def pmean(x: np.ndarray, axis_name: str) -> np.ndarray:
        return x

    @staticmethod
    def all_gather(x: np.ndarray, axis_name: str, axis: int = 0,
                   tiled: bool = True) -> np.ndarray:
        # world size 1: tiled concat of one shard is the shard itself;
        # untiled inserts a unit group axis (matching jax.lax.all_gather)
        return x if tiled else np.expand_dims(x, axis)

    @staticmethod
    def psum_scatter(x: np.ndarray, axis_name: str,
                     scatter_dimension: int = 0,
                     tiled: bool = True) -> np.ndarray:
        # world size 1: the sum is the local value and the single device
        # keeps the whole (tiled) slice / drops the unit axis (untiled)
        return x if tiled else np.squeeze(x, axis=scatter_dimension)

    @staticmethod
    def all_to_all(x: np.ndarray, axis_name: str, split_axis: int,
                   concat_axis: int) -> np.ndarray:
        return x  # one device exchanges one chunk with itself

    @staticmethod
    def axis_size(axis_name: str) -> int:
        return 1

    # ---- functional ----
    @staticmethod
    def vmap(fun: Callable) -> Callable:
        # reference contract (minidiff/tensor.py:518-536): the FIRST argument
        # maps over its leading axis; extras pass through unmapped
        def mapped(arr: np.ndarray, *args: Any, **kwargs: Any) -> np.ndarray:
            return np.stack([fun(row, *args, **kwargs) for row in arr])

        return mapped

    # ---- properties ----
    @staticmethod
    def tensor_shape(data: np.ndarray) -> Tuple[int, ...]:
        return data.shape

    @staticmethod
    def tensor_size(data: np.ndarray) -> int:
        return data.size

    @staticmethod
    def tensor_ndim(data: np.ndarray) -> int:
        return data.ndim

    @staticmethod
    def tensor_dtype(data: np.ndarray) -> np.dtype:
        return data.dtype

    @staticmethod
    def tensor_item(data: np.ndarray) -> Any:
        return data.item()

    @staticmethod
    def repr(data: np.ndarray) -> str:
        return data.__repr__()

    @staticmethod
    def len(data: np.ndarray) -> int:
        return data.__len__()

    @staticmethod
    def array_interface(data: np.ndarray) -> dict:
        return data.__array_interface__

    @staticmethod
    def array(
        data: np.ndarray,
        dtype: Optional[np.dtype] = None,
        copy: Optional[py_bool] = None,
    ) -> np.ndarray:
        if dtype is not None and dtype != data.dtype:
            if copy is False:
                raise ValueError("attempted cast, but copies are not permitted")
            return data.astype(dtype)
        if copy:
            return data.copy()
        return data

    @staticmethod
    def as_numpy(a: Any) -> np.ndarray:
        return np.asarray(a)

    # ---- dtypes ----
    dtype = np.dtype
    float64 = np.float64
    float32 = np.float32
    float16 = np.float16
    bfloat16 = _bfloat16
    uint64 = np.uint64
    uint32 = np.uint32
    uint16 = np.uint16
    uint8 = np.uint8
    int64 = np.int64
    int32 = np.int32
    int16 = np.int16
    int8 = np.int8
    bool = np.bool_
    nan = np.nan


from minidiff_tpu.backend import register_backend

register_backend("numpy", NumpyBackend)
