"""PyTorch (CPU) backend — the third concrete array backend.

Role: prove the backend abstraction's generality with a genuinely different
array library (the reference ships numpy/cupy/mlx behind one interface;
its MLX backend is mostly shims for missing APIs, minidiff/backend/mlx.py:16-363
— this backend plays that part here).  Autograd is OURS: torch tensors are
plain value arrays (every constructor detaches), the tape provides
differentiation.

Shim notes (numpy semantics torch lacks natively):
* ``flatten``/``ravel``/``reshape`` honor ``order="F"`` via permute-reshape.
* ``prod``/``all``/``any``/``flip``/``cumsum``/``sort`` normalize numpy's
  axis conventions (tuples, None-flattening) onto torch's.
* ``split`` replicates numpy's strict equal-division error semantics.
* ``choice`` is a full reimplementation over torch.multinomial (the
  reference MLX backend does the same, mlx.py:209-255).
* ``rand``/``randn`` draw float64 to match the numpy oracle's default.
* conv2d family maps NHWC/HWIO onto torch's NCHW/OIHW native kernels
  (torch.nn.grad supplies the input/weight gradients).
* the functional key_* RNG reuses the numpy backend's splitmix64+Philox
  stream, converted — identical draws for identical keys across the two
  CPU backends.
"""

from __future__ import annotations

from builtins import bool as py_bool
from typing import TYPE_CHECKING

import numpy as np
import torch

from minidiff_tpu.backend.numpy_backend import NumpyBackend

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Sequence, Tuple

torch.set_num_threads(max(1, torch.get_num_threads()))

_NP_TO_TORCH = {
    np.dtype(np.float64): torch.float64,
    np.dtype(np.float32): torch.float32,
    np.dtype(np.float16): torch.float16,
    np.dtype(np.int64): torch.int64,
    np.dtype(np.int32): torch.int32,
    np.dtype(np.int16): torch.int16,
    np.dtype(np.int8): torch.int8,
    np.dtype(np.uint8): torch.uint8,
    np.dtype(np.bool_): torch.bool,
}


def _dt(dtype: "Any") -> torch.dtype:
    """Normalize numpy/str/torch dtype spellings onto torch dtypes."""
    if dtype is None or isinstance(dtype, torch.dtype):
        return dtype
    try:
        return _NP_TO_TORCH[np.dtype(dtype)]
    except (TypeError, KeyError):
        name = getattr(dtype, "__name__", str(dtype))
        resolved = getattr(torch, name.replace("bool_", "bool"), None)
        if isinstance(resolved, torch.dtype):
            return resolved
        raise TypeError(f"cannot map {dtype!r} to a torch dtype") from None


def _t(x: "Any") -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x
    return torch.as_tensor(np.asarray(x))


def _axis_tuple(axis, ndim: int):
    if axis is None:
        return tuple(range(ndim))
    if isinstance(axis, (list, tuple)):
        return tuple(int(a) % ndim for a in axis)
    return (int(axis) % ndim,)


def _f_order_perm(ndim: int):
    return tuple(reversed(range(ndim)))


class TorchBackend:
    name = "torch"

    tensor_class = torch.Tensor

    @staticmethod
    def tensor_constructor(data: "Any", dtype: "Any" = None) -> torch.Tensor:
        # torch autograd never engages: the tape is the differentiator
        out = _t(data).detach()
        if dtype is not None:
            out = out.to(_dt(dtype))
        return out.clone() if out is data else out

    # ---- elementwise unary ----
    absolute = staticmethod(torch.absolute)
    ceil = staticmethod(torch.ceil)
    copy = staticmethod(lambda a: _t(a).clone())
    cos = staticmethod(torch.cos)
    cosh = staticmethod(torch.cosh)
    erf = staticmethod(lambda a: torch.erf(_t(a)))
    exp = staticmethod(torch.exp)
    floor = staticmethod(torch.floor)
    invert = staticmethod(torch.bitwise_not)
    log = staticmethod(torch.log)
    logical_not = staticmethod(torch.logical_not)
    sign = staticmethod(torch.sign)
    sin = staticmethod(torch.sin)
    sinh = staticmethod(torch.sinh)
    sqrt = staticmethod(torch.sqrt)
    square = staticmethod(torch.square)
    tan = staticmethod(torch.tan)
    tanh = staticmethod(torch.tanh)

    # ---- shape unary ----
    @staticmethod
    def atleast_1d(a):
        return torch.atleast_1d(_t(a))

    @staticmethod
    def atleast_2d(a):
        return torch.atleast_2d(_t(a))

    @staticmethod
    def atleast_3d(a):
        return torch.atleast_3d(_t(a))

    @staticmethod
    def flatten(a, order: str = "C") -> torch.Tensor:
        a = _t(a)
        if order == "F":
            a = a.permute(_f_order_perm(a.ndim))
        return a.reshape(-1).clone()

    @classmethod
    def ravel(cls, a, order: str = "C") -> torch.Tensor:
        return cls.flatten(a, order=order)

    @staticmethod
    def squeeze(a, axis=None) -> torch.Tensor:
        a = _t(a)
        if axis is None:
            return a.squeeze()
        return a.squeeze(axis if isinstance(axis, int) else tuple(axis))

    @staticmethod
    def transpose(a, axes=None) -> torch.Tensor:
        a = _t(a)
        if axes is None:
            axes = _f_order_perm(a.ndim)
        return a.permute(tuple(int(x) for x in axes))

    @staticmethod
    def flip(a, axis=None) -> torch.Tensor:
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        return torch.flip(a, dims)

    # ---- reductions / search ----
    @staticmethod
    def all(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        return torch.all(a.bool(), dim=_axis_tuple(axis, a.ndim) or None,
                         keepdim=keepdims) if a.ndim else torch.all(a)

    @staticmethod
    def any(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        return torch.any(a.bool(), dim=_axis_tuple(axis, a.ndim) or None,
                         keepdim=keepdims) if a.ndim else torch.any(a)

    @staticmethod
    def argmax(a, axis=None, keepdims: py_bool = False):
        return torch.argmax(_t(a), dim=axis, keepdim=keepdims)

    @staticmethod
    def argmin(a, axis=None, keepdims: py_bool = False):
        return torch.argmin(_t(a), dim=axis, keepdim=keepdims)

    argwhere = staticmethod(lambda a: torch.argwhere(_t(a)))

    @staticmethod
    def max(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        if not dims:
            return a.clone()
        return torch.amax(a, dim=dims, keepdim=keepdims)

    @staticmethod
    def min(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        if not dims:
            return a.clone()
        return torch.amin(a, dim=dims, keepdim=keepdims)

    @staticmethod
    def sum(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        if not dims:
            return a.clone()
        return torch.sum(a, dim=dims, keepdim=keepdims)

    @staticmethod
    def mean(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        if not dims:
            return a.clone()
        return torch.mean(a, dim=dims, keepdim=keepdims)

    @staticmethod
    def prod(a, axis=None, keepdims: py_bool = False):
        a = _t(a)
        dims = sorted(_axis_tuple(axis, a.ndim), reverse=True)
        if not dims:
            return a.clone()
        out = a
        for d in dims:  # torch.prod reduces one dim at a time
            out = torch.prod(out, dim=d, keepdim=True)
        if not keepdims:
            for d in dims:
                out = out.squeeze(d)
        return out

    @staticmethod
    def std(a, axis=None, ddof: int = 0, keepdims: py_bool = False):
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        return torch.std(a, dim=dims or None, correction=ddof,
                         keepdim=keepdims)

    @staticmethod
    def var(a, axis=None, ddof: int = 0, keepdims: py_bool = False):
        a = _t(a)
        dims = _axis_tuple(axis, a.ndim)
        return torch.var(a, dim=dims or None, correction=ddof,
                         keepdim=keepdims)

    @staticmethod
    def cumsum(a, axis=None):
        a = _t(a)
        if axis is None:
            return torch.cumsum(a.reshape(-1), dim=0)
        return torch.cumsum(a, dim=axis)

    @staticmethod
    def linear_scan(a, b, axis=-1):
        # y_t = a_t * y_{t-1} + b_t, y_{-1} = 0 (sequential, like the numpy
        # oracle; the parallel formulation lives in the xla backend)
        a, b = _t(a), _t(b)
        a = torch.movedim(a, axis, 0)
        b = torch.movedim(b, axis, 0)
        out = torch.empty(b.shape, dtype=torch.promote_types(a.dtype, b.dtype))
        acc = torch.zeros(b.shape[1:], dtype=out.dtype)
        for t in range(b.shape[0]):
            acc = a[t] * acc + b[t]
            out[t] = acc
        return torch.movedim(out, 0, axis)

    @staticmethod
    def sort(a, axis=-1):
        a = _t(a)
        if axis is None:
            return torch.sort(a.reshape(-1), dim=0).values
        return torch.sort(a, dim=axis).values

    @staticmethod
    def argsort(a, axis=-1):
        a = _t(a)
        if axis is None:
            return torch.argsort(a.reshape(-1), dim=0)
        return torch.argsort(a, dim=axis)

    @staticmethod
    def top_k_indices(a, k: int):
        return torch.topk(_t(a), k, dim=-1, sorted=True).indices

    # ---- binary ----
    add = staticmethod(lambda a, b: torch.add(_t(a), _t(b)))
    einsum = staticmethod(lambda spec, *ops: torch.einsum(
        spec, *[_t(o) for o in ops]))
    maximum = staticmethod(lambda a, b: torch.maximum(_t(a), _t(b)))
    minimum = staticmethod(lambda a, b: torch.minimum(_t(a), _t(b)))

    @staticmethod
    def astype(a, dtype, **kwargs):
        return _t(a).to(_dt(dtype))

    broadcast_to = staticmethod(lambda a, shape: torch.broadcast_to(
        _t(a), tuple(shape)))

    @staticmethod
    def dot(a, b):
        a, b = _t(a), _t(b)
        if a.ndim == 0 or b.ndim == 0:
            return a * b
        if a.ndim == 1 and b.ndim == 1:
            return torch.dot(a, b)
        if b.ndim == 1:
            return torch.tensordot(a, b, dims=([a.ndim - 1], [0]))
        # numpy N-D dot: contract a's last axis with b's second-to-last
        return torch.tensordot(a, b, dims=([a.ndim - 1], [b.ndim - 2]))

    equal = staticmethod(lambda a, b: torch.eq(_t(a), _t(b)))

    @staticmethod
    def expand_dims(a, axis):
        a = _t(a)
        if isinstance(axis, int):
            axis = (axis,)
        out_ndim = a.ndim + len(axis)
        norm = sorted(ax % out_ndim for ax in axis)
        for ax in norm:
            a = a.unsqueeze(ax)
        return a

    floor_divide = staticmethod(lambda a, b: torch.floor_divide(_t(a), _t(b)))

    @staticmethod
    def getitem(a, key):
        return _t(a)[key]

    greater = staticmethod(lambda a, b: torch.gt(_t(a), _t(b)))
    greater_equal = staticmethod(lambda a, b: torch.ge(_t(a), _t(b)))
    less = staticmethod(lambda a, b: torch.lt(_t(a), _t(b)))
    less_equal = staticmethod(lambda a, b: torch.le(_t(a), _t(b)))
    logical_and = staticmethod(lambda a, b: torch.logical_and(_t(a), _t(b)))
    logical_or = staticmethod(lambda a, b: torch.logical_or(_t(a), _t(b)))
    logical_xor = staticmethod(lambda a, b: torch.logical_xor(_t(a), _t(b)))
    matmul = staticmethod(lambda a, b: torch.matmul(_t(a), _t(b)))

    @staticmethod
    def matmul_nt(a, b):
        a, b = _t(a), _t(b)
        if a.ndim < 2 or b.ndim < 2:
            raise ValueError("matmul_nt requires operands with ndim >= 2")
        return torch.matmul(a, b.transpose(-1, -2))

    @staticmethod
    def matmul_tn(a, b):
        a, b = _t(a), _t(b)
        if a.ndim < 2 or b.ndim < 2:
            raise ValueError("matmul_tn requires operands with ndim >= 2")
        return torch.matmul(a.transpose(-1, -2), b)

    @staticmethod
    def quantize_int8(w):
        w = _t(w)
        if w.ndim != 2:
            raise ValueError("quantize_int8 expects a 2-D weight matrix")
        w32 = w.to(torch.float32)
        amax = torch.max(torch.abs(w32), dim=0).values
        s = torch.where(amax > 0, amax / 127.0,
                        torch.ones_like(amax))
        q = torch.clamp(torch.round(w32 / s), -127, 127).to(torch.int8)
        return q, s

    @staticmethod
    def dequant_matmul(x, q, s):
        x, q, s = _t(x), _t(q), _t(s)
        if q.ndim != 2:
            raise ValueError("dequant_matmul expects a 2-D int8 weight")
        acc = torch.matmul(x, q.to(x.dtype))
        return (acc * s.to(x.dtype)).to(x.dtype)

    @staticmethod
    def quantize_int8_stacked(w):
        w = _t(w)
        if w.ndim != 3:
            raise ValueError(
                "quantize_int8_stacked expects a 3-D weight bank")
        w32 = w.to(torch.float32)
        amax = torch.max(torch.abs(w32), dim=1).values       # (E, N)
        s = torch.where(amax > 0, amax / 127.0, torch.ones_like(amax))
        q = torch.clamp(torch.round(w32 / s[:, None, :]), -127,
                        127).to(torch.int8)
        return q, s

    @staticmethod
    def dequant_matmul_bmm(x, q, s):
        x, q, s = _t(x), _t(q), _t(s)
        if q.ndim != 3:
            raise ValueError("dequant_matmul_bmm expects a 3-D int8 bank")
        acc = torch.matmul(x, q.to(x.dtype))
        return (acc * s.to(x.dtype)[:, None, :]).to(x.dtype)

    @staticmethod
    def quantize_int4(w, group: int = 128):
        w = _t(w)
        if w.ndim != 2:
            raise ValueError("quantize_int4 expects a 2-D weight matrix")
        k, n = w.shape
        if k % 2 or k % group:
            raise ValueError(
                f"K={k} must be even and divisible by group={group}")
        w32 = w.to(torch.float32)
        amax = torch.max(torch.abs(w32.reshape(k // group, group, n)),
                         dim=1).values
        s = torch.where(amax > 0, amax / 7.0, torch.ones_like(amax))
        q = torch.clamp(
            torch.round(w32 / torch.repeat_interleave(s, group, dim=0)),
            -7, 7).to(torch.int32)
        lo, hi = q[: k // 2], q[k // 2:]
        packed = (((hi << 4) | (lo & 0xF)) & 0xFF).to(torch.uint8)
        return packed.view(torch.int8), s

    @staticmethod
    def unpack_int4(p):
        pi = _t(p).to(torch.int32)
        lo = (pi << 28) >> 28
        hi = (pi << 24) >> 28
        return torch.cat([lo, hi], dim=0).to(torch.int8)

    @staticmethod
    def dequant_matmul4(x, p, s):
        x, p, s = _t(x), _t(p), _t(s)
        pi = p.to(torch.int32)
        lo = (pi << 28) >> 28
        hi = (pi << 24) >> 28
        q = torch.cat([lo, hi], dim=0)
        k = q.shape[0]
        groups = s.shape[0]
        w = q.to(x.dtype) * torch.repeat_interleave(
            s.to(x.dtype), k // groups, dim=0)
        return torch.matmul(x, w).to(x.dtype)

    @staticmethod
    def quantize_int8_rows(x):
        x32 = _t(x).to(torch.float32)
        amax = torch.max(torch.abs(x32), dim=-1).values
        s = torch.where(amax > 0, amax / 127.0, torch.ones_like(amax))
        q = torch.clamp(torch.round(x32 / s.unsqueeze(-1)),
                        -127, 127).to(torch.int8)
        return q, s

    @staticmethod
    def sdpa_int8_cache(q, k8, ks, v8, vs, pos, scale=None):
        # same algebra as the numpy oracle (see numpy_backend)
        import math

        q, k8, ks, v8, vs, pos = (_t(a) for a in (q, k8, ks, v8, vs, pos))
        b, h, c, hd = q.shape
        kv, L = k8.shape[1], k8.shape[2]
        g = h // kv
        sc = float(scale) if scale is not None else 1.0 / math.sqrt(hd)
        qg = q.reshape(b, kv, g * c, hd).to(torch.float32)
        scores = torch.einsum("bkqd,bkld->bkql", qg, k8.to(torch.float32))
        scores = scores * ks.to(torch.float32)[:, :, None, :] * sc
        row_i = (torch.arange(g * c) % c)[None, None, :, None]
        col_l = torch.arange(L)[None, None, None, :]
        visible = col_l <= pos.to(torch.int64)[:, None, None, None] + row_i
        scores = torch.where(visible, scores,
                             torch.full_like(scores, -1e30))
        p = torch.softmax(scores, dim=-1)
        pv = p * vs.to(torch.float32)[:, :, None, :]
        out = torch.einsum("bkql,bkld->bkqd", pv, v8.to(torch.float32))
        return out.reshape(b, h, c, hd).to(q.dtype)

    # ---- conv2d family: NHWC/HWIO contract onto torch NCHW/OIHW ----
    @staticmethod
    def conv2d(x, w, stride: int = 1, padding: int = 0):
        x, w = _t(x), _t(w)
        xt = x.permute(0, 3, 1, 2)  # NHWC -> NCHW
        wt = w.permute(3, 2, 0, 1)  # HWIO -> OIHW
        out = torch.nn.functional.conv2d(xt, wt, stride=stride,
                                         padding=padding)
        return out.permute(0, 2, 3, 1)

    @staticmethod
    def conv2d_kernel_grad(x, grad, x_shape=None, w_shape=None,
                           stride: int = 1, padding: int = 0):
        x, grad = _t(x), _t(grad)
        xt = x.permute(0, 3, 1, 2)
        gt = grad.permute(0, 3, 1, 2)
        kh, kw = int(w_shape[0]), int(w_shape[1])
        wt = torch.nn.grad.conv2d_weight(
            xt, (gt.shape[1], xt.shape[1], kh, kw), gt,
            stride=stride, padding=padding,
        )  # OIHW
        return wt.permute(2, 3, 1, 0)  # -> HWIO

    @staticmethod
    def conv2d_input_grad(grad, w, x_shape=None, stride: int = 1,
                          padding: int = 0):
        grad, w = _t(grad), _t(w)
        gt = grad.permute(0, 3, 1, 2)
        wt = w.permute(3, 2, 0, 1)
        b, h, wd, c = (int(d) for d in x_shape)
        xt = torch.nn.grad.conv2d_input(
            (b, c, h, wd), wt, gt, stride=stride, padding=padding)
        return xt.permute(0, 2, 3, 1)

    @staticmethod
    def layernorm(x, g, b, eps: float = 1e-5):
        # same accumulation rule as the numpy oracle (see numpy_backend)
        x, g, b = _t(x), _t(g), _t(b)
        acc = x.dtype if x.dtype in (torch.float64, torch.float32) \
            else torch.float32
        xa = x.to(acc)
        mu = xa.mean(dim=-1, keepdim=True)
        xc = xa - mu
        var = (xc * xc).mean(dim=-1, keepdim=True)
        y = xc * torch.rsqrt(var + eps) * g.to(acc) + b.to(acc)
        return y.to(x.dtype)

    @staticmethod
    def add_layernorm(x, a, g, b, eps: float = 1e-5):
        # stacked (2, ...): [0] = x + a, [1] = layernorm(x + a) — see the
        # numpy oracle / kernels/layernorm.py for the fusion story
        t = _t(x) + _t(a)
        return torch.stack([t, TorchBackend.layernorm(t, g, b, eps=eps)])

    @staticmethod
    def add_rmsnorm(x, a, g, eps: float = 1e-6):
        t = _t(x) + _t(a)
        return torch.stack([t, TorchBackend.rmsnorm(t, g, eps=eps)])

    @staticmethod
    def softmax_xent(z, lab):
        # same accumulation rule as the numpy oracle
        z, lab = _t(z), _t(lab)
        acc = z.dtype if z.dtype in (torch.float64, torch.float32) \
            else torch.float32
        za = z.to(acc)
        lse = torch.logsumexp(za, dim=-1, keepdim=True)
        zlab = torch.gather(za, -1, lab.to(torch.int64)[..., None])
        return (lse - zlab)[..., 0]

    @staticmethod
    def rmsnorm(x, g, eps: float = 1e-6):
        # same accumulation rule as the numpy oracle
        x, g = _t(x), _t(g)
        acc = x.dtype if x.dtype in (torch.float64, torch.float32) \
            else torch.float32
        xa = x.to(acc)
        rsig = torch.rsqrt((xa * xa).mean(dim=-1, keepdim=True) + eps)
        return (xa * rsig * g.to(acc)).to(x.dtype)

    @staticmethod
    def sdpa(q, k, v, causal: py_bool = False, scale=None, mask=None,
             window=None, sinks: int = 0, segment_ids=None):
        q, k, v = _t(q), _t(k), _t(v)
        if scale is None:
            scale = 1.0 / float(q.shape[-1]) ** 0.5
        if window is not None and not causal:
            raise ValueError("sliding-window attention requires causal=True")
        s = torch.matmul(q.double(), k.double().transpose(-1, -2)) * scale
        if segment_ids is not None:
            if q.shape[-2] != k.shape[-2]:
                raise ValueError(
                    "segment_ids requires S_q == S_k (self-attention "
                    f"packing); got {q.shape[-2]} vs {k.shape[-2]}")
            sg = _t(segment_ids)
            if sg.ndim == 1:
                sg = sg[None, :]
            sm = sg[:, :, None] == sg[:, None, :]   # (B, Sq, Sk)
            while sm.ndim < s.ndim:                 # head axis broadcast
                sm = sm[:, None]
            mask = sm if mask is None else (_t(mask).bool() & sm)
        if causal:
            sq, sk = s.shape[-2], s.shape[-1]
            rows = torch.arange(sq)[:, None]
            cols = torch.arange(sk)[None, :]
            cm = rows >= cols
            if window is not None and (int(window) < sq or int(window) < sk):
                live = rows - cols < int(window)
                if sinks:
                    live = live | (cols < int(sinks))
                cm = cm & live
            s = torch.where(cm, s, torch.full_like(s, -1e30))
        if mask is not None:
            s = torch.where(_t(mask).bool(), s, torch.full_like(s, -1e30))
        p = torch.softmax(s, dim=-1)
        out = torch.matmul(p, v.double())
        return out.to(torch.promote_types(q.dtype, k.dtype))

    mod = staticmethod(lambda a, b: torch.remainder(_t(a), _t(b)))
    multiply = staticmethod(lambda a, b: torch.multiply(_t(a), _t(b)))
    not_equal = staticmethod(lambda a, b: torch.ne(_t(a), _t(b)))
    power = staticmethod(lambda a, b: torch.pow(_t(a), _t(b)))

    @staticmethod
    def reshape(a, shape, order: str = "C"):
        a = _t(a)
        if isinstance(shape, int):
            shape = (shape,)
        if order == "F":
            # numpy F-order reshape = read F, write F
            flat = a.permute(_f_order_perm(a.ndim)).reshape(-1)
            rev = tuple(reversed(tuple(shape)))
            return flat.reshape(rev).permute(_f_order_perm(len(rev)))
        return a.reshape(tuple(shape))

    subtract = staticmethod(lambda a, b: torch.subtract(_t(a), _t(b)))

    @staticmethod
    def tensordot(a, b, axes=2):
        if isinstance(axes, (list, tuple)):
            ax_a, ax_b = axes
            if isinstance(ax_a, int):
                ax_a, ax_b = [ax_a], [ax_b]
            return torch.tensordot(_t(a), _t(b),
                                   dims=(list(ax_a), list(ax_b)))
        return torch.tensordot(_t(a), _t(b), dims=int(axes))

    true_divide = staticmethod(lambda a, b: torch.true_divide(_t(a), _t(b)))

    # ---- ternary ----
    @staticmethod
    def clip(a, a_min=None, a_max=None):
        return torch.clamp(_t(a), min=a_min, max=a_max)

    swapaxes = staticmethod(lambda a, ax1, ax2: torch.swapaxes(
        _t(a), int(ax1), int(ax2)))

    @staticmethod
    def where(condition, x, y):
        c = _t(condition).bool()
        return torch.where(c, _t(x), _t(y))

    # ---- creation (float64 default, matching the numpy oracle) ----
    ones_like = staticmethod(lambda a: torch.ones_like(_t(a)))
    zeros_like = staticmethod(lambda a: torch.zeros_like(_t(a)))

    @staticmethod
    def ones(shape, dtype=None):
        return torch.ones(tuple(np.atleast_1d(shape)),
                          dtype=_dt(dtype) or torch.float64)

    @staticmethod
    def zeros(shape, dtype=None):
        return torch.zeros(tuple(np.atleast_1d(shape)),
                           dtype=_dt(dtype) or torch.float64)

    full_like = staticmethod(lambda a, v: torch.full_like(_t(a), v))

    @staticmethod
    def full(shape, fill_value, dtype=None):
        if isinstance(shape, int):
            shape = (shape,)
        out = torch.full(tuple(shape), fill_value, dtype=_dt(dtype))
        return out.double() if out.dtype == torch.float32 and dtype is None \
            else out

    @staticmethod
    def concatenate(arrays, axis=0):
        return torch.concatenate([_t(a) for a in arrays], dim=axis)

    @staticmethod
    def arange(*args, **kwargs):
        return torch.as_tensor(np.arange(*args, **kwargs))

    @staticmethod
    def stack(arrays, axis=0):
        return torch.stack([_t(a) for a in arrays], dim=axis)

    @staticmethod
    def tile(a, reps):
        return torch.tile(_t(a), tuple(np.atleast_1d(reps)))

    @staticmethod
    def repeat(a, repeats, axis=None):
        return torch.repeat_interleave(_t(a), _t(repeats) if not
                                       isinstance(repeats, int) else repeats,
                                       dim=axis)

    # ---- indexing / scatter (return-the-result contract) ----
    @staticmethod
    def _np_key(indices):
        """Torch tensors in an index key -> numpy, slices/ints pass through."""
        if not isinstance(indices, tuple):
            indices = (indices,)
        return tuple(
            i.numpy() if isinstance(i, torch.Tensor) else i for i in indices
        )

    @classmethod
    def _add_at(cls, a, indices, b):
        # np.add.at via the shared-memory numpy view of a CPU torch tensor:
        # exact numpy scatter semantics (repeats accumulate, basic slices
        # stay basic) with the mutation landing in the torch buffer
        view = a.numpy()
        np.add.at(view, cls._np_key(indices), TorchBackend.as_numpy(_t(b)))
        return a

    @classmethod
    def index_add(cls, a, indices, b):
        return cls._add_at(_t(a).clone(), indices, b)

    @classmethod
    def scatter_add(cls, a, indices, b):
        return cls._add_at(torch.zeros_like(_t(a)), indices, b)

    @staticmethod
    def put_along_axis(arr, indices, values, axis):
        arr = _t(arr).clone()
        if axis is None:
            flat = arr.reshape(-1)
            flat.scatter_(0, _t(indices).reshape(-1).long(),
                          torch.broadcast_to(
                              _t(values).to(arr.dtype),
                              _t(indices).shape).reshape(-1))
            return flat.reshape(arr.shape)
        idx = _t(indices).long()
        vals = torch.broadcast_to(_t(values).to(arr.dtype), idx.shape)
        arr.scatter_(axis, idx, vals)
        return arr

    @staticmethod
    def take_along_axis(a, indices, axis):
        return torch.take_along_dim(_t(a), _t(indices).long(), dim=axis)

    @staticmethod
    def setitem(a, key, value):
        a = _t(a).clone()
        a[key] = torch.as_tensor(value, dtype=a.dtype) \
            if not isinstance(value, torch.Tensor) else value.to(a.dtype)
        return a

    isin = staticmethod(lambda e, t: torch.isin(_t(e), _t(t)))

    @staticmethod
    def unravel_index(indices, shape):
        return torch.unravel_index(_t(indices).long(), tuple(shape))

    @staticmethod
    def split(a, sections, axis=0):
        # numpy semantics: int sections must divide exactly; lists are
        # boundary indices
        a = _t(a)
        if isinstance(sections, int):
            if a.shape[axis] % sections != 0:
                raise ValueError(
                    "array split does not result in an equal division")
            return list(torch.chunk(a, sections, dim=axis))
        return list(torch.tensor_split(
            a, [int(s) for s in sections], dim=axis))

    # ---- random (torch global generator; float64 draws) ----
    @staticmethod
    def seed(value: int) -> None:
        torch.manual_seed(int(value))

    @staticmethod
    def rand(*dims: int):
        return torch.rand(tuple(dims), dtype=torch.float64)

    @staticmethod
    def randn(*dims: int):
        return torch.randn(tuple(dims), dtype=torch.float64)

    @staticmethod
    def randint(low, high=None, size=None):
        if high is None:
            low, high = 0, low
        if size is None:
            lo, hi = _t(low), _t(high)
            shape = torch.broadcast_shapes(lo.shape, hi.shape)
            u = torch.rand(shape, dtype=torch.float64)
            return (lo + (u * (hi - lo).double()).floor().long()).long()
        if isinstance(size, int):
            size = (size,)
        lo, hi = _t(low), _t(high)
        if lo.ndim == 0 and hi.ndim == 0:
            return torch.randint(int(lo), int(hi), tuple(size))
        u = torch.rand(tuple(size), dtype=torch.float64)
        return (lo + (u * (hi - lo).double()).floor().long()).long()

    @staticmethod
    def binomial(n, p, size=None):
        nt = _t(n).double()
        pt = _t(p).double()
        if size is not None:
            shape = (size,) if isinstance(size, int) else tuple(size)
            nt = torch.broadcast_to(nt, shape)
            pt = torch.broadcast_to(pt, shape)
        else:
            shape = torch.broadcast_shapes(nt.shape, pt.shape)
            nt = torch.broadcast_to(nt, shape)
            pt = torch.broadcast_to(pt, shape)
        return torch.binomial(nt.contiguous(), pt.contiguous()).long()

    @staticmethod
    def choice(a, size=None, replace: py_bool = True, p=None):
        # full reimplementation (torch has no np.random.choice): the same
        # shim discipline the reference's MLX backend demonstrates
        pool = torch.arange(a) if isinstance(a, (int, np.integer)) else _t(a)
        n = pool.shape[0]
        count = int(np.prod(size)) if size is not None else 1
        if p is None:
            weights = torch.ones(n, dtype=torch.float64)
        else:
            weights = _t(p).double()
        idx = torch.multinomial(weights, count, replacement=replace)
        out = pool[idx]
        if size is None:
            return out[0]
        return out.reshape((size,) if isinstance(size, int) else tuple(size))

    @staticmethod
    def permutation(x):
        if isinstance(x, (int, np.integer)):
            return torch.randperm(int(x))
        x = _t(x)
        return x[torch.randperm(x.shape[0])]

    @classmethod
    def shuffle(cls, x):
        return cls.permutation(x)

    # ---- functional keyed RNG: same stream as the numpy oracle ----
    key_from_seed = staticmethod(
        lambda seed: torch.as_tensor(
            NumpyBackend.key_from_seed(seed).astype(np.int64)
        ).to(torch.int64))

    @staticmethod
    def key_fold_in(key, data):
        k = np.asarray(_t(key).numpy(), dtype=np.uint32)
        return torch.as_tensor(
            NumpyBackend.key_fold_in(k, int(data)).astype(np.int64))

    @staticmethod
    def key_split(key, num: int):
        k = np.asarray(_t(key).numpy(), dtype=np.uint32)
        return torch.as_tensor(
            NumpyBackend.key_split(k, num).astype(np.int64))

    @staticmethod
    def key_uniform(key, shape, dtype=None):
        k = np.asarray(_t(key).numpy(), dtype=np.uint32)
        out = NumpyBackend.key_uniform(k, shape, None)
        return torch.as_tensor(out).to(_dt(dtype) or torch.float64)

    @staticmethod
    def key_normal(key, shape, dtype=None):
        k = np.asarray(_t(key).numpy(), dtype=np.uint32)
        out = NumpyBackend.key_normal(k, shape, None)
        return torch.as_tensor(out).to(_dt(dtype) or torch.float64)

    # ---- io (numpy container round-trip) ----
    @staticmethod
    def save(file, arr):
        np.save(file, _t(arr).numpy())

    @staticmethod
    def load(file):
        return torch.as_tensor(np.load(file))

    # ---- collectives: single-device semantics (like the numpy oracle) ----
    @staticmethod
    def psum(x, axis_name: str):
        return x

    @staticmethod
    def ppermute(x, axis_name: str, perm):
        if any(tuple(p) == (0, 0) for p in perm):
            return x
        return torch.zeros_like(_t(x))

    @staticmethod
    def pmean(x, axis_name: str):
        return x

    @staticmethod
    def all_gather(x, axis_name: str, axis: int = 0, tiled: bool = True):
        return x if tiled else torch.unsqueeze(_t(x), axis)

    @staticmethod
    def psum_scatter(x, axis_name: str, scatter_dimension: int = 0,
                     tiled: bool = True):
        return x if tiled else torch.squeeze(_t(x), scatter_dimension)

    @staticmethod
    def all_to_all(x, axis_name: str, split_axis: int, concat_axis: int):
        return x

    @staticmethod
    def axis_size(axis_name: str) -> int:
        return 1

    # ---- functional ----
    @staticmethod
    def vmap(fun: "Callable") -> "Callable":
        def mapped(arr, *args, **kwargs):
            return torch.stack([fun(row, *args, **kwargs) for row in _t(arr)])

        return mapped

    # ---- properties ----
    @staticmethod
    def tensor_shape(data: torch.Tensor):
        return tuple(data.shape)

    @staticmethod
    def tensor_size(data: torch.Tensor) -> int:
        return data.numel()

    @staticmethod
    def tensor_ndim(data: torch.Tensor) -> int:
        return data.ndim

    @staticmethod
    def tensor_dtype(data: torch.Tensor):
        return data.dtype

    @staticmethod
    def tensor_item(data: torch.Tensor):
        return data.item()

    @staticmethod
    def repr(data: torch.Tensor) -> str:
        return repr(data)

    @staticmethod
    def len(data: torch.Tensor) -> int:
        return data.shape[0]

    @staticmethod
    def array_interface(data: torch.Tensor) -> dict:
        return data.numpy().__array_interface__

    @staticmethod
    def array(data: torch.Tensor, dtype=None, copy=None):
        want = _dt(dtype)
        if want is not None and want != data.dtype:
            if copy is False:
                raise ValueError("attempted cast, but copies are not permitted")
            return data.to(want)
        if copy:
            return data.clone()
        return data

    @staticmethod
    def as_numpy(a: "Any") -> np.ndarray:
        if isinstance(a, torch.Tensor):
            if a.dtype == torch.bfloat16:
                return a.float().numpy()
            return a.numpy()
        return np.asarray(a)

    # ---- dtypes ----
    dtype = torch.dtype
    float64 = torch.float64
    float32 = torch.float32
    float16 = torch.float16
    bfloat16 = torch.bfloat16
    uint64 = torch.uint64
    uint32 = torch.uint32
    uint16 = torch.uint16
    uint8 = torch.uint8
    int64 = torch.int64
    int32 = torch.int32
    int16 = torch.int16
    int8 = torch.int8
    bool = torch.bool
    nan = float("nan")


from minidiff_tpu.backend import register_backend

register_backend("torch", TorchBackend)
