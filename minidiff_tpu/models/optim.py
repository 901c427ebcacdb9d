"""Functional optimizers over parameter pytrees.

``update(params, grads, state) -> (new_params, new_state)`` is pure in the
Tensor values, so an optimizer step jits into the same executable as the
forward/backward (see models.mlp.make_train_step).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax

import minidiff_tpu as md

if TYPE_CHECKING:
    from typing import Any, Tuple


def _is_tensor(x):
    return isinstance(x, md.Tensor)


def _tree_map(fn, *trees):
    return jax.tree.map(fn, *trees, is_leaf=_is_tensor)


class Optimizer:
    def init(self, params: "Any") -> "Any":
        raise NotImplementedError

    def update(self, params: "Any", grads: "Any", state: "Any") -> "Tuple[Any, Any]":
        raise NotImplementedError


class SGD(Optimizer):
    def __init__(self, lr: float, momentum: float = 0.0):
        self.lr = lr
        self.momentum = momentum

    def init(self, params: "Any") -> "Any":
        if self.momentum == 0.0:
            return None
        return _tree_map(lambda p: md.zeros_like(p), params)

    def update(self, params, grads, state):
        # no_grad: optimizer math never needs a tape
        with md.no_grad():
            if self.momentum == 0.0:
                new_params = _tree_map(
                    lambda p, g: (p - self.lr * g).detach(allow_grad=True),
                    params,
                    grads,
                )
                return new_params, None
            new_state = _tree_map(lambda v, g: self.momentum * v + g, state, grads)
            new_params = _tree_map(
                lambda p, v: (p - self.lr * v).detach(allow_grad=True),
                params,
                new_state,
            )
            return new_params, new_state


class Adam(Optimizer):
    def __init__(self, lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8):
        self.lr = lr
        self.b1 = b1
        self.b2 = b2
        self.eps = eps

    def init(self, params: "Any") -> "Any":
        zeros = lambda p: md.zeros_like(p)
        return {
            "m": _tree_map(zeros, params),
            "v": _tree_map(zeros, params),
            "t": md.Tensor(0.0),
        }

    def update(self, params, grads, state):
        with md.no_grad():
            t = state["t"] + 1.0
            m = _tree_map(
                lambda m_, g: self.b1 * m_ + (1 - self.b1) * g, state["m"], grads
            )
            v = _tree_map(
                lambda v_, g: self.b2 * v_ + (1 - self.b2) * g * g, state["v"], grads
            )
            # bias-corrected step size folded into a scalar Tensor
            step = self.lr * md.sqrt(1 - self.b2**t) / (1 - self.b1**t)
            new_params = _tree_map(
                lambda p, m_, v_: (p - step * m_ / (md.sqrt(v_) + self.eps)).detach(
                    allow_grad=True
                ),
                params,
                m,
                v,
            )
            return new_params, {"m": m, "v": v, "t": t}


def _blocks(x: "md.Tensor", block: int):
    flat = x.reshape((-1,)).astype(md.float32)
    n = flat.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        flat = md.concat((flat, md.zeros((pad,)).astype(md.float32)), axis=0)
    return flat.reshape((nb, block)), n


def _q8_block(x: "md.Tensor", block: int):
    """Blockwise SYMMETRIC int8: (q (nb, block), s (nb, 1), n).  Right for
    zero-centred values (first moment): resolution amax/127 per block."""
    blocks, n = _blocks(x, block)
    amax = md.max(md.absolute(blocks), axis=1, keepdims=True)
    s = md.where(amax > 0, amax / 127.0, md.ones_like(amax))
    # round-half-up in framework ops (no dedicated round op)
    q = md.clip(md.floor(blocks / s + 0.5), -127, 127).astype(md.int8)
    return q, s, n


def _dq8_block(q: "md.Tensor", s: "md.Tensor", n: int, shape):
    flat = (q.astype(md.float32) * s).reshape((-1,))
    return flat[:n].reshape(shape)


_LOG_TINY = 1e-16


def _q8_log_block(x: "md.Tensor", block: int):
    """Blockwise LOG-UNIFORM int8 for NONNEGATIVE values (second moment):
    (q (nb, block), s (nb, 2) = [log-min, log-step], n).

    Linear symmetric quantization collapses a block's small entries to
    ZERO when it also holds large ones — and a zeroed second moment makes
    1/(sqrt(v)+eps) explode (observed: loss 1.06 -> 3.17 one step after a
    collapse).  Log-spacing keeps RELATIVE resolution uniform across the
    block (~e^(range/254) multiplicative error), so no magnitude ever
    rounds to zero."""
    blocks, n = _blocks(x, block)
    lg = md.log(blocks + _LOG_TINY)
    lmin = md.min(lg, axis=1, keepdims=True)
    lmax = md.max(lg, axis=1, keepdims=True)
    step = md.maximum((lmax - lmin) / 254.0,
                      md.full_like(lmin, 1e-12))
    q = md.clip(md.floor((lg - lmin) / step + 0.5) - 127.0, -127, 127)
    s = md.concat((lmin, step), axis=1)  # (nb, 2)
    return q.astype(md.int8), s, n


def _dq8_log_block(q: "md.Tensor", s: "md.Tensor", n: int, shape):
    lmin = s[:, 0:1]
    step = s[:, 1:2]
    flat = (md.exp(lmin + (q.astype(md.float32) + 127.0) * step)
            - _LOG_TINY).reshape((-1,))
    return md.maximum(flat[:n], md.zeros((n,))).reshape(shape)


class Adam8bit(Adam):
    """Adam with BLOCKWISE int8 moment storage (the bitsandbytes idea).

    Full-precision Adam keeps two f32 moments per parameter — 8 bytes of
    optimizer HBM per weight, often more than the bf16 weights themselves.
    Here m and v live as int8 with one f32 scale per ``block`` values
    (~1.02 bytes/value at the default 2048): the update dequantizes, does
    the exact Adam math in f32, and requantizes — all inside the one
    compiled train step, so the extra work is a few fused elementwise
    passes while the persistent state shrinks ~4x.  Quantization noise is
    bounded by amax/254 per block per step; the parity test trains to the
    same loss trajectory as f32 Adam within tolerance.
    """

    def __init__(self, lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, block: int = 2048):
        super().__init__(lr, b1, b2, eps)
        self.block = block

    def init(self, params: "Any") -> "Any":
        def zq(p):
            q, s, _ = _q8_block(md.zeros_like(p), self.block)
            return {"q": q, "s": s}

        def zql(p):
            q, s, _ = _q8_log_block(md.zeros_like(p), self.block)
            return {"q": q, "s": s}

        return {
            "m": _tree_map(zq, params),
            "v": _tree_map(zql, params),
            "t": md.Tensor(0.0),
        }

    def update(self, params, grads, state):
        with md.no_grad():
            t = state["t"] + 1.0
            step = self.lr * md.sqrt(1 - self.b2**t) / (1 - self.b1**t)

            def upd(p, g, mq, vq):
                m = _dq8_block(mq["q"], mq["s"], p.size, p.shape)
                v = _dq8_log_block(vq["q"], vq["s"], p.size, p.shape)
                g32 = g.astype(md.float32)
                m = self.b1 * m + (1 - self.b1) * g32
                v = self.b2 * v + (1 - self.b2) * g32 * g32
                new_p = (p - (step * m / (md.sqrt(v) + self.eps)).astype(
                    p.dtype)).detach(allow_grad=True)
                qm, sm, _ = _q8_block(m, self.block)
                qv, sv, _ = _q8_log_block(v, self.block)
                return new_p, {"q": qm, "s": sm}, {"q": qv, "s": sv}

            def is_moment(x):
                return isinstance(x, dict) and "q" in x and "s" in x

            flat_p, tdef = jax.tree.flatten(params, is_leaf=_is_tensor)
            flat_g = jax.tree.flatten(grads, is_leaf=_is_tensor)[0]
            mdef = jax.tree.structure(state["m"], is_leaf=is_moment)
            flat_m = jax.tree.flatten(state["m"], is_leaf=is_moment)[0]
            flat_v = jax.tree.flatten(state["v"], is_leaf=is_moment)[0]
            outs = [upd(p, g, mq, vq)
                    for p, g, mq, vq in zip(flat_p, flat_g, flat_m, flat_v)]
            new_params = jax.tree.unflatten(tdef, [o[0] for o in outs])
            new_m = jax.tree.unflatten(mdef, [o[1] for o in outs])
            new_v = jax.tree.unflatten(mdef, [o[2] for o in outs])
            return new_params, {"m": new_m, "v": new_v, "t": t}


class AdamW(Adam):
    """Adam with decoupled weight decay (applied to params, not grads)."""

    def __init__(self, lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.01):
        super().__init__(lr, b1, b2, eps)
        self.weight_decay = weight_decay

    def update(self, params, grads, state):
        with md.no_grad():
            decayed = _tree_map(
                lambda p: p * (1.0 - self.lr * self.weight_decay), params
            )
        new_params, new_state = super().update(decayed, grads, state)
        return new_params, new_state


class Lion(Optimizer):
    """Lion (EvoLved sign momentum): update = sign(b1*m + (1-b1)*g).

    One momentum buffer (half Adam's state memory) and sign-magnitude
    updates; decoupled weight decay like AdamW.
    """

    def __init__(self, lr: float = 1e-4, b1: float = 0.9, b2: float = 0.99,
                 weight_decay: float = 0.0):
        self.lr = lr
        self.b1 = b1
        self.b2 = b2
        self.weight_decay = weight_decay

    def init(self, params: "Any") -> "Any":
        return _tree_map(lambda p: md.zeros_like(p), params)

    def update(self, params, grads, state):
        with md.no_grad():
            new_params = _tree_map(
                lambda p, m, g: (
                    p * (1.0 - self.lr * self.weight_decay)
                    - self.lr * md.sign(self.b1 * m + (1 - self.b1) * g)
                ).detach(allow_grad=True),
                params, state, grads,
            )
            new_state = _tree_map(
                lambda m, g: self.b2 * m + (1 - self.b2) * g, state, grads
            )
            return new_params, new_state


class Adafactor(Optimizer):
    """Adafactor: factored second moments — O(rows+cols) optimizer memory.

    For >=2-D params the v statistic is stored as a row vector + column
    vector (outer-product reconstruction) instead of a full matrix; 1-D
    params keep an unfactored v.  This simplified variant uses a fixed
    learning rate with update clipping (d=1.0) and no first moment —
    the memory-lean recipe that made large TPU models trainable.
    """

    def __init__(self, lr: float = 1e-2, decay: float = 0.999,
                 eps: float = 1e-30, clip_threshold: float = 1.0):
        self.lr = lr
        self.decay = decay
        self.eps = eps
        self.clip = clip_threshold

    def init(self, params: "Any") -> "Any":
        def factored(p):
            if p.ndim >= 2:
                return {
                    "r": md.zeros(p.shape[:-1]),          # row stats
                    "c": md.zeros(p.shape[:-2] + p.shape[-1:]),  # col stats
                }
            return {"v": md.zeros_like(p)}

        return _tree_map(factored, params)

    def update(self, params, grads, state):
        with md.no_grad():
            def upd(p, g, s):
                g2 = g * g + self.eps
                if p.ndim >= 2:
                    r = self.decay * s["r"] + (1 - self.decay) * md.mean(
                        g2, axis=-1)
                    c = self.decay * s["c"] + (1 - self.decay) * md.mean(
                        g2, axis=-2)
                    # v_hat = outer(r, c) / mean(r): rank-1 reconstruction
                    denom = md.mean(r, axis=-1, keepdims=True)
                    v = md.expand_dims(r, -1) * md.expand_dims(c, -2) / (
                        md.expand_dims(denom, -1) + self.eps)
                    new_s = {"r": r, "c": c}
                else:
                    v = self.decay * s["v"] + (1 - self.decay) * g2
                    new_s = {"v": v}
                u = g / md.sqrt(v + self.eps)
                # update clipping: rms(u) <= clip_threshold
                rms = md.sqrt(md.mean(u * u) + self.eps)
                u = u / md.clip(rms / self.clip, 1.0, None)
                return (p - self.lr * u).detach(allow_grad=True), new_s

            # state nests one dict level below each param leaf, so align by
            # flatten order instead of a joint tree_map
            p_leaves, treedef = jax.tree.flatten(params, is_leaf=_is_tensor)
            g_leaves = treedef.flatten_up_to(grads)
            s_leaves = treedef.flatten_up_to(state)
            outs = [upd(p, g, s)
                    for p, g, s in zip(p_leaves, g_leaves, s_leaves)]
            new_params = jax.tree.unflatten(treedef, [o[0] for o in outs])
            new_state = jax.tree.unflatten(treedef, [o[1] for o in outs])
            return new_params, new_state


class MixedPrecision(Optimizer):
    """Mixed-precision training: f32 master weights, low-precision compute.

    Wraps any optimizer.  The model holds and computes with low-precision
    (bf16) parameters; this wrapper keeps a float32 master copy in its
    state, applies the inner update there (grads are upcast, optionally
    unscaled by ``loss_scale``), and hands back the re-cast low-precision
    params.  The standard production recipe on TPU: bf16 matmuls on the
    MXU, f32 accumulation of the optimizer state so tiny updates don't
    round to zero.

    ``compute_dtype=None`` (default) re-casts each updated param to the
    dtype it came in with — so wrapping an f32 model never silently
    downcasts it; pass ``compute_dtype=bfloat16`` explicitly to convert.

    ``loss_scale`` matches a loss multiplied by the same factor at the call
    site (usually unnecessary for bf16 — its exponent range equals f32's —
    but required for f16).
    """

    def __init__(self, inner: "Optimizer", compute_dtype: "Any" = None,
                 loss_scale: float = 1.0):
        self.inner = inner
        self.compute_dtype = compute_dtype
        self.loss_scale = loss_scale

    def _f32(self):
        import minidiff_tpu.backend as backend

        return backend.get_backend().float32

    def init(self, params: "Any") -> "Any":
        with md.no_grad():
            master = _tree_map(
                lambda p: p.astype(self._f32()).detach(allow_grad=True), params
            )
        return {"master": master, "inner": self.inner.init(master)}

    def update(self, params, grads, state):
        with md.no_grad():
            f32 = self._f32()
            gscale = 1.0 / self.loss_scale
            grads32 = _tree_map(
                lambda g: g.astype(f32) * gscale if self.loss_scale != 1.0
                else g.astype(f32),
                grads,
            )
        master, inner_state = self.inner.update(
            state["master"], grads32, state["inner"]
        )
        with md.no_grad():
            if self.compute_dtype is not None:
                new_params = _tree_map(
                    lambda p: p.astype(self.compute_dtype).detach(
                        allow_grad=True),
                    master,
                )
            else:
                # default: every param keeps the dtype it came in with —
                # wrapping an f32 model without compute_dtype must not
                # silently re-cast it to bf16 after the first update
                new_params = _tree_map(
                    lambda m, p: m.astype(p.dtype).detach(allow_grad=True),
                    master, params,
                )
        return new_params, {"master": master, "inner": inner_state}


def _newton_schulz(g: "md.Tensor", steps: int = 5,
                   eps: float = 1e-7) -> "md.Tensor":
    """Quintic Newton-Schulz orthogonalization: ~zeroth power of a matrix.

    Five iterations of X <- aX + (bA + cA²)X with A = XXᵀ drive the
    singular values of the Frobenius-normalized input toward 1 (the
    coefficients trade exactness for convergence speed across the whole
    spectrum — singular values land in ~[0.7, 1.2], which is what Muon
    wants).  All work is matmuls, so the whole orthogonalization runs on
    the MXU; f32 throughout (bf16 Newton-Schulz diverges), cast back by
    the caller.  Tall matrices transpose first so the Gram matrix A is
    the SMALLER square."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(md.float32)
    tall = x.shape[0] > x.shape[1]
    if tall:
        x = md.transpose(x)
    x = x / (md.sqrt(md.sum(x * x)) + eps)
    for _ in range(steps):
        gram = md.matmul_nt(x, x)
        x = a * x + md.matmul(b * gram + c * md.matmul(gram, gram), x)
    return md.transpose(x) if tall else x


class Muon(Optimizer):
    """Muon: momentum orthogonalized by Newton-Schulz (2-D params).

    Each 2-D parameter's momentum buffer is orthogonalized (all singular
    values ~1) before the step, scaled by sqrt(max(1, rows/cols)) so the
    per-row update RMS is aspect-ratio independent.  Non-2-D leaves
    (biases, norm gains, scalars) fall back to plain Nesterov-momentum
    SGD at the same lr — Muon's public recipe reserves orthogonalization
    for hidden weight matrices.  TPU-fit: the optimizer itself is five
    matmuls per weight (MXU work), no elementwise-heavy state like Adam.
    """

    def __init__(self, lr: float = 0.02, momentum: float = 0.95,
                 nesterov: bool = True, ns_steps: int = 5):
        self.lr = lr
        self.momentum = momentum
        self.nesterov = nesterov
        self.ns_steps = ns_steps

    def init(self, params: "Any") -> "Any":
        return _tree_map(lambda p: md.zeros_like(p).astype(md.float32),
                         params)

    def update(self, params, grads, state):
        with md.no_grad():
            if state is None:  # lazy init: fresh momentum buffers
                state = self.init(params)
            new_m = _tree_map(
                lambda m, g: self.momentum * m + g.astype(md.float32),
                state, grads)

            def step(p, m, g):
                upd = (g.astype(md.float32) + self.momentum * m
                       if self.nesterov else m)
                if p.ndim == 2:
                    upd = _newton_schulz(upd, self.ns_steps)
                    upd = upd * max(1.0, p.shape[0] / p.shape[1]) ** 0.5
                return (p - self.lr * upd.astype(p.dtype)).detach(
                    allow_grad=True)

            return _tree_map(step, params, new_m, grads), new_m


class EMA:
    """Exponential moving average of a parameter tree (diffusion-standard
    eval weights: sample with ema_params, train with params).

    ``init(params)`` copies the tree; ``update(ema, params)`` returns
    decay·ema + (1-decay)·params leaf-wise — pure framework ops, so it
    folds into a compiled train step (and shards like the params under
    SPMD: same tree, same placement)."""

    def __init__(self, decay: float = 0.999):
        self.decay = decay

    def init(self, params: "Any") -> "Any":
        with md.no_grad():
            return _tree_map(lambda p: (p * 1.0).detach(), params)

    def update(self, ema: "Any", params: "Any") -> "Any":
        with md.no_grad():
            return _tree_map(
                lambda e, p: self.decay * e + (1.0 - self.decay) * p,
                ema, params)


def clip_by_global_norm(grads: "Any", max_norm: float) -> "Any":
    """Scale the whole gradient tree so its global L2 norm is <= max_norm."""
    with md.no_grad():
        sq = None
        for g in jax.tree.leaves(grads, is_leaf=_is_tensor):
            if not _is_tensor(g):
                continue
            term = md.sum(g * g)
            sq = term if sq is None else sq + term
        if sq is None:
            return grads
        norm = md.sqrt(sq)
        # min(1, max_norm / norm), safe at norm == 0
        scale = md.clip(max_norm / (norm + 1e-12), None, 1.0)
        return _tree_map(lambda g: g * scale if _is_tensor(g) else g, grads)


# -- learning-rate schedules: step -> lr (floats; close over them in a
# make_train_step-style builder or rebuild the optimizer per epoch) ----------


def cosine_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0,
                    final_lr: float = 0.0):
    import math as _math

    def lr_at(step: int) -> float:
        if warmup_steps and step < warmup_steps:
            return base_lr * (step + 1) / warmup_steps
        frac = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        frac = min(max(frac, 0.0), 1.0)
        return final_lr + 0.5 * (base_lr - final_lr) * (1 + _math.cos(_math.pi * frac))

    return lr_at


def warmup_linear_schedule(base_lr: float, total_steps: int,
                           warmup_steps: int = 0):
    def lr_at(step: int) -> float:
        if warmup_steps and step < warmup_steps:
            return base_lr * (step + 1) / warmup_steps
        frac = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        return base_lr * max(1.0 - frac, 0.0)

    return lr_at
